package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema DIFF between two datasets — the evolution report a `schema` verb
  * (reference: /root/reference/src/bin/main.rs:128-135) grows into once
  * tables have history: which columns were added, removed, or changed type
  * between two snapshots. Pure footer metadata — zero data rows move — so
  * the report costs the same on a 100 TB table as on a test fixture. Types
  * render through [[SchemaOp.ansiTypeName]] (ANSI/DuckDB spellings) so both
  * engines name them identically.
  */
object SchemaDiff {

  /** One row per column name present on either side: (column_name,
    * left_type, right_type, status ∈ added|removed|type_changed|same).
    */
  def diff(spark: SparkSession, left: DataFrame, right: DataFrame): DataFrame = {
    val l = SchemaOp.describe(spark, left)
      .select(col("column_name"), col("data_type").as("left_type"))
    val r = SchemaOp.describe(spark, right)
      .select(col("column_name"), col("data_type").as("right_type"))
    l.join(r, Seq("column_name"), "full_outer")
      .select(
        col("column_name"), col("left_type"), col("right_type"),
        when(col("left_type").isNull, "added")
          .when(col("right_type").isNull, "removed")
          .when(col("left_type") =!= col("right_type"), "type_changed")
          .otherwise("same").as("status"))
      .orderBy(col("column_name"))
  }
}
