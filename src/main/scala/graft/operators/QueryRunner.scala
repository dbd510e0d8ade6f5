package graft.operators

import graft.sources.Formats
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `query` op: register files/dirs as temp views named after their sanitized
  * stems, run arbitrary SQL, optionally write the result
  * (reference /root/reference/src/bin/main.rs:146-225).
  */
object QueryRunner {

  /** @param tables   individual files to register
    * @param tableDir optional directory whose entries all get registered
    * @param output   optional result path; extension must be .csv or .parquet
    *                 (reference rejects others, main.rs:210-221)
    * @param verbose  print logical + physical plan (reference main.rs:183-186)
    */
  def run(
      spark: SparkSession,
      tables: Seq[String],
      tableDir: Option[String],
      sql: String,
      output: Option[String] = None,
      verbose: Boolean = false): DataFrame = {

    tables.foreach(p => Formats.registerTable(spark, p))
    tableDir.foreach(d => Formats.registerDir(spark, d))

    val df = spark.sql(sql)
    if (verbose) df.explain(true)

    output.foreach { out =>
      val lower = out.toLowerCase
      if (lower.endsWith(".csv"))
        df.write.mode("overwrite").option("header", "true").csv(out)
      else if (lower.endsWith(".parquet"))
        df.write.mode("overwrite").parquet(out)
      else throw new IllegalArgumentException(
        s"unsupported output extension for '$out' (use .csv or .parquet)")
    }
    df
  }
}
