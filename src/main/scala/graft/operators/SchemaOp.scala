package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `schema` op: information_schema.columns-shaped description of a file
  * (reference: SQL over information_schema, /root/reference/src/bin/main.rs:128-135,
  * output shape /root/reference/README.md:55-77).
  *
  * Type names follow ANSI/DuckDB information_schema spellings (VARCHAR,
  * BIGINT, ...) rather than Spark's (STRING, ...) so the output is directly
  * comparable with an information_schema oracle.
  */
object SchemaOp {

  def ansiTypeName(dt: DataType): String = dt match {
    case ByteType                => "TINYINT"
    case ShortType               => "SMALLINT"
    case IntegerType             => "INTEGER"
    case LongType                => "BIGINT"
    case FloatType               => "FLOAT"
    case DoubleType              => "DOUBLE"
    case StringType              => "VARCHAR"
    case BooleanType             => "BOOLEAN"
    case DateType                => "DATE"
    case _: TimestampType        => "TIMESTAMP"
    case _: TimestampNTZType     => "TIMESTAMP"
    case d: DecimalType          => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType              => "BLOB"
    case ArrayType(e, _)         => s"${ansiTypeName(e)}[]"
    case MapType(k, v, _)        => s"MAP(${ansiTypeName(k)}, ${ansiTypeName(v)})"
    case StructType(fields)      =>
      fields.map(f => s"${f.name} ${ansiTypeName(f.dataType)}").mkString("STRUCT(", ", ", ")")
    case other                   => other.sql
  }

  /** (column_name, data_type, is_nullable, ordinal_position) for a DataFrame. */
  def describe(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.schema.fields.zipWithIndex.map { case (f, i) =>
      Row(f.name, ansiTypeName(f.dataType), if (f.nullable) "YES" else "NO", i + 1)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("column_name", StringType, nullable = false),
        StructField("data_type", StringType, nullable = false),
        StructField("is_nullable", StringType, nullable = false),
        StructField("ordinal_position", IntegerType, nullable = false))))
  }

  /** schema of a file path (any supported format). */
  def describePath(spark: SparkSession, path: String): DataFrame =
    describe(spark, graft.sources.Formats.read(spark, path))
}
