package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** `view-parquet-meta` op: parquet footer / row-group / column-chunk stats
  * (reference /root/reference/src/parquet.rs:9-141 — footer version,
  * created_by, row counts, then per row group per column: stats incl. UTF-8
  * decoded byte-array min/max, parquet.rs:83-123).
  *
  * No Spark SQL path exists for footers; this uses parquet-hadoop directly
  * (ships in /opt/spark/jars). Stat values are rendered as strings using
  * DuckDB `parquet_metadata()` conventions so the output is oracle-checkable.
  */
object ParquetMeta {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private def renderTimestamp(value: Long, unit: TimeUnit): String = {
    val (sec, nanos) = unit match {
      case TimeUnit.MILLIS => (Math.floorDiv(value, 1000L), Math.floorMod(value, 1000L) * 1000000L)
      case TimeUnit.MICROS => (Math.floorDiv(value, 1000000L), Math.floorMod(value, 1000000L) * 1000L)
      case TimeUnit.NANOS  => (Math.floorDiv(value, 1000000000L), Math.floorMod(value, 1000000000L))
    }
    val ldt = LocalDateTime.ofInstant(Instant.ofEpochSecond(sec, nanos), ZoneOffset.UTC)
    val base = ldt.format(tsFmt)
    if (nanos == 0) base
    else base + "." + f"${nanos}%09d".reverse.dropWhile(_ == '0').reverse
  }

  private def renderStat(pt: PrimitiveType, v: Any): String = {
    if (v == null) return null
    val logical = pt.getLogicalTypeAnnotation
    (pt.getPrimitiveTypeName.name, v, logical) match {
      case (_, l: java.lang.Long, ts: TimestampLogicalTypeAnnotation) =>
        renderTimestamp(l, ts.getUnit)
      case ("BINARY", b: org.apache.parquet.io.api.Binary, lt)
          if lt.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        b.toStringUsingUTF8
      case ("BINARY", b: org.apache.parquet.io.api.Binary, _) =>
        b.getBytes.mkString("[", ", ", "]")
      case (_, other, _) => other.toString
    }
  }

  /** parquet-java's PrimitiveTypeName spells BINARY where the parquet spec
    * (and DuckDB) say BYTE_ARRAY.
    */
  private def specTypeName(name: String): String =
    if (name == "BINARY") "BYTE_ARRAY" else name

  private val schema = StructType(Seq(
    StructField("row_group_id", LongType, nullable = false),
    StructField("row_group_num_rows", LongType, nullable = false),
    StructField("column_id", LongType, nullable = false),
    StructField("path_in_schema", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("num_values", LongType, nullable = false),
    StructField("stats_null_count", LongType, nullable = true),
    StructField("stats_min_value", StringType, nullable = true),
    StructField("stats_max_value", StringType, nullable = true),
    StructField("compression", StringType, nullable = false)))

  /** One row per (row group, column chunk). Footer-only read — no data pages
    * touched, so this is O(row-groups), not O(data).
    */
  def metadata(spark: SparkSession, path: String): DataFrame = {
    val input = HadoopInputFile.fromPath(
      new Path(path), spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(input)
    try {
      val footer = reader.getFooter
      val msgType = footer.getFileMetaData.getSchema
      val rows = footer.getBlocks.asScala.zipWithIndex.flatMap { case (block, rgId) =>
        block.getColumns.asScala.zipWithIndex.map { case (cc, colId) =>
          val pt = msgType.getType(cc.getPath.toArray: _*).asPrimitiveType()
          val stats = cc.getStatistics
          val (nulls, minV, maxV) =
            if (stats == null) (null, null, null)
            else (
              if (stats.isNumNullsSet) Long.box(stats.getNumNulls) else null,
              if (stats.hasNonNullValue) renderStat(pt, stats.genericGetMin) else null,
              if (stats.hasNonNullValue) renderStat(pt, stats.genericGetMax) else null)
          Row(rgId.toLong, block.getRowCount, colId.toLong,
            cc.getPath.toDotString, specTypeName(pt.getPrimitiveTypeName.name),
            cc.getValueCount, nulls, minV, maxV, cc.getCodec.name)
        }
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    } finally reader.close()
  }

  /** File-level footer summary (version, created_by, totals) —
    * reference parquet.rs:15-35.
    */
  def fileInfo(spark: SparkSession, path: String): DataFrame = {
    val input = HadoopInputFile.fromPath(
      new Path(path), spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(input)
    try {
      val footer = reader.getFooter
      val rows = Seq(Row(
        footer.getFileMetaData.getCreatedBy,
        reader.getRecordCount,
        footer.getBlocks.size.toLong,
        footer.getFileMetaData.getSchema.getFieldCount))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("created_by", StringType, nullable = true),
          StructField("num_rows", LongType, nullable = false),
          StructField("num_row_groups", LongType, nullable = false),
          StructField("num_columns", IntegerType, nullable = false))))
    } finally reader.close()
  }
}
