package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File

/** File-format handling: extension sniffing, table-name sanitization and
  * table registration.
  *
  * Reference behavior (re-expressed, not ported):
  *  - format-by-extension map `avro/csv/json/parquet|parq`
  *    (/root/reference/src/utils.rs:12-33)
  *  - `sanitize_table_name` replaces every non `[A-Za-z0-9_]` char with `_`
  *    (/root/reference/src/utils.rs:41-51)
  *  - `register_table` registers one file-backed table and returns a lazy
  *    DataFrame (/root/reference/src/utils.rs:53-87); CSV assumes a header
  *    row and inferred schema, JSON is newline-delimited.
  *  - "Arrow" format is declared but unimplemented in the reference
  *    (/root/reference/src/utils.rs:59-61); we do not add it (SURVEY §7.5).
  */
object Formats {

  sealed abstract class FileFormat(val name: String)
  case object Avro extends FileFormat("avro")
  case object Csv extends FileFormat("csv")
  case object Json extends FileFormat("json")
  case object Parquet extends FileFormat("parquet")
  /** Engine extension beyond the reference's format map: ORC is a Spark
    * built-in columnar source/sink (footer stats, predicate pushdown) and a
    * bdt user migrating a lakehouse will meet it; costs one match arm.
    */
  case object Orc extends FileFormat("orc")

  /** Sniff the format of a path from its extension. Directories are sniffed
    * from the first file inside (reference registers dirs of parquet the same
    * way, /root/reference/src/bin/main.rs:154-166).
    */
  def fileFormat(path: String): Either[String, FileFormat] = {
    val f = new File(path)
    val target =
      if (f.isDirectory)
        f.listFiles().filter(_.isFile).map(_.getName)
          // skip Spark/Hadoop bookkeeping files (_SUCCESS, .crc, ...)
          .filterNot(n => n.startsWith(".") || n.startsWith("_"))
          .sorted.headOption
          .map(n => s"$path/$n").getOrElse(path)
      else path
    extension(target) match {
      case Some("avro")             => Right(Avro)
      case Some("csv")              => Right(Csv)
      case Some("json")             => Right(Json)
      case Some("orc")              => Right(Orc)
      case Some("parquet" | "parq") => Right(Parquet)
      case Some(other)              => Left(s"unsupported file extension '$other'")
      case None                     => Left(s"no file extension in '$path'")
    }
  }

  private def extension(path: String): Option[String] = {
    val name = new File(path).getName
    val i = name.lastIndexOf('.')
    if (i <= 0 || i == name.length - 1) None
    else Some(name.substring(i + 1).toLowerCase)
  }

  /** File stem (name without the final extension). */
  def fileStem(path: String): String = {
    val name = new File(path).getName
    val i = name.lastIndexOf('.')
    if (i <= 0) name else name.substring(0, i)
  }

  /** Replace every char outside [A-Za-z0-9_] with '_' so a file stem is a
    * legal SQL table identifier (e.g. `yellow_tripdata_2022-01` →
    * `yellow_tripdata_2022_01`).
    */
  def sanitizeTableName(name: String): String =
    name.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  /** Read a file/dir with the sniffed format. CSV: header + inferred schema;
    * JSON: newline-delimited (Spark's default); Avro via the avro-mapred
    * Hadoop input format ([[AvroRead]] — no spark-avro connector needed).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    fileFormat(path) match {
      case Right(Csv) =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case Right(Json)    => spark.read.json(path)
      case Right(Orc)     => spark.read.orc(path)
      case Right(Parquet) => spark.read.parquet(path)
      case Right(Avro)    => AvroRead.read(spark, path)
      case Left(err)      => throw new IllegalArgumentException(err)
    }

  /** CSV read without a header row (columns become _c0, _c1, ...) — used by
    * compare's `--no-header-row` escape hatch.
    */
  def readCsvNoHeader(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "false").option("inferSchema", "true").csv(path)

  /** Register one file as a temp view named after its sanitized stem.
    * Returns (viewName, DataFrame).
    */
  def registerTable(spark: SparkSession, path: String): (String, DataFrame) = {
    val name = sanitizeTableName(fileStem(path))
    val df = read(spark, path)
    df.createOrReplaceTempView(name)
    (name, df)
  }

  /** Register every entry of a directory as its own table (reference
    * `--tables <dir>`, /root/reference/src/bin/main.rs:154-166).
    */
  def registerDir(spark: SparkSession, dir: String): Seq[String] = {
    val entries = Option(new File(dir).listFiles()).getOrElse(Array.empty)
    entries.sortBy(_.getName).map(f => registerTable(spark, f.getPath)._1).toSeq
  }
}
