package graft

import graft.operators.{Convert, ParquetMeta, SchemaOp}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaOpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ANSI type names") {
    assert(SchemaOp.ansiTypeName(LongType) == "BIGINT")
    assert(SchemaOp.ansiTypeName(StringType) == "VARCHAR")
    assert(SchemaOp.ansiTypeName(ArrayType(FloatType)) == "FLOAT[]")
    assert(SchemaOp.ansiTypeName(DecimalType(12, 2)) == "DECIMAL(12,2)")
    assert(SchemaOp.ansiTypeName(TimestampNTZType) == "TIMESTAMP")
  }

  test("describe shape matches information_schema.columns") {
    val df = SchemaOp.describePath(spark, s"${TestSpark.sf}/lineitem.parquet")
    assert(df.columns.toSeq ==
      Seq("column_name", "data_type", "is_nullable", "ordinal_position"))
    assert(df.count() == 11)
    assert(df.head().getString(0) == "l_orderkey")
  }
}

class ConvertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet -> csv -> parquet preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_conv").toString
    val in = s"${TestSpark.sf}/region.parquet"
    Convert.convert(spark, in, s"$dir/r.csv", singleFile = true)
    Convert.convert(spark, s"$dir/r.csv", s"$dir/r.parquet")
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(s"$dir/r.parquet")
    assert(a.count() == b.count())
    assert(a.columns.toSeq == b.columns.toSeq)
  }

  test("zstd + single-file writes one zstd part file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_conv2").toString
    Convert.convert(spark, s"${TestSpark.sf}/nation.parquet", s"$dir/n.parquet",
      singleFile = true, zstd = true)
    val parts = new java.io.File(s"$dir/n.parquet").listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(parts.length == 1)
    val meta = ParquetMeta.metadata(spark, parts.head.getPath)
    assert(meta.select("compression").distinct().head().getString(0) == "ZSTD")
  }

  test("convert does not leak writer conf into the session (dictionary stays on)") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    def encodings(dir: String): Set[String] = {
      val part = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(part.getPath), spark.sparkContext.hadoopConfiguration))
      try r.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala)
        .flatMap(_.getEncodings.asScala.map(_.name)).toSet
      finally r.close()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_conv3").toString
    Convert.convert(spark, s"${TestSpark.sf}/nation.parquet", s"$dir/c.parquet")
    // convert itself writes without dictionary pages (reference writes PLAIN)
    assert(!encodings(s"$dir/c.parquet").exists(_.contains("DICTIONARY")))
    // ...but the session conf is untouched, so a plain follow-up write keeps
    // Spark's default dictionary encoding (this regressed when convert set
    // parquet.enable.dictionary on the session-global Hadoop conf)
    assert(spark.sparkContext.hadoopConfiguration.get("parquet.enable.dictionary") == null)
    spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
      .write.mode("overwrite").parquet(s"$dir/plain.parquet")
    assert(encodings(s"$dir/plain.parquet").exists(_.contains("DICTIONARY")))
  }

  test("avro output rejected like the reference") {
    intercept[IllegalArgumentException] {
      Convert.convert(spark, s"${TestSpark.sf}/region.parquet", "/tmp/x.avro")
    }
  }

  test("avro input converts to parquet (the reference's canonical avro flow)") {
    // `bdt convert in.avro out.parquet` is what the reference's avro read
    // support exists for — prove the same flow end-to-end here
    val dir = java.nio.file.Files.createTempDirectory("graft_conv5").toString
    val nation = Tables.t(spark, TestSpark.sf, "nation")
    graft.sources.AvroRead.writeFixture(nation, s"$dir/n.avro")
    Convert.convert(spark, s"$dir/n.avro", s"$dir/n.parquet")
    val back = spark.read.parquet(s"$dir/n.parquet")
    assert(back.count() == nation.count())
    assert(back.columns.toSeq == nation.columns.toSeq)
  }

  test("parquet -> orc -> read round trip (engine extension)") {
    // the sniffer knows .orc, so convert must write it rather than
    // MatchError (regression: Orc was added to Formats without a write arm)
    val dir = java.nio.file.Files.createTempDirectory("graft_conv4").toString
    Convert.convert(spark, s"${TestSpark.sf}/region.parquet", s"$dir/r.orc")
    val a = spark.read.parquet(s"${TestSpark.sf}/region.parquet")
    val b = graft.sources.Formats.read(spark, s"$dir/r.orc")
    assert(b.count() == a.count())
    assert(b.columns.toSeq == a.columns.toSeq)
  }
}

class ParquetMetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("footer stats match the data") {
    val path = s"${TestSpark.sf}/region.parquet"
    val meta = ParquetMeta.metadata(spark, path)
    val n = spark.read.parquet(path).count()
    assert(meta.select("row_group_num_rows").head().getLong(0) == n)
    val names = meta.select("path_in_schema").collect().map(_.getString(0)).toSet
    assert(names == Set("r_regionkey", "r_name"))
    // string min/max decoded as UTF-8, not raw bytes
    val rName = meta.filter(meta("path_in_schema") === "r_name").head()
    assert(rName.getAs[String]("stats_min_value").nonEmpty)
    assert(rName.getAs[String]("type") == "BYTE_ARRAY")
  }

  test("fileInfo totals") {
    val info = ParquetMeta.fileInfo(spark, s"${TestSpark.sf}/region.parquet").head()
    assert(info.getLong(1) == 5L) // rows
    assert(info.getInt(3) == 2)   // columns
  }
}

/** information_schema SQL-queryability (reference enables DataFusion's
  * information_schema session-wide, main.rs:111).
  */
class InformationSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("information_schema views queryable through the query op") {
    val df = graft.operators.QueryRunner.run(
      spark,
      tables = Seq(s"${TestSpark.sf}/region.parquet"),
      tableDir = None,
      sql = """SELECT table_name, column_name, data_type
               FROM information_schema_columns
               WHERE table_name = 'region' ORDER BY ordinal_position""")
    val rows = df.collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("r_regionkey", "r_name"))
    assert(rows.forall(_.getString(0) == "region"))
    val tables = spark.sql(
      "SELECT table_type FROM information_schema_tables WHERE table_name = 'region'")
    assert(tables.head().getString(0) == "VIEW")
  }
}
