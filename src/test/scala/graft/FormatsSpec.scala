package graft

import graft.sources.Formats
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("format sniffing by extension") {
    assert(Formats.fileFormat("/x/a.parquet") == Right(Formats.Parquet))
    assert(Formats.fileFormat("/x/a.parq") == Right(Formats.Parquet))
    assert(Formats.fileFormat("/x/a.csv") == Right(Formats.Csv))
    assert(Formats.fileFormat("/x/a.json") == Right(Formats.Json))
    assert(Formats.fileFormat("/x/a.avro") == Right(Formats.Avro))
    assert(Formats.fileFormat("/x/a.xyz").isLeft)
    assert(Formats.fileFormat("/x/noext").isLeft)
  }

  test("sanitize table name replaces non-identifier chars") {
    assert(Formats.sanitizeTableName("yellow_tripdata_2022-01") == "yellow_tripdata_2022_01")
    assert(Formats.sanitizeTableName("a.b c/d") == "a_b_c_d")
    assert(Formats.sanitizeTableName("ok_name_9") == "ok_name_9")
  }

  test("file stem") {
    assert(Formats.fileStem("/p/q/data.parquet") == "data")
    assert(Formats.fileStem("noext") == "noext")
  }

  test("register parquet file as view named after stem") {
    val (name, df) = Formats.registerTable(spark, s"${TestSpark.sf}/region.parquet")
    assert(name == "region")
    assert(spark.sql("SELECT count(*) FROM region").head().getLong(0) == df.count())
  }

  test("csv and json round trip through read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val src = spark.read.parquet(s"${TestSpark.sf}/region.parquet")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/r.csv")
    src.write.mode("overwrite").json(s"$dir/r.json")
    assert(Formats.read(spark, s"$dir/r.csv").count() == src.count())
    assert(Formats.read(spark, s"$dir/r.json").count() == src.count())
  }
}
