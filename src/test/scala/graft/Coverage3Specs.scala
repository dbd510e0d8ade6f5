package graft

import graft.functions.ZOrder
import graft.operators.Compact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit interleave matches hand-computed Morton key") {
    // x=5 (0101b) at even bit positions, y=3 (0011b) at odd:
    // x: bits 0,2 set -> key bits 0,4 -> 1+16; y: bits 0,1 set -> key bits 1,3 -> 2+8
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zKey(Seq($"x", $"y"), 4).as("z"))
      .head().getLong(0)
    assert(got == 27L)
  }

  test("quadrant containment: both coords < 2^k iff zkey < 4^k") {
    val grid = spark.range(16).toDF("x")
      .crossJoin(spark.range(16).toDF("y"))
      .select($"x", $"y", ZOrder.zKey(Seq($"x", $"y"), 4).as("z"))
    val inQuad = grid.filter($"x" < 8 && $"y" < 8)
    assert(inQuad.agg(max($"z")).head().getLong(0) < 64L)
    val outQuad = grid.filter($"x" >= 8 || $"y" >= 8)
    assert(outQuad.agg(min($"z")).head().getLong(0) >= 64L)
  }

  test("zOrderSql mirror computes the identical key") {
    // the generated SQL is plain ANSI bit arithmetic, so Spark itself can
    // evaluate the DuckDB-dialect string — cross-checks the two generators
    val sql = ZOrder.zOrderSql(Seq("x", "y"), 6)
    val diff = spark.range(64).toDF("x")
      .crossJoin(spark.range(64).toDF("y"))
      .select(
        ZOrder.zKey(Seq($"x", $"y"), 6).as("a"),
        expr(sql).as("b"))
      .filter($"a" =!= $"b")
      .count()
    assert(diff == 0L)
  }
}

class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDirs(tag: String): (String, String) =
    (Tables.scratch(s"compact_spec_in_$tag"), Tables.scratch(s"compact_spec_out_$tag"))

  test("compaction to a huge target collapses to one file, content preserved") {
    val (in, out) = freshDirs("one")
    spark.range(100000).toDF("v").repartition(16)
      .write.mode("overwrite").parquet(in)
    val (before, after) = Compact.compact(spark, in, out, 1L << 30)
    assert(before == 16 && after == 1, s"before=$before after=$after")
    val got = spark.read.parquet(out)
    assert(got.count() == 100000L)
    assert(got.agg(sum(col("v"))).head().getLong(0) == 100000L * 99999 / 2)
  }

  test("target smaller than total yields multiple files near ceil(total/target)") {
    val (in, out) = freshDirs("multi")
    spark.range(200000).toDF("v").repartition(32)
      .write.mode("overwrite").parquet(in)
    val (_, total) = Compact.stats(spark, in)
    val target = total / 4
    val (_, after) = Compact.compact(spark, in, out, target)
    val expected = ((total + target - 1) / target).toInt
    assert(after == expected, s"after=$after expected=$expected")
    assert(spark.read.parquet(out).count() == 200000L)
  }
}
