package graft

import graft.operators.Compare
import org.scalatest.funsuite.AnyFunSuite

class CompareSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame) = {
    val r = df.head()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))
  }

  test("identical inputs are equal") {
    val a = Seq((1, "x", 1.5), (2, "y", 2.5)).toDF("i", "s", "d").orderBy("i")
    assert(summary(Compare.summarize(spark, a, a)) == ((2L, 2L, 0L, -1L, true)))
  }

  test("value difference found at the right index") {
    val a = Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("i", "d").orderBy("i")
    val b = Seq((1, 1.0), (2, 9.0), (3, 3.0)).toDF("i", "d").orderBy("i")
    assert(summary(Compare.summarize(spark, a, b)) == ((3L, 3L, 1L, 1L, false)))
  }

  test("column names are ignored, positions matter") {
    val a = Seq((1, 2)).toDF("x", "y")
    val b = Seq((1, 2)).toDF("p", "q")
    assert(summary(Compare.summarize(spark, a, b))._5)
  }

  test("row count mismatch counts missing rows as diffs") {
    val a = Seq(1, 2, 3).toDF("i").orderBy("i")
    val b = Seq(1, 2).toDF("i").orderBy("i")
    val (l, r, d, first, eq) = summary(Compare.summarize(spark, a, b))
    assert((l, r, d, first, eq) == ((3L, 2L, 1L, 2L, false)))
  }

  test("epsilon is absolute-valued (reference's signed-epsilon bug fixed)") {
    val a = Seq((1, 1.000), (2, 2.000)).toDF("i", "d").orderBy("i")
    val b = Seq((1, 1.004), (2, 1.996)).toDF("i", "d").orderBy("i")
    // reference semantics would pass row 2 even with eps=0 since l>r
    assert(!summary(Compare.summarize(spark, a, b))._5)
    assert(summary(Compare.summarize(spark, a, b, epsilon = 0.01))._5)
    assert(!summary(Compare.summarize(spark, a, b, epsilon = 0.001))._5)
  }

  test("types beyond the reference whitelist compare fine") {
    val a = Seq((1, Array[Byte](1, 2), Seq("a", "b"), true)).toDF("i", "bin", "arr", "b")
    val b = Seq((1, Array[Byte](1, 2), Seq("a", "b"), true)).toDF("i", "bin", "arr", "b")
    val c = Seq((1, Array[Byte](1, 3), Seq("a", "b"), true)).toDF("i", "bin", "arr", "b")
    assert(summary(Compare.summarize(spark, a, b))._5)
    assert(!summary(Compare.summarize(spark, a, c))._5)
  }

  test("integer widths compare by value") {
    val a = Seq(1, 2).toDF("i") // int
    val b = Seq(1L, 2L).toDF("i") // long
    assert(summary(Compare.summarize(spark, a, b))._5)
  }
}
