package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_incremental_bloom must be a pure PLAN optimization: identical rows
  * to dedup_incremental (the bloom may only divert rows the exact anti-join
  * passes anyway), with the map-side might_contain probe actually present.
  */
class IncrementalBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom-prefiltered incremental dedup equals the plain anti-join, probe in plan") {
    val plain = SparkEntry.queries("dedup_incremental")(spark, TestSpark.sf)
    val bloom = SparkEntry.queries("dedup_incremental_bloom")(spark, TestSpark.sf)
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"),
      "no map-side bloom probe in the plan")
    val a = plain.collect().map(_.toSeq).toSeq
    val b = bloom.collect().map(_.toSeq).toSeq
    assert(a == b, "bloom variant diverged from the exact anti-join result")
  }
}
