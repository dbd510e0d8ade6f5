package graft

import graft.functions.HeavyHittersAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two Misra–Gries contracts the corpus_heavy_hitters oracle
  * relies on, under adversarial partitioning (1 partition = pure streaming
  * updates; several = partial summaries + the mergeable-summaries merge):
  * counters never exceed true frequency, every item with freq > n/(k+1) is
  * present, and the summary never exceeds k entries.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sketch captures every guaranteed heavy hitter; never overcounts; ≤ k entries") {
    import spark.implicits._
    val k = 16
    // 20 hot items with frequencies 30..600 over ~3k singleton noise
    val items = (1 to 20).flatMap(i => Seq.fill(i * 30)(s"hot_$i")) ++
      (1 to 3000).map(i => s"rare_$i")
    val freq = items.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    val n = items.size.toLong
    val guaranteed = freq.filter(_._2 > n / (k + 1)).keySet
    assert(guaranteed.nonEmpty, "fixture must have guaranteed hitters")
    for (parts <- Seq(1, 7)) {
      val got = items.toDF("w").repartition(parts)
        .agg(HeavyHittersAgg.heavy_hitters(col("w"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.term"), col("e.cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"summary exceeded k at parts=$parts")
      got.foreach { case (t, c) =>
        assert(c <= freq(t), s"overcounted $t at parts=$parts: $c > ${freq(t)}")
      }
      guaranteed.foreach(t =>
        assert(got.contains(t), s"guaranteed hitter $t missing at parts=$parts"))
    }
  }
}
