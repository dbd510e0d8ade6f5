package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operator specs. */
class R8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("rec_eval_mrr: exact integer identity with the hit-rate counters") {
    // both readouts ride evalShared's one split + one retrained model, so
    // rr_sum is EXACTLY determined by the recall counters: every k=1 hit
    // contributes 1e9, every first-hit-at-2 contributes 1e9 div 2, every
    // first-hit-at-3 contributes 1e9 div 3
    val hit = run("rec_eval_hitrate").collect().map(r =>
      r.getAs[Int]("k") -> (r.getAs[Long]("n_users"), r.getAs[Long]("n_hits"))).toMap
    val (nUsers, h3) = hit(3)
    val h1 = hit(1)._2
    val h2 = hit(2)._2
    val rrSum = h1 * 1000000000L +
      (h2 - h1) * (1000000000L / 2) + (h3 - h2) * (1000000000L / 3)
    val r = run("rec_eval_mrr").collect().head
    assert(r.getAs[Long]("n_users") == nUsers, "denominators must agree")
    assert(r.getAs[Long]("n_hit_users") == h3, "hit-user count = hits@3")
    assert(r.getAs[Long]("mrr_nano") == rrSum / math.max(nUsers, 1L),
      s"mrr ${r.getAs[Long]("mrr_nano")} != $rrSum / $nUsers")
    // MRR is sandwiched by the recall curve: rate@1 <= MRR <= rate@3
    assert(r.getAs[Long]("mrr_nano") >= 1000000000L * h1 / math.max(nUsers, 1L) - 1)
    assert(r.getAs[Long]("mrr_nano") <= 1000000000L * h3 / math.max(nUsers, 1L))
  }
}
