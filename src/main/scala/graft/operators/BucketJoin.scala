package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe bucket self-join: the shared candidate-pair engine behind every
  * LSH dedup pipeline here (MinHash bands, sign-LSH embedding buckets).
  *
  * The problem it solves: an unsalted self-join on a bucket key makes one
  * pathologically hot bucket (boilerplate text, a near-constant embedding
  * corpus) a single-reducer n² at 100 TB. The fix is pair-set-preserving
  * salting: buckets larger than `bucketCap` get fan = ceil(bucket/cap); the
  * left side keeps ONE deterministic salt per row, the right side replicates
  * each row to EVERY salt, and the join key gains the salt — every (x, y)
  * pair still meets exactly once (at x's salt), but the hot bucket's work
  * spreads over `fan` reducers at the cost of replicating only that bucket's
  * rows (ids + bucket keys, never payloads) `fan`×.
  *
  * Only OVERSIZED buckets get fan > 1 — there are ≤ total/cap of them by
  * definition, so the fan table is always tiny and broadcastable (the full
  * per-bucket count table would be ∝ corpus size; never broadcast that).
  * Everything else defaults to fan = 1 via the left join.
  *
  * BucketJoinSpec + SkewSaltingSpec pin pair-set equality salted vs unsalted.
  */
object BucketJoin {

  /** Distinct candidate pairs (id1 < id2) of rows sharing all `bucketCols`,
    * with hot buckets salted as described above. `bucketed` must carry
    * exactly (idCol ++ bucketCols); payload columns should be re-joined by
    * id afterwards so they never cross the bucket shuffle.
    *
    * `keepCols` (⊆ bucketCols) survive into the output and the distinct —
    * a multi-config sweep (dedup_lsh_tuning) banding several geometries in
    * ONE pass keeps its config tag here, so "distinct pairs PER CONFIG"
    * still holds while the bucket shuffle, hot-bucket census and pair
    * distinct each run once instead of once per config.
    */
  def saltedCandidatePairs(
      bucketed: DataFrame,
      idCol: String,
      bucketCols: Seq[String],
      bucketCap: Int = 100000,
      keepCols: Seq[String] = Nil): DataFrame = {
    val bCols = bucketCols.map(col)

    val hotFans = bucketed.groupBy(bCols: _*)
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > bucketCap)
      .select(bCols :+
        ceil(col("__bn").cast("double") / bucketCap).cast("int").as("__fan"): _*)
    val withFan = bucketed
      .join(broadcast(hotFans), bucketCols, "left")
      .na.fill(1, Seq("__fan"))

    val a = withFan.select(
      (col(idCol).as("id1") +: bCols) :+
        pmod(xxhash64(col(idCol)), col("__fan").cast("long")).cast("int").as("__salt"): _*)
    val b = withFan.select(
      (col(idCol).as("id2") +: bCols) :+
        explode(sequence(lit(0), col("__fan") - 1)).as("__salt"): _*)
    a.join(b, bucketCols :+ "__salt")
      .filter(col("id1") < col("id2"))
      .select(col("id1") +: col("id2") +: keepCols.map(col): _*)
      .distinct()
  }
}
