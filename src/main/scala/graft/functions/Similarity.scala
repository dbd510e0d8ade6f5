package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity over ArrayType(FloatType) embedding columns, via
  * higher-order functions (zip_with / aggregate) — executes inside codegen,
  * no UDF. Elements are widened to double BEFORE multiplying so results are
  * bit-identical to engines that accumulate in double (e.g. DuckDB's
  * list_cosine_similarity).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine over float arrays: the native codegen'd [[CosineSim]] Expression
    * (single fused loop inside WholeStageCodegen). Bit-identical to
    * [[cosineHof]] — CosineSimSpec pins the equivalence.
    */
  def cosine(a: Column, b: Column): Column = CosineSim.cosine_sim(a, b)

  /** The original higher-order-function formulation (works for any numeric
    * array type; reference implementation for the equivalence spec).
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH bucket id from a fixed hyperplane matrix: bit j = 1 iff
    * dot(v, planes(j)) > 0. With P planes keys fall into 2^P buckets;
    * near-identical vectors collide w.h.p. Planes are ±1-valued and
    * generated from a fixed seed so any engine can reproduce the bucketing.
    * Native codegen ([[SignLshBucket]]) — one fused loop instead of one HOF
    * chain per plane; [[lshBucketHof]] is the reference formulation the
    * equivalence spec compares against.
    */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    SignLshBucket.sign_lsh_bucket(v, planes)

  /** HOF formulation of [[lshBucket]] (any numeric array type). */
  def lshBucketHof(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, j) =>
        val planeCol = array(p.map(lit): _*)
        when(dot(v, planeCol) > 0.0, lit(1 << j)).otherwise(lit(0))
      }
      .reduce(_ + _)

  /** Deterministic ±1 hyperplanes (java.util.Random is a specified LCG, so
    * these values are stable across JVMs; they are also embedded literally
    * into oracle SQL, so cross-engine agreement doesn't depend on the RNG).
    */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** The same bucket computation as DuckDB SQL (planes inlined as literals). */
  def lshBucketSql(vecExpr: String, planes: Seq[Array[Double]]): String =
    planes.zipWithIndex
      .map { case (p, j) =>
        val lst = p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product($vecExpr, $lst) > 0.0 THEN ${1 << j} ELSE 0 END"
      }
      .mkString(" + ")

  /** Resolution ladder for sign-LSH SELF-JOIN (pair-generating) queries:
    * plane count grows with corpus size so expected bucket occupancy
    * (n / 2^p) stays ≤ ~100 and within-bucket pair volume stays LINEAR
    * per decade — with p frozen, occupancy grows with n and pair volume
    * grows QUADRATICALLY (measured before this ladder existed:
    * dedup_embed_cosine 4.2 s at sf1 → 349.7 s at sf10, sim_knn_graph
    * 8.5 s → 1133.7 s — both ~100×/decade on 10× data). Tiers are
    * base, base+3, base+6, … (+3 planes ≈ one 8× resolution step),
    * UNBOUNDED: p is the smallest tier with 100·2^p ≥ n, so the
    * occupancy bound holds at every corpus size instead of saturating
    * (the r9 ladder stopped at base+6, which re-created the quadratic
    * cliff one decade out — ~1.6M vectors for the base-8 family).
    * Mirrored in oracle SQL by a CASE on count(*) over the same tier
    * thresholds ([[lshBucketSqlAdaptive]]); [[planes]] is prefix-stable
    * in its seed so every tier's first `base` hyperplanes are the
    * original family. p is capped at [[MaxLshPlanes]] = 30 (bucket ids
    * are Int bitmasks, `1 << j`, in both the codegen'd expression and
    * the oracle's INT32 `<<`): the occupancy bound therefore holds to
    * 100·2^30 ≈ 1.07e11 vectors (~27 TB of raw 64-dim float32) — past
    * that, production amplifies with more OR-tables or moves to the IVF
    * path (sim_ivfpq's flat probes), the standard LSH recall/resolution
    * trade (collision prob (1-θ/π)^p) — documented, not hidden.
    */
  def lshPlaneCount(n: Long, base: Int): Int = {
    @annotation.tailrec
    def go(p: Int): Int =
      if (p >= MaxLshPlanes || n <= lshTierCeiling(p)) p
      else go(math.min(p + 3, MaxLshPlanes))
    go(base)
  }

  /** Int-bitmask bucket ids bound the ladder at 30 planes (see
    * [[lshPlaneCount]] scaladoc for what that means at scale).
    */
  val MaxLshPlanes: Int = 30

  /** Largest corpus size tier p covers: expected occupancy n / 2^p ≤ 100. */
  def lshTierCeiling(p: Int): Long = (1L << p) * 100L

  /** The tier sequence [[lshBucketSqlAdaptive]] materializes: every tier
    * from `base` upward until one covers `maxN` (so the generated CASE
    * agrees with [[lshPlaneCount]] for ALL n ≤ lshTierCeiling(last tier)).
    * Exposed so specs can pin Spark-tier/oracle-tier agreement at the
    * exact boundary values.
    */
  def lshTiersFor(base: Int, maxN: Long): Seq[Int] = {
    val tiers = scala.collection.mutable.ArrayBuffer(base)
    while (tiers.last < MaxLshPlanes && lshTierCeiling(tiers.last) < maxN)
      tiers += math.min(tiers.last + 3, MaxLshPlanes)
    tiers.toSeq
  }

  /** Planes for [[lshPlaneCount]]'s tier at corpus size n. */
  def planesFor(n: Long, base: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] =
    planes(lshPlaneCount(n, base), dim, seed)

  /** DuckDB mirror of [[planesFor]]: a CASE on `countSql` (a scalar count
    * subquery over the same set the Spark side counts) selecting the same
    * tier's bucket expression. The ladder is generated over every tier up
    * to the first that covers `maxN` (default 1e9 — three decades past the
    * largest synthesized probe corpus), so oracle and Spark agree at every
    * n the driver or a probe can reach; the Spark side itself is unbounded.
    */
  def lshBucketSqlAdaptive(
      vecExpr: String, countSql: String, base: Int, dim: Int,
      seed: Long = 42L, maxN: Long = 1000000000L): String = {
    val tiers = lshTiersFor(base, maxN)
    val whens = tiers.init.map { p =>
      s"WHEN ($countSql) <= ${lshTierCeiling(p)}\n        THEN ${lshBucketSql(vecExpr, planes(p, dim, seed))}"
    }.mkString("\n        ")
    s"""CASE $whens
        ELSE ${lshBucketSql(vecExpr, planes(tiers.last, dim, seed))} END"""
  }
}
