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
    * 8.5 s → 1133.7 s — both ~100×/decade on 10× data). Three pinned
    * tiers (base, base+3, base+6 planes — +3 planes ≈ one 8× resolution
    * step), mirrored in oracle SQL by a CASE on count(*); [[planes]] is
    * prefix-stable in its seed so every tier's first `base` hyperplanes
    * are the original family. The recall cost of finer buckets is the
    * standard LSH trade (collision prob (1-θ/π)^p): production amplifies
    * with more OR-tables or moves to the IVF path (sim_ivfpq's flat
    * probes) — documented, not hidden.
    */
  def lshPlaneCount(n: Long, base: Int): Int =
    if (n <= (1L << base) * 100L) base
    else if (n <= (1L << (base + 3)) * 100L) base + 3
    else base + 6

  /** Planes for [[lshPlaneCount]]'s tier at corpus size n. */
  def planesFor(n: Long, base: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] =
    planes(lshPlaneCount(n, base), dim, seed)

  /** DuckDB mirror of [[planesFor]]: a CASE on `countSql` (a scalar count
    * subquery over the same set the Spark side counts) selecting the same
    * tier's bucket expression.
    */
  def lshBucketSqlAdaptive(
      vecExpr: String, countSql: String, base: Int, dim: Int,
      seed: Long = 42L): String = {
    val t1 = (1L << base) * 100L
    val t2 = (1L << (base + 3)) * 100L
    s"""CASE WHEN ($countSql) <= $t1
        THEN ${lshBucketSql(vecExpr, planes(base, dim, seed))}
        WHEN ($countSql) <= $t2
        THEN ${lshBucketSql(vecExpr, planes(base + 3, dim, seed))}
        ELSE ${lshBucketSql(vecExpr, planes(base + 6, dim, seed))} END"""
  }
}
