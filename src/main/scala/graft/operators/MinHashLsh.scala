package graft.operators

import graft.functions.{Hashing, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (shingle → minhash → band →
  * bucket-join), the standard web-scale dedup pipeline.
  *
  * Scale design (the whole point of this operator):
  *  - signatures: explode shingles then K=64 `min()` aggregates of
  *    h1 + k*h2 (2-universal family) — partial aggregation happens map-side,
  *    so the only shuffle is (doc_id → 64 longs). No shingle set ever crosses
  *    the network.
  *  - candidates: signatures explode into BANDS=16 band hashes; the
  *    bucket-join shuffles on (band, band_hash) — near-linear; no all-pairs
  *    comparison anywhere. Pathologically hot buckets (boilerplate text)
  *    would be capped/salted in production; the estimate join stays
  *    signature-only (128 B per doc).
  *  - Jaccard estimate: fraction of equal signature positions — computed
  *    from the two 64-long arrays, never from the original text.
  */
object MinHashLsh {

  val K = 64
  val BANDS = 16
  val ROWS = 4 // K / BANDS

  /** (idCol, signature: array<bigint> of length K) — one row per document.
    * The K running minima live in ONE custom TypedImperativeAggregate buffer
    * ([[graft.functions.MinHashSignatureAgg]]); `signaturesBuiltin` keeps the
    * pure-built-in formulation (K separate min() columns) — same results
    * (MinHashLshSpec pins equality), one aggregate state instead of K.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = baseHashes(docs, idCol, textCol)
    hashed
      .groupBy(col(idCol))
      .agg(graft.functions.MinHashSignatureAgg
        .minhash_signature(col("h1"), col("h2"), K).as("signature"))
  }

  /** Built-in-only variant: K min() aggregate columns, then array(). */
  def signaturesBuiltin(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = baseHashes(docs, idCol, textCol)
    val aggs = (0 until K).map(k => min(col("h1") + lit(k.toLong) * col("h2")).as(s"sig_$k"))
    hashed
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until K).map(k => col(s"sig_$k")): _*).as("signature"))
  }

  private def baseHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val shingled = docs
      .select(col(idCol), explode(TextFns.wordShingles(textCol, 3)).as("shingle"))
    val (h1, h2) = Hashing.minhashBase(col("shingle"))
    // mask to 32 bits so h1 + 63*h2 can't overflow a long (ANSI mode traps)
    shingled.select(
      col(idCol),
      h1.bitwiseAND(lit(0xFFFFFFFFL)).as("h1"),
      h2.bitwiseAND(lit(0xFFFFFFFFL)).as("h2"))
  }

  /** Candidate pairs (id1 < id2) that share at least one LSH band bucket,
    * with the signature-estimated Jaccard similarity.
    */
  def candidatePairs(sigs: DataFrame, idCol: String): DataFrame = {
    val banded = sigs.select(
      col(idCol),
      posexplode(expr(
        s"transform(sequence(0, ${BANDS - 1}), b -> xxhash64(slice(signature, b * $ROWS + 1, $ROWS)))"))
        .as(Seq("band", "band_hash")))

    val a = banded.select(col(idCol).as("id1"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id2"), col("band"), col("band_hash"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()

    val s1 = sigs.select(col(idCol).as("id1"), col("signature").as("sig1"))
    val s2 = sigs.select(col(idCol).as("id2"), col("signature").as("sig2"))
    cand.join(s1, "id1").join(s2, "id2")
      .select(
        col("id1"), col("id2"),
        (expr("aggregate(zip_with(sig1, sig2, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / lit(K.toDouble)).as("est_jaccard"))
  }

  /** End-to-end: near-duplicate pairs above an estimated-Jaccard threshold. */
  def nearDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    candidatePairs(sigs, idCol)
      .filter(col("est_jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }
}
