package graft.operators

import graft.functions.{Hashing, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (shingle → minhash → band →
  * bucket-join), the standard web-scale dedup pipeline.
  *
  * Scale design (the whole point of this operator):
  *  - signatures: explode shingles then K=64 running minima of
  *    (h1 + k*h2) mod 2^31-1 (2-universal family; the mod is load-bearing,
  *    see MinHashSignatureAgg) — partial aggregation happens map-side, so
  *    the only shuffle is (doc_id → 64 longs). No shingle set ever crosses
  *    the network. Base hashes are the portable md5 pair, which makes the
  *    whole pipeline reproducible outside Spark (DuckDB oracle, [[oracleSql]]).
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
    val p = graft.functions.MinHashSignatureAgg.P
    val aggs = (0 until K).map(k =>
      min(pmod(col("h1") + lit(k.toLong) * col("h2"), lit(p))).as(s"sig_$k"))
    hashed
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until K).map(k => col(s"sig_$k")): _*).as("signature"))
  }

  private def baseHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread first: the shingle explode + per-shingle md5 is the CPU-heavy
    // stage, and a small single-file scan would pin it to one core
    val shingled = graft.Tables.spread(docs, idCol)
      .select(col(idCol), explode(TextFns.wordShingles(textCol, 3)).as("shingle"))
    // portable md5-pair base hashes (32-bit each, so h1 + 63*h2 can't
    // overflow a long): the whole pipeline becomes engine-reproducible and
    // the dedup_minhash query is DuckDB-oracle-checked via [[oracleSql]]
    val (h1, h2) = Hashing.minhashBasePortable(col("shingle"))
    shingled.select(col(idCol), h1.as("h1"), h2.as("h2"))
  }

  /** Candidate pairs (id1 < id2) that share at least one LSH band bucket,
    * with the signature-estimated Jaccard similarity.
    *
    * Skew guard (`bucketCap`): boilerplate-heavy corpora put millions of docs
    * into ONE band bucket, and an unsalted self-join makes that bucket an n²
    * single-reducer. The pair-set-preserving salting lives in
    * [[BucketJoin.saltedCandidatePairs]] (shared with the sign-LSH dedup
    * queries); SkewSaltingSpec pins pair-set equality salted vs unsalted.
    */
  /** Band the signature table at an arbitrary (bands × rowsPerBand) split of
    * the K hashes and return the skew-salted candidate pairs — the
    * primitive dedup_lsh_tuning sweeps configs over. */
  def bandedCandidates(
      sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
      bucketCap: Int = 100000): DataFrame = {
    require(bands * rowsPerBand == K, s"bands*rows must equal $K")
    val banded = sigs.select(
      col(idCol),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(signature, b * $rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "band_hash")))
    BucketJoin.saltedCandidatePairs(
      banded, idCol, Seq("band", "band_hash"), bucketCap)
  }

  /** Band the signature table at SEVERAL (bands × rowsPerBand) splits of
    * the K hashes in ONE pass: every config's band rows ride a single
    * bucket shuffle (band ids are offset per config, so buckets of
    * different configs can never mix), the hot-bucket census and the pair
    * distinct each run once, and the returned pairs carry their config
    * index — (id1, id2, cfg), distinct PER CONFIG. Per config the pair set
    * is exactly [[bandedCandidates]]'s (MultiBandSpec pins the equality);
    * the win is structural: a 3-config sweep pays 1 banded sort + 1
    * distinct instead of 3 + 3, and downstream the signature est-join runs
    * once over the union instead of once per config (6 signature-table
    * shuffles → 2 at dedup_lsh_tuning's sf100 scale).
    */
  def multiBandedCandidates(
      sigs: DataFrame, idCol: String, configs: Seq[(Int, Int)],
      bucketCap: Int = 100000): DataFrame = {
    configs.foreach { case (b, r) =>
      require(b * r == K, s"bands*rows must equal $K") }
    val arrays = configs.zipWithIndex.map { case ((b, r), ci) =>
      val off = configs.take(ci).map(_._1).sum
      s"transform(sequence(0, ${b - 1}), bb -> named_struct(" +
        s"'cfg', $ci, 'band', $off + bb, " +
        s"'band_hash', xxhash64(slice(signature, bb * $r + 1, $r))))"
    }.mkString("concat(", ", ", ")")
    val banded = sigs
      .select(col(idCol), explode(expr(arrays)).as("bb"))
      .select(col(idCol), col("bb.cfg").as("cfg"),
        col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
    BucketJoin.saltedCandidatePairs(
      banded, idCol, Seq("cfg", "band", "band_hash"), bucketCap,
      keepCols = Seq("cfg"))
  }

  def candidatePairs(
      sigs: DataFrame, idCol: String, bucketCap: Int = 100000): DataFrame = {
    val cand = bandedCandidates(sigs, idCol, BANDS, ROWS, bucketCap)

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
    // materialize the signature stage ONCE: downstream it is consumed five
    // ways (band fan count, both sides of the salted bucket join, s1, s2),
    // and each un-materialized consumption would re-run the full shingle +
    // minhash aggregation. The checkpoint is (id, 64 longs) per doc — tiny
    // relative to the text it replaces, and exactly what a 100 TB pipeline
    // would persist as its "signature table" between stages.
    val sigs = signatures(docs, idCol, textCol).localCheckpoint()
    candidatePairs(sigs, idCol)
      .filter(col("est_jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** DuckDB oracle for [[nearDuplicates]] over the `documents` table —
    * generated from the same math (md5-pair base hashes, (h1 + k*h2) mod
    * 2^31-1 minima, 16×4 banding on signature-slice equality, est-Jaccard =
    * matching positions / K). Banding here compares the slice VALUES where
    * Spark buckets on xxhash64 of the slice — the same candidate set modulo
    * 64-bit hash collisions.
    */
  /** The w/hs/sig CTE chain (64 `sig_k` columns over `documents`) shared by
    * [[oracleSql]] and the dedup_lsh_tuning oracle. */
  def sigCtesSql(idCol: String = "doc_id", textCol: String = "text"): String = {
    val p = graft.functions.MinHashSignatureAgg.P
    val h1 = graft.functions.Hashing.md5Hash32DuckSql("x", 1)
    val h2 = graft.functions.Hashing.md5Hash32DuckSql("x", 9)
    val sigCols = (0 until K).map(k =>
      s"list_min(list_transform(range(len(h1s)), i -> (h1s[i + 1] + $k * h2s[i + 1]) % $p)) AS sig_$k")
      .mkString(",\n          ")
    s"""w AS (
        SELECT $idCol, list_distinct(list_transform(
            range(1, greatest(len(ws) - 2, 1) + 1),
            i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS sh
        FROM (SELECT $idCol, string_split_regex(trim($textCol), '\\s+') AS ws FROM documents)),
      hs AS (
        SELECT $idCol,
          list_transform(sh, x -> $h1) AS h1s,
          list_transform(sh, x -> $h2) AS h2s
        FROM w),
      sig AS (
        SELECT $idCol,
          $sigCols
        FROM hs)"""
  }

  /** 64-term signature-position match count between join aliases s1/s2. */
  def estSumSql: String = (0 until K)
    .map(k => s"(CASE WHEN s1.sig_$k = s2.sig_$k THEN 1 ELSE 0 END)")
    .mkString(" + ")

  def oracleSql(threshold: Double, idCol: String = "doc_id", textCol: String = "text"): String = {
    val bandSelects = (0 until BANDS).map { b =>
      val key = (0 until ROWS).map(r => s"CAST(sig_${b * ROWS + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT $idCol, $b AS band, $key AS bkey FROM sig"
    }.mkString("\n        UNION ALL ")
    val estSum = estSumSql
    s"""WITH ${sigCtesSql(idCol, textCol)},
      banded AS (
        $bandSelects),
      cand AS (
        SELECT DISTINCT a.$idCol AS id1, b.$idCol AS id2
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bkey = b.bkey AND a.$idCol < b.$idCol)
      SELECT id1, id2,
        CAST($estSum AS DOUBLE) / $K.0 AS est_jaccard
      FROM cand
      JOIN sig s1 ON s1.$idCol = cand.id1
      JOIN sig s2 ON s2.$idCol = cand.id2
      WHERE CAST($estSum AS DOUBLE) / $K.0 >= $threshold
      ORDER BY id1, id2"""
  }
}
