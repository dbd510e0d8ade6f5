package graft.queries

import graft.{Declared, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators beyond dedup/similarity (BASELINE.json
  * north star): benchmark decontamination, sequence packing, embedding
  * outlier detection, and corpus term statistics. Each is the Spark-first
  * shape of a step a real 100 TB pretraining pipeline runs between "raw
  * corpus" and "tokenized shards".
  */
object PipelineQ {
  import Tables.t

  /** Eval-set decontamination: flag corpus documents sharing any word-5-gram
    * with a benchmark set (here: the `source = 'src0'` slice standing in for
    * a held-out eval suite). The benchmark side is tiny at ANY corpus scale —
    * eval suites don't grow with the crawl — so its distinct shingle set is
    * broadcast and the corpus side stays a map-side shingle + broadcast hash
    * join + partial-agg pipeline: no corpus shuffle at all beyond the final
    * per-doc aggregation.
    */
  val decontaminate = Declared(
    "decontaminate",
    (s, dir) => {
      val docs = Tables.spread(t(s, dir, "documents"), "doc_id")
      val sh = docs.select(
        col("doc_id"), col("source"), TextFns.wordShingles("text", 5).as("sh"))
      val bench = sh.filter(col("source") === "src0")
        .select(explode(col("sh")).as("g")).distinct()
      val corpus = sh.filter(col("source") =!= "src0")
        .select(col("doc_id"), size(col("sh")).as("n_shingles"), explode(col("sh")).as("g"))
      corpus.join(broadcast(bench), "g")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).cast("int").as("n_hits"),
          max(col("n_shingles")).as("n_shingles"))
        .select(
          col("doc_id"), col("n_hits"), col("n_shingles"),
          round(col("n_hits").cast("double") / col("n_shingles").cast("double"), 6)
            .as("contamination"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH ws AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w FROM documents),
      sh AS (
        SELECT doc_id, source,
          list_distinct(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
            i -> array_to_string(list_slice(w, CAST(i AS INTEGER), CAST(i AS INTEGER) + 4), ' '))) AS sh
        FROM ws),
      bench AS (
        SELECT DISTINCT unnest(sh) AS g FROM sh WHERE source = 'src0'),
      corpus AS (
        SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS g FROM sh WHERE source <> 'src0')
      SELECT c.doc_id,
        CAST(count(*) AS INTEGER) AS n_hits,
        CAST(max(c.n_shingles) AS INTEGER) AS n_shingles,
        round(CAST(count(*) AS DOUBLE) / CAST(max(c.n_shingles) AS DOUBLE), 6) AS contamination
      FROM corpus c JOIN bench b ON c.g = b.g
      GROUP BY c.doc_id
      ORDER BY c.doc_id"""))

  /** Sequence packing: assign documents to fixed-capacity (128 BPE-token)
    * training packs by cumulative token count within (lang, source) shards.
    * Sharding by (lang, source) — not lang alone — is the scale decision: a
    * per-language global running sum would serialize each language onto one
    * window partition, while shards keep the window state bounded and
    * parallel (at 100 TB the shard key gains a hash bucket). A document that
    * straddles a boundary starts in the pack its cumulative start falls in —
    * the standard greedy sequential approximation.
    */
  val packSequences = Declared(
    "pack_sequences",
    (s, dir) => {
      val tok = t(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("source"),
        TextFns.bpeTokenCount(col("text")).cast("long").as("n_tok"))
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tok.withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tok")).cast("double") / 128.0).cast("long"))
        .groupBy(col("lang"), col("source"), col("pack_id"))
        .agg(
          count(lit(1)).cast("int").as("n_docs"),
          sum(col("n_tok")).as("pack_tokens"))
        .orderBy(col("lang"), col("source"), col("pack_id"))
    },
    Some(s"""WITH tok AS (
        SELECT doc_id, lang, source,
          CAST(len(regexp_extract_all(text, '${TextFns.bpeTokenPattern}', 0)) AS BIGINT) AS n_tok
        FROM documents),
      cum AS (
        SELECT lang, source, doc_id, n_tok,
          sum(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM tok)
      SELECT lang, source,
        CAST(floor(CAST(cum - n_tok AS DOUBLE) / 128.0) AS BIGINT) AS pack_id,
        CAST(count(*) AS INTEGER) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS pack_tokens
      FROM cum
      GROUP BY lang, source, pack_id
      ORDER BY lang, source, pack_id"""))

  /** Embedding outlier detection for corpus cleaning: distance of each
    * vector to its label centroid, top-3 farthest per label. Centroids fold
    * as a (label, dim)-cell partial aggregate — 64·|labels| cells regardless
    * of corpus size — then come back as one ordered array per label so the
    * distance is a per-row left-to-right array fold (deterministic float
    * summation, same discipline as dedup_embed_cosine). Centroid components
    * are rounded before the distance so both engines fold bit-identical
    * inputs.
    */
  val embedOutliers = Declared(
    "embed_outliers",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cells = emb.select(
        col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      val cent = cells.groupBy(col("label"), col("i"))
        .agg(round(avg(col("x").cast("double")), 6).as("c"))
      val carr = cent.groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)").as("c_arr"))
      val dist = emb.join(broadcast(carr), "label")
        .withColumn("dist", round(sqrt(expr(
          """aggregate(zip_with(embedding, c_arr,
               (a, b) -> power(CAST(a AS DOUBLE) - b, 2D)),
             0D, (acc, v) -> acc + v)""")), 6))
      dist
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("label")).orderBy(col("dist").desc, col("vec_id"))))
        .filter(col("rk") <= 3)
        .select(col("label"), col("vec_id"), col("dist"), col("rk"))
        .orderBy(col("label"), col("rk"))
    },
    Some("""WITH cells AS (
        SELECT vec_id, label, CAST(i AS INTEGER) AS i,
          CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
        FROM embeddings, range(1, 65) t(i)),
      cent AS (
        SELECT label, i, round(avg(x), 6) AS c FROM cells GROUP BY label, i),
      carr AS (
        SELECT label, list(c ORDER BY i) AS c_arr FROM cent GROUP BY label),
      dist AS (
        SELECT vec_id, em.label,
          round(sqrt(list_sum(list_transform(range(1, 65),
            i -> power(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                       - c_arr[CAST(i AS INTEGER)], 2)))), 6) AS dist
        FROM embeddings em JOIN carr ON em.label = carr.label),
      rk AS (
        SELECT label, vec_id, dist,
          row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rk
        FROM dist)
      SELECT label, vec_id, dist, CAST(rk AS INTEGER) AS rk
      FROM rk WHERE rk <= 3 ORDER BY label, rk"""))

  /** Corpus term statistics (the inverted-index head): top-20 alphabetic
    * terms (≥4 chars, lowercased) by document frequency with total
    * occurrence counts — classic two-counter wordcount with map-side partial
    * aggregation and a TakeOrderedAndProject top-k, no global sort.
    */
  val corpusTerms = Declared(
    "corpus_terms",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(TextFns.words(col("text"))).as("w0"))
        .select(col("doc_id"), lower(col("w0")).as("w"))
        .filter(col("w").rlike("^[a-z]{4,}$"))
        // two-step instead of countDistinct: the (w, doc_id) pre-aggregate
        // collapses within-doc repeats map-side, so the shuffle carries one
        // row per distinct (term, doc) — no Expand replica of the full
        // exploded stream, roughly halving shuffle volume on repetitive text
        .groupBy(col("w"), col("doc_id"))
        .agg(count(lit(1)).as("occ"))
        .groupBy(col("w"))
        .agg(
          count(lit(1)).cast("int").as("n_docs"),
          sum(col("occ")).cast("int").as("n_occ"))
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("w"))
        .limit(20),
    Some("""WITH w AS (
        SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\s+'))) AS w
        FROM documents)
      SELECT w,
        CAST(count(DISTINCT doc_id) AS INTEGER) AS n_docs,
        CAST(count(*) AS INTEGER) AS n_occ
      FROM w WHERE regexp_matches(w, '^[a-z]{4,}$')
      GROUP BY w
      ORDER BY n_docs DESC, n_occ DESC, w
      LIMIT 20"""))

  /** Gopher-style repetition scoring: fraction of duplicate word 2-grams and
    * 3-grams per document (1 − distinct/total), the standard pretraining
    * quality gate for boilerplate / template spam. Per-row map-side work
    * only; the flag compares the ROUNDED fractions so both engines gate on
    * bit-identical values.
    */
  val textRepetition = Declared(
    "text_repetition",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextFns.wordShinglesAll("text", 2).as("g2"),
          TextFns.wordShinglesAll("text", 3).as("g3"))
        .select(
          col("doc_id"),
          size(col("g2")).as("n2"),
          round(lit(1.0) - size(array_distinct(col("g2"))).cast("double")
            / size(col("g2")).cast("double"), 6).as("dup2"),
          size(col("g3")).as("n3"),
          round(lit(1.0) - size(array_distinct(col("g3"))).cast("double")
            / size(col("g3")).cast("double"), 6).as("dup3"))
        .withColumn("repetitive", col("dup2") > 0.1 || col("dup3") > 0.05)
        .orderBy(col("doc_id")),
    Some("""WITH ws AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      g AS (
        SELECT doc_id,
          list_transform(range(1, greatest(len(w) - 1, 1) + 1),
            i -> array_to_string(list_slice(w, CAST(i AS INTEGER), CAST(i AS INTEGER) + 1), ' ')) AS g2,
          list_transform(range(1, greatest(len(w) - 2, 1) + 1),
            i -> array_to_string(list_slice(w, CAST(i AS INTEGER), CAST(i AS INTEGER) + 2), ' ')) AS g3
        FROM ws),
      scored AS (
        SELECT doc_id,
          CAST(len(g2) AS INTEGER) AS n2,
          round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE), 6) AS dup2,
          CAST(len(g3) AS INTEGER) AS n3,
          round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE), 6) AS dup3
        FROM g)
      SELECT doc_id, n2, dup2, n3, dup3,
        (dup2 > 0.1 OR dup3 > 0.05) AS repetitive
      FROM scored ORDER BY doc_id"""))

  /** Data mixing: per-language target sampling rates applied with a salted
    * deterministic hash (the doc's identity decides its fate, so reruns and
    * retried partitions agree — same discipline as split_train_val, different
    * salt so the two decisions stay independent). Readout is the realized
    * mixture vs target per language.
    */
  val mixSample = Declared(
    "mix_sample",
    (s, dir) => {
      val target = when(col("lang") === "en", 1.0)
        .when(col("lang") === "de", 0.5)
        .when(col("lang") === "fr", 0.5)
        .when(col("lang") === "es", 0.25)
        .otherwise(0.1)
      val bucket = graft.functions.Hashing
        .md5Hash32(concat(col("doc_id").cast("string"), lit("|mix"))) % 1000
      t(s, dir, "documents")
        .withColumn("target_rate", target)
        .withColumn("kept", bucket.cast("double") < col("target_rate") * 1000.0)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(col("kept").cast("long")).as("n_kept"),
          round(avg(col("target_rate")), 6).as("target_rate"),
          round(avg(col("kept").cast("double")), 6).as("realized_rate"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH d AS (
        SELECT lang,
          CAST(CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.5
            WHEN 'es' THEN 0.25 ELSE 0.1 END AS DOUBLE) AS target_rate,
          (CAST(${graft.functions.Hashing.md5Hash32DuckSql("CAST(doc_id AS VARCHAR) || '|mix'")} % 1000 AS DOUBLE)
            < CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.5
                WHEN 'es' THEN 0.25 ELSE 0.1 END * 1000.0) AS kept
        FROM documents)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_total,
        CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        round(avg(target_rate), 6) AS target_rate,
        round(avg(CASE WHEN kept THEN 1.0 ELSE 0.0 END), 6) AS realized_rate
      FROM d GROUP BY lang ORDER BY lang"""))

  /** Context-window chunking: split each document into 500-char chunks with
    * 100-char overlap (stride 400) — the standard long-doc → training-sample
    * step. `sequence()` + explode is pure per-row fan-out (no shuffle, no
    * state); chunk content is pinned via md5 so the oracle checks bytes, not
    * just offsets.
    */
  val chunkDocuments = Declared(
    "chunk_documents",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"), col("text"),
          explode(sequence(lit(1L), greatest(col("n_chars").cast("long"), lit(1L)),
            lit(400L))).as("chunk_start"))
        .select(
          col("doc_id"), col("chunk_start"),
          expr("substring(text, CAST(chunk_start AS INT), 500)").as("chunk"))
        .select(
          col("doc_id"), col("chunk_start"),
          length(col("chunk")).as("chunk_len"),
          md5(col("chunk").cast("binary")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_start")),
    Some("""WITH starts AS (
        SELECT doc_id, text,
          unnest(generate_series(1, CAST(greatest(n_chars, 1) AS BIGINT), 400)) AS chunk_start
        FROM documents),
      c AS (
        SELECT doc_id, chunk_start,
          substring(text, CAST(chunk_start AS INT), 500) AS chunk
        FROM starts)
      SELECT doc_id, chunk_start,
        CAST(length(chunk) AS INTEGER) AS chunk_len,
        md5(chunk) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_start"""))

  /** Stratified deterministic sampling: top-20 docs per language by a salted
    * content-independent hash rank — every partition/rerun agrees on the
    * sample, and the per-stratum window state is bounded by the stratum's
    * row count (keys gain a hash bucket at 100 TB, same note as
    * pack_sequences). The shape behind "give me a balanced eval slice".
    */
  val sampleStratified = Declared(
    "sample_stratified",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(concat(col("doc_id").cast("string"), lit("|sample"))
          .cast("binary")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("rn"), col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("lang"), col("rn"))
    },
    Some("""SELECT lang, CAST(rn AS INTEGER) AS rn, doc_id, source, n_chars
      FROM (
        SELECT lang, doc_id, source, n_chars,
          row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR) || '|sample'), doc_id) AS rn
        FROM documents)
      WHERE rn <= 20 ORDER BY lang, rn"""))

  /** Curriculum sharding: within each language, order docs by length and cut
    * into 5 equal-depth shards (ntile) — short-to-long curriculum per
    * language. Partitioning the window BY LANGUAGE is the scale decision: a
    * global ntile is a one-reducer sort, while per-stratum tiles keep every
    * window partition bounded and parallel.
    */
  val curriculumOrder = Declared(
    "curriculum_order",
    (s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("shard", ntile(5).over(w))
        .groupBy(col("lang"), col("shard"))
        .agg(
          count(lit(1)).cast("int").as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"), col("shard"))
    },
    Some("""SELECT lang, CAST(shard AS INTEGER) AS shard,
        CAST(count(*) AS INTEGER) AS n_docs,
        min(n_chars) AS min_chars,
        max(n_chars) AS max_chars,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM (
        SELECT lang, n_chars,
          ntile(5) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS shard
        FROM documents)
      GROUP BY lang, shard ORDER BY lang, shard"""))

  /** Temperature-scaled mixture weights (the multilingual-pretraining
    * sampling rule, p_s ∝ n_s^α with α = 0.5): up-weight small
    * (source, lang) strata, down-weight dominant ones, and emit the expected
    * per-stratum draw count for a fixed budget. One hash aggregate folds the
    * corpus to O(strata) rows; the normalizer is a 1-row broadcast. The
    * weights table is what a sampler joins back onto the corpus — computing
    * it never touches more than the stratum histogram.
    */
  val mixTemperature = Declared(
    "mix_temperature",
    (s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val z = counts.agg(sum(pow(col("n_docs"), 0.5)).as("z"))
      counts.crossJoin(broadcast(z))
        .select(
          col("source"), col("lang"), col("n_docs"),
          round(pow(col("n_docs"), 0.5) / col("z"), 6).as("weight"),
          round(pow(col("n_docs"), 0.5) / col("z") * 10000.0, 2).as("n_expected"))
        .orderBy(col("source"), col("lang"))
    },
    Some("""WITH c AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source, lang),
      z AS (SELECT sum(pow(n_docs, 0.5)) AS z FROM c)
      SELECT source, lang, n_docs,
        round(pow(n_docs, 0.5) / z.z, 6) AS weight,
        round(pow(n_docs, 0.5) / z.z * 10000.0, 2) AS n_expected
      FROM c CROSS JOIN z ORDER BY source, lang"""))

  /** Heavy hitters by SKETCH ([[graft.functions.HeavyHittersAgg]], the
    * Misra–Gries mergeable summary) — [[corpusTerms]]' exact wordcount
    * shuffles one row per distinct term; the sketch answers the same "what
    * dominates the stream" question with ≤ k counters per partition and an
    * O(k) merge, the only shape that works when the term universe itself
    * doesn't fit anywhere (URLs, user-ids, n-grams at 100 TB).
    *
    * The output is the sketch's CONTRACT, not its raw state (Misra–Gries
    * counters are partition-order dependent; the guarantees are not): for
    * every top-10 exact term with freq > n/(k+1), `captured` says the
    * sketch held it (guaranteed by the undercount bound) and
    * `no_overcount` says its counter never exceeded the true frequency.
    * The oracle recomputes the exact side and pins both flags true — the
    * q_hll_sketch pattern: a false (or null) flag from a broken sketch
    * hash-mismatches the row. HeavyHittersSpec additionally pins both
    * bounds under adversarial partitioning.
    */
  val heavyHitters = Declared(
    "corpus_heavy_hitters",
    (s, dir) => {
      val k = 32
      val toks = t(s, dir, "documents")
        .select(explode(TextFns.words(col("text"))).as("w0"))
        .select(lower(col("w0")).as("w"))
        .filter(col("w").rlike("^[a-z]{4,}$"))
      val sketch = toks
        .agg(graft.functions.HeavyHittersAgg.heavy_hitters(col("w"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.term").as("term"), col("e.cnt").as("sketch_cnt"))
      // exact side: fold once, checkpoint the (small) per-term counts, then
      // derive both the total and the top-10 from the materialized fold
      val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
        .localCheckpoint()
      val total = counts.agg(sum(col("exact_cnt")).as("total"))
      counts.orderBy(col("exact_cnt").desc, col("w")).limit(10)
        .crossJoin(broadcast(total))
        .filter(col("exact_cnt") * (k + 1) > col("total"))
        .join(sketch, col("w") === col("term"), "left")
        .select(
          col("w").as("term"), col("exact_cnt"),
          col("sketch_cnt").isNotNull.as("captured"),
          (col("sketch_cnt") <= col("exact_cnt")).as("no_overcount"))
        .orderBy(col("exact_cnt").desc, col("term"))
    },
    Some("""WITH w AS (
        SELECT lower(unnest(string_split_regex(trim(text), '\s+'))) AS w
        FROM documents),
      f AS (
        SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt FROM w
        WHERE regexp_matches(w, '^[a-z]{4,}$') GROUP BY w),
      tot AS (SELECT CAST(sum(exact_cnt) AS BIGINT) AS total FROM f),
      top AS (SELECT w, exact_cnt FROM f ORDER BY exact_cnt DESC, w LIMIT 10)
      SELECT w AS term, exact_cnt, true AS captured, true AS no_overcount
      FROM top, tot WHERE exact_cnt * 33 > total
      ORDER BY exact_cnt DESC, term"""))

  /** Vocabulary coverage / OOV rate — the tokenizer-sizing readout: train a
    * top-k vocab on ONE language's tokens (the common monolingual-
    * tokenizer setup; size 20 — the synthetic corpus has only 31
    * distinct alphabetic terms, so the cap plays the role a 32k-entry
    * vocab plays on real text), then measure what fraction of every
    * language's
    * token stream falls outside it. High OOV for a language says the vocab
    * (or the sampling mix feeding it) underserves that language — the
    * number a multilingual pipeline checks before committing a tokenizer.
    * Shapes: token fold for the vocab (TakeOrderedAndProject top-k),
    * broadcast vocab LEFT join marks membership map-side, one hash
    * aggregate per language; the OOV division is two exact longs.
    */
  val vocabCoverage = Declared(
    "corpus_vocab_coverage",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("lang"), explode(TextFns.words(col("text"))).as("w0"))
        .select(col("lang"), lower(col("w0")).as("w"))
        .filter(col("w").rlike("^[a-z]+$"))
      val vocab = toks.filter(col("lang") === "en")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(20)
        .select(col("w"), lit(1L).as("in_v"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(coalesce(col("in_v"), lit(0L))).as("n_in_vocab"))
        .withColumn("oov_rate",
          round(lit(1.0) - col("n_in_vocab").cast("double") / col("n_tokens"), 6))
        .orderBy(col("lang"))
    },
    Some("""WITH w AS (
        SELECT lang, lower(unnest(string_split_regex(trim(text), '\s+'))) AS w
        FROM documents),
      toks AS (SELECT lang, w FROM w WHERE regexp_matches(w, '^[a-z]+$')),
      vocab AS (
        SELECT w, 1 AS in_v FROM (
          SELECT w, count(*) AS n FROM toks WHERE lang = 'en' GROUP BY w
          ORDER BY n DESC, w LIMIT 20)),
      marked AS (
        SELECT t.lang, coalesce(v.in_v, 0) AS in_v
        FROM toks t LEFT JOIN vocab v ON t.w = v.w)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(in_v) AS BIGINT) AS n_in_vocab,
        round(1.0 - CAST(sum(in_v) AS DOUBLE) / count(*), 6) AS oov_rate
      FROM marked GROUP BY lang ORDER BY lang"""))

  /** Per-domain document cap — the anti-monoculture quota every large crawl
    * pipeline applies (a handful of template-heavy domains would otherwise
    * dominate the token budget): within each source domain, RANK documents
    * best-first (longer docs first here; any quality score slots into the
    * same ORDER BY) and keep at most K. The per-domain window prunes as a
    * WindowGroupLimit — each domain's partition stops ranking after K rows
    * instead of sorting its whole slice, so a 10M-page domain costs the
    * same as a 200-page one. The keep/drop LEDGER (docs seen, kept, chars
    * kept/dropped) deliberately comes from TWO branches — per-domain totals
    * are a plain hash aggregate needing no ranking at all, and only the
    * kept branch carries the `rn <= K` filter that lets Catalyst insert
    * WindowGroupLimit — because folding both into one window would force
    * ranking every row and forfeit the pruning. Both branches share the
    * same (source)-keyed shuffle; the ledger join is per-domain rows only.
    */
  val domainCap = Declared(
    "curate_domain_cap",
    (s, dir) => {
      val k = 30
      val docs = t(s, dir, "documents").select(
        col("source"), col("doc_id"), col("n_chars"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      val kept = docs
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k) // ← WindowGroupLimit: per-domain top-k heap
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
      val totals = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      totals.join(kept, Seq("source"))
        .select(
          col("source"), col("n_docs"), col("n_kept"), col("kept_chars"),
          (col("total_chars") - col("kept_chars")).as("dropped_chars"))
        .orderBy(col("source"))
    },
    Some("""WITH ranked AS (
        SELECT source, n_chars,
          row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN rn <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN rn <= 30 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
        CAST(sum(CASE WHEN rn <= 30 THEN 0 ELSE n_chars END) AS BIGINT) AS dropped_chars
      FROM ranked GROUP BY source ORDER BY source"""))

  /** Token-budget epoch schedule — [[mixTemperature]] answers "what share
    * of the mixture is each stratum"; this answers the follow-up a real
    * pretraining run asks: "given a TOTAL token budget, how many times will
    * each stratum's data be repeated?" epochs = budget·weight / tokens_have.
    * Small low-resource strata get up-weighted by the temperature rule and
    * therefore repeat more — the readout flags strata pushed past 4 epochs,
    * the point where repetition stops helping (the data-constrained-scaling
    * rule of thumb). Everything folds to one row per (source, lang) before
    * any arithmetic; tokens are approximated as chars/4 (the fixture has no
    * tokenizer), stated here because the oracle reproduces it exactly.
    */
  val mixEpochs = Declared(
    "mix_epochs",
    (s, dir) => {
      val strata = t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(floor(sum(col("n_chars")) / 4.0).cast("long").as("tokens_have"))
      val z = strata.agg(
        sum(pow(col("tokens_have"), 0.5)).as("z"),
        // budget: 2x the corpus — forces some strata over the repeat cap
        (sum(col("tokens_have")) * 2).as("budget"))
      strata.crossJoin(broadcast(z))
        .withColumn("weight", pow(col("tokens_have"), 0.5) / col("z"))
        .select(
          col("source"), col("lang"), col("tokens_have"),
          round(col("weight"), 6).as("weight"),
          floor(col("budget") * col("weight")).cast("long").as("tokens_target"),
          round(col("budget") * col("weight") / col("tokens_have"), 4).as("epochs"),
          (col("budget") * col("weight") / col("tokens_have") > 4.0).as("over_repeat_cap"))
        .orderBy(col("source"), col("lang"))
    },
    Some("""WITH strata AS (
        SELECT source, lang,
          CAST(floor(sum(n_chars) / 4.0) AS BIGINT) AS tokens_have
        FROM documents GROUP BY source, lang),
      z AS (
        SELECT sum(pow(tokens_have, 0.5)) AS z,
          CAST(sum(tokens_have) * 2 AS BIGINT) AS budget
        FROM strata)
      SELECT source, lang, tokens_have,
        round(pow(tokens_have, 0.5) / z.z, 6) AS weight,
        CAST(floor(budget * (pow(tokens_have, 0.5) / z.z)) AS BIGINT) AS tokens_target,
        round(budget * (pow(tokens_have, 0.5) / z.z) / tokens_have, 4) AS epochs,
        budget * (pow(tokens_have, 0.5) / z.z) / tokens_have > 4.0 AS over_repeat_cap
      FROM strata CROSS JOIN z ORDER BY source, lang"""))

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res): each
    * row draws priority u^(1/w) from a deterministic uniform u ∈ (0,1] (salted
    * portable hash of its identity, same determinism discipline as
    * split_train_val) with weight w = n_chars, and the sample IS the global
    * top-k by priority — longer documents proportionally likelier, any k
    * without a pre-pass over the weights. Spark-first this is a
    * TakeOrderedAndProject: per-partition top-k folds map-side and only
    * k rows per partition reach the driver-side merge, so the operator never
    * shuffles the corpus — the at-scale shape for "sample 10k docs from 10B
    * weighted by length". Priorities are rounded to 9 decimals before the
    * order (doc_id tiebreak) so a last-ulp pow() difference between engines
    * cannot flip the selection.
    */
  val sampleWeighted = Declared(
    "sample_weighted",
    (s, dir) => {
      val u = (graft.functions.Hashing
        .md5Hash32(concat(col("doc_id").cast("string"), lit("|wsample")))
        .cast("double") + 1.0) / 4294967296.0
      val priority = round(pow(u, lit(1.0) / col("n_chars").cast("double")), 9)
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), priority.as("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""SELECT doc_id, lang, n_chars, priority FROM (
        SELECT doc_id, lang, n_chars,
          round(pow(
            (CAST(${graft.functions.Hashing.md5Hash32DuckSql("CAST(doc_id AS VARCHAR) || '|wsample'")} AS DOUBLE) + 1.0)
              / 4294967296.0,
            1.0 / CAST(n_chars AS DOUBLE)), 9) AS priority
        FROM documents) p
      ORDER BY priority DESC, doc_id LIMIT 20"""))

  /** Leakage-aware temporal split: cut the event stream at a date (train
    * before, validation after) and report, alongside the per-split event and
    * user counts, how many USERS appear on both sides — the entity-overlap
    * readout that tells you whether a per-user model can trust this split or
    * needs entity-disjoint splitting instead. One hash aggregate folds each
    * user's side-of-cut event counts (shuffles user-cardinality rows once),
    * and the five readout sums fold those with map-side partial combine —
    * the whole audit is two exact-integer aggregates at any event volume.
    */
  val splitTemporal = Declared(
    "split_temporal",
    (s, dir) => {
      val cut = expr("timestamp_ntz'2024-01-25 00:00:00'")
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < cut, 1L).otherwise(0L)).as("n_train_ev"),
          sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("n_val_ev"))
      perUser.agg(
        sum(col("n_train_ev")).as("train_events"),
        sum(col("n_val_ev")).as("val_events"),
        sum(when(col("n_train_ev") > 0, 1L).otherwise(0L)).as("train_users"),
        sum(when(col("n_val_ev") > 0, 1L).otherwise(0L)).as("val_users"),
        sum(when(col("n_train_ev") > 0 && col("n_val_ev") > 0, 1L).otherwise(0L))
          .as("leaked_users"))
    },
    Some("""WITH per_user AS (
        SELECT user_id,
          sum(CASE WHEN ts < TIMESTAMP '2024-01-25' THEN 1 ELSE 0 END) AS n_train_ev,
          sum(CASE WHEN ts >= TIMESTAMP '2024-01-25' THEN 1 ELSE 0 END) AS n_val_ev
        FROM events GROUP BY 1)
      SELECT
        CAST(sum(n_train_ev) AS BIGINT) AS train_events,
        CAST(sum(n_val_ev) AS BIGINT) AS val_events,
        CAST(sum(CASE WHEN n_train_ev > 0 THEN 1 ELSE 0 END) AS BIGINT) AS train_users,
        CAST(sum(CASE WHEN n_val_ev > 0 THEN 1 ELSE 0 END) AS BIGINT) AS val_users,
        CAST(sum(CASE WHEN n_train_ev > 0 AND n_val_ev > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS leaked_users
      FROM per_user"""))

  /** Pairwise 8-gram overlap BETWEEN SOURCES — the provenance/contamination
    * matrix a corpus audit publishes (which domains plagiarize which, where
    * a "held-out" source actually leaks into training sources). Per-source
    * distinct shingle sets from one corpus fold, then a shingle equi-join
    * whose fan-out is bounded by the SOURCE catalog (≤ |sources|² pairs per
    * shingle — the events_cooccurrence bound, never doc-pair-shaped), down
    * to an O(|sources|²) report with both Jaccard and containment (the
    * asymmetric signal: a small source fully embedded in a big one has low
    * Jaccard but containment ≈ 1). Zero-overlap pairs are omitted — the
    * report is sparse by construction, which is also why it survives at a
    * scale where a dense |sources|² frame from a cross join would not.
    */
  val sourceOverlap = Declared(
    "corpus_source_overlap",
    (s, dir) => {
      val docs = Tables.spread(t(s, dir, "documents"), "doc_id")
      // the per-gram SOURCE SET (≤ |sources| entries, collapsing duplicate
      // (source, gram) rows exactly like the old distinct) replaces the
      // gram self-join: per-source sizes explode the singleton memberships
      // out of it and pair counts explode the a<b combinations — both
      // fan-outs bounded by the source catalog, never doc- or corpus-
      // shaped. Each readout derives the fold itself (one corpus pass +
      // one g-keyed exchange ×2 consumers; deliberately NOT materialized —
      // the fold is distinct-gram-sized, and an A/B probe read the
      // checkpointed form 0.2 s SLOWER at sf0.1 anyway). The r12 shape
      // derived the distinct (source, gram) table THREE times (sizes +
      // both self-join sides) and paid the join's two further g-keyed
      // exchanges on top (sf0.1 isolated: 3.07 → 2.77 s).
      val perGram = docs
        .select(col("source"), explode(TextFns.wordShingles("text", 8)).as("g"))
        .groupBy(col("g")).agg(collect_set(col("source")).as("ss"))
        .select(array_sort(col("ss")).as("ss"))
      val sizes = perGram
        .select(explode(col("ss")).as("source"))
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      val common = perGram
        .filter(size(col("ss")) >= 2)
        .select(explode(col("ss")).as("src_a"), col("ss"))
        .select(col("src_a"), explode(col("ss")).as("src_b"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_common"))
      common
        .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
        .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_common"),
          round(col("n_common").cast("double") /
            (col("na") + col("nb") - col("n_common")), 6).as("jaccard"),
          round(col("n_common").cast("double") / least(col("na"), col("nb")), 6)
            .as("containment"))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some("""WITH ws AS (
        SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents),
      sh0 AS (
        SELECT source,
          unnest(list_distinct(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
            i -> array_to_string(list_slice(w, CAST(i AS INTEGER), CAST(i AS INTEGER) + 7), ' ')))) AS g
        FROM ws),
      sh AS (SELECT DISTINCT source, g FROM sh0),
      sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source),
      common AS (
        SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, n_common,
        round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard,
        round(CAST(n_common AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
      FROM common
      JOIN sizes sa ON sa.source = src_a
      JOIN sizes sb ON sb.source = src_b
      ORDER BY src_a, src_b"""))

  /** Deterministic k-fold split assignment + per-fold balance report — the
    * cross-validation / shard-assignment primitive. Fold = portable md5 of
    * a SALTED doc id (the salt is the split version: bump it and every doc
    * reshuffles; keep it and the assignment is reproducible in any engine,
    * the same contract as split_train_val). The report carries the balance
    * evidence a reviewer checks before trusting CV numbers: doc/token
    * counts and language coverage per fold. One map-side hash + one
    * aggregate at any corpus size.
    */
  val splitKfold = Declared(
    "split_kfold",
    (s, dir) => {
      val fold = (graft.functions.Hashing.md5Hash32(
        concat(lit("kfold1|"), col("doc_id").cast("string"))) % 5).cast("int")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), fold.as("fold"),
          size(TextFns.words(col("text"))).cast("long").as("n_tokens"))
        .groupBy(col("fold"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("fold"))
    },
    Some {
      val h = graft.functions.Hashing.md5Hash32DuckSql(
        "concat('kfold1|', CAST(doc_id AS VARCHAR))")
      s"""SELECT CAST($h % 5 AS INTEGER) AS fold,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        min(doc_id) AS min_doc
      FROM documents GROUP BY 1 ORDER BY fold"""
    })

  /** Loss-aware domain reweighting (the DoReMi idea reduced to its
    * measurable core): domains whose text the corpus-level unigram LM finds
    * SURPRISING (higher mean negative log-likelihood — rarer vocabulary)
    * get upweighted via a softmax over per-source mean NLL, versus
    * mix_temperature's purely size-based weights. The per-word NLL is
    * rounded to integer NANO-units before the per-source sum (the
    * dq_drift_psi discipline), so the mean is exact long arithmetic with no
    * float summation order to diverge between engines; the softmax then
    * runs over the O(sources) table only (max-subtracted for stability —
    * weights are scale-free so the shift cancels). Corpus text is scanned
    * once; the unigram dictionary broadcasts like text_unigram_nll's.
    */
  val doremiWeights = Declared(
    "mix_doremi_weights",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val words = docs.select(col("source"),
        explode(TextFns.words(col("text"))).as("w"))
      val freq = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = freq.agg(sum(col("c")).cast("double").as("n"))
      val bySrc = words.join(broadcast(freq), "w")
        .crossJoin(broadcast(tot))
        .select(col("source"),
          round(-log(col("c").cast("double") / col("n")) * 1e9).cast("long")
            .as("nano"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"), sum(col("nano")).as("s_nano"))
        .withColumn("mean_nll",
          col("s_nano").cast("double") / 1e9 / col("n_words"))
      val mx = bySrc.agg(max(col("mean_nll")).as("mx"))
      val expd = bySrc.crossJoin(broadcast(mx))
        .withColumn("e", exp(col("mean_nll") - col("mx")))
      val denom = expd.agg(sum(col("e")).as("d"))
      expd.crossJoin(broadcast(denom))
        .select(col("source"), col("n_words"),
          round(col("mean_nll"), 6).as("mean_nll"),
          round(col("e") / col("d"), 6).as("weight"))
        .orderBy(col("source"))
    },
    Some("""WITH w AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents),
      freq AS (SELECT w, count(*) AS c FROM w GROUP BY w),
      tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq),
      by_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_words,
          CAST(sum(CAST(round(-ln(CAST(f.c AS DOUBLE) / t.n) * 1e9) AS BIGINT)) AS BIGINT) AS s_nano
        FROM w JOIN freq f USING (w) CROSS JOIN tot t
        GROUP BY source),
      stats AS (
        SELECT source, n_words,
          CAST(s_nano AS DOUBLE) / 1e9 / n_words AS mean_nll
        FROM by_src),
      mx AS (SELECT max(mean_nll) AS mx FROM stats),
      e AS (SELECT s.*, exp(mean_nll - mx) AS e FROM stats s, mx),
      d AS (SELECT sum(e) AS d FROM e)
      SELECT source, n_words, round(mean_nll, 6) AS mean_nll,
        round(e / d, 6) AS weight
      FROM e, d ORDER BY source"""))

  /** DSIR data selection (Xie et al. 2023, arXiv:2302.03169): rank raw
    * documents by an importance weight estimated from hashed-feature
    * distributions — the published cheap alternative to a trained quality
    * classifier. Every word hashes into one of D = 4096 buckets (portable
    * md5, the [[graft.functions.Hashing]] convention); bucket counts under
    * the TARGET distribution (here the `lang = 'en'` slice standing in for
    * a curated target corpus) and the RAW distribution (everything) fold in
    * ONE pass; a doc's log-importance is the sum of its words' per-bucket
    * log-likelihood ratios, Laplace-smoothed (+1 / +D) as in the paper.
    * Each ratio becomes an integer nano-unit once (`round(ln(...)·1e9)` on
    * identical exact-integer-valued doubles — the text_unigram_nll
    * discipline), so per-doc sums are order-free longs and the top-100
    * selection cannot split the engines. The paper's Gumbel-noise sampling
    * step is deliberately replaced by deterministic top-k (documented
    * deviation — reproducible selection is what a production rerun wants);
    * the length bias of summed ratios is the paper's own (§3).
    *
    * Scale shape: two corpus scans (feature fold, scoring join), the ratio
    * table is D ≤ 4096 rows — broadcast-sized at any corpus scale — and the
    * readout is the selected-mixture audit (per-lang doc/token mass of the
    * top-k), which is what one actually inspects before committing a
    * trillion-token selection. TakeOrderedAndProject bounds the top-k: the
    * corpus never globally sorts.
    */
  val dsir = Declared(
    "curate_dsir",
    (s, dir) => {
      val h = graft.functions.Hashing.md5Hash32SparkSql("w")
      val feats = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(TextFns.words(col("text"))).as("w"))
        .select(col("doc_id"), col("lang"), expr(s"$h % 4096").as("b"))
      val counts = feats.groupBy(col("b")).agg(
        count(lit(1)).as("rc"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
      val totals = counts.agg(sum(col("rc")).as("rt"), sum(col("tc")).as("tt"))
      val ratio = counts.crossJoin(broadcast(totals))
        .select(col("b"),
          expr("""CAST(round((ln((tc + 1.0) / (tt + 4096.0))
                 - ln((rc + 1.0) / (rt + 4096.0))) * 1e9) AS BIGINT)""")
            .as("lr_nano"))
      feats.join(broadcast(ratio), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("lr_nano")).as("dsir_nano"))
        .orderBy(col("dsir_nano").desc, col("doc_id"))
        .limit(100)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_selected"),
          sum(col("n_tokens")).as("sel_tokens"),
          sum(col("dsir_nano")).as("sel_nano"))
        .orderBy(col("lang"))
    },
    Some {
      val h = graft.functions.Hashing.md5Hash32DuckSql("w")
      s"""WITH feats AS (
        SELECT doc_id, lang, $h % 4096 AS b
        FROM (SELECT doc_id, lang,
                unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents)),
      counts AS (
        SELECT b, CAST(count(*) AS BIGINT) AS rc,
          CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc
        FROM feats GROUP BY b),
      tot AS (SELECT CAST(sum(rc) AS BIGINT) AS rt,
                     CAST(sum(tc) AS BIGINT) AS tt FROM counts),
      ratio AS (
        SELECT b, CAST(round((ln((tc + 1.0) / (tt + 4096.0))
          - ln((rc + 1.0) / (rt + 4096.0))) * 1e9) AS BIGINT) AS lr_nano
        FROM counts, tot),
      scored AS (
        SELECT f.doc_id, f.lang, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(r.lr_nano) AS BIGINT) AS dsir_nano
        FROM feats f JOIN ratio r USING (b)
        GROUP BY 1, 2),
      sel AS (SELECT * FROM scored ORDER BY dsir_nano DESC, doc_id LIMIT 100)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_selected,
        CAST(sum(n_tokens) AS BIGINT) AS sel_tokens,
        CAST(sum(dsir_nano) AS BIGINT) AS sel_nano
      FROM sel GROUP BY lang ORDER BY lang"""
    })

  val all: Seq[Declared] = Seq(
    decontaminate, packSequences, embedOutliers, corpusTerms, textRepetition,
    mixSample, chunkDocuments, sampleStratified, curriculumOrder,
    mixTemperature, heavyHitters, vocabCoverage, domainCap, mixEpochs,
    sampleWeighted, splitTemporal, sourceOverlap, splitKfold, doremiWeights,
    dsir)
}
