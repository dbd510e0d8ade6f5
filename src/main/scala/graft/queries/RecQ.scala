package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.functions._

/** Recommendation primitives over the implicit-feedback matrix implied by
  * the fixture's purchase history (customer × part through lineitem ⋈
  * orders). The classic serving stack's batch half: co-occurrence counting
  * and neighborhood models, declared as keyed joins + hash aggregates so
  * Catalyst owns the physical strategy — the same pair-counting discipline
  * as [[GraphQ]]'s wedge queries, pointed at "what should this user see
  * next" instead of "how is the graph shaped".
  */
object RecQ {
  import Tables.t

  /** Item–item collaborative filtering: cosine similarity over binary
    * user-interaction vectors (Linden et al., IEEE Internet Computing 2003 —
    * the amazon.com item-to-item paper). An item pair's cosine is
    * `c / sqrt(d_i · d_j)` where c counts users who bought both and d the
    * users who bought each; binary vectors make this exact integer work
    * plus one sqrt on exact-integer-valued doubles, rounded ONCE to
    * nano-units (the established cross-engine float discipline).
    *
    * Scale shape: the pair fan-out is Σ_u basket(u)² — the same quadratic
    * hazard as [[GraphQ.linkPredict]]'s wedges, bounded the same way: users
    * with > 100 distinct items are excluded from pair generation (a
    * power-user's basket approximates the popularity list and adds noise to
    * item neighborhoods — the documented practice in the paper's successors;
    * the cap is a declared semantic, identical in the oracle). Pairs below
    * support 2 are dropped before scoring — the standard min-support
    * threshold: a pair two long-tail items share with ONE user scores a
    * perfect-but-meaningless cosine of 1.0, and at real sparsity
    * support-1 pairs are the bulk of the pair table (measured here:
    * ~15M of ~20M candidates at sf0.1), so the threshold is also what
    * keeps the degree join sized to signal instead of noise. Degrees join
    * back keyed (the degree table is item-dimension-sized, NOT broadcast —
    * item catalogs at 100 TB are billions); the top-20 readout is
    * TakeOrderedAndProject, so nothing global-sorts.
    */
  val itemCf = Declared(
    "rec_item_cf",
    (s, dir) => {
      val baskets = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
        .distinct()
      val small = baskets.groupBy(col("u"))
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= 100)
        .select(col("u"))
      // consumed three times (both pair-join sides + degrees): checkpoint so
      // the lineitem ⋈ orders distinct runs once, not three times
      val capped = baskets.join(small, "u").localCheckpoint()
      val deg = capped.groupBy(col("i")).agg(count(lit(1)).as("d"))
      // The candidate stream is Σ basket² rows (268M at the sf1 probe) of
      // ~95% unique pair keys — the aggregate IS this query's cost. A
      // two-column (i1, i2) groupBy pays generic-hash-map partial
      // aggregation that overflows to sort on every map task (measured
      // 95–198 s at sf1); PACKING the pair into one long turns both agg
      // passes into Spark's vectorized long-key fast hash map and the
      // shuffle rows into 16 bytes (measured 8.6 s — 11–23× off the same
      // plan shape). The pack is exact while ids < 2^31 (i1·2^32 + i2;
      // wider catalogs shard the id space or keep the composite key), and
      // the unpack is exact integer div/mod on the non-negative domain.
      val pairs = capped.select(col("u"), col("i").as("i1"))
        .join(capped.select(col("u"), col("i").as("i2")), "u")
        .filter(col("i1") < col("i2"))
        .select((col("i1") * 4294967296L + col("i2")).as("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 2)
        .select(expr("pk div 4294967296L").as("i1"),
          expr("pk % 4294967296L").as("i2"), col("n_co"))
      pairs
        .join(deg.select(col("i").as("i1"), col("d").as("d1")), "i1")
        .join(deg.select(col("i").as("i2"), col("d").as("d2")), "i2")
        .select(col("i1"), col("i2"), col("n_co"),
          expr("""CAST(round(CAST(n_co AS DOUBLE) * 1e9
                 / sqrt(CAST(d1 * d2 AS DOUBLE))) AS BIGINT)""")
            .as("cos_nano"))
        .orderBy(col("cos_nano").desc, col("i1"), col("i2"))
        .limit(20)
    },
    Some("""WITH baskets AS (
        SELECT DISTINCT o_custkey AS u, l_partkey AS i
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      small AS (
        SELECT u FROM baskets GROUP BY u HAVING count(*) <= 100),
      capped AS (SELECT b.u, b.i FROM baskets b JOIN small USING (u)),
      deg AS (SELECT i, CAST(count(*) AS BIGINT) AS d
              FROM capped GROUP BY i),
      pairs AS (
        SELECT a.i AS i1, b.i AS i2, CAST(count(*) AS BIGINT) AS n_co
        FROM capped a JOIN capped b ON a.u = b.u AND a.i < b.i
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT i1, i2, n_co,
        CAST(round(CAST(n_co AS DOUBLE) * 1e9
          / sqrt(CAST(d1.d * d2.d AS DOUBLE))) AS BIGINT) AS cos_nano
      FROM pairs
      JOIN deg d1 ON d1.i = pairs.i1
      JOIN deg d2 ON d2.i = pairs.i2
      ORDER BY cos_nano DESC, i1, i2 LIMIT 20"""))

  val all: Seq[Declared] = Seq(itemCf)
}
