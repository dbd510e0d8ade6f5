package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relationships implied by the TPC-H-ish
  * fixture. Complements [[graft.operators.DedupClusters]] (connected
  * components): where label propagation converges on set membership, the
  * power iteration here converges on node IMPORTANCE — the two canonical
  * shuffle-per-round Spark graph workloads. GraphX/GraphFrames execute the
  * same per-round shape (edge join + aggregate-by-destination); declaring
  * it with DataFrames keeps Catalyst in charge of the join strategy.
  */
object GraphQ {
  import Tables.t

  /** PageRank over the bipartite customer–supplier graph (an edge per
    * distinct (customer, supplier) trading pair in lineitem ⋈ orders),
    * made undirected so no node dangles. Three power iterations with 0.85
    * damping; top-20 nodes reported.
    *
    * Scale shape: the edge list (with out-degrees attached) is built once
    * and localCheckpointed; each round is one shuffle-on-src join plus one
    * aggregate-by-dst — O(edges) per round, state is O(nodes), nothing on
    * the driver but the loop counter. Supplier node ids are offset by
    * 100000 to disjoint the two key spaces.
    *
    * Determinism: ranks live in integer MICRO-UNITS (1e9 = rank 1.0) and
    * every step is integer arithmetic — `rank div outdeg` per edge,
    * `0.15·1e9 + (85·sum) div 100` per node — so no floating sum order can
    * perturb the result in either engine; doubles never appear.
    */
  val pagerank = Declared(
    "graph_pagerank",
    (s, dir) => {
      val eraw = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("su"))
        .distinct()
      val undirected = eraw
        .select(col("c").as("src"), (col("su") + 100000L).as("dst"))
        .union(eraw.select((col("su") + 100000L).as("src"), col("c").as("dst")))
      val deg = undirected.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edges = undirected.join(deg, "src").localCheckpoint()
      var rank = edges.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(1000000000L))
      // bounded 3-round loop: lineage stays 3 joins deep, so the rounds run
      // as ONE Spark job over the checkpointed edge list — no per-round
      // eager materialization. An unbounded/convergence-driven loop would
      // checkpoint each round instead (DedupClusters' cadence).
      for (_ <- 1 to 3) {
        rank = edges.join(rank, edges("src") === rank("node"))
          .select(col("dst"), expr("rank div outdeg").as("contrib"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("cb"))
          .select(col("dst").as("node"),
            expr("150000000L + (85L * cb) div 100L").as("rank"))
      }
      rank
        .select(col("node"), col("rank"),
          when(col("node") >= 100000L, lit("supplier"))
            .otherwise(lit("customer")).as("kind"))
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },
    Some("""WITH eraw AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS su
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      e0 AS (
        SELECT c AS src, su + 100000 AS dst FROM eraw
        UNION ALL
        SELECT su + 100000 AS src, c AS dst FROM eraw),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e0 GROUP BY src),
      e AS (SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg USING (src)),
      r0 AS (SELECT DISTINCT src AS node, CAST(1000000000 AS BIGINT) AS rank FROM e0),
      c1 AS (SELECT e.dst AS node, CAST(sum(r.rank // e.outdeg) AS BIGINT) AS cb
             FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
      r1 AS (SELECT node, CAST(150000000 + (85 * cb) // 100 AS BIGINT) AS rank FROM c1),
      c2 AS (SELECT e.dst AS node, CAST(sum(r.rank // e.outdeg) AS BIGINT) AS cb
             FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
      r2 AS (SELECT node, CAST(150000000 + (85 * cb) // 100 AS BIGINT) AS rank FROM c2),
      c3 AS (SELECT e.dst AS node, CAST(sum(r.rank // e.outdeg) AS BIGINT) AS cb
             FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
      r3 AS (SELECT node, CAST(150000000 + (85 * cb) // 100 AS BIGINT) AS rank FROM c3)
      SELECT CAST(node AS BIGINT) AS node, rank,
        CASE WHEN node >= 100000 THEN 'supplier' ELSE 'customer' END AS kind
      FROM r3 ORDER BY rank DESC, node LIMIT 20"""))

  val all: Seq[Declared] = Seq(pagerank)
}
