package graft.queries

import graft.{Declared, Tables}

/** SQL-passthrough surface: CTEs, scalar/IN/correlated subqueries, VALUES
  * (SURVEY §2.B "subqueries/CTE"). These run through `spark.sql` over temp
  * views — the direct analog of the reference's `ctx.sql`
  * (/root/reference/src/bin/main.rs:182) — and exercise Catalyst's
  * decorrelation rewrites.
  */
object SqlSurface {

  /** Same text runs in Spark and DuckDB (conservative ANSI). */
  private def both(name: String, sql: String) = Declared(
    name,
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) },
    Some(sql))

  val cte = both(
    "q_cte",
    """WITH big_orders AS (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey),
      seg AS (
        SELECT c_custkey, c_mktsegment FROM customer)
      SELECT seg.c_mktsegment, CAST(sum(b.n_big) AS BIGINT) AS total_big
      FROM big_orders b JOIN seg ON b.o_custkey = seg.c_custkey
      GROUP BY seg.c_mktsegment
      ORDER BY seg.c_mktsegment""")

  val subqueryScalar = both(
    "q_subquery_scalar",
    """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_totalprice > 2.0 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey""")

  val subqueryIn = both(
    "q_subquery_in",
    """SELECT o_orderkey, o_custkey
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        AND o_orderstatus = 'O'
      ORDER BY o_orderkey""")

  val subqueryCorrelated = both(
    "q_subquery_correlated",
    """SELECT c.c_custkey, round(c.c_acctbal, 2) AS acctbal
      FROM customer c
      WHERE c.c_acctbal > 1.5 * (SELECT avg(c2.c_acctbal) FROM customer c2
                                 WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c.c_custkey""")

  val valuesQ = both(
    "q_values",
    """SELECT v.tier, count(*) AS n
      FROM orders
      JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                   ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                   ('5-LOW', 'cold')) AS v(prio, tier)
        ON orders.o_orderpriority = v.prio
      GROUP BY v.tier
      ORDER BY v.tier""")

  /** HAVING over an aggregate (reachable via the query surface). */
  val having = both(
    "q_having",
    """SELECT l_suppkey, count(*) AS n_items
      FROM lineitem
      GROUP BY l_suppkey
      HAVING count(*) > 550
      ORDER BY l_suppkey""")

  /** Correlated EXISTS / NOT EXISTS (Catalyst rewrites to semi/anti join —
    * the q_join_semi/anti plans through the SQL surface).
    */
  val subqueryExists = both(
    "q_subquery_exists",
    """SELECT c_custkey, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
      ORDER BY c_custkey""")

  /** DECIMAL-typed aggregation (exact fixed-point sums; surfaced as DOUBLE
    * because the engines widen sum-of-decimal precision differently —
    * 2-decimal inputs make every step exact in both).
    */
  val decimalAgg = both(
    "q_decimal_agg",
    """SELECT o_orderstatus,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_p,
      CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_p
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")

  /** GROUP BY ALL (modern shorthand both engines support). */
  val groupByAll = both(
    "q_group_by_all",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""")

  /** LIKE / ILIKE / ESCAPE / IN-list / BETWEEN predicate battery. */
  val likePatterns = both(
    "q_like_patterns",
    """SELECT p_partkey,
      p_name LIKE '%iv%' AS has_iv,
      p_name ILIKE 'A%' AS starts_a_i,
      p_type NOT LIKE 'SMALL%' AS not_small,
      p_name LIKE '%!_%' ESCAPE '!' AS has_underscore,
      p_brand IN ('Brand#13', 'Brand#42') AS known_brand,
      p_name BETWEEN 'a' AND 'm' AS first_half
      FROM part ORDER BY p_partkey""")

  /** LATERAL correlated table subquery — same text on both engines. */
  val lateralJoin = both(
    "q_lateral_join",
    """SELECT r.r_name, l.n_nations, l.first_n
      FROM region r, LATERAL (
        SELECT CAST(count(*) AS BIGINT) AS n_nations, min(n.n_name) AS first_n
        FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS l
      ORDER BY r.r_name""")

  /** ANSI-mode escape hatches: the try_* family returns null where plain
    * arithmetic would raise (divide-by-zero, long overflow, out-of-bounds
    * index) — essential under Spark 4's ANSI-on default. The oracle emulates
    * each via nullif / HUGEINT + TRY_CAST / list indexing.
    */
  val tryArith = Declared(
    "q_try_arith",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(
      """SELECT l_orderkey, l_linenumber,
        try_divide(l_quantity, CAST(l_linenumber - l_linenumber AS DOUBLE)) AS div0,
        round(try_divide(l_quantity, CAST(l_linenumber AS DOUBLE)), 6) AS divn,
        try_add(9223372036854775807, l_orderkey) AS add_of,
        try_multiply(4611686018427387904, l_orderkey) AS mul_of,
        try_element_at(array(l_linenumber), 99) AS oob
        FROM lineitem WHERE l_orderkey <= 200
        ORDER BY l_orderkey, l_linenumber, divn""") },
    Some("""SELECT l_orderkey, l_linenumber,
      l_quantity / nullif(CAST(l_linenumber - l_linenumber AS DOUBLE), 0.0) AS div0,
      round(l_quantity / CAST(l_linenumber AS DOUBLE), 6) AS divn,
      TRY_CAST(CAST(9223372036854775807 AS HUGEINT) + l_orderkey AS BIGINT) AS add_of,
      TRY_CAST(CAST(4611686018427387904 AS HUGEINT) * l_orderkey AS BIGINT) AS mul_of,
      ([l_linenumber])[99] AS oob
      FROM lineitem WHERE l_orderkey <= 200
      ORDER BY l_orderkey, l_linenumber, divn"""))

  /** Aggregate FILTER clause (ANSI): conditional aggregation without CASE
    * scaffolding — one pass, each aggregate sees its own row subset. Plans
    * as a single HashAggregate with per-aggregate predicates.
    */
  val aggFilter = both(
    "q_agg_filter",
    """SELECT o_orderpriority,
        count(*) AS n_all,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        count(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
        round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_value,
        round(avg(o_totalprice) FILTER (WHERE o_totalprice > 150000.0), 2) AS avg_big
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")

  /** Recursive CTE (SQL:1999 WITH RECURSIVE, landed in Spark 4): bounded
    * multi-hop reachability from a 10-customer seed set over the
    * customer–supplier trade graph, the SAME query text executing on both
    * engines — the strongest possible dialect-parity statement for the
    * feature. The recursion is UNION ALL path enumeration capped at hop < 2
    * (each level joins the frontier to the edge list), then min(hop) folds
    * paths to distances and the readout is the O(3 × 2) distance × kind
    * census. Scope stated plainly: UNION ALL recursion enumerates PATHS, so
    * its cost is Σ deg^hops of the seed set — fine for bounded-hop
    * neighborhood queries like this one; UNBOUNDED traversal at scale
    * belongs to the iterative checkpoint loop ([[graft.queries.GraphQ]]
    * label spread / pagerank), which dedups the frontier every round.
    */
  val recursiveCte = both(
    "q_recursive_cte",
    """WITH RECURSIVE e AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000000 AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT DISTINCT l.l_suppkey + 1000000000 AS src, o.o_custkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      reach AS (
        SELECT c_custkey AS node, 0 AS hop
        FROM customer WHERE c_custkey <= 10
        UNION ALL
        SELECT e.dst AS node, r.hop + 1 AS hop
        FROM reach r JOIN e ON e.src = r.node
        WHERE r.hop < 2),
      agg AS (
        SELECT node, min(hop) AS dist, CAST(count(*) AS BIGINT) AS n_paths
        FROM reach GROUP BY node)
      SELECT dist,
        CASE WHEN node >= 1000000000 THEN 'supplier' ELSE 'customer' END AS kind,
        CAST(count(*) AS BIGINT) AS n_nodes,
        CAST(sum(n_paths) AS BIGINT) AS n_paths
      FROM agg
      GROUP BY 1, 2
      ORDER BY dist, kind""")

  val all: Seq[Declared] = Seq(
    cte, subqueryScalar, subqueryIn, subqueryCorrelated, valuesQ, having,
    subqueryExists, decimalAgg, groupByAll, likePatterns, lateralJoin, tryArith,
    aggFilter, recursiveCte)
}
