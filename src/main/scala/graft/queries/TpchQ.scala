package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.functions._

/** Multi-join TPC-H-shaped headliners beyond q1 (the reference's demo runs
  * the full sqlbench-h suite through `bdt query`,
  * /root/reference/README.md:119-135 — any TPC-H query a bdt user runs today
  * must run here). Adapted to the fixture schema (TESTDATA.md drops
  * partsupp/o_shippriority/comment columns).
  *
  * These four exercise the join-planning surface the single-table queries
  * can't: a 3-way selective join with top-k (q3), a 6-way snowflake with two
  * genuinely-small broadcast dims (q5), a filtered fact→dim rollup (q10), and
  * a self-aggregated semi-join (q18). In every case the plan is declared and
  * Catalyst/AQE picks broadcast-vs-shuffle per side at runtime — at 100 TB
  * the filtered customer/orders sides exceed any broadcast threshold and
  * degrade gracefully to shuffle joins on the join key, while nation/region
  * stay broadcast forever.
  */
object TpchQ {
  import Tables.t

  /** TPC-H q3: shipping priority — revenue of undelivered orders in one
    * market segment. Filters reach both parquet scans (segment on customer,
    * date on orders/lineitem) before the joins; the final top-10 is a
    * TakeOrderedAndProject, not a full sort.
    */
  val q3 = Declared(
    "q3_shipping_priority",
    (s, dir) => {
      val cut = expr("timestamp'1995-03-15 00:00:00'")
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < cut)
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .select(
          col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
        round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        o_orderdate
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1995-03-15'
        AND l_shipdate > TIMESTAMP '1995-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** TPC-H q5: local supplier volume — revenue where the customer and the
    * line's supplier share a nation, rolled up by nation within one region.
    * nation/region are forced broadcasts (25/5 rows at any scale); the
    * customer⋈orders⋈lineitem⋈supplier spine shuffles on its keys. The
    * local-supplier predicate (s_nationkey = c_nationkey) rides the supplier
    * join as an extra equi-condition, not a post-filter.
    */
  val q5 = Declared(
    "q5_local_supplier",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp'1997-01-01 00:00:00'"))
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
        round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** TPC-H q10: returned-item reporting — lost revenue per customer from
    * returned lines in one quarter, with the customer's nation. The
    * returnflag filter prunes the fact scan (parquet pushdown), nation is a
    * broadcast, and the top-20 is a TakeOrderedAndProject over the
    * per-customer aggregate.
    */
  val q10 = Declared(
    "q10_returned_items",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= expr("timestamp'1995-04-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp'1995-07-01 00:00:00'"))
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .select(
          col("c_custkey"), col("c_name"), col("revenue"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name,
        round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        round(c_acctbal, 2) AS c_acctbal, n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1995-04-01'
        AND o_orderdate < TIMESTAMP '1995-07-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** TPC-H q18: large-volume customers — orders whose total quantity exceeds
    * a threshold, with the buyer. The HAVING subquery folds lineitem FIRST
    * (map-side partial sum on l_orderkey, the fact table's natural key), so
    * only the tiny qualifying-order set joins back to orders/customer —
    * a semi-join-shaped plan that never widens the fact table.
    */
  val q18 = Declared(
    "q18_big_spenders",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 300.0)
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(
          col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        round(o_totalprice, 2) AS o_totalprice, total_qty
      FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING round(sum(l_quantity), 2) > 300.0) big
      JOIN orders ON big.l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  val all: Seq[Declared] = Seq(q3, q5, q10, q18)
}
