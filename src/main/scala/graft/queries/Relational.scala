package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY §2.B): scan/filter/project, joins of every
  * type, aggregation, sort/limit. Everything is declarative DataFrame API so
  * Catalyst gets full pushdown/pruning/join-selection freedom; `.explain`
  * sanity lives in the specs.
  */
object Relational {
  import Tables.t

  /** TPC-H q1-style pricing summary — the flagship (reference demo runs TPC-H
    * q1 via sqlbench-h, /root/reference/README.md:119-135).
    */
  val q1 = Declared(
    "q1_pricing_summary",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= expr("timestamp'1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity),2) AS sum_qty,
      round(sum(l_extendedprice),2) AS sum_base_price,
      round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
      round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),2) AS sum_charge,
      round(avg(l_quantity),4) AS avg_qty,
      round(avg(l_extendedprice),4) AS avg_price,
      round(avg(l_discount),4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Projection + arithmetic + filter; pushdown-friendly (only 5 columns read). */
  val filterProject = Declared(
    "q_filter_project",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("net_price"),
          col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"), col("l_returnflag")),
    Some("""SELECT l_orderkey, l_linenumber,
      round(l_extendedprice*(1.0-l_discount),4) AS net_price, l_returnflag
      FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
      ORDER BY l_orderkey, l_linenumber, net_price, l_returnflag"""))

  val distinctQ = Declared(
    "q_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** ORDER BY + LIMIT: Catalyst plans TakeOrderedAndProject (top-k, no full
    * sort at scale). Unique tiebreak keeps ties deterministic.
    */
  val topk = Declared(
    "q_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  /** Inner equi-join + aggregate. Catalyst broadcast/SMJ selection is free;
    * at 100 TB the orders side shuffles on the join key and the aggregate is
    * partial (map-side) before the final shuffle.
    */
  val joinInner = Declared(
    "q_join_inner",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
      round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** LEFT OUTER join preserving customers with zero orders. */
  val joinLeft = Declared(
    "q_join_left",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
      round(coalesce(sum(o_totalprice), 0.0),2) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))

  /** RIGHT OUTER join (kept as right to exercise the plan shape). */
  val joinRight = Declared(
    "q_join_right",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(o_orderkey) AS n_orders,
      count(DISTINCT c_custkey) AS n_customers
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** FULL OUTER join over two aggregates; counts unmatched sides. */
  val joinFull = Declared(
    "q_join_full",
    (s, dir) => {
      val perCust = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val c = t(s, dir, "customer")
      c.join(perCust, c("c_custkey") === perCust("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("c_custkey").isNull.as("customer_missing"),
          col("o_custkey").isNull.as("orders_missing"))
        .orderBy(col("custkey"))
    },
    Some("""SELECT coalesce(c_custkey, o_custkey) AS custkey,
      coalesce(n_orders, 0) AS n_orders,
      (c_custkey IS NULL) AS customer_missing,
      (o_custkey IS NULL) AS orders_missing
      FROM customer FULL JOIN
        (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey) o
        ON c_custkey = o_custkey
      ORDER BY custkey"""))

  /** CROSS join (small dims only — would never cross big tables). */
  val joinCross = Declared(
    "q_join_cross",
    (s, dir) => {
      val r = t(s, dir, "region").select(col("r_name"))
      val n = t(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name"""))

  /** LEFT SEMI = EXISTS. */
  val joinSemi = Declared(
    "q_join_semi",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      ORDER BY c_custkey"""))

  /** LEFT ANTI = NOT EXISTS. */
  val joinAnti = Declared(
    "q_join_anti",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** Theta join: equi key (nationkey, hash-joinable) + inequality residual —
    * the scalable shape for non-equi conditions (pure theta would force a
    * nested-loop over everything).
    */
  val joinTheta = Declared(
    "q_join_theta",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      sup.join(c, sup("s_nationkey") === c("c_nationkey") && sup("s_acctbal") > c("c_acctbal"))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_poorer_customers"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, count(*) AS n_poorer_customers
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      GROUP BY s_suppkey ORDER BY s_suppkey"""))

  /** Multi-way star join: region→nation→customer→orders→lineitem (TPC-H
    * q5 flavor). Small dims broadcast; the two fact tables shuffle on the
    * join key — the canonical 100 TB plan.
    */
  val joinStar = Declared(
    "q_join_star",
    (s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
      round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  val all: Seq[Declared] = Seq(
    q1, filterProject, distinctQ, topk, joinInner, joinLeft, joinRight,
    joinFull, joinCross, joinSemi, joinAnti, joinTheta, joinStar)
}
