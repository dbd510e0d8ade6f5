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

  /** TPC-H q6: forecasting revenue change — a pure single-table filter-agg.
    * All three predicates (date range, discount band, quantity cap) reach the
    * parquet scan as PushedFilters, so at 100 TB the scan reads only the
    * row groups whose min/max stats overlap the band; no shuffle at all
    * (partial sums combine map-side into one row).
    */
  val q6 = Declared(
    "q6_forecast_revenue",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("timestamp'1997-01-01 00:00:00'") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""))

  /** TPC-H q7: volume shipping — revenue shipped between two specific nations
    * (either direction), by year. The two 25-row nation dims ride broadcasts
    * with their `n_name IN (…)` filters applied BEFORE the broadcast, so the
    * supplier/customer joins immediately drop every row outside the pair; the
    * directional (n1,n2)≠(n2,n1) predicate is the only post-join filter.
    * Fixture nations are NATION_0..24 (TESTDATA.md); the reference's
    * FRANCE/GERMANY become NATION_1/NATION_2.
    */
  val q7 = Declared(
    "q7_volume_shipping",
    (s, dir) => {
      val l = t(s, dir, "lineitem").filter(
        col("l_shipdate") >= expr("timestamp'1995-01-01 00:00:00'") &&
          col("l_shipdate") <= expr("timestamp'1996-12-31 00:00:00'"))
      val su = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*)).as("n1")
      val n2 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*)).as("n2")
      l.join(su, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), su("s_nationkey") === col("n1.n_nationkey"))
        .join(broadcast(n2), c("c_nationkey") === col("n2.n_nationkey"))
        .filter(col("n1.n_name") =!= col("n2.n_name"))
        .groupBy(
          col("n1.n_name").as("supp_nation"),
          col("n2.n_name").as("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H q8: national market share — the fraction of one region's revenue
    * in one part type supplied by one nation, per order year. The deepest
    * join tree in the suite (7 tables, two nation roles): part's type filter
    * prunes the fact side first (p_type is 1-of-6 in the fixture, standing in
    * for 'ECONOMY ANODIZED STEEL'); region restricts the CUSTOMER nation via
    * broadcast; the SUPPLIER nation is carried through to the conditional
    * numerator. The share is a single conditional-sum / sum over one grouped
    * aggregate — no second pass.
    */
  val q8 = Declared(
    "q8_market_share",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= expr("timestamp'1995-01-01 00:00:00'") &&
          col("o_orderdate") <= expr("timestamp'1996-12-31 00:00:00'"))
      val c = t(s, dir, "customer")
      val n1 = t(s, dir, "nation").as("n1") // customer nation → region gate
      val n2 = t(s, dir, "nation").as("n2") // supplier nation → share numerator
      val r = t(s, dir, "region").filter(col("r_name") === "AMERICA")
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), c("c_nationkey") === col("n1.n_nationkey"))
        .join(broadcast(r), col("n1.n_regionkey") === r("r_regionkey"))
        .join(broadcast(n2), su("s_nationkey") === col("n2.n_nationkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("n2.n_name") === "NATION_1", vol).otherwise(lit(0.0))) / sum(vol),
          4).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT o_year,
        round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) / sum(volume), 4) AS mkt_share
      FROM (SELECT year(o_orderdate) AS o_year,
              l_extendedprice * (1.0 - l_discount) AS volume,
              n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
              AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
              AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
              AND p_type = 'ECONOMY') all_nations
      GROUP BY o_year ORDER BY o_year"""))

  /** TPC-H q14: promo revenue — the percentage of one month's revenue from
    * promotional parts. One fact⋈dim join on partkey (part scales with SF, so
    * no forced broadcast — AQE picks per side) with the month filter pushed
    * to the lineitem scan; numerator and denominator come from the same
    * single aggregate. Fixture p_type is exactly 'PROMO' (1-of-6), standing
    * in for the reference's `p_type LIKE 'PROMO%%'`.
    */
  val q14 = Declared(
    "q14_promo_revenue",
    (s, dir) => {
      val l = t(s, dir, "lineitem").filter(
        col("l_shipdate") >= expr("timestamp'1996-09-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1996-10-01 00:00:00'"))
      val p = t(s, dir, "part")
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) / sum(vol),
          4).as("promo_revenue"))
    },
    Some("""SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END)
            / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01'"""))

  /** TPC-H q13 (adapted): customer order-count distribution — how many
    * customers placed k orders, including k=0 via the LEFT join. Two hash
    * aggregates back to back: count per customer (shuffles on c_custkey),
    * then the tiny histogram over counts. Adaptation: the reference filters
    * `o_comment NOT LIKE '%special%requests%'`; the fixture has no comment
    * columns (TESTDATA.md), so the filter is dropped and every order counts.
    */
  val q13 = Declared(
    "q13_order_counts",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H q17 (adapted): small-quantity-order revenue — yearly revenue lost
    * if small orders of one brand's parts were no longer taken. The reference
    * correlates a scalar subquery (`0.2 * avg(l_quantity)` per part) against
    * the outer row; here the part filter broadcasts into the fact scan FIRST,
    * then the per-part average is a window over the already-pruned lineitem
    * subset — one shuffle on l_partkey, no second scan of the fact table.
    * Adaptation: `p_container = 'MED BOX'` has no fixture column; `p_size = 5`
    * keeps an equality dim filter of similar selectivity.
    */
  val q17 = Declared(
    "q17_small_qty_revenue",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val p = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_size") === 5)
        .select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_partkey"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .withColumn("avg_qty", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    },
    Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND p_size = 5
        AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)"""))

  /** TPC-H q19 (adapted): discounted revenue — an OR of three brand/size/
    * quantity bands. The classic q19 plan trick is applied: the HULL of the
    * disjunction (`p_size ≤ 15`, `l_quantity ≤ 30`, brand IN the three) is
    * pushed to each scan as a conjunctive pre-filter — those DO reach parquet
    * as PushedFilters — and only the exact three-way OR runs post-join.
    * Adaptation: the reference's p_container/l_shipmode/l_shipinstruct legs
    * have no fixture columns; brand × size × quantity keep the shape.
    */
  val q19 = Declared(
    "q19_banded_revenue",
    (s, dir) => {
      val brands = Seq("Brand#12", "Brand#23", "Brand#3")
      val p = t(s, dir, "part").filter(
        col("p_brand").isin(brands: _*) && col("p_size").between(1, 15))
      val l = t(s, dir, "lineitem").filter(col("l_quantity").between(1, 30))
      val band = (b: String, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === b && col("p_size").between(1, szHi) &&
          col("l_quantity").between(qLo, qHi)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(band("Brand#12", 5, 1, 11) || band("Brand#23", 10, 10, 20) ||
          band("Brand#3", 15, 20, 30))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    },
    Some("""SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND (
          (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))"""))

  /** TPC-H q9 (adapted): product-type profit by nation and year. The classic
    * widest-fact plan: part's name filter prunes the join tree first, the
    * supplier→nation lookup is a 25-row broadcast, and profit aggregates in
    * one pass grouped by (nation, year). Adaptations: no partsupp table in
    * the fixture, so `ps_supplycost` becomes a `p_retailprice × quantity`
    * cost proxy (identical join/agg shape minus one dim); the reference's
    * `p_name LIKE '%green%'` becomes `'%red%'` (a color the fixture names
    * actually contain).
    */
  val q9 = Declared(
    "q9_nation_profit",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_name").like("%red%"))
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(
          col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity")), 2).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT nation, o_year, round(sum(amount), 2) AS sum_profit FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
          l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%') profit
      GROUP BY nation, o_year ORDER BY nation, o_year DESC"""))

  /** TPC-H q12 (adapted): shipping-priority split — of the lines shipped in
    * one year, how many belonged to urgent/high-priority orders vs the rest.
    * One fact⋈orders join with the year filter pushed to the lineitem scan
    * and both counts from one conditional aggregate. Adaptations: the
    * fixture has no l_shipmode/l_commitdate/l_receiptdate, so the grouping
    * key is l_returnflag and the late-delivery predicate is dropped;
    * o_orderpriority drives the urgent/other split exactly as written.
    */
  val q12 = Declared(
    "q12_priority_shipping",
    (s, dir) => {
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      val l = t(s, dir, "lineitem").filter(
        col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp'1997-01-01 00:00:00'"))
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H q15: top supplier — the supplier(s) whose quarter revenue equals
    * the maximum. The per-supplier revenue fold happens FIRST (map-side
    * partial sums on l_suppkey), the scalar max of that small per-supplier
    * table broadcasts back over it (never a single-partition window), and
    * only the winner row(s) join to supplier. s_address/s_phone are not in
    * the fixture and are simply absent from the projection.
    */
  val q15 = Declared(
    "q15_top_supplier",
    (s, dir) => {
      // revenue is rounded AT the aggregate: the winner is selected by
      // equality between two independently executed evaluations of this
      // fold, and raw double sums can differ in the last bit across plan
      // branches (shuffle-merge order) — rounding first makes the equality
      // stable, and it is the precision the output contract states anyway
      // localCheckpoint: rev feeds BOTH the scalar max and the winner join,
      // and the two consumers' exchanges don't canonicalize equal (the max
      // branch normalizes the float key), so without it the quarter's
      // lineitem scan + fold runs twice — measured in the executed plan.
      // The materialized set is one row per supplier, negligible at any sf.
      val rev = t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("timestamp'1996-04-01 00:00:00'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_revenue"))
        .localCheckpoint()
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      val top = rev.join(broadcast(mx), rev("total_revenue") === mx("mx"))
      val su = t(s, dir, "supplier")
      su.join(broadcast(top), su("s_suppkey") === top("supplier_no"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier, revenue
      WHERE s_suppkey = supplier_no
        AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""))

  /** TPC-H q22 (adapted): global sales opportunity — well-funded customers
    * in selected country codes who have gone dormant. The plan shape is the
    * reference's exactly: a scalar average broadcast back over the filtered
    * customer scan, then a LEFT ANTI join against (date-filtered) orders on
    * o_custkey — never a correlated per-row probe. Adaptations: the fixture
    * has no c_phone, so the country code is `c_custkey % 7` (a deterministic
    * 7-way code with the same IN-list selectivity lever); every fixture
    * customer has ≥1 order, so "no orders at all" becomes the equivalent
    * dormancy predicate "no orders since 1999-01-01".
    */
  val q22 = Declared(
    "q22_global_sales",
    (s, dir) => {
      val cAll = t(s, dir, "customer")
        .select(
          (col("c_custkey") % 7).as("cntrycode"),
          col("c_custkey"), col("c_acctbal"))
      val codes = cAll.filter(col("cntrycode").isin(1, 2, 3))
      val avgBal = codes.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= expr("timestamp'1999-01-01 00:00:00'"))
        .select(col("o_custkey"))
      codes.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, codes("c_custkey") === recent("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(
          count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("cntrycode"))
    },
    Some("""SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        round(sum(c_acctbal), 2) AS totacctbal FROM (
        SELECT c_custkey % 7 AS cntrycode, c_acctbal FROM customer
        WHERE c_custkey % 7 IN (1, 2, 3)
          AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 2, 3))
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01')) custsale
      GROUP BY cntrycode ORDER BY cntrycode"""))

  /** TPC-H q4 (adapted): order-priority checking — how many orders in one
    * quarter had at least one late line, counted per priority. The EXISTS
    * is a LEFT SEMI join carrying the non-equi lateness predicate alongside
    * the orderkey equi-condition (the equi key still drives the shuffle; the
    * date comparison rides as a residual). Adaptation: the fixture has no
    * l_commitdate/l_receiptdate, so "late" is the equivalent dormancy-style
    * stand-in `l_shipdate > o_orderdate + 60 days` — same plan shape, same
    * semi-join cardinality behavior.
    */
  val q4 = Declared(
    "q4_priority_count",
    (s, dir) => {
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= expr("timestamp'1996-07-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp'1996-10-01 00:00:00'"))
      val l = t(s, dir, "lineitem")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H q21 (adapted): suppliers who kept waiting — lines late on
    * finished multi-supplier orders where NO other supplier on the order was
    * late. The reference SQL is the densest correlated shape in the suite
    * (an EXISTS plus a NOT EXISTS, both over lineitem); planned naively that
    * is THREE full fact scans and a semi + anti join pair. Spark-first, the
    * whole correlated pair collapses into ONE grouped pass over the fact
    * table: per order, count distinct suppliers, collect the distinct LATE
    * suppliers, and count late lines — an order qualifies exactly when it
    * has >1 supplier and its late-supplier set has size 1, and that lone
    * supplier's numwait contribution is the order's late-line count. One
    * lineitem scan, one shuffle on the order key (the plan pin asserts the
    * single scan); supplier/nation attach after the order-level fold has
    * already collapsed the fact table. Adaptation: lateness is
    * `l_shipdate > o_orderdate + 60 days` (no receipt/commit dates in the
    * fixture); SAUDI ARABIA becomes NATION_3.
    */
  val q21 = Declared(
    "q21_waiting_suppliers",
    (s, dir) => {
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation").filter(col("n_name") === "NATION_3")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val l = t(s, dir, "lineitem")
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
      // two stacked hash aggregates, both with map-side partial combine and
      // NO Expand (a countDistinct + collect_set single-agg would expand
      // every row): first fold lines to (order, supplier) late counts, then
      // fold suppliers to the per-order verdict — when exactly one supplier
      // is late, max(when(late, suppkey)) IS that supplier
      val perOrder = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(when(col("is_late"), 1L).otherwise(0L)).as("supp_late"))
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("n_supp"),
          sum(when(col("supp_late") > 0, 1L).otherwise(0L)).as("n_late_supp"),
          max(when(col("supp_late") > 0, col("l_suppkey"))).as("wait_sk"),
          sum(col("supp_late")).as("n_late_lines"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .select(col("wait_sk"), col("n_late_lines"))
      perOrder
        .join(su, col("wait_sk") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_late_lines")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""))

  // ——— the four partsupp queries (q2/q11/q16/q20), on a DERIVED partsupp ———
  // The fixture has no partsupp table, but lineitem carries (l_partkey,
  // l_suppkey): folding it yields the part-supplier relationship plus
  // shipped-quantity/unit-price proxies for ps_availqty/ps_supplycost.
  // One scan + one shuffle on the pair key builds the derived table inline;
  // at 100 TB that fold is exactly the partial-aggregate shape that scales
  // (and a production deployment would materialize it once, bucketed by
  // partkey). Semantics adapted where a proxy stands in are documented per
  // query; the JOIN/AGG/subquery plan shapes are the reference suite's.

  /** TPC-H q2 (adapted): minimum-cost supplier — for each qualifying part,
    * the European supplier(s) quoting the minimum cost. ps_supplycost is the
    * derived min unit price (l_extendedprice / l_quantity) per (part,
    * supplier); p_size ≤ 15 + p_type = 'LARGE' stand in for the original
    * size/type predicates (the fixture p_type is a single word, no '%BRASS'
    * suffix; no p_mfgr, so p_brand is projected instead). The correlated
    * min-cost subquery is planned Spark-first as a window min over
    * p_partkey on the eligible set — the eligible (part, supplier, cost)
    * rows are computed ONCE and the per-part floor derived in place, where
    * the SQL form re-evaluates the whole region join inside the subquery.
    * nation/region broadcast; supplier and the filtered part side are left
    * to AQE (broadcast at fixture scale, shuffle joins at 100 TB).
    */
  val q2 = Declared(
    "q2_min_cost_supplier",
    (s, dir) => {
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val su = t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      val p = t(s, dir, "part")
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
      val elig = ps
        .join(su, ps("ps_suppkey") === su("s_suppkey"))
        .join(p, ps("ps_partkey") === p("p_partkey"))
      val perPart = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
      elig
        .withColumn("mn", min(col("ps_supplycost")).over(perPart))
        .filter(col("ps_supplycost") === col("mn"))
        .select(
          col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"),
          round(col("ps_supplycost"), 2).as("min_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2),
      elig AS (
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
        FROM part, supplier, ps, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size <= 15 AND p_type = 'LARGE'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE')
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
             round(ps_supplycost, 2) AS min_cost
      FROM elig
      WHERE ps_supplycost = (SELECT min(e2.ps_supplycost) FROM elig e2
                             WHERE e2.p_partkey = elig.p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""))

  /** TPC-H q11 (adapted): important stock — parts whose value held by one
    * nation's suppliers exceeds a fraction of that nation's total. Value is
    * the derived cost × shipped-quantity proxy, computed in integer CENTS
    * (floor of the unit price × 100) so every sum is exact long arithmetic —
    * the original's double-sum HAVING threshold would be shuffle-order
    * nondeterministic across engines at the boundary. The scalar national
    * total broadcasts back over the per-part rollup (the q15 pattern), and
    * the fraction is 1/700 (scaled to fixture selectivity; TPC-H's
    * 0.0001/sf plays the same role).
    */
  val q11 = Declared(
    "q11_important_stock",
    (s, dir) => {
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(
          floor(min(col("l_extendedprice") / col("l_quantity")) * 100)
            .cast("long").as("cost_cents"),
          sum(col("l_quantity")).cast("long").as("availqty"))
      val n = t(s, dir, "nation").filter(col("n_name") === "NATION_7")
      val gsup = t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .select(col("s_suppkey"))
      val natps = ps
        .join(gsup, ps("ps_suppkey") === gsup("s_suppkey"))
        .select(col("ps_partkey"), (col("cost_cents") * col("availqty")).as("val_cents"))
      val total = natps.agg(sum(col("val_cents")).as("total"))
      natps
        .groupBy(col("ps_partkey"))
        .agg(sum(col("val_cents")).as("v"))
        .crossJoin(broadcast(total))
        .filter(col("v") * 700 > col("total"))
        .select(col("ps_partkey"), round(col("v") / 100.0, 2).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },
    Some("""WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          CAST(floor(min(l_extendedprice / l_quantity) * 100) AS BIGINT) AS cost_cents,
          CAST(sum(l_quantity) AS BIGINT) AS availqty
        FROM lineitem GROUP BY 1, 2),
      natps AS (
        SELECT ps_partkey, cost_cents * availqty AS val_cents
        FROM ps, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7')
      SELECT ps_partkey, round(sum(val_cents) / 100.0, 2) AS value
      FROM natps
      GROUP BY ps_partkey
      HAVING sum(val_cents) * 700 > (SELECT sum(val_cents) FROM natps)
      ORDER BY value DESC, ps_partkey"""))

  /** TPC-H q16 (adapted): parts/supplier relationship — how many distinct
    * suppliers can furnish parts of each qualifying (brand, type, size),
    * excluding flagged suppliers. The relationship IS the derived distinct
    * (l_partkey, l_suppkey) pair set; "customer complaints" (an o_comment
    * LIKE with no fixture column) becomes the equivalent exclusion
    * predicate s_acctbal < 0, applied as a broadcast LEFT ANTI join BEFORE
    * the part join so excluded suppliers never reach the wide side. The
    * final count(DISTINCT ps_suppkey) groups by part attributes — the
    * distinct-aggregate-after-anti-join shape nothing else in the suite
    * exercises.
    */
  val q16 = Declared(
    "q16_parts_suppliers",
    (s, dir) => {
      val pairs = t(s, dir, "lineitem")
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .distinct()
      val flagged = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
      val p = t(s, dir, "part").filter(
        col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      pairs
        .join(broadcast(flagged), pairs("ps_suppkey") === flagged("s_suppkey"), "left_anti")
        .join(p, col("ps_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""WITH ps AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
      SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      FROM ps, part
      WHERE p_partkey = ps_partkey
        AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H q20 (adapted): potential part promotion — named-nation suppliers
    * holding a concentrated recent position in selected parts. The original
    * compares ps_availqty against half the quantity shipped in one year;
    * with availqty itself derived from shipments, the equivalent
    * concentration predicate is "1997 shipments exceed half the pair's
    * all-time shipments". Both sums come from ONE grouped pass over
    * lineitem (a conditional sum inside the same aggregate — never two fact
    * scans), in exact long arithmetic. The part-name filter ('red%' — the
    * fixture's color vocabulary has no 'green') and the supplier lift are
    * LEFT SEMI joins, so nothing fans out.
    */
  val q20 = Declared(
    "q20_promotion_suppliers",
    (s, dir) => {
      val y97 = col("l_shipdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
        col("l_shipdate") < expr("timestamp'1998-01-01 00:00:00'")
      val shipped = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(col("l_quantity")).cast("long").as("qty_all"),
          sum(when(y97, col("l_quantity")).otherwise(0.0)).cast("long").as("qty_97"))
      val red = t(s, dir, "part")
        .filter(col("p_name").like("red%")).select(col("p_partkey"))
      val cand = shipped
        .filter(col("qty_97") * 2 > col("qty_all"))
        .join(broadcast(red), col("l_partkey") === red("p_partkey"), "left_semi")
        .select(col("l_suppkey")).distinct()
      val n = t(s, dir, "nation").filter(col("n_name") === "NATION_5")
      t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .join(cand, col("s_suppkey") === cand("l_suppkey"), "left_semi")
        .select(col("s_name"))
        .orderBy(col("s_name"))
    },
    Some("""WITH shipped AS (
        SELECT l_partkey, l_suppkey,
          CAST(sum(l_quantity) AS BIGINT) AS qty_all,
          CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                         AND l_shipdate < TIMESTAMP '1998-01-01'
                   THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_97
        FROM lineitem GROUP BY 1, 2)
      SELECT s_name FROM supplier, nation
      WHERE s_nationkey = n_nationkey AND n_name = 'NATION_5'
        AND s_suppkey IN (
          SELECT l_suppkey FROM shipped
          WHERE 2 * qty_97 > qty_all
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%'))
      ORDER BY s_name"""))

  val all: Seq[Declared] =
    Seq(q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15, q16,
      q17, q18, q19, q20, q21, q22)
}
