package graft.queries

import graft.{Declared, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY §2.B "window functions"). All orderings
  * include a unique key so ranks/frames are deterministic; partitions are
  * per-customer/per-status so state stays bounded per task at any scale.
  */
object Windows {
  import Tables.t

  private def byCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  /** row_number / rank / dense_rank; keep top-3 orders per customer. */
  val ranks = Declared(
    "q_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("rk"), col("drk"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn,
      CAST(rk AS INTEGER) AS rk, CAST(drk AS INTEGER) AS drk FROM (
      SELECT o_custkey, o_orderkey,
        row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC)
      ) WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  val lagLead = Declared(
    "q_window_lag",
    (s, dir) =>
      t(s, dir, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(byCust))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(byCust))
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(col("prev_price"), 2).as("prev_price"),
          round(col("o_totalprice") - coalesce(col("prev_price"), lit(0.0)), 2).as("delta"),
          round(col("next_price"), 2).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey")),
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS price,
      round(prev_price,2) AS prev_price,
      round(o_totalprice - coalesce(prev_price, 0.0),2) AS delta,
      round(next_price,2) AS next_price FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ) ORDER BY o_custkey, o_orderkey"""))

  /** Running aggregate: ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW. */
  val running = Declared(
    "q_window_running",
    (s, dir) => {
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_total"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      round(sum(o_totalprice) OVER w, 2) AS running_total,
      count(*) OVER w AS running_n
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  /** Value-based RANGE frame (orders within a 10k price band below each row).
    * Frame membership is defined by value, so it's tie-insensitive.
    */
  val rangeFrame = Declared(
    "q_window_range",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("price"),
          expr("""count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
            RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)""").as("n_in_band"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_orderstatus, round(o_totalprice,2) AS price,
      count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_in_band
      FROM orders ORDER BY o_orderkey"""))

  /** ntile / percent_rank / cume_dist — partitioned (a global unpartitioned
    * window would single-task all data; per-key windows scale).
    */
  val ntileDist = Declared(
    "q_window_ntile",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_orderstatus, CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      round(percent_rank() OVER w, 6) AS pct_rank,
      round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""))

  /** first/last/nth over an explicit full-partition frame. */
  val nth = Declared(
    "q_window_nth",
    (s, dir) => {
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      first_value(o_orderkey) OVER w AS first_key,
      last_value(o_orderkey) OVER w AS last_key,
      nth_value(o_orderkey, 2) OVER w AS second_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""))

  /** Bounded sliding frame: trailing 4-row moving average / min / max —
    * the moving-window smoothing shape (ROWS BETWEEN 3 PRECEDING AND
    * CURRENT ROW). Bounded frames evict as they slide, so state per
    * partition is O(frame), not O(rows).
    */
  val moving = Declared(
    "q_window_moving",
    (s, dir) => {
      val w = byCust.rowsBetween(-3, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(avg(col("o_totalprice")).over(w), 4).as("ma4"),
          round(min(col("o_totalprice")).over(w), 2).as("min4"),
          round(max(col("o_totalprice")).over(w), 2).as("max4"),
          count(lit(1)).over(w).as("n4"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      round(avg(o_totalprice) OVER w, 4) AS ma4,
      round(min(o_totalprice) OVER w, 2) AS min4,
      round(max(o_totalprice) OVER w, 2) AS max4,
      count(*) OVER w AS n4
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""))

  val all: Seq[Declared] =
    Seq(ranks, lagLead, running, rangeFrame, ntileDist, nth, moving)
}
