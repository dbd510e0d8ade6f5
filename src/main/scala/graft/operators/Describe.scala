package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column summary statistics (count / nulls / mean / stddev / min / max)
  * for numeric columns — the `view`-adjacent profiling step a data tool runs
  * before anything else (the reference's closest feature is the per-column
  * min/max in view-parquet-meta, /root/reference/src/parquet.rs:83-123,
  * which only covers what the footer already stores).
  *
  * Shape matters at scale: ALL columns' aggregates are computed in ONE
  * partial-aggregate pass over the table (a single 1-row global aggregate —
  * no shuffle of data rows, map-side combine does the work), then the single
  * row is exploded into one row per column with `stack`. The naive
  * per-column `df.describe` loop would be N full scans.
  */
object Describe {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    def aggsFor(c: String): Seq[Column] = Seq(
      count(col(c)).as(s"${c}__n"),
      (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
      round(avg(col(c)), 6).as(s"${c}__mean"),
      round(stddev_samp(col(c)), 6).as(s"${c}__std"),
      round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
      round(max(col(c)).cast("double"), 6).as(s"${c}__max"))
    val aggs = cols.flatMap(aggsFor)
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__mean, ${c}__std, ${c}__min, ${c}__max"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n, n_null, mean, std, vmin, vmax)"))
  }
}
