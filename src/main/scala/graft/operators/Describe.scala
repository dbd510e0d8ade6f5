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
    // source columns are addressed with backtick quoting (doubled-backtick
    // escape) and intermediate aliases are INDEX-derived, so a column named
    // `a.b`, `a b` or `a-b` never reaches the parser as a bare identifier
    val src = cols.map(c => col(s"`${c.replace("`", "``")}`"))
    def aggsFor(c: Column, i: Int): Seq[Column] = Seq(
      count(c).as(s"c${i}__n"),
      (count(lit(1)) - count(c)).as(s"c${i}__nulls"),
      round(avg(c), 6).as(s"c${i}__mean"),
      round(stddev_samp(c), 6).as(s"c${i}__std"),
      round(min(c).cast("double"), 6).as(s"c${i}__min"),
      round(max(c).cast("double"), 6).as(s"c${i}__max"))
    val aggs = src.zipWithIndex.flatMap { case (c, i) => aggsFor(c, i) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one row per column via explode(array(struct...)) — the Column-API
    // equivalent of stack(), with the column NAME as a literal, never SQL
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"c${i}__n").as("n"), col(s"c${i}__nulls").as("n_null"),
        col(s"c${i}__mean").as("mean"), col(s"c${i}__std").as("std"),
        col(s"c${i}__min").as("vmin"), col(s"c${i}__max").as("vmax"))
    }
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
  }
}
