package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key: bit-interleaves n non-negative integer
  * columns into one sort key. Sorting / range-partitioning a table by this
  * key before writing clusters rows so that EVERY interleaved dimension has
  * narrow min/max ranges per file — parquet row-group stats then prune scans
  * filtered on ANY of the dimensions, not just the leading sort column. This
  * is the standard multi-dimensional layout lever at 100 TB (the reference
  * has no layout ops at all — its tables are single files; extension).
  *
  * Pure bit arithmetic over built-ins (shiftright / bitwise AND / shiftleft /
  * sum), so the whole key stays inside whole-stage codegen and is expressible
  * identically in any ANSI engine (see [[zOrderSql]] for the DuckDB mirror).
  *
  * Inputs must already be bucketized to `bits` bits (e.g. `pmod(x, 256)` for
  * 8) — the caller picks the quantization; the key packs
  * `cols.size * bits` bits into a non-negative long (≤ 62 bits total).
  */
object ZOrder {

  def zKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && cols.size * bits <= 62,
      s"z-key needs 1..62 total bits, got ${cols.size} cols x $bits")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** DuckDB-dialect SQL for the same key (same bit layout, same result). */
  def zOrderSql(colExprs: Seq[String], bits: Int): String = {
    val n = colExprs.size
    val terms = for {
      (c, j) <- colExprs.zipWithIndex
      i <- 0 until bits
    } yield s"(((($c) >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " + ", ")")
  }
}
