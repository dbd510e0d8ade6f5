package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `compare` op: row-by-row, column-by-column, ORDER-SENSITIVE, position-based
  * (column names ignored) equality of two DataFrames, with optional float
  * epsilon (reference /root/reference/src/compare.rs:10-143).
  *
  * Documented deviations from the reference (SURVEY §2.A):
  *  - epsilon is |l-r| <= eps, not the reference's signed `(l-r) < eps`
  *    (compare.rs:36,40 always passes when l < r — a bug we don't replicate);
  *  - all Spark types are comparable (the reference `todo!()`-panics on
  *    anything beyond strings/ints/floats/dates, utils.rs:193-196).
  *
  * Scale: the reference collects both files into driver memory
  * (compare.rs:116-143). Here both sides are indexed with zipWithIndex and
  * cogrouped on the index — one shuffle per side, no driver materialization,
  * so it works at any size. Row order must be deterministic for the result to
  * be meaningful; pass pre-sorted inputs (Spark's parquet split order is not
  * file order — splits are scheduled by size).
  */
object Compare {

  /** One mismatch, or the overall summary via [[summarize]]. */
  private def valuesEqual(l: Any, r: Any, eps: Double): Boolean = (l, r) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (a: Float, b: Float)   => math.abs(a.toDouble - b.toDouble) <= eps
    case (a: Double, b: Double) => math.abs(a - b) <= eps
    case (a: Float, b: Double)  => math.abs(a.toDouble - b) <= eps
    case (a: Double, b: Float)  => math.abs(a - b.toDouble) <= eps
    case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
    case (a: Number, b: Number) if integral(a) && integral(b) =>
      a.longValue == b.longValue
    case (a, b) => a == b
  }

  private def integral(n: Number): Boolean = n match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
         _: java.lang.Long => true
    case _ => false
  }

  private def rowsEqual(l: Row, r: Row, eps: Double): Boolean =
    l.length == r.length &&
      (0 until l.length).forall(i => valuesEqual(l.get(i), r.get(i), eps))

  /** Distributed summary: rows on each side, number of differing positions,
    * index of the first difference. A missing row (length mismatch between
    * sides) counts as a diff at its index.
    */
  def summarize(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      epsilon: Double = 0.0): DataFrame = {

    val l = left.rdd.zipWithIndex().map(_.swap)
    val r = right.rdd.zipWithIndex().map(_.swap)

    val (nDiffs, firstDiff) = l.fullOuterJoin(r)
      .flatMap {
        case (i, (Some(lr), Some(rr))) =>
          if (rowsEqual(lr, rr, epsilon)) None else Some(i)
        case (i, _) => Some(i) // present on one side only
      }
      .aggregate((0L, Long.MaxValue))(
        (acc, i) => (acc._1 + 1, math.min(acc._2, i)),
        (a, b) => (a._1 + b._1, math.min(a._2, b._2)))

    val rowsLeft = left.count()
    val rowsRight = right.count()
    val first: Any = if (nDiffs == 0) null else firstDiff
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(rowsLeft, rowsRight, nDiffs, first, nDiffs == 0L && rowsLeft == rowsRight)), 1),
      StructType(Seq(
        StructField("rows_left", LongType, nullable = false),
        StructField("rows_right", LongType, nullable = false),
        StructField("n_diffs", LongType, nullable = false),
        StructField("first_diff_index", LongType, nullable = true),
        StructField("is_equal", BooleanType, nullable = false))))
  }

  /** File-level entry mirroring the reference CLI (CSV/Parquet only there;
    * we accept any supported format). `noHeaderRow` applies to CSV inputs.
    */
  def compareFiles(
      spark: SparkSession,
      path1: String,
      path2: String,
      epsilon: Double = 0.0,
      noHeaderRow: Boolean = false): DataFrame = {
    def read(p: String): DataFrame =
      if (noHeaderRow && p.toLowerCase.endsWith(".csv"))
        graft.sources.Formats.readCsvNoHeader(spark, p)
      else graft.sources.Formats.read(spark, p)
    summarize(spark, read(path1), read(path2), epsilon)
  }
}
