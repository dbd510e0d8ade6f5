package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the right
  * row with the greatest `rightTs <= leftTs` for the same key (inclusive).
  *
  * Spark has no built-in as-of join; per the preference order we COMPOSE
  * built-ins rather than write a custom SparkStrategy: tag both sides, union,
  * and take `last(payload) ignoreNulls` over a per-key time-ordered running
  * window. This is a single shuffle on (key) + one sort — the same cost
  * profile as a sort-merge join, so it scales to arbitrarily large sides
  * (no broadcast, no nested loop). Skewed keys salt like any window op.
  *
  * Right-side rows sort BEFORE left rows at equal timestamps, which yields
  * the inclusive (>=) semantics of e.g. DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** Forward as-of: earliest right row with `rightTs >= leftTs` (inclusive).
    * Same machinery as [[backward]] with time reversed via negated sort.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    // negate the time axis (epoch micros) and reuse the backward scan
    def flip(df: DataFrame, ts: String): DataFrame =
      df.withColumn("__negts", -col(ts).cast("timestamp").cast("double"))
    val out = backward(flip(left, leftTs), flip(right, rightTs),
      key, "__negts", "__negts", payload)
    out.drop("__negts")
  }

  /** Backward as-of with a max-staleness tolerance: matches older than
    * `toleranceSeconds` before the left timestamp are nulled out.
    */
  def backwardTolerance(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSeconds: Double): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val withTs = backward(left, right.withColumnRenamed(rightTs, "__rts")
      .withColumn(rightTs, col("__rts")), key, leftTs, rightTs, payload :+ "__rts")
    val fresh = col("__rts").isNotNull &&
      (col(leftTs).cast("timestamp").cast("double") -
        col("__rts").cast("timestamp").cast("double")) <= toleranceSeconds
    payload.foldLeft(withTs) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }.drop("__rts")
  }

  /** @param payload right-side columns to carry (aliased as-is onto output) */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!payload.contains(key), "payload must not repeat the key")

    // Common layout: key, __ts, __side (0 = right so it sorts first on ties),
    // left columns (null on right rows), payload columns (null on left rows).
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(
        Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)

    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(
        Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = taggedLeft.unionByName(taggedRight)
      .select(
        (Seq(col("__key"), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c))): _*)

    joined
      .filter(col("__side") === 1)
      .select(
        (Seq(col("__key").as(key)) ++
          leftCols.filterNot(_ == key).map(c => col(c)) ++
          payload.map(c => col(c))): _*)
  }
}
