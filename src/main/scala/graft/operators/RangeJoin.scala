package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows with a point column joined to right rows
  * with [start, end] interval columns, on an equi key plus containment.
  *
  * Spark's planner turns a raw `BETWEEN` join condition into a nested-loop /
  * cartesian per key group — quadratic in hot keys. The scalable strategy is
  * BINNING: quantize time into fixed bins, explode each interval into the
  * bins it covers, bin the point side, equi-join on (key, bin), then apply
  * the exact containment as a residual filter. Every step is a hash
  * shuffle; the blow-up factor is interval_length / bin_size (choose the
  * bin near the median interval length).
  */
object RangeJoin {

  /** @param leftPoint  left timestamp/numeric point column (seconds granularity)
    * @param rightStart/rightEnd right interval bounds (inclusive)
    * @param binSeconds bin width for the equi-join key
    */
  def binned(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftPoint: String,
      rightStart: String,
      rightEnd: String,
      binSeconds: Long): DataFrame = {

    def toBin(c: org.apache.spark.sql.Column) =
      floor(c.cast("timestamp").cast("double") / binSeconds).cast("long")

    val l = left.withColumn("__bin", toBin(col(leftPoint)))

    // one row per bin the interval covers
    val r = right
      .withColumn("__bin", explode(sequence(
        toBin(col(rightStart)), toBin(col(rightEnd)))))

    l.join(r, Seq(key, "__bin"))
      .filter(
        col(leftPoint) >= col(rightStart) &&
          col(leftPoint) <= col(rightEnd))
      .drop("__bin")
  }
}
