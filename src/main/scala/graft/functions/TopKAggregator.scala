package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** User-facing typed aggregate (the `Aggregator[IN, BUF, OUT]` form): keep
  * the top-k (score, id) pairs per group, return ids best-first.
  *
  * The buffer is bounded at k elements through both reduce and merge, so the
  * shuffle carries at most k pairs per (group × partition) — the aggregate
  * analog of TakeOrderedAndProject, and the right shape for "top-k per key"
  * at any scale (vs. collect_list + sort, whose buffer is unbounded).
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    trim((in._2, in._1) +: buf)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
