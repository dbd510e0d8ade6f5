package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Misra–Gries heavy-hitters summary as a mergeable sketch aggregate — the
  * bounded-state answer to "top terms over a stream too big to count
  * exactly". The buffer is AT MOST k counters no matter how many distinct
  * items flow through: a hit increments, a miss with spare room inserts,
  * and a miss at capacity decrements EVERY counter (dropping zeros) — the
  * classic frequent-items algorithm (Misra & Gries 1982).
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS'12): sum counters of the union, then subtract the (k+1)-th largest
  * count from all and keep the positive ones — at most k survive and the
  * summed error stays bounded. The resulting guarantees, both pinned by
  * HeavyHittersSpec and the corpus_heavy_hitters oracle:
  *   - counter(x) ≤ freq(x)           (never overestimates), and
  *   - counter(x) ≥ freq(x) − n/(k+1) (undercount bounded by stream length),
  * so every item with freq > n/(k+1) is GUARANTEED present in the summary.
  *
  * Scale shape: exactly the HLL/KLL/MinHash sketch-aggregate pattern —
  * map-side partial summaries of ≤ k entries per partition, one tiny merge
  * at the reducer; the shuffle carries O(k) bytes per group regardless of
  * corpus size. The exact wordcount it approximates shuffles one row per
  * distinct term.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1L
        case None if buf.size < k => buf(s) = 1L
        case None =>
          // miss at capacity: the whole summary decays by one (O(k), and k
          // is a constant like 32 — this is the price of bounded state)
          val keys = buf.keysIterator.toArray
          var i = 0
          while (i < keys.length) {
            val c = buf(keys(i)) - 1L
            if (c <= 0L) buf.remove(keys(i)) else buf(keys(i)) = c
            i += 1
          }
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) => b1(s) = b1.getOrElse(s, 0L) + c }
    if (b1.size > k) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - 1 - k) // (k+1)-th largest
      val keys = b1.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val c = b1(keys(i)) - sub
        if (c <= 0L) b1.remove(keys(i)) else b1(keys(i)) = c
        i += 1
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic order: count desc, then term — so the summary is a
    // stable value even though HashMap iteration is not
    val rows = buf.toSeq.sortBy { case (s, c) => (-c, s) }.map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toSeq.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.size)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m(new String(b, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = c(0))
}

object HeavyHittersAgg {
  /** Column API: summarize a string column into ≤ k (term, cnt) candidates. */
  def heavy_hitters(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      HeavyHittersAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
