package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** MinHash signature as ONE custom aggregate (SURVEY §7.4's candidate for a
  * `TypedImperativeAggregate` sketch): buffer = K running minima of the
  * 2-universal family (h1 + k*h2) mod p, merged elementwise — the same math
  * as K separate `min()` columns but with a single mutable long-array buffer
  * per group instead of K aggregate states, and one array output.
  *
  * The mod-p (p = 2^31 - 1, Mersenne prime) is NOT optional: without the
  * wrap, one shingle with small h1 AND small h2 wins the min for EVERY k —
  * the K minima become the arithmetic sequence h1* + k·h2* and any two docs
  * sharing that shingle collide on all LSH bands regardless of similarity
  * (observed: 361k spurious candidate pairs on 5k unrelated docs). The
  * wrap re-permutes the ordering per k, restoring independent minima.
  *
  * This is the sketch-aggregate pattern (HLL / KLL / MinHash all share it):
  * partial aggregation still happens map-side, the shuffle carries one
  * serialized buffer per (group × partition).
  */
case class MinHashSignatureAgg(
    h1: Expression,
    h2: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      val av = a.asInstanceOf[Long]
      val bv = b.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val v = (av + i * bv) % MinHashSignatureAgg.P
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSignatureAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSignatureAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSignatureAgg =
    copy(h1 = c(0), h2 = c(1))
}

object MinHashSignatureAgg {
  /** Modulus for the hash family — Mersenne prime 2^31 - 1 (see class doc). */
  val P: Long = 2147483647L

  /** Column API: aggregate two base-hash columns into a K-long signature. */
  def minhash_signature(h1: Column, h2: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSignatureAgg(
        GraftColumnBridge.expression(h1),
        GraftColumnBridge.expression(h2), k).toAggregateExpression())
}
