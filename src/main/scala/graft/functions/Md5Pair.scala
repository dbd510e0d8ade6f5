package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The two unsigned 32-bit halves of an md5 digest as `array<bigint>[h1, h2]`
  * — the portable MinHash base-hash pair ([[Hashing.minhashBasePortable]]).
  *
  * Value-identical to `conv(substring(md5(x), 1, 8), 16, 10)` /
  * `(…, 9, 8)` (the digest's first 8 hex chars ARE its first 4 bytes
  * big-endian), but skips the hex-string round-trip entirely: Spark's `conv`
  * goes through NumberConverter's per-char string arithmetic and measured
  * ~4× the cost of the md5 itself on the shingle fixture. Here the digest
  * bytes are packed straight into two longs inside WholeStageCodegen; the
  * DuckDB oracle side keeps the hex formulation ([[Hashing.md5Hash32DuckSql]])
  * and Md5PairSpec pins bit-equality between the two.
  */
case class Md5Pair(child: Expression) extends UnaryExpression {

  // checked input type: a non-string child becomes a clean AnalysisException
  // instead of a mid-job ClassCastException / codegen compile failure
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // must match the SQL registration name (GraftExtensions) — errors and
  // EXPLAIN output should name the function a SQL user can actually call
  override def prettyName: String = "md5_pair"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Md5Pair.pairOf(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          graft.functions.Md5Pair.pairOf($c.getBytes()));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Pair =
    copy(child = newChild)
}

object Md5Pair {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** [h1, h2]: digest bytes 0-3 and 4-7 as unsigned big-endian ints. */
  def pairOf(bytes: Array[Byte]): Array[Long] = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    Array(
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL),
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) | ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL))
  }

  def md5_pair(c: Column): Column =
    GraftColumnBridge.column(Md5Pair(GraftColumnBridge.expression(c)))
}
