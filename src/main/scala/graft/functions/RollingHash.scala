package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash h_{i+1} = (31*h_i + byte_i) mod 1e9+7 over a
  * string's UTF-8 bytes — the document-fingerprinting primitive (content
  * shard keys, incremental chunk hashing).
  *
  * Implemented as a native Catalyst Expression WITH doGenCode (preference
  * order (b) from the build brief: a codegen'd Expression beats a Scala UDF):
  * the generated code is a tight per-row byte loop that participates in
  * WholeStageCodegen — no boxing, no Row materialization, vectorizable scan
  * on top.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = ($h * 31L + ($bytes[$i] & 0xFFL)) % 1000000007L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  val Mod = 1000000007L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xFFL)) % Mod
      i += 1
    }
    h
  }

  /** Column API (ExpressionUtils bridges catalyst Expressions to the
    * connect-compatible Column in Spark 4).
    */
  def rolling_hash(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c)))

  /** SQL registration: `SELECT rolling_hash(text) FROM ...`. Delegates to
    * the single registration point ([[graft.GraftExtensions.register]]) so
    * the kernel can't end up registered two different ways on one session.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftExtensions.register(spark)
}
