package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Sign-LSH bucket id of a float vector against a fixed hyperplane matrix:
  * bit j = 1 iff dot(v, planes(j)) > 0 — as ONE native codegen Expression.
  *
  * The HOF formulation evaluates one zip_with→aggregate chain PER PLANE per
  * row (the banded pair query runs 24 of them); this is a single fused
  * loop with the plane matrix attached as a codegen reference object.
  * Semantics are identical to the HOF version (pinned by spec): elements
  * widen to double, accumulation left-to-right, and a plane contributes 0
  * unless the vector length matches the plane and has no null elements
  * (what zip_with's null-padding + `when(dot > 0)` `otherwise(0)` produced).
  */
case class SignLshBucket(child: Expression, planes: Seq[Seq[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sign_lsh_bucket"

  @transient private lazy val planeMatrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0
    var j = 0
    while (j < planeMatrix.length) {
      val p = planeMatrix(j)
      if (n == p.length) {
        var dot = 0.0
        var anyNull = false
        var i = 0
        while (i < n && !anyNull) {
          if (v.isNullAt(i)) anyNull = true
          else dot += v.getFloat(i).toDouble * p(i)
          i += 1
        }
        if (!anyNull && dot > 0.0) bucket |= 1 << j
      }
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planeMatrix, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      s"""
        int $n = $v.numElements();
        int $bucket = 0;
        for (int $j = 0; $j < $mat.length; $j++) {
          double[] $p = $mat[$j];
          if ($n == $p.length) {
            double $dot = 0.0;
            boolean $anyNull = false;
            for (int $i = 0; $i < $n && !$anyNull; $i++) {
              if ($v.isNullAt($i)) { $anyNull = true; }
              else { $dot += ((double) $v.getFloat($i)) * $p[$i]; }
            }
            if (!$anyNull && $dot > 0.0) { $bucket |= 1 << $j; }
          }
        }
        ${ev.value} = $bucket;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object SignLshBucket {
  /** Column API. */
  def sign_lsh_bucket(v: Column, planes: Seq[Array[Double]]): Column =
    GraftColumnBridge.column(
      SignLshBucket(GraftColumnBridge.expression(v), planes.map(_.toSeq)))
}
