package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared Euclidean distance of two double-array vectors as one native
  * Catalyst Expression with doGenCode — the inner loop of the hierarchical
  * quantizer's descent (dedup_semantic: 4 candidate cells × L levels per
  * vector; at 20M vectors that is ~720M evaluations per run).
  *
  * Semantics are IDENTICAL to the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, (acc,v) -> acc+v)`,
  * pinned by SqDistSpec): per-element (x−y)² accumulated left-to-right in
  * double (bit-identical — the DuckDB oracle mirrors this order), null
  * element or length mismatch → null (zip_with pads the shorter side with
  * null, which nulls the lambda and then the whole fold). The HOF version
  * allocates a zipped array per evaluation and is CodegenFallback; this is
  * a fused allocation-free loop inside WholeStageCodegen.
  */
case class SqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $d = $a.getDouble($i) - $b.getDouble($i);
            $acc += $d * $d;
          }
          if (!${ev.isNull}) {
            ${ev.value} = $acc;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** Column API. */
  def sq_dist(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SqDist(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
