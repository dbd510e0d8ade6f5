package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the private[sql] session function registry: lets the library
  * register its native Catalyst expressions as SQL functions on a session it
  * did NOT build (when `spark.sql.extensions` injection is no longer
  * possible). Same narrow-shim rationale as [[GraftColumnBridge]].
  */
object GraftFunctionBridge {
  def register(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Drive a SparkSessionExtensions' collected function injections into a
    * registry — the exact step session construction performs; lets a test
    * exercise the `spark.sql.extensions` path without building a session.
    */
  def applyExtensions(
      ext: SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}
