package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters (Spark 4 moved
  * Column to the connect-compatible API; classic.ExpressionUtils is the
  * supported conversion point for extension libraries shipping native
  * Catalyst Expressions).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
