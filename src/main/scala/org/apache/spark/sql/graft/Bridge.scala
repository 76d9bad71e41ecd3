package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 moved the Column(expr) constructor behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); libraries that build
  * Catalyst expressions directly (our StaticInvoke-based generator
  * expressions) use a same-package accessor — the established pattern for
  * Spark extensions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
