package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(Expression)` constructor; the supported
  * bridge (`classic.ExpressionUtils`) is private[sql], so this shim re-exports
  * the two conversions the graft function registry needs. */
object Interop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
