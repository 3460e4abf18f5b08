package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Spark 4 removed the public `Column(Expression)` constructor; the supported
  * bridges live in `classic` and are private[sql], so this shim re-exports
  * the two conversions graft's native expressions need.
  *
  * Note: `expression` uses the eager ColumnNodeToExpressionConverter — the
  * lazy `ExpressionUtils.expression` wrapper stays Unevaluable if it never
  * passes through Dataset analysis (e.g. when embedded as a child of a
  * custom Expression). */
object Interop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)
  /** `AbstractDataType` is private[sql]; re-export the alias so graft
    * expressions outside the spark namespace can declare `inputTypes`
    * (ExpectsInputTypes) — r19 ADVICE #1. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
