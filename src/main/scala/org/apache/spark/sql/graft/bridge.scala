package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for the graft engine's custom
  * expressions. Spark 4 made these converters `private[sql]` (the Column
  * API is Connect-agnostic now), so third-party native expressions reach
  * them from inside the sql package tree — the standard pattern for
  * Catalyst extension libraries on Spark 4.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
