package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal private[sql]-access bridge (the standard pattern for Spark
  * ecosystem libraries shipping custom Catalyst expressions): converts
  * between the public Column API and catalyst Expressions. Nothing else
  * from Spark internals is accessed anywhere in this codebase. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
