package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column⇄Expression converters — the
  * supported seam for registering custom Catalyst expressions from a
  * library in Spark 4 (the Column constructor moved behind the Spark
  * Connect split). Only used by graft.functions. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
