package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column conversion for graft's native expressions.
  *
  * Spark 4 made these helpers `private[sql]`, so the one sanctioned way for
  * an extension library to wrap a custom Catalyst Expression into a Column
  * is a bridge object living in the `org.apache.spark.sql` package — the
  * same pattern established Spark extension libraries use. Nothing else in
  * graft reaches into Spark internals.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
