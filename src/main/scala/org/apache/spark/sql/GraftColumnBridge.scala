package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column and LogicalPlan ↔ DataFrame conversion for graft's
  * native expressions and plans.
  *
  * Spark 4 made these helpers `private[sql]`, so the one sanctioned way for
  * an extension library to wrap a custom Catalyst Expression into a Column
  * (or a custom LogicalPlan into a DataFrame) is a bridge object living in
  * the `org.apache.spark.sql` package — the same pattern established Spark
  * extension libraries use. Nothing else in graft reaches into Spark
  * internals.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) LogicalPlan into a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A DataFrame's analyzed plan (resolved attributes for plan builders). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
