package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals.
  *
  * Spark 4 removed the public `Column(expr)` constructor; custom
  * Catalyst expressions need `classic.ExpressionUtils` to surface as
  * `Column`s, and custom logical plans need `classic.Dataset.ofRows`
  * to surface as `DataFrame`s. This object lives in an
  * `org.apache.spark.sql` subpackage purely to satisfy the access
  * modifier — it adds no behavior.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a (resolved) custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
