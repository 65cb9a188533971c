package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals.
  *
  * Spark 4 removed the public `Column(expr)` constructor; custom
  * Catalyst expressions need `classic.ExpressionUtils` to surface as
  * `Column`s. This object lives in an `org.apache.spark.sql`
  * subpackage purely to satisfy the access modifier — it adds no
  * behavior.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
