package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for `private[sql]` conversion helpers — the standard idiom
  * for libraries that define custom Catalyst expressions against Spark 4's
  * classic API (Column ↔ Expression conversions live in
  * org.apache.spark.sql.classic.ExpressionUtils).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
