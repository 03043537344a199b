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

  /** `AbstractDataType` is `private[sql]` in Spark 4's sql-api, but it is
    * the declared element type of `ExpectsInputTypes.inputTypes` — any
    * library expression wanting analyzer-inserted casts must name it.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** DataFrame from a (resolved) logical plan — the `Dataset.ofRows` hook a
    * library needs to expose a custom LogicalPlan node through the public
    * DataFrame API.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
