package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for library code to wrap custom Catalyst expressions into
  * `Column`s: the Spark 4 converters (`classic.ExpressionUtils`) are
  * `private[sql]`, so this one-file shim re-exports them from inside
  * the package — the standard extension-point pattern for libraries
  * that ship their own expressions without a full
  * SparkSessionExtensions registration. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
