package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Expression <-> Column converters,
  * needed to expose graft's custom Catalyst expressions as `Column`s on
  * Spark 4 (where `Column` wraps a ColumnNode, not an Expression). Same
  * shim pattern public Spark extension libraries use for package-private
  * factories (cf. SNIPPETS.md [3]).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def functionRegistry(spark: SparkSession): catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental
  /** The session's stable UUID (`private[sql]` on classic.SparkSession)
    * — graft.Tables keys its relation memo by it precisely because a
    * String cannot pin the session the way a session-keyed map would. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
