package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, ExperimentalMethods, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkPlan

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Column wraps a ColumnNode since the Connect
  * unification), so extension libraries expose them from inside the
  * `org.apache.spark.sql` namespace — the documented pattern for classic
  * Catalyst extensions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (classic `Dataset.ofRows` is
    * `private[sql]`). The cast is safe: this library only runs on classic
    * (non-Connect) sessions. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** The executed physical plan (for plan-shape assertions in specs). */
  def executedPlan(df: DataFrame): SparkPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan

  /** Per-session experimental hooks (extra strategies / optimizations). */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental
}
