package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression converters (Spark 4 moved
  * the Expression-backed Column constructor behind the classic API). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → catalyst Expression conversion. `expression(c)` wraps
    * lazily and the wrapper retains the internal ColumnNode — fine inside a
    * normal Dataset call (the analyzer rewrites it), but a node that rides
    * a hand-built Project into task serialization is a
    * NotSerializableException. Convert up front instead. */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a hand-built logical plan as a DataFrame (single analysis pass).
    * Lets the Strategy compiler stack N leveled Projects and analyze the
    * whole tree ONCE instead of once per `withColumns` call — analyzer
    * rules that rescan the entire tree per invocation (DeduplicateRelations
    * alone was 0.4s over a 17-call build) collapse from O(levels²) to
    * O(levels) work. */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (child for plan stacking —
    * already-analyzed subtrees are skip-marked for the analyzer). */
  def analyzed(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
