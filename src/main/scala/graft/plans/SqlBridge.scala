// Package-injected bridge: Column ⇄ Expression conversion lives behind
// private[sql] in Spark 4 (classic.ExpressionUtils), and custom-expression
// libraries conventionally expose it through a shim in the sql package.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → Expression: the ExpressionUtils form above wraps the
    * column in a lazy ColumnNodeExpression placeholder, which only the
    * Dataset API path converts; inside a FunctionRegistry builder the
    * placeholder survives analysis un-converted and dies in codegen
    * (Unevaluable). SQL-function builders must convert eagerly.
    */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over a custom logical node (Dataset.ofRows is private[sql]). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a live session (the
    * non-extensions path; GraftExtensions covers config-time install).
    */
  def addStrategy(spark: SparkSession,
                  s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s)) {
      exp.extraStrategies = exp.extraStrategies :+ s
    }
  }
}
