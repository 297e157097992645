// Package-injected bridge: Column ⇄ Expression conversion lives behind
// private[sql] in Spark 4 (classic.ExpressionUtils), and custom-expression
// libraries conventionally expose it through a shim in the sql package.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
