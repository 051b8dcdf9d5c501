package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to the `private[sql]` Column <-> Expression
 * converters. Graft expressions that carry non-SQL-expressible model
 * state (e.g. [[graft.functions.NearestCentroidsExpr]]'s centroid
 * matrix) cannot resolve through the FunctionRegistry, so their Column
 * wrappers are built directly from the catalyst expression. Lives in
 * the Spark namespace solely for access — the standard pattern for
 * Spark extension libraries.
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
