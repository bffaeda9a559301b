package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column<->Expression converters —
  * the only Spark-internal access the engine needs outside the documented
  * Catalyst extension points. */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column -> Expression: converts the whole ColumnNode tree into
    * concrete Catalyst expressions up front.  `expression` above wraps
    * lazily in a ColumnNodeExpression, which only Dataset API paths
    * unwrap — a FunctionRegistry builder must return an eager tree or
    * codegen hits the Unevaluable wrapper. */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register an Expression-builder SQL function on a live session —
    * the runtime twin of `SparkSessionExtensions.injectFunction` (which
    * only applies at session build). */
  def registerFunction(spark: SparkSession,
                       ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
