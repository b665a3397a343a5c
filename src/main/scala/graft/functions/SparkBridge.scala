/* Bridge into Spark 4's private[sql] Column↔Expression converters —
 * the standard extension-library escape hatch (Spark 4 removed the
 * public Column(expr) constructor; sql.classic.ExpressionUtils is the
 * blessed internal path used by Spark's own connectors).
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Column → catalyst Expression via the full node converter —
    * unlike `ExpressionUtils.expression`, which wraps any
    * non-catalyst-backed node (e.g. `functions.coalesce`'s
    * UnresolvedFunction) in an Unevaluable ColumnNodeExpression leaf
    * that the analyzer never touches, the converter lowers every node
    * kind to a real (possibly unresolved) catalyst expression the
    * analyzer then resolves.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a named SQL function on a live session (the
    * FunctionRegistry is private[sql]).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression
  ): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
