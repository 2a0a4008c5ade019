package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]`, so the graft Column API reaches it through this shim —
  * the established pattern for Spark-native libraries that expose custom
  * Catalyst expressions on the public Column surface. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ScalaUDF construction from a UserDefinedFunction + resolved
    * children — what a FunctionRegistry builder must return (a lazy Column
    * node would reach codegen unresolved). */
  def scalaUDF(f: org.apache.spark.sql.expressions.UserDefinedFunction,
      children: Seq[Expression]): Expression =
    org.apache.spark.sql.classic.UserDefinedFunctionUtils.toScalaUDF(
      f.asInstanceOf[org.apache.spark.sql.expressions.SparkUserDefinedFunction], children)

  /** Eager aggregate construction from a `udaf(...)`-wrapped Aggregator +
    * resolved children — the UDAF analog of [[scalaUDF]] for
    * FunctionRegistry builders. */
  def scalaUDAF(f: org.apache.spark.sql.expressions.UserDefinedFunction,
      children: Seq[Expression]): Expression =
    org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      f.asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[Any, Any, Any]],
      children).toAggregateExpression(isDistinct = false)
}
