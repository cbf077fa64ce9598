package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` seams a Spark library needs to add a custom
  * operator with a public-API surface (the standard extension pattern
  * used by Spark connector/extension libraries — a bridge object inside
  * the `org.apache.spark.sql` namespace):
  *
  *  - build a DataFrame from a custom [[LogicalPlan]] node;
  *  - get the Catalyst [[Expression]] behind a [[Column]] (Spark 4
  *    removed the public `Column.expr`).
  *
  * Nothing else in the codebase reaches into Spark internals — all
  * custom expressions/strategies use supported extension points.
  */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Total ordering over a data type's CATALYST-internal values —
    * what Spark's own comparison operators use (TypeUtils is
    * `private[sql]`). Needed by the zone-map pruning rule to compare
    * catalog min/max against filter literals for any atomic type. */
  def interpretedOrdering(dt: org.apache.spark.sql.types.DataType): Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
      .asInstanceOf[Ordering[Any]]
}
