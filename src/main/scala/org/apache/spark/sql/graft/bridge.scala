package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression converters. Spark scopes these `private[sql]`, so
  * this one-file bridge lives in the sql package tree solely to lift the
  * restriction — the standard pattern for libraries that ship native
  * Catalyst expressions (the engine charter's preferred extension point
  * over UDFs). No Spark internals are modified. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a hand-built `LogicalPlan` (e.g. a custom operator node) as a
    * DataFrame — `Dataset.ofRows` is `private[sql]`, same story as above. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
