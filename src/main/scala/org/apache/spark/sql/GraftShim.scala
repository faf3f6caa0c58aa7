package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for the three `private[sql]` touches graft needs from Spark
  * 4's classic module: building [[Column]]s from custom Catalyst
  * [[Expression]]s, reading them back, and turning a hand-built
  * [[LogicalPlan]] into a [[DataFrame]] (the pattern every library that
  * contributes a custom logical operator — Delta, Sedona, Iceberg —
  * carries). Kept to three one-liners so the unstable-API exposure
  * stays in one file. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
