package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one place graft touches Spark's `private[sql]` surface: turning a
  * hand-built [[LogicalPlan]] back into a [[DataFrame]]. Spark exposes no
  * public constructor for this — `Dataset.ofRows` is `private[sql]` — so
  * every library that contributes a custom logical operator (the pattern
  * Delta, Sedona, and Iceberg all use) carries exactly this shim, placed
  * in a subpackage of `org.apache.spark.sql` to satisfy the qualifier.
  * Kept to a single method so the unstable-API exposure is one line.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
