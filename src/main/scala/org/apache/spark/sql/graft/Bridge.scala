package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a custom LogicalPlan needs: turning a
  * plan node back into a DataFrame (`Dataset.ofRows`) has no public
  * equivalent, so extension libraries place a single bridge object
  * under `org.apache.spark.sql` — the standard pattern for
  * SparkSessionExtensions-based operators. Everything else in graft
  * stays on public API; keep this file to exactly this. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
