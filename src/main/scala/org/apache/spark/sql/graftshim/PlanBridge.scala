package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal bridge to the two `private[sql]` seams a whole-operator
  * Catalyst extension needs: turning a custom LogicalPlan into a
  * DataFrame, and extracting a frame's analyzed plan to use as a child.
  * Lives under `org.apache.spark.sql` so the qualified-private access is
  * legal — the same pattern public Spark extensions (Delta, Qbeast,
  * Iceberg) use for exactly this purpose. Nothing else in the codebase
  * may touch non-public Spark API; keep this file to these two calls. */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
