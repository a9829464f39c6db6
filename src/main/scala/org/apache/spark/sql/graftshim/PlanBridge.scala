package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Minimal bridge to the `private[sql]` seams a whole-operator Catalyst
  * extension needs: turning a custom LogicalPlan into a DataFrame,
  * extracting a frame's analyzed plan to use as a child, and rebuilding
  * a checkpoint's LogicalRDD with fresh statistics. Lives under
  * `org.apache.spark.sql` so the qualified-private access is legal — the
  * same pattern public Spark extensions (Delta, Qbeast, Iceberg) use for
  * exactly this purpose. Nothing else in the codebase may touch
  * non-public Spark API; keep this file to these calls. */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Column ⇄ Expression bridges for custom expressions that carry
    * non-Expression payloads (e.g. driver-collected lookup arrays) and so
    * cannot go through the string-keyed function registry. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager localCheckpoint that replaces the carried origin statistics
    * with the checkpointed blocks' TRUE storage size.
    *
    * Why this exists: `Dataset.localCheckpoint` hands the new LogicalRDD
    * the ORIGIN plan's estimated `Statistics`, and the size-only
    * estimator multiplies children's `sizeInBytes` at every join. An
    * iterative algorithm that checkpoints each round therefore compounds
    * the estimate round over round — the BigInt's bit-length grows
    * geometrically with the number of per-round self-references, and
    * after enough rounds the driver burns whole minutes in
    * BigInteger.multiply while planning (observed: 72 s for ONE
    * label-propagation round at fixture scale, on sub-MB frames).
    * Replacing the carried estimate with the measured block-store size
    * of the just-materialized RDD is strictly more truthful, keeps
    * auto-broadcast working on genuinely small state, and caps the
    * estimate chain at one round's depth forever. Partitioning and
    * ordering are preserved exactly as localCheckpoint leaves them. */
  def checkpointTrueStats(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = true)
    ck.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val sc = df.sparkSession.sparkContext
        sc.getRDDStorageInfo.find(_.id == lr.rdd.id)
          .map { info =>
            val size = math.max(info.memSize + info.diskSize, 1L)
            val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
              lr.outputOrdering, lr.isStreaming, lr.stream)(
              df.sparkSession.asInstanceOf[classic.SparkSession],
              Some(Statistics(sizeInBytes = BigInt(size))), None)
            ofRows(df.sparkSession, fresh)
          }
          // storage info missing (shouldn't happen for an eager local
          // checkpoint) — fall back to the plain checkpoint
          .getOrElse(ck)
      case _ => ck
    }
  }
}
