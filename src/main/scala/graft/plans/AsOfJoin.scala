package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native as-of join — SURVEY.md §2.C's join_asof as a whole-operator
  * Catalyst extension (the (c) rung of the custom-operator ladder:
  * LogicalPlan + SparkStrategy + SparkPlan), instead of the
  * left-join + window + rn=1 idiom.
  *
  * Why a custom operator is the right scale shape here: the window idiom
  * materializes EVERY qualifying (probe, event) pair before ranking —
  * a probe whose key has k earlier events costs k joined rows and a
  * partition sort over all of them. This operator keeps the classic
  * streamed sorted-merge form: both sides hash-partition by key (one
  * shuffle each, same as the join's), sort (key, time) within partitions,
  * and a single forward pass emits exactly ONE row per probe while
  * holding ONE candidate row of state — O(|probes| + |events|) per
  * partition, no pair blow-up, no second sort. This is how dedicated
  * engines (kdb aj, QuestDB/DuckDB ASOF JOIN) execute it.
  *
  * Semantics (matches the join_asof oracle SQL): for each left (probe)
  * row, the right (event) row with the same key and the greatest
  * (time, tie) such that time <= probe time; probes with no qualifying
  * event emit nulls (left-outer). A null right time never qualifies
  * (SQL `e.ts <= p_ts` is not-true on null) and null keys never match.
  *
  * Key/time/tie expressions must evaluate to LONG-backed atomic types
  * (BIGINT, TIMESTAMP, TIMESTAMP_NTZ — Catalyst's internal micros are
  * Long); construction rejects anything else. That covers every as-of
  * shape in this engine; widening to arbitrary orderable types would
  * swap the Long compares for interpreted orderings.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression,
    tolerance: Long = -1L) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical choice, the sorted-merge exec. Installed
  * per-session via `spark.experimental.extraStrategies` (public API) by
  * [[AsOfJoin.install]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression,
    tolerance: Long = -1L) extends BinaryExecNode {

  private def longBacked(e: Expression): Boolean = e.dataType match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  require(Seq(leftKey, leftTime, rightKey, rightTime, rightTie).forall(longBacked),
    "as-of join expressions must be Long-backed (BIGINT / TIMESTAMP / TIMESTAMP_NTZ)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** One row out per left row, in left order — the left child's
    * partitioning and (key, time) sort survive the merge. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  /** Both sides cluster by key (EnsureRequirements inserts the two hash
    * exchanges — the same shuffles a sort-merge equi-join would pay) and
    * sort ascending so the merge is a single forward pass. NULLS FIRST
    * (the Ascending default) is load-bearing: null keys/times are
    * consumed and discarded at the front of each key group. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey, lOut)
    val lTimeB = BindReferences.bindReference(leftTime, lOut)
    val rKeyB = BindReferences.bindReference(rightKey, rOut)
    val rTimeB = BindReferences.bindReference(rightTime, rOut)
    val rightWidth = rOut.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // the projection's input schema must carry the OUTPUT nullability:
      // binding against the raw right attributes would inherit
      // non-nullable flags from a non-nullable child and skip the null
      // check, silently reading 0 from the all-null unmatched row (caught
      // by the seeded differential test — parquet children are nullable,
      // which is why fixture queries never tripped it)
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      // `cur` is always a defensive copy: execute() iterators reuse row
      // objects, and both cur and lastMatch outlive the next() call.
      var cur: InternalRow = null
      def advance(): Unit =
        cur = if (rIter.hasNext) rIter.next().copy() else null
      advance()
      var lastMatch: InternalRow = null
      var lastMatchKey: Long = 0L
      var lastMatchTs: Long = 0L
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk != null && lt != null) {
          val lkv = lk.asInstanceOf[Long]
          val ltv = lt.asInstanceOf[Long]
          var done = false
          while (!done && cur != null) {
            val rk = rKeyB.eval(cur)
            if (rk == null) advance() // null keys never match; sorted first
            else {
              val rkv = rk.asInstanceOf[Long]
              if (rkv < lkv) advance() // earlier key group: exhausted
              else if (rkv == lkv) {
                val rt = rTimeB.eval(cur)
                if (rt == null) advance() // null time never qualifies
                else if (rt.asInstanceOf[Long] <= ltv) {
                  // qualifying; (time, tie) sort makes the LAST one best
                  lastMatch = cur
                  lastMatchKey = rkv
                  lastMatchTs = rt.asInstanceOf[Long]
                  advance()
                } else done = true // future event for this key: stop
              } else done = true // right is ahead of left: stop
            }
          }
          // tolerance bounds staleness: the retained best match may have
          // aged out for THIS probe even though it qualified for earlier
          // ones (probes ascend, so staleness only grows).
          val m = if (lastMatch != null && lastMatchKey == lkv &&
              (tolerance < 0L || lastMatchTs >= ltv - tolerance)) lastMatch
            else nullRight
          outProj(joined(lRow, m))
        } else {
          outProj(joined(lRow, nullRight)) // null probe key/time: no match
        }
      }
    }
  }
}

/** Public entry: build the native as-of join between two frames. */
object AsOfJoin {

  /** Idempotently add the strategy to the session (ExperimentalMethods is
    * the public, documented injection point for planner strategies). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** As-of join `probes` (key, time) to `events` (key, time, tie): one row
    * per probe with the latest event at-or-before its time, nulls when
    * none. Column NAMES across the two frames must be disjoint (the
    * operator's output concatenates them). `tolerance` bounds staleness
    * in the time expressions' own unit (MICROSECONDS for timestamps):
    * a match older than probeTime − tolerance answers null instead —
    * the merge_asof/kdb-aj tolerance knob; negative = unbounded. */
  def apply(
      probes: org.apache.spark.sql.DataFrame,
      events: org.apache.spark.sql.DataFrame,
      probeKey: String, probeTime: String,
      eventKey: String, eventTime: String, eventTie: String,
      tolerance: Long = -1L)
      : org.apache.spark.sql.DataFrame = {
    val spark = probes.sparkSession
    install(spark)
    val lPlan = org.apache.spark.sql.graftshim.PlanBridge.analyzedPlan(probes)
    val rPlan = org.apache.spark.sql.graftshim.PlanBridge.analyzedPlan(events)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graftshim.PlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, probeKey), attr(lPlan, probeTime),
      attr(rPlan, eventKey), attr(rPlan, eventTime), attr(rPlan, eventTie),
      tolerance))
  }
}
