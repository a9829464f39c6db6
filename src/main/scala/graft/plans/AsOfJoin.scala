package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Direction of an as-of match relative to the probe time.
  *
  *  - [[AsOfDirection.Backward]] (the default, kdb `aj` / pandas
  *    `merge_asof` default): greatest event time <= probe time; time
  *    ties resolve to the GREATEST tie value (the "latest" event).
  *  - [[AsOfDirection.Forward]]: least event time >= probe time; time
  *    ties resolve to the SMALLEST tie value (the "next" event).
  *  - [[AsOfDirection.Nearest]]: whichever of the backward/forward
  *    candidates minimizes |event time − probe time|; an exact-distance
  *    tie prefers the BACKWARD candidate (matching pandas merge_asof,
  *    which resolves equidistant matches to the earlier row).
  */
sealed abstract class AsOfDirection(val name: String)
object AsOfDirection {
  case object Backward extends AsOfDirection("backward")
  case object Forward extends AsOfDirection("forward")
  case object Nearest extends AsOfDirection("nearest")
  def of(name: String): AsOfDirection = name match {
    case "backward" => Backward
    case "forward" => Forward
    case "nearest" => Nearest
    case other => throw new IllegalArgumentException(
      s"unknown as-of direction '$other' (backward | forward | nearest)")
  }
}

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
  * Semantics (matches the join_asof oracle SQL), parameterized by
  * [[AsOfDirection]]: for each left (probe) row, the right (event) row
  * with the same key on the direction's side of the probe time; probes
  * with no qualifying event emit nulls (left-outer). A null right time
  * never qualifies (SQL `e.ts <= p_ts` is not-true on null) and null
  * keys never match.
  *
  * Key/time/tie expressions must evaluate to LONG-backed atomic types
  * (BIGINT, TIMESTAMP, TIMESTAMP_NTZ — Catalyst's internal micros are
  * Long); construction rejects anything else, and the left/right key and
  * time types must MATCH EXACTLY — a TIMESTAMP probe against a
  * TIMESTAMP_NTZ event column would compare UTC-epoch micros to
  * wall-clock micros and silently shift every match in non-UTC sessions.
  * Widening to arbitrary orderable types would swap the Long compares
  * for interpreted orderings.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression,
    tolerance: Long = -1L,
    direction: AsOfDirection = AsOfDirection.Backward) extends BinaryNode {

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
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tie, tol, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie, tol, dir) :: Nil
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
    tolerance: Long = -1L,
    direction: AsOfDirection = AsOfDirection.Backward) extends BinaryExecNode {

  private def longBacked(e: Expression): Boolean = e.dataType match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  require(Seq(leftKey, leftTime, rightKey, rightTime, rightTie).forall(longBacked),
    "as-of join expressions must be Long-backed (BIGINT / TIMESTAMP / TIMESTAMP_NTZ)")
  // Long-backed alone is not enough: TIMESTAMP stores UTC-epoch micros and
  // TIMESTAMP_NTZ wall-clock micros, so a mixed pair passes the individual
  // checks but compares shifted values in non-UTC sessions. Demand exact
  // type equality across the seam.
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")

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
      // Backward candidate: the latest consumed event (direction backward /
      // nearest). Forward candidate: `cur` itself once the cursor rests on
      // the first event at-or-after the probe — forward mode never consumes
      // it, so one pass still suffices and state stays O(1).
      val fwd = direction == AsOfDirection.Forward
      var lastMatch: InternalRow = null
      var lastMatchKey: Long = 0L
      var lastMatchTs: Long = 0L
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk != null && lt != null) {
          val lkv = lk.asInstanceOf[Long]
          val ltv = lt.asInstanceOf[Long]
          var curKey = 0L
          var curTs = 0L
          var curValid = false // cur rests on this probe's key at ts >= (>) probe
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
                else {
                  val rtv = rt.asInstanceOf[Long]
                  // forward keeps ts == probe ts under the cursor (it IS the
                  // forward match); backward/nearest consume it (<=) so the
                  // (time, tie) sort makes the LAST consumed one best
                  if (if (fwd) rtv < ltv else rtv <= ltv) {
                    if (!fwd) {
                      lastMatch = cur
                      lastMatchKey = rkv
                      lastMatchTs = rtv
                    }
                    advance()
                  } else { // first event on the forward side of this probe
                    curKey = rkv; curTs = rtv; curValid = true; done = true
                  }
                }
              } else done = true // right is ahead of left: stop
            }
          }
          // tolerance bounds staleness symmetrically: backward matches no
          // older than probe − tolerance, forward matches no further than
          // probe + tolerance (probes ascend, so staleness only grows).
          val bwOk = !fwd && lastMatch != null && lastMatchKey == lkv &&
            (tolerance < 0L || lastMatchTs >= ltv - tolerance)
          val fwOk = direction != AsOfDirection.Backward && curValid &&
            curKey == lkv && (tolerance < 0L || curTs <= ltv + tolerance)
          val m = direction match {
            case AsOfDirection.Backward => if (bwOk) lastMatch else nullRight
            case AsOfDirection.Forward => if (fwOk) cur else nullRight
            case AsOfDirection.Nearest =>
              if (bwOk && fwOk) {
                // equidistant → backward (the earlier row), per scaladoc
                if (ltv - lastMatchTs <= curTs - ltv) lastMatch else cur
              } else if (bwOk) lastMatch
              else if (fwOk) cur
              else nullRight
          }
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
    * per probe with the event on `direction`'s side of its time (backward =
    * latest at-or-before, forward = earliest at-or-after, nearest = closest
    * with equidistant ties to backward), nulls when none. Column NAMES
    * across the two frames must be disjoint (the operator's output
    * concatenates them; enforced). `tolerance` bounds the match distance
    * in the time expressions' own unit (MICROSECONDS for timestamps):
    * a match further than that from the probe answers null instead —
    * the merge_asof/kdb-aj tolerance knob; negative = unbounded. */
  def apply(
      probes: org.apache.spark.sql.DataFrame,
      events: org.apache.spark.sql.DataFrame,
      probeKey: String, probeTime: String,
      eventKey: String, eventTime: String, eventTie: String,
      tolerance: Long = -1L,
      direction: AsOfDirection = AsOfDirection.Backward)
      : org.apache.spark.sql.DataFrame = {
    val overlap = probes.columns.toSet.intersect(events.columns.toSet)
    require(overlap.isEmpty,
      s"as-of join frames must have disjoint column names; both have: " +
        overlap.toSeq.sorted.mkString(", "))
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
      tolerance, direction))
  }
}
