package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prepend the free length guard to un-thresholded
  * edit-distance predicates —
  *
  * {{{ levenshtein(a, b) <= t   ==>   abs(length(a) - length(b)) <= t
  *                                      AND levenshtein(a, b) <= t }}}
  *
  * Sound unconditionally: every insert/delete changes the length by one and
  * substitutions not at all, so lev(a, b) >= |length(a) - length(b)| — the
  * guard can only reject rows the original predicate rejects (and agrees on
  * null propagation, since both sides are null iff an input is). It pays
  * because the guard is O(1) per row while the O(len²) DP it short-circuits
  * is the most expensive scalar in a fuzzy-join pipeline; the same bound is
  * what makes llm_dedup_fuzzy_lev's length-band blocking lossless
  * (graft.ops.LlmOps), applied here as a plan rewrite instead of a
  * hand-written filter.
  *
  * Registered for production sessions by [[graft.GraftExtensions]]
  * (injectOptimizerRule); [[install]] adds it to an already-running session
  * via `experimental.extraOptimizations` (extensions conf is fixed at
  * context creation). Idempotent under the optimizer's fixpoint batch: a
  * predicate whose conjunction already contains the guard is left alone.
  * Only 2-arg levenshtein is rewritten — the 3-arg thresholded form already
  * runs the banded DP and needs no guard.
  */
object LevenshteinGuardRule extends Rule[LogicalPlan] {

  /** Add the rule to a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) {
      spark.experimental.extraOptimizations = cur :+ this
    }
  }

  private def guardFor(lev: Levenshtein, bound: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), bound)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case p @ LessThanOrEqual(lev: Levenshtein, bound: Literal)
            if lev.threshold.isEmpty =>
          val g = guardFor(lev, bound)
          if (cond.exists(_.semanticEquals(g))) p else And(g, p)
        case p @ LessThan(lev: Levenshtein, bound: Literal)
            if lev.threshold.isEmpty =>
          // lev < t ⇒ lev <= t, so the (looser) <= guard stays sound.
          val g = guardFor(lev, bound)
          if (cond.exists(_.semanticEquals(g))) p else And(g, p)
      }
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }
}
