package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-slot-per-(session, call-site) parking for eager localCheckpoints a
  * method cannot release in-method because its RETURNED lazy frame still
  * reads them (a declared query hands the caller an unexecuted plan, so
  * releasing before the caller collects would drop blocks the plan
  * needs). Parking the current invocation's checkpoints retires the
  * PREVIOUS invocation's occupants via [[LlmOps.releaseCheckpoint]], so
  * retained block-store copies are bounded at one invocation per live
  * session per call site — instead of one per invocation, GC-reliant on
  * the ContextCleaner (the round-15 generalization of the ktruss fix;
  * Verify runs 280+ queries in one session and Bench runs 3 repeats per
  * query, so per-invocation retention is a real block-store tax).
  *
  * Contract: a returned frame is CONSUMED before the same call site runs
  * again on that session (every declared-query caller — Verify, Bench,
  * the specs — collects immediately). Tags are unique per call site, so
  * two different operators never retire each other's slots; no single
  * declared query invokes the same parked call site twice within one
  * composite plan (the louvain two-level sweep, which does, keeps its own
  * per-level lifecycle and does not park). Stopped sessions are swept on
  * every park — their blocks died with the context, removing the entry
  * just drops the dead plan reference. */
object CheckpointPark {
  private val slots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Seq[DataFrame]]()

  /** Park this invocation's retained checkpoints under `tag`, retiring
    * the previous occupants of (frames.head.sparkSession, tag). */
  def park(tag: String, frames: DataFrame*): Unit = {
    require(frames.nonEmpty, "park needs at least one frame")
    val s = frames.head.sparkSession
    val it = slots.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    val prev = slots.put((s, tag), frames.toSeq)
    if (prev != null) prev.foreach(LlmOps.releaseCheckpoint)
  }
}
