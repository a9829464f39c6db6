package graft.ops

import graft.SparkSpec

/** Pins the round-16 consumption-aware retirement guard (ADVICE r15,
  * medium): parking a second frame under the same tag BEFORE the first
  * was executed must NOT unpersist the first's localCheckpoint blocks —
  * a localCheckpoint is not recomputable, so the old eager release made
  * the first frame fail with a missing-block error. The guard defers the
  * release until a QueryExecutionListener observes an execution touching
  * the retired slot's checkpoint RDDs. */
class CheckpointParkSpec extends SparkSpec {

  test("a retired-but-unconsumed frame still executes; release follows its first execution") {
    val tag = "checkpointpark-spec"
    val df1 = spark.range(0L, 1000L).toDF("id").localCheckpoint(true)
    CheckpointPark.park(tag, df1)
    // same call site parks again BEFORE df1 is consumed — the ADVICE
    // failure mode. df1 must remain executable afterwards.
    val df2 = spark.range(0L, 2000L).toDF("id").localCheckpoint(true)
    CheckpointPark.park(tag, df2)
    assert(df1.count() === 1000L,
      "retired-but-unconsumed frame lost its checkpoint blocks")
    // the deferred slot is released once the listener observes the
    // execution — listener events are asynchronous, so poll briefly
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (CheckpointPark.deferredCount > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(CheckpointPark.deferredCount === 0,
      "deferred slot was never released after its execution was observed")
    // df2 (the live occupant) is untouched by df1's retirement
    assert(df2.count() === 2000L)
    // a CONSUMED occupant retires immediately on the next park — the
    // round-15 bounded-retention behavior is preserved
    val df3 = spark.range(0L, 10L).toDF("id").localCheckpoint(true)
    CheckpointPark.park(tag, df3)
    assert(df3.count() === 10L)
  }
}
