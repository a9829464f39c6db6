package graft.functions

import org.apache.datasketches.memory.{Memory, WritableMemory}
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Theta-sketch aggregation for mergeable distinct-count SET ALGEBRA —
  * the piece HLL cannot do: HLL unions, but only theta supports
  * intersection and difference (A-not-B), which is what
  * audience-overlap / churn / segment-containment questions need at
  * 100 TB (|A∩B| without ever joining the raw rows of A and B).
  *
  * Spark 4 ships `hll_sketch_agg` but no theta functions, so these are
  * typed `Aggregator`s over the Datasketches theta library (already on
  * Spark's classpath — the same library backing the HLL builtins).
  * Design notes, all scale-motivated:
  *
  *  - The aggregation buffer is a DIRECT-memory Union image
  *    (`SetOperation.wrap` over the byte array): `reduce` wraps and
  *    updates IN PLACE — no per-row allocation, no
  *    serialize/deserialize churn; Spark only ships the buffer bytes
  *    when a partial crosses an operator boundary.
  *  - The partial layer (`thetaSketchAgg`) emits ORDERED COMPACT blobs
  *    (canonical bytes for a given key set — estimates and the blobs
  *    themselves are deterministic: theta retains the k smallest
  *    MurmurHash3 values, no RNG anywhere), so what shuffles and what
  *    persists to parquet is ≈8 bytes/retained key, not the 2k-slot
  *    update gadget.
  *  - The merge layer (`thetaUnionAgg`) unions compact blobs — the
  *    profile-job rollup shape: daily partials persisted once, every
  *    later question answered from the summary table.
  *  - Below the nominal-entries threshold (lgK=14 → 16384) a theta
  *    sketch is in EXACT mode (theta == 1.0, every hash retained), and
  *    union/intersection/difference of exact sketches are exact, so
  *    estimates are exactly the true distinct counts — which is what
  *    makes the declared query oracle-backed (the fixture's widest
  *    per-segment distinct-customer set is ~12.9k at sf0.1 and a
  *    two-segment union ~14.7k, both under 16384; ThetaSketchSpec pins
  *    the bounded-error behaviour past the threshold on a synthetic
  *    corpus so the estimation path is tested too).
  */
object ThetaSketch {

  /** lgK=14 → nominal 16384 entries: exact through every fixture scale
    * (see cardinality analysis above), ~1.6% RSE in estimation mode. */
  val LgK = 14
  private val Nom = 1 << LgK

  private def newUnionBuf(): Array[Byte] = {
    val bytes = new Array[Byte](SetOperation.getMaxUnionBytes(Nom))
    SetOperation.builder().setNominalEntries(Nom)
      .buildUnion(WritableMemory.writableWrap(bytes))
    bytes
  }

  private def wrapUnion(b: Array[Byte]): Union =
    SetOperation.wrap(WritableMemory.writableWrap(b)).asInstanceOf[Union]

  private def wrapSketch(b: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(b))

  /** Build a compact theta sketch from raw LONG keys. Buffer = direct
    * Union image (a Union accepts raw `update(long)` exactly like an
    * UpdateSketch); output = ordered compact blob. */
  private class SketchAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = newUnionBuf()
    def reduce(b: Array[Byte], key: Long): Array[Byte] = {
      wrapUnion(b).update(key); b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      wrapUnion(a).union(wrapUnion(b).getResult()); a
    }
    def finish(b: Array[Byte]): Array[Byte] =
      wrapUnion(b).getResult().toByteArray
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  /** Union already-compact sketch blobs (the persisted-partial merge). */
  private class UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = newUnionBuf()
    def reduce(b: Array[Byte], in: Array[Byte]): Array[Byte] = {
      wrapUnion(b).union(Memory.wrap(in)); b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      wrapUnion(a).union(wrapUnion(b).getResult()); a
    }
    def finish(b: Array[Byte]): Array[Byte] =
      wrapUnion(b).getResult().toByteArray
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  /** `theta_sketch_agg(longCol)` → compact sketch blob. */
  def thetaSketchAgg(c: Column): Column = udaf(new SketchAgg, Encoders.scalaLong).apply(c)

  /** `theta_union_agg(blobCol)` → compact sketch blob. */
  def thetaUnionAgg(c: Column): Column = udaf(new UnionAgg, Encoders.BINARY).apply(c)

  // ---- scalar set-algebra over compact blobs ----------------------------
  // Scala UDFs, deliberately: these run on the MERGED summary frame —
  // one row per segment pair, never per data row — so codegen friendliness
  // is irrelevant and the clarity of direct library calls wins.

  /** Rounded estimate of a blob. Exact mode ⇒ exactly the distinct count. */
  val estimate: Array[Byte] => Long =
    b => Math.round(wrapSketch(b).getEstimate)

  /** Identity pass-through that FAILS LOUDLY if the blob has left exact
    * mode. `agg_theta_sketch_setops`'s oracle-exactness rests on every
    * per-segment sketch staying under the lgK nominal (estimates ==
    * true distinct counts only while theta == 1.0); the fixture is
    * regenerated between sessions, so that cardinality analysis is
    * asserted at RUNTIME on the ≤k-row merged frame (cost: nothing)
    * instead of living only in a comment — a fixture change fails with
    * this message, not a bare cross-engine hash mismatch. */
  val requireExactMode: Array[Byte] => Array[Byte] = { b =>
    val sk = wrapSketch(b)
    require(!sk.isEstimationMode,
      s"theta sketch entered estimation mode (theta=${sk.getTheta}, " +
        s"retained=${sk.getRetainedEntries}): a segment's distinct count " +
        s"crossed the lgK=$LgK nominal ($Nom) and the oracle-exact " +
        "contract of agg_theta_sketch_setops no longer holds — raise LgK " +
        "or demote the query to a bounded-error flag")
    b
  }

  /** |A ∪ B| estimate. */
  val unionEst: (Array[Byte], Array[Byte]) => Long = { (a, b) =>
    val u = SetOperation.builder().setNominalEntries(Nom).buildUnion()
    u.union(wrapSketch(a)); u.union(wrapSketch(b))
    Math.round(u.getResult().getEstimate)
  }

  /** `unionEst` with the exact-mode tripwire: the PAIR union is the
    * largest set the oracle-exact query ever sketches (two exact inputs
    * can still overflow the nominal together — the ~14.7k-vs-16384
    * headroom is the tightest in the fixture), so it carries its own
    * runtime guard alongside requireExactMode's per-segment one. */
  val unionEstExact: (Array[Byte], Array[Byte]) => Long = { (a, b) =>
    val u = SetOperation.builder().setNominalEntries(Nom).buildUnion()
    u.union(wrapSketch(a)); u.union(wrapSketch(b))
    val r = u.getResult()
    require(!r.isEstimationMode,
      s"theta pair union entered estimation mode (theta=${r.getTheta}): " +
        s"|A∪B| crossed the lgK=$LgK nominal ($Nom) — the oracle-exact " +
        "contract of agg_theta_sketch_setops no longer holds; raise LgK")
    Math.round(r.getEstimate)
  }

  /** |A ∩ B| estimate — the operation HLL fundamentally lacks. */
  val intersectEst: (Array[Byte], Array[Byte]) => Long = { (a, b) =>
    val i = SetOperation.builder().setNominalEntries(Nom).buildIntersection()
    i.intersect(wrapSketch(a)); i.intersect(wrapSketch(b))
    Math.round(i.getResult().getEstimate)
  }

  /** |A \ B| estimate (churn / exclusive-audience). */
  val aNotBEst: (Array[Byte], Array[Byte]) => Long = { (a, b) =>
    val op = SetOperation.builder().buildANotB()
    Math.round(op.aNotB(wrapSketch(a), wrapSketch(b)).getEstimate)
  }
}
