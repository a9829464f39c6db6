package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Edge-case semantics of the native as-of operator (the fixture-level
  * result equality vs the window idiom lives in the oracle compare and the
  * PlanSpec physical-plan assertion). */
class AsOfJoinSpec extends SparkSpec {

  import java.sql.Timestamp

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def runAsOf(probes: Seq[(java.lang.Long, Timestamp)],
      events: Seq[(java.lang.Long, Timestamp, java.lang.Long)]): Seq[Row] = {
    import spark.implicits._
    val p = probes.toDF("user_id", "p_ts")
    val e = events.toDF("e_user_id", "e_ts", "e_event_id")
    AsOfJoin(p, e, "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id")
      .orderBy(col("user_id").asc_nulls_first, col("p_ts").asc)
      .collect().toSeq
  }

  test("as-of picks the latest event at-or-before, breaking ts ties on the highest tie column") {
    val rows = runAsOf(
      probes = Seq((1L: java.lang.Long) -> ts("2024-01-10 00:00:00")),
      events = Seq(
        (1L: java.lang.Long, ts("2024-01-09 00:00:00"), 7L: java.lang.Long),
        (1L: java.lang.Long, ts("2024-01-09 00:00:00"), 9L: java.lang.Long), // tie: higher id wins
        (1L: java.lang.Long, ts("2024-01-11 00:00:00"), 99L: java.lang.Long))) // future: excluded
    assert(rows.size === 1)
    assert(rows.head.getLong(4) === 9L)
  }

  test("probes before any event, unmatched keys, and empty right side emit null matches") {
    val rows = runAsOf(
      probes = Seq(
        (1L: java.lang.Long) -> ts("2024-01-01 00:00:00"), // before key 1's events
        (2L: java.lang.Long) -> ts("2024-01-10 00:00:00")), // key 2 has no events
      events = Seq((1L: java.lang.Long, ts("2024-01-05 00:00:00"), 1L: java.lang.Long)))
    assert(rows.forall(_.isNullAt(4)), rows.mkString(","))
    val empty = runAsOf(
      probes = Seq((1L: java.lang.Long) -> ts("2024-01-01 00:00:00")),
      events = Seq.empty)
    assert(empty.size === 1 && empty.head.isNullAt(4))
  }

  test("null right times never qualify and null keys never match") {
    val rows = runAsOf(
      probes = Seq(
        (1L: java.lang.Long) -> ts("2024-01-10 00:00:00"),
        (null: java.lang.Long) -> ts("2024-01-10 00:00:00")),
      events = Seq(
        (1L: java.lang.Long, null, 50L: java.lang.Long), // null ts: excluded
        (1L: java.lang.Long, ts("2024-01-02 00:00:00"), 3L: java.lang.Long),
        (null, ts("2024-01-02 00:00:00"), 60L: java.lang.Long))) // null key: excluded
    val byKey = rows.map(r => (if (r.isNullAt(0)) null else r.getLong(0)) ->
      (if (r.isNullAt(4)) null else r.getLong(4))).toMap
    assert(byKey(1L) === 3L)
    assert(byKey(null) === null)
  }

  test("native as-of equals the window idiom on seeded random data") {
    // differential test: same semantics, two unrelated executions (custom
    // sorted-merge exec vs left-join + window + rn=1). Seeded so failures
    // reproduce; probes deduplicated because the window idiom groups by
    // (key, p_ts) while the operator answers each input row.
    import spark.implicits._
    val rnd = new scala.util.Random(12345)
    def rts(): Timestamp = ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
    for (_ <- 1 to 3) {
      val events = Seq.fill(300)((rnd.nextInt(20).toLong, rts(), rnd.nextLong(1000)))
        .toDF("e_user_id", "e_ts", "e_event_id")
      val probes = Seq.fill(80)((rnd.nextInt(25).toLong, rts())).distinct
        .toDF("user_id", "p_ts")
      val native = AsOfJoin(probes, events,
          "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id")
        .select(col("user_id"), col("p_ts"), col("e_event_id"), col("e_ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
        .collect().map(_.toSeq.toList).toList
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("p_ts"))
        .orderBy(col("e_ts").desc_nulls_last, col("e_event_id").desc_nulls_last)
      val idiom = probes.join(events,
          col("user_id") === col("e_user_id") && col("e_ts") <= col("p_ts"),
          "left_outer")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("p_ts"), col("e_event_id"), col("e_ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
        .collect().map(_.toSeq.toList).toList
      assert(native === idiom)
    }
  }

  test("tolerance bounds staleness: an aged-out match answers null for later probes only") {
    import spark.implicits._
    val probes = Seq(
      (1L: java.lang.Long) -> ts("2024-01-01 00:10:00"),  // 10 min after event
      (1L: java.lang.Long) -> ts("2024-01-01 02:00:00"))  // 2 h after event
      .toDF("user_id", "p_ts")
    val events = Seq((1L: java.lang.Long, ts("2024-01-01 00:00:00"), 5L: java.lang.Long))
      .toDF("e_user_id", "e_ts", "e_event_id")
    val hourUs = 3600L * 1000 * 1000 // timestamps compare in microseconds
    val rows = AsOfJoin(probes, events,
        "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id", tolerance = hourUs)
      .orderBy(col("p_ts").asc).collect()
    assert(!rows.head.isNullAt(4) && rows.head.getLong(4) === 5L,
      "within tolerance: must answer")
    assert(rows.last.isNullAt(4), "beyond tolerance: the same match must age out")
  }

  test("mismatched child pre-partitioning is re-shuffled, not zipped wrong") {
    // zipPartitions requires co-partitioned children; EnsureRequirements
    // must reconcile a left side already hash-partitioned into a DIFFERENT
    // partition count (7) with the right side's fresh shuffle — if it ever
    // zipped incompatible partitionings, keys would land in different
    // partitions and matches would silently vanish.
    import spark.implicits._
    val probes = (0L until 50L).map(k => (k, ts("2024-01-10 00:00:00")))
      .toDF("user_id", "p_ts").repartition(7, col("user_id"))
    val events = (0L until 50L).map(k => (k, ts("2024-01-05 00:00:00"), k * 10))
      .toDF("e_user_id", "e_ts", "e_event_id")
    val got = AsOfJoin(probes, events,
        "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id")
      .orderBy(col("user_id").asc).collect()
    assert(got.length === 50)
    assert(got.forall(r => !r.isNullAt(4) && r.getLong(4) === r.getLong(0) * 10),
      "a probe lost its match across the partitioning mismatch")
  }

  test("multiple probes per key advance monotonically (later probe sees later events)") {
    val rows = runAsOf(
      probes = Seq(
        (1L: java.lang.Long) -> ts("2024-01-05 00:00:00"),
        (1L: java.lang.Long) -> ts("2024-01-15 00:00:00")),
      events = Seq(
        (1L: java.lang.Long, ts("2024-01-03 00:00:00"), 1L: java.lang.Long),
        (1L: java.lang.Long, ts("2024-01-12 00:00:00"), 2L: java.lang.Long)))
    assert(rows.map(_.getLong(4)) === Seq(1L, 2L))
  }

  private def runDir(direction: AsOfDirection,
      probes: Seq[(java.lang.Long, Timestamp)],
      events: Seq[(java.lang.Long, Timestamp, java.lang.Long)],
      tolerance: Long = -1L): Seq[Row] = {
    import spark.implicits._
    val p = probes.toDF("user_id", "p_ts")
    val e = events.toDF("e_user_id", "e_ts", "e_event_id")
    AsOfJoin(p, e, "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id",
        tolerance, direction)
      .orderBy(col("user_id").asc_nulls_first, col("p_ts").asc)
      .collect().toSeq
  }

  test("forward picks the earliest event at-or-after, breaking ts ties on the LOWEST tie") {
    val rows = runDir(AsOfDirection.Forward,
      probes = Seq((1L: java.lang.Long) -> ts("2024-01-10 00:00:00")),
      events = Seq(
        (1L: java.lang.Long, ts("2024-01-09 00:00:00"), 1L: java.lang.Long), // past: excluded
        (1L: java.lang.Long, ts("2024-01-10 00:00:00"), 4L: java.lang.Long), // exact hit, low id
        (1L: java.lang.Long, ts("2024-01-10 00:00:00"), 8L: java.lang.Long), // tie: low id wins
        (1L: java.lang.Long, ts("2024-01-12 00:00:00"), 9L: java.lang.Long)))
    assert(rows.size === 1 && rows.head.getLong(4) === 4L)
  }

  test("forward: probes after the last event, unmatched keys, empty right emit nulls") {
    val rows = runDir(AsOfDirection.Forward,
      probes = Seq(
        (1L: java.lang.Long) -> ts("2024-01-20 00:00:00"), // after key 1's events
        (2L: java.lang.Long) -> ts("2024-01-10 00:00:00")), // no events
      events = Seq((1L: java.lang.Long, ts("2024-01-05 00:00:00"), 1L: java.lang.Long)))
    assert(rows.forall(_.isNullAt(4)), rows.mkString(","))
    val empty = runDir(AsOfDirection.Forward,
      probes = Seq((1L: java.lang.Long) -> ts("2024-01-01 00:00:00")), events = Seq.empty)
    assert(empty.size === 1 && empty.head.isNullAt(4))
  }

  test("nearest picks the closer side; equidistant ties go backward") {
    val rows = runDir(AsOfDirection.Nearest,
      probes = Seq(
        (1L: java.lang.Long) -> ts("2024-01-10 00:00:00"), // bw 2d away, fw 1d away
        (2L: java.lang.Long) -> ts("2024-01-10 00:00:00"), // bw 1d, fw 1d: tie → backward
        (3L: java.lang.Long) -> ts("2024-01-10 00:00:00")), // only a backward event
      events = Seq(
        (1L: java.lang.Long, ts("2024-01-08 00:00:00"), 1L: java.lang.Long),
        (1L: java.lang.Long, ts("2024-01-11 00:00:00"), 2L: java.lang.Long),
        (2L: java.lang.Long, ts("2024-01-09 00:00:00"), 3L: java.lang.Long),
        (2L: java.lang.Long, ts("2024-01-11 00:00:00"), 4L: java.lang.Long),
        (3L: java.lang.Long, ts("2024-01-01 00:00:00"), 5L: java.lang.Long)))
    assert(rows.map(_.getLong(4)) === Seq(2L, 3L, 5L))
  }

  test("nearest tolerance bounds BOTH sides of the probe") {
    val hourUs = 3600L * 1000 * 1000
    val rows = runDir(AsOfDirection.Nearest,
      probes = Seq((1L: java.lang.Long) -> ts("2024-01-01 12:00:00")),
      events = Seq(
        (1L: java.lang.Long, ts("2024-01-01 09:00:00"), 1L: java.lang.Long), // 3h back
        (1L: java.lang.Long, ts("2024-01-01 16:00:00"), 2L: java.lang.Long)), // 4h fwd
      tolerance = 2 * hourUs)
    assert(rows.head.isNullAt(4), "both candidates beyond tolerance must answer null")
    val loose = runDir(AsOfDirection.Nearest,
      probes = Seq((1L: java.lang.Long) -> ts("2024-01-01 12:00:00")),
      events = Seq(
        (1L: java.lang.Long, ts("2024-01-01 09:00:00"), 1L: java.lang.Long),
        (1L: java.lang.Long, ts("2024-01-01 16:00:00"), 2L: java.lang.Long)),
      tolerance = 7 * hourUs / 2)
    assert(loose.head.getLong(4) === 1L, "within tolerance the closer (backward) side answers")
  }

  test("forward and nearest equal their window idioms on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(67890)
    def rts(): Timestamp = ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")
    for (_ <- 1 to 3) {
      val events = Seq.fill(300)((rnd.nextInt(20).toLong, rts(), rnd.nextLong(1000)))
        .toDF("e_user_id", "e_ts", "e_event_id")
      val probes = Seq.fill(80)((rnd.nextInt(25).toLong, rts())).distinct
        .toDF("user_id", "p_ts")
      // forward twin: first event at-or-after, ascending (ts, id)
      val wF = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("p_ts"))
        .orderBy(col("e_ts").asc_nulls_last, col("e_event_id").asc_nulls_last)
      val idiomF = probes.join(events,
          col("user_id") === col("e_user_id") && col("e_ts") >= col("p_ts"), "left_outer")
        .withColumn("rn", row_number().over(wF)).filter(col("rn") === 1)
        .select(col("user_id"), col("p_ts"), col("e_event_id"), col("e_ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
        .collect().map(_.toSeq.toList).toList
      val nativeF = AsOfJoin(probes, events,
          "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id",
          direction = AsOfDirection.Forward)
        .select(col("user_id"), col("p_ts"), col("e_event_id"), col("e_ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
        .collect().map(_.toSeq.toList).toList
      assert(nativeF === idiomF, "forward direction diverged from the window idiom")
      // nearest twin: rank all same-key events by |Δt|, side, then tie
      val wN = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("p_ts"))
        .orderBy(
          abs(unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).asc_nulls_last,
          when(col("e_ts") <= col("p_ts"), 0).otherwise(1).asc,
          when(col("e_ts") <= col("p_ts"), -col("e_event_id"))
            .otherwise(col("e_event_id")).asc)
      val idiomN = probes.join(events,
          col("user_id") === col("e_user_id") && col("e_ts").isNotNull, "left_outer")
        .withColumn("rn", row_number().over(wN)).filter(col("rn") === 1)
        .select(col("user_id"), col("p_ts"), col("e_event_id"), col("e_ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
        .collect().map(_.toSeq.toList).toList
      val nativeN = AsOfJoin(probes, events,
          "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id",
          direction = AsOfDirection.Nearest)
        .select(col("user_id"), col("p_ts"), col("e_event_id"), col("e_ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
        .collect().map(_.toSeq.toList).toList
      assert(nativeN === idiomN, "nearest direction diverged from the window idiom")
    }
  }

  test("construction rejects mismatched time types and colliding column names") {
    import spark.implicits._
    val p = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("user_id", "p_ts")
    val eLong = Seq((1L, 5L, 1L)).toDF("e_user_id", "e_ts", "e_event_id")
    // TIMESTAMP_NTZ probe time vs BIGINT event time: individually
    // Long-backed, jointly meaningless — must be rejected at build time
    val ex = intercept[Exception] {
      AsOfJoin(p, eLong, "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id")
        .collect()
    }
    assert(ex.getMessage.contains("time types must match"), ex.getMessage)
    val eClash = Seq((1L, ts("2024-01-01 00:00:00"), 1L)).toDF("user_id", "e_ts", "e_event_id")
    val ex2 = intercept[IllegalArgumentException] {
      AsOfJoin(p, eClash, "user_id", "p_ts", "user_id", "e_ts", "e_event_id")
    }
    assert(ex2.getMessage.contains("disjoint"), ex2.getMessage)
  }
}
