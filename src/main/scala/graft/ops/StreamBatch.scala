package graft.ops

import graft.Tables
import graft.Tables.dsumD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.I — batch-equivalent forms of the streaming aggregations.
  *
  * Structured Streaming's core guarantee is batch-stream equivalence: the
  * same `window()` / `session_window()` / dedup transform over a static
  * DataFrame produces exactly what the streaming query emits after all
  * watermarks close. These queries pin that batch semantics against the
  * DuckDB oracle; `graft.streaming.StreamingSpec` replays the same
  * transforms through MemoryStream and asserts equality with these results.
  *
  * Scale notes (100 TB): tumbling windows aggregate with map-side partials
  * (key = (bucket, type)); session windows shuffle once by user and
  * sort-merge sessions per key — both are the plans the streaming engine
  * uses incrementally with state stores.
  */
object StreamBatch {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "stream_tumbling_agg_batch" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsumD(col("value")).as("sum_value"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy(col("win_start").asc, col("event_type").asc)
    },

    "stream_sliding_agg_batch" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "5 minutes", "1 minute").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"))
        .orderBy(col("win_start").asc, col("event_type").asc)
    },

    "stream_session_agg_batch" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"))
        .orderBy(col("user_id").asc, col("session_start").asc)
    },

    "stream_dedup_batch" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
        .orderBy(col("user_id").asc, col("event_type").asc)
    },

    // Final-state silence view — the batch twin of
    // streaming.StreamOps.streamSilenceAlerts (the dead-man's switch):
    // keys whose last event precedes the stream maximum by the 4 h
    // threshold, with the instant their silence became certain. The
    // streaming op emits one alert per silence EPISODE; this is the
    // episodes-still-open-at-end view (StreamingSpec pins the episode
    // semantics). One map-side-combinable groupBy + a broadcast scalar —
    // no window, no second shuffle.
    "stream_silence_batch" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val gmax = ev.agg(max(col("ts")).as("g_max"))
      ev.groupBy(col("user_id")).agg(max(col("ts")).as("last_ts"))
        .crossJoin(broadcast(gmax))
        .filter(col("last_ts") <= col("g_max") - expr("INTERVAL 4 HOURS"))
        .select(col("user_id"), col("last_ts"),
          (col("last_ts") + expr("INTERVAL 4 HOURS")).as("silent_as_of"))
        .orderBy(col("user_id").asc)
    },

    // Exact per-window top-k heavy hitters — the batch twin of
    // streaming.StreamOps.streamWindowTopK (space-saving sketch). In the
    // sketch's exact regime (capacity >= per-window key cardinality) the
    // streaming op emits precisely these rows once watermarks close
    // (StreamingSpec pins that); under tight capacity it degrades along
    // the published space-saving bounds instead of this exact answer.
    // One shuffle to (window, user) partial counts, one window-function
    // pass for the rank — both map-side combinable at 100 TB.
    "stream_topk_batch" -> { (s, d) =>
      val counts = Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val rk = Window.partitionBy(col("w"))
        .orderBy(col("n").desc, col("user_id").asc)
      counts.withColumn("rnk", row_number().over(rk))
        .filter(col("rnk") <= 3)
        .select(col("w.start").as("win_start"), col("user_id"), col("n"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("win_start").asc, col("rnk").asc)
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "stream_tumbling_agg_batch" ->
      """SELECT time_bucket(INTERVAL '1 minute', ts) AS win_start, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY win_start, event_type
        |ORDER BY win_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    // Sliding windows: each event belongs to the 5 minute-aligned windows
    // whose start lies in (ts - 5min, ts] — enumerated via a 0..4 offset.
    "stream_sliding_agg_batch" ->
      """SELECT time_bucket(INTERVAL '1 minute', ts) - (k * INTERVAL 1 MINUTE) AS win_start,
        |       event_type, count(*) AS n
        |FROM events CROSS JOIN (SELECT unnest(range(0, 5)) AS k) o
        |GROUP BY win_start, event_type
        |ORDER BY win_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    // Session semantics: a gap of exactly the 30-minute timeout starts a NEW
    // session (Spark session windows are [start, last+gap) half-open).
    "stream_session_agg_batch" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), y AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x
        |)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events
        |FROM y
        |GROUP BY user_id, sid
        |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin,

    "stream_dedup_batch" ->
      """SELECT user_id, event_type, event_id, ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "stream_silence_batch" ->
      """SELECT user_id, max(ts) AS last_ts,
        |       max(ts) + INTERVAL 4 HOUR AS silent_as_of
        |FROM events
        |GROUP BY user_id
        |HAVING max(ts) <= (SELECT max(ts) FROM events) - INTERVAL 4 HOUR
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    "stream_topk_batch" ->
      """WITH c AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start, user_id,
        |         count(*) AS n
        |  FROM events GROUP BY win_start, user_id
        |), r AS (
        |  SELECT win_start, user_id, n,
        |         row_number() OVER (PARTITION BY win_start
        |                            ORDER BY n DESC, user_id ASC) AS rnk
        |  FROM c)
        |SELECT win_start, user_id, n, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3
        |ORDER BY win_start ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin
  )
}
