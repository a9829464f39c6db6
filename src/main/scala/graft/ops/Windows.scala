package graft.ops

import graft.Tables
import graft.Tables.dec2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.E — window functions.
  *
  * Scale notes (100 TB): every window here partitions by a grouping key
  * (customer/user/brand) so the sort is per-partition after one hash shuffle —
  * never a global sort. Skewed partitions (a user with millions of events)
  * would need the two-level trick (pre-aggregate or salt + re-window); the
  * fixture keys are uniform so the plain form is the right plan.
  *
  * Determinism: every ORDER BY inside a window carries a unique tie-break key
  * (orderkey/event_id) so row_number/ntile/frames are total; running sums use
  * exact decimal; moving averages divide two exact quantities in double
  * (identical IEEE ops in both engines).
  */
object Windows {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "win_row_number_topk" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        // .cast("long"): DuckDB window ranks are BIGINT; Spark's are INT and
        // the driver compares pandas dtypes strictly.
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey").asc, col("rn").asc)
    },

    "win_rank_dense" -> { (s, d) =>
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("p_brand").asc, col("p_retailprice").desc, col("p_partkey").asc)
    },

    "win_ntile_percent" -> { (s, d) =>
      // Distributed two-pass global ranking: a bare
      // Window.orderBy(...) funnels the whole table through ONE task — a
      // scale-killer on a large table. Instead: range-partition on the sort
      // key, row_number within each partition, then add the exact cumulative
      // row-count offset of the preceding partitions (a K-row broadcast).
      // Correct wherever the range boundaries land, because offsets come from
      // actual partition sizes; the sort key is unique (c_custkey tie-break)
      // so global rank == global row_number, percent_rank = (rn-1)/(n-1),
      // cume_dist = rn/n, and ntile(4) is a closed-form bucket of rn.
      val k = 32
      val keys = Seq(col("c_acctbal").asc, col("c_custkey").asc)
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
        .repartitionByRange(k, keys: _*)
        .withColumn("pid", spark_partition_id())
      val sizes = base.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      // K-row frame: the un-partitioned window below runs over ≤ k rows.
      val offs = sizes
        .withColumn("off", coalesce(
          sum(col("cnt")).over(Window.orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("pid"), col("off"))
      val total = sizes.agg(sum(col("cnt")).as("n_total"))
      val wp = Window.partitionBy(col("pid")).orderBy(keys: _*)
      val tiles = 4L
      val ranked = base
        .withColumn("rn_local", row_number().over(wp).cast("long"))
        .join(broadcast(offs), Seq("pid"))
        .crossJoin(broadcast(total))
        .withColumn("rn", col("rn_local") + col("off"))
      // ntile(t) over n rows: the first n%t buckets get floor(n/t)+1 rows.
      // floor(): Spark's `/` on integral columns is DOUBLE division (exact
      // below 2^52, i.e. any realistic row count).
      val size = floor(col("n_total") / tiles).cast("long")
      val rem = (col("n_total") % tiles).cast("long")
      val cut = rem * (size + 1L)
      ranked.select(col("c_custkey"), col("c_acctbal"),
          when(col("rn") <= cut,
            floor((col("rn") - 1L) / (size + 1L)) + 1L)
            .otherwise(rem + floor((col("rn") - 1L - cut) / size) + 1L)
            .cast("long").as("quartile"),
          // n_total=1 guard: SQL percent_rank() is 0.0 for a single row,
          // where (rn-1)/(n-1) would be 0/0 = NaN.
          when(col("n_total") === 1L, lit(0.0))
            .otherwise((col("rn") - 1L).cast("double") /
              (col("n_total") - 1L).cast("double")).as("pr"),
          (col("rn").cast("double") / col("n_total").cast("double")).as("cd"))
        .orderBy(col("c_custkey").asc)
    },

    "win_lag_lead" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          // exact µs arithmetic: Spark long-cast truncates sub-second parts
          // while DuckDB's epoch()::BIGINT rounds — integers avoid both.
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))).as("gap_us"),
          lead(col("event_id"), 1).over(w).as("next_event"))
        .orderBy(col("user_id").asc, col("event_id").asc)
    },

    // Batch sessionization — the batch twin of streaming session_window: a
    // session breaks where the gap to the user's previous event exceeds 30
    // minutes; session_id is the running count of breaks. Two stacked
    // windows over ONE (user_id, ts) ordering — Catalyst plans them in a
    // single WindowExec pass over a single shuffle+sort, the right shape
    // at any scale (sessions never cross users).
    // Running DISTINCT count — the per-key count(DISTINCT) shape that
    // cannot ride a plain window aggregate (no distinct in frames):
    // flag each (user, event_type)'s FIRST occurrence under the total
    // order (row_number = 1 over one window), then a running sum of flags
    // over the user's timeline (a second window). Two shuffles, both on
    // small keys — the standard distributed form; no join-back (per the
    // round-5 dense_rank rule, a first-seen flag + running sum is the
    // frame-friendly equivalent when the output must be cumulative).
    "win_running_distinct" -> { (s, d) =>
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("fs",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("n_distinct_types", sum(col("fs")).over(wRun))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          col("n_distinct_types"))
        .orderBy(col("user_id").asc, col("ts").asc, col("event_id").asc)
    },

    "win_sessionize" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("gap_us", unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
        .withColumn("brk", when(col("gap_us").isNull ||
          col("gap_us") > 30L * 60L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("event_id"), col("session_id"))
        .orderBy(col("user_id").asc, col("event_id").asc)
    },

    "win_running_sum_rows" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast(DecimalType(38, 2))
            .cast("double").as("run_total"))
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    },

    "win_moving_avg_rows" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-6, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          (sum(dec2(col("value"))).over(w).cast("double") /
            count(lit(1)).over(w).cast("double")).as("mov_avg"))
        .orderBy(col("user_id").asc, col("event_id").asc)
    },

    "win_range_frame" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_last30"),
          sum(dec2(col("o_totalprice"))).over(w).cast(DecimalType(38, 2))
            .cast("double").as("sum_last30"))
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    },

    "win_nth_value" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_best"))
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    },

    "win_first_last_value" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"))
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "win_row_number_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    "win_rank_dense" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |       rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
        |       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
        |FROM part
        |ORDER BY p_brand ASC NULLS FIRST, p_retailprice DESC NULLS LAST, p_partkey ASC NULLS FIRST""".stripMargin,

    "win_ntile_percent" ->
      """SELECT c_custkey, c_acctbal,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "win_lag_lead" ->
      """SELECT user_id, event_id,
        |       epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
        |       lead(event_id, 1) OVER w AS next_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,

    "win_running_distinct" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                ORDER BY ts ASC, event_id ASC) = 1
        |              THEN 1 ELSE 0 END AS fs
        |  FROM events)
        |SELECT user_id, ts, event_id, event_type,
        |       CAST(sum(fs) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS n_distinct_types
        |FROM f
        |ORDER BY user_id ASC NULLS FIRST, ts ASC NULLS FIRST,
        |         event_id ASC NULLS FIRST""".stripMargin,

    "win_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |b AS (SELECT user_id, event_id, ts,
        |             CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM g)
        |SELECT user_id, event_id,
        |       CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM b
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,

    "win_running_sum_rows" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "win_moving_avg_rows" ->
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) /
        |       CAST(count(*) OVER w AS DOUBLE) AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,

    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |       count(*) OVER w AS n_last30,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_last30
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)::BIGINT
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "win_nth_value" ->
      """SELECT o_custkey, o_orderkey,
        |       nth_value(o_orderkey, 2) OVER w AS second_best
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "win_first_last_value" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_orderkey) OVER w AS first_ok,
        |       last_value(o_orderkey) OVER w AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin
  )
}
