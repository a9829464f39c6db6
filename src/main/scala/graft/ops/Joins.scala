package graft.ops

import graft.Tables
import graft.Tables.{dsumD, dec2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C — join operators.
  *
  * Scale notes (100 TB):
  *  - Equi-joins declare only the logical join; Catalyst's JoinSelection picks
  *    broadcast-hash for dims under `autoBroadcastJoinThreshold` and
  *    sort-merge for fact⋈fact. We force the physical only where the
  *    inventory demands it (`broadcast()` / `hint("merge")`).
  *  - `join_theta_range` is a banded non-equi join. At scale the BNLJ is only
  *    viable because the build side (supplier) is broadcastable; a
  *    fact⋈fact form bucketizes acctbal into floor(bal/width) keys and
  *    equi-joins on adjacent buckets — `join_range_banded` IS that scale
  *    plan (Scale.bandedRangeJoin), declared with the identical oracle so
  *    the decomposition's losslessness is driver-checked.
  *  - `join_interval` equi-joins would-be-range pairs through a derived
  *    bucket key (date_trunc hour) so the range condition only runs within a
  *    bucket — the standard interval-join decomposition.
  *  - `join_asof` uses the union/window formulation: shuffle both sides once
  *    by (user), sort by ts, row_number — no per-probe scan, no driver loop.
  */
object Joins {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "join_inner_equi" -> { (s, d) =>
      Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
        .orderBy(col("o_orderkey").asc)
    },

    "join_broadcast" -> { (s, d) =>
      Tables.lineitem(s, d).join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          dsumD(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand").asc)
    },

    "join_sortmerge" -> { (s, d) =>
      Tables.lineitem(s, d).hint("merge").join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"), dsumD(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderstatus").asc)
    },

    "join_left_outer" -> { (s, d) =>
      Tables.customer(s, d).join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey").asc)
    },

    "join_right_outer" -> { (s, d) =>
      Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "right_outer")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    },

    "join_full_outer" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_custkey") < 600)
      val o = Tables.orders(s, d)
        .filter(col("o_custkey") >= 400 && col("o_custkey") < 800)
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    },

    "join_left_semi" -> { (s, d) =>
      Tables.customer(s, d).join(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey").asc)
    },

    "join_left_anti" -> { (s, d) =>
      Tables.customer(s, d).join(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey").asc)
    },

    "join_cross" -> { (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy(col("r_regionkey").asc, col("n_nationkey").asc)
    },

    "join_theta_range" -> { (s, d) =>
      Tables.supplier(s, d).join(Tables.customer(s, d),
          col("s_acctbal") > col("c_acctbal") - 10.0 &&
            col("s_acctbal") < col("c_acctbal"))
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey").asc, col("c_custkey").asc)
    },

    // The same band semantics as join_theta_range through the fact ⋈ fact
    // scale plan (Scale.bandedRangeJoin): bucket-key equi-join + residual
    // filter instead of a BNLJ. Identical oracle — the decomposition is
    // required to be lossless, and the driver compare proves it.
    "join_range_banded" -> { (s, d) =>
      Scale.bandedRangeJoin(Tables.supplier(s, d), Tables.customer(s, d),
          "s_acctbal", "c_acctbal", 10.0)
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey").asc, col("c_custkey").asc)
    },

    "join_interval" -> { (s, d) =>
      // Interval-join decomposition: the candidate bucket for a row is a
      // FUNCTION of its timestamp (hour truncation), so the range pair-up
      // becomes an equi-join on the derived key plus a residual range
      // filter. This turns an O(rows × intervals) BNLJ into one hash
      // shuffle — the standard interval-join plan at scale.
      val ev = Tables.events(s, d)
      val buckets = ev.select(date_trunc("hour", col("ts")).as("h")).distinct()
      ev.as("e")
        .withColumn("e_h", date_trunc("hour", col("ts")))
        .join(buckets.as("b"), col("e_h") === col("b.h"))
        .filter(col("e.ts") < col("b.h") + expr("INTERVAL 30 MINUTES"))
        .groupBy(col("b.h").as("h"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("h").asc)
    },

    "join_asof" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val probes = ev.select(col("user_id")).distinct()
        .withColumn("p_ts", explode(array(
          lit("2024-01-10 00:00:00").cast("timestamp_ntz"),
          lit("2024-01-20 00:00:00").cast("timestamp_ntz"))))
      val w = Window.partitionBy(col("p.user_id"), col("p_ts"))
        .orderBy(col("e.ts").desc_nulls_last, col("e.event_id").desc_nulls_last)
      probes.as("p").join(ev.as("e"),
          col("p.user_id") === col("e.user_id") && col("e.ts") <= col("p_ts"),
          "left_outer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p.user_id").as("user_id"), col("p_ts"),
          col("e.event_id").as("event_id"), col("e.ts").as("ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
    },

    // The SAME as-of semantics (and the same oracle SQL) executed by the
    // custom whole-operator Catalyst extension (plans/AsOfJoin.scala:
    // LogicalPlan + Strategy + sorted-merge SparkPlan) instead of the
    // left-join + window + rn=1 idiom above — one forward pass per
    // partition, one output row per probe, no qualifying-pair blow-up.
    // Right columns are pre-renamed so the operator's concatenated output
    // has unique names. PlanSpec asserts AsOfJoinExec is in the executed
    // plan; the driver's oracle compare proves result equality.
    "join_asof_native" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val probes = ev.select(col("user_id")).distinct()
        .withColumn("p_ts", explode(array(
          lit("2024-01-10 00:00:00").cast("timestamp_ntz"),
          lit("2024-01-20 00:00:00").cast("timestamp_ntz"))))
      val right = ev.select(col("user_id").as("e_user_id"),
        col("ts").as("e_ts"), col("event_id").as("e_event_id"))
      graft.plans.AsOfJoin(probes, right,
          "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id")
        .select(col("user_id"), col("p_ts"),
          col("e_event_id").as("event_id"), col("e_ts").as("ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
    },

    // Forward as-of through the same native operator: earliest event
    // AT-OR-AFTER each probe (time ties resolve to the smallest event_id —
    // the ascending (time, tie) sort's first row). Same single merge pass;
    // the forward candidate is the unconsumed cursor row itself, so the
    // per-partition state stays one row.
    "join_asof_forward" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val probes = ev.select(col("user_id")).distinct()
        .withColumn("p_ts", explode(array(
          lit("2024-01-10 00:00:00").cast("timestamp_ntz"),
          lit("2024-01-20 00:00:00").cast("timestamp_ntz"))))
      val right = ev.select(col("user_id").as("e_user_id"),
        col("ts").as("e_ts"), col("event_id").as("e_event_id"))
      graft.plans.AsOfJoin(probes, right,
          "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id",
          direction = graft.plans.AsOfDirection.Forward)
        .select(col("user_id"), col("p_ts"),
          col("e_event_id").as("event_id"), col("e_ts").as("ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
    },

    // Backward as-of with a STALENESS BOUND — the merge_asof/kdb-aj
    // tolerance knob on the native exec's batch path (streaming forward
    // as-of already requires it; this pins the batch semantics with an
    // oracle): a match older than 2 days is no match, so those probes
    // surface NULL instead of silently stale data — the freshness
    // contract a feature-store lookup needs. Tolerance is exact integer
    // microseconds, same unit as the exec's cursor arithmetic.
    "join_asof_tolerance" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val probes = ev.select(col("user_id")).distinct()
        .withColumn("p_ts", explode(array(
          lit("2024-01-10 00:00:00").cast("timestamp_ntz"),
          lit("2024-01-20 00:00:00").cast("timestamp_ntz"))))
      val right = ev.select(col("user_id").as("e_user_id"),
        col("ts").as("e_ts"), col("event_id").as("e_event_id"))
      graft.plans.AsOfJoin(probes, right,
          "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id",
          tolerance = 2L * 86400L * 1000000L,
          direction = graft.plans.AsOfDirection.Backward)
        .select(col("user_id"), col("p_ts"),
          col("e_event_id").as("event_id"), col("e_ts").as("ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
    },

    // Nearest as-of: closest event on either side of the probe, equidistant
    // ties to the backward (earlier) row — pandas merge_asof semantics. The
    // oracle ranks the full per-user candidate set by |Δt| in integer
    // microseconds; the native exec holds just the backward candidate and
    // the cursor row and compares the two deltas.
    "join_asof_nearest" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val probes = ev.select(col("user_id")).distinct()
        .withColumn("p_ts", explode(array(
          lit("2024-01-10 00:00:00").cast("timestamp_ntz"),
          lit("2024-01-20 00:00:00").cast("timestamp_ntz"))))
      val right = ev.select(col("user_id").as("e_user_id"),
        col("ts").as("e_ts"), col("event_id").as("e_event_id"))
      graft.plans.AsOfJoin(probes, right,
          "user_id", "p_ts", "e_user_id", "e_ts", "e_event_id",
          direction = graft.plans.AsOfDirection.Nearest)
        .select(col("user_id"), col("p_ts"),
          col("e_event_id").as("event_id"), col("e_ts").as("ts"))
        .orderBy(col("user_id").asc, col("p_ts").asc)
    },

    "join_self" -> { (s, d) =>
      val ev = Tables.events(s, d)
      ev.as("a").join(ev.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.ts") > col("a.ts") &&
            col("b.ts") <= col("a.ts") + expr("INTERVAL 5 MINUTES"))
        .select(col("a.user_id").as("user_id"),
          col("a.event_id").as("eid_a"), col("b.event_id").as("eid_b"))
        .orderBy(col("eid_a").asc, col("eid_b").asc)
    },

    // Skew-salted fact ⋈ dim (Scale.saltedJoin wired
    // into a driver-checked path, not just library code): events enriched
    // with a per-user dimension through the salt-scattered join. The result
    // is provably identical to the plain join (ScaleSpec exercises a 90%-
    // hot-key distribution), so the oracle is the plain SQL join — which is
    // exactly the point: salting changes the shuffle layout, never the rows.
    "join_skew_salted" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val userDim = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"))
      Scale.saltedJoin(
          ev.select(col("user_id"), col("event_id"), col("event_type")),
          userDim, "user_id", salt = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_events")).as("sum_ue"))
        .orderBy(col("event_type").asc)
    },

    // TPC-H Q3-shaped multiway pipeline: selective dim filter → two
    // cascaded equi-joins → grouped decimal-exact revenue → global top-10.
    // The composition test for Catalyst: the mktsegment and date filters
    // push into all three scans, the customer side broadcasts under the
    // threshold (falls back to shuffle joins at 100 TB where AQE picks the
    // build side), and the top-k is TakeOrderedAndProject — never a global
    // sort. Revenue reuses agg_groupby_pricing's exact-decimal discipline:
    // (12,2) × (1.00 − (4,2)) keeps true scale 4, summed exactly, ONE cast
    // to double at output, with (o_orderdate, l_orderkey) making the
    // DESC-revenue order total.
    "join_multiway_q3" -> { (s, d) =>
      val cut = lit("1997-01-01").cast("timestamp_ntz")
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
          "AS DOUBLE)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc,
          col("l_orderkey").asc)
        .limit(10)
    },

    // TPC-H Q5-shaped star join — local-supplier revenue per nation: six
    // tables, a year of orders, one region. The canonical 100 TB plan:
    // region⋈nation⋈supplier collapse into ONE broadcast (dims are tiny —
    // even at sf100 supplier's nation projection is MBs), orders⋈customer
    // shuffle on custkey first (both carry custkey; the date filter
    // pushes to the orders scan), then one shuffle on orderkey against
    // lineitem, with the c_nationkey = s_nationkey local-supplier
    // predicate applied inside the broadcast probe — so the two big
    // shuffles are the only exchanges and each is on its natural key.
    "join_multiway_q5" -> { (s, d) =>
      val lo = lit("1996-01-01").cast("timestamp_ntz")
      val hi = lit("1997-01-01").cast("timestamp_ntz")
      val asiaSup = Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val oc = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(oc, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaSup), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
          "AS DOUBLE)").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    // TPC-H Q7 shape (volume shipping): bilateral trade between two
    // nations by ship year. The nation pair filter lands on supplier and
    // customer BEFORE either touches a fact table — the dimension chain
    // collapses to two tiny broadcast sides (a few % of each dim), so the
    // only big work is the lineitem⋈orders fact join, date-pruned at the
    // scan. The (supp, cust) pair predicate evaluates inside the fact
    // join's projection, not as a post-join filter stage, and the final
    // aggregate is a 4-group rollup — nothing scales with |lineitem|
    // except the one fact shuffle. Exact decimal revenue, double at
    // output only.
    "join_multiway_q7" -> { (s, d) =>
      val lo = lit("1996-01-01").cast("timestamp_ntz")
      val hi = lit("1998-01-01").cast("timestamp_ntz")
      val nations = Seq("NATION_11", "NATION_12")
      val sup = Tables.supplier(s, d)
        .join(Tables.nation(s, d).filter(col("n_name").isInCollection(nations)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(Tables.nation(s, d).filter(col("n_name").isInCollection(nations)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
          "AS DOUBLE)").as("revenue"))
        .orderBy(col("supp_nation").asc, col("cust_nation").asc, col("l_year").asc)
    },

    // Null-safe equi-join (`<=>` ↔ IS NOT DISTINCT FROM): the dimension-
    // lookup-with-unknowns shape — error events carry a NULL bucket key and
    // must land on the dim's sentinel "unknown" row instead of dropping out
    // (a plain equi-join loses every NULL row silently). `<=>` is a real
    // equi-join key for Catalyst, so this stays a broadcast-hash join, not
    // a BNLJ. Scale: NULL is ONE key value — if the null share is large it
    // is the classic skew key; here the dim side is an 11-row broadcast so
    // every partition probes locally and no shuffle of the fact occurs.
    "join_null_safe" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("bucket",
          when(col("event_type") === "error", lit(null).cast("long"))
            .otherwise(get_json_object(col("props"), "$.k").cast("long") % 10))
      val dim = s.range(0, 10)
        .select(col("id").as("bucket"),
          concat(lit("bucket_"), col("id")).as("bucket_name"))
        .unionAll(s.range(1).select(lit(null).cast("long").as("bucket"),
          lit("unknown").as("bucket_name")))
      ev.join(broadcast(dim), ev("bucket") <=> dim("bucket"))
        .groupBy(col("bucket_name"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(round(value * 10000, 0) AS BIGINT)")).as("sum_v10k"))
        .orderBy(col("bucket_name").asc)
    },

    // TPC-H Q10-shaped returned-item report: revenue lost to returns per
    // customer, top 20. The canonical plan at 100 TB: the l_returnflag
    // filter pushes to the lineitem scan (the 'R' stripe is ~⅓ of rows),
    // orders⋈lineitem shuffles on orderkey, the result shuffles ONCE on
    // custkey into the customer join + groupBy (customer attributes ride
    // the aggregate keys, so no second customer pass), nation is a
    // broadcast. Top-20 is TakeOrderedAndProject — no global sort.
    "join_multiway_q10" -> { (s, d) =>
      val lo = lit("1996-01-01").cast("timestamp_ntz")
      val hi = lit("1996-07-01").cast("timestamp_ntz")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val rev = l.join(o, col("l_orderkey") === col("o_orderkey"))
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(rev, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
          "AS DOUBLE)").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // TPC-H Q18-shaped large-order report — the HAVING-subquery semi-join
    // shape: orders qualify through an AGGREGATE predicate
    // (sum(l_quantity) > 240), not a row predicate, so the qualifying-key
    // set must be computed before any join. Plan at 100 TB: ONE
    // map-side-combined groupBy(l_orderkey) produces the (few) qualifying
    // orders WITH their quantity sum — the classic Q18 trap is joining
    // lineitem back a second time for the sum; carrying qsum out of the
    // HAVING aggregate makes the big fact pass single-scan. Orders join
    // on the shuffled orderkey; customer is the broadcast dim; top-100 is
    // TakeOrderedAndProject. Quantities sum in exact DECIMAL.
    "join_multiway_q18" -> { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_quantity"))).as("qsum"))
        .filter(col("qsum") > lit(240).cast("decimal(12,2)"))
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("qsum").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    // TPC-H Q2-shaped correlated min-cost lookup (the fixture has no
    // partsupp, so lineitem plays the supply table): for each small part,
    // the supplier(s) offering the MINIMUM extendedprice — selected by a
    // correlated scalar subquery, the classic Q2 decorrelation stress.
    // Written in SQL on temp views deliberately (the
    // filter_correlated_subquery precedent) so Catalyst's
    // RewriteCorrelatedScalarSubquery actually runs: the per-part min
    // compiles to ONE map-side-combined aggregate over lineitem joined
    // back on partkey — never a per-row subquery execution, which is the
    // difference between one shuffle and |part| scans of lineitem at
    // 100 TB. PlanSpec asserts the decorrelated aggregate + top-k plan.
    // Ties at the min price keep all qualifying suppliers; the
    // (min_price DESC, p_partkey, s_suppkey) order is total, so the
    // LIMIT 100 cut is deterministic in both engines (prices are parquet
    // doubles compared exactly, never re-derived).
    "join_multiway_q2" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_q2_part")
      Tables.supplier(s, d).createOrReplaceTempView("graft_q2_supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q2_lineitem")
      s.sql(
        """SELECT p_partkey, p_brand, s_suppkey, s_name,
          |       l_extendedprice AS min_price
          |FROM graft_q2_part
          |JOIN graft_q2_lineitem ON l_partkey = p_partkey
          |JOIN graft_q2_supplier ON s_suppkey = l_suppkey
          |WHERE p_size <= 5
          |  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
          |                         FROM graft_q2_lineitem l2
          |                         WHERE l2.l_partkey = p_partkey)
          |ORDER BY min_price DESC NULLS LAST, p_partkey ASC NULLS FIRST,
          |         s_suppkey ASC NULLS FIRST
          |LIMIT 100""".stripMargin)
    },

    // TPC-H Q21-shaped EXISTS + NOT-EXISTS self-join stack (suppliers who
    // kept multi-supplier orders waiting): a supplier's returned line in a
    // finished order counts iff ANOTHER supplier shipped in the same order
    // (EXISTS) and NO other supplier's line was returned (NOT EXISTS) —
    // returnflag standing in for the receipt>commit lateness column the
    // fixture lacks. The decorrelation stress nothing else covers: BOTH
    // subqueries correlate to the outer lineitem on orderkey with a
    // suppkey inequality, and must compile to a LeftSemi and a LeftAnti
    // join over ONE orderkey-shuffled self-join each — per-row subquery
    // execution would re-scan lineitem per line. PlanSpec asserts both
    // join types and no nested loops. count(*) per s_name with a total
    // (numwait DESC, s_name) order makes the LIMIT 100 deterministic.
    "join_multiway_q21" -> { (s, d) =>
      Tables.supplier(s, d).createOrReplaceTempView("graft_q21_supplier")
      Tables.orders(s, d).createOrReplaceTempView("graft_q21_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q21_lineitem")
      s.sql(
        """SELECT s_name, count(*) AS numwait
          |FROM graft_q21_supplier
          |JOIN graft_q21_lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN graft_q21_orders ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM graft_q21_lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM graft_q21_lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY s_name
          |ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS FIRST
          |LIMIT 100""".stripMargin)
    },

    // TPC-H Q4-shaped order-priority check: orders in a quarter that had
    // at least one LATE line (l_shipdate > o_orderdate + 60 days —
    // standing in for the commit/receipt columns the fixture lacks). The
    // decorrelation wrinkle Q21's pure-key EXISTS does not cover: the
    // subquery predicate references the OUTER's non-key column
    // (o_orderdate), so Catalyst must carry it into the semi-join as a
    // residual condition on the l_orderkey = o_orderkey hash join — a
    // per-row subquery would re-scan lineitem per order. PlanSpec asserts
    // the LeftSemi and no nested loops; the date window pushes to the
    // orders scan.
    "join_multiway_q4" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_q4_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q4_lineitem")
      s.sql(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM graft_q4_orders
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM graft_q4_lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    // TPC-H Q22-shaped global-customer report: high-balance customers
    // (above the positive-balance average — an UNCORRELATED scalar
    // subquery, evaluated once and broadcast as a literal filter) with no
    // orders at all (NOT EXISTS → LeftAnti on the custkey hash join),
    // grouped by a country-code stand-in (c_nationkey mod 5). The
    // remaining classic subquery composition after Q2 (correlated
    // scalar) and Q21 (correlated EXISTS stack). Determinism: the
    // average is the exact-decimal sum divided ONCE as double (the
    // filter_scalar_subquery discipline), so the > cut is the identical
    // IEEE comparison in both engines; totacctbal is dsumD-shaped.
    "join_multiway_q22" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("graft_q22_customer")
      Tables.orders(s, d).createOrReplaceTempView("graft_q22_orders")
      s.sql(
        """SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
          |       count(*) AS numcust,
          |       CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS totacctbal
          |FROM graft_q22_customer c
          |WHERE c_nationkey % 5 IN (0, 1, 2)
          |  AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE)
          |                          / count(*)
          |                   FROM graft_q22_customer
          |                   WHERE c_acctbal > 0.00
          |                     AND c_nationkey % 5 IN (0, 1, 2))
          |  AND NOT EXISTS (SELECT 1 FROM graft_q22_orders o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderpriority = '1-URGENT')
          |GROUP BY c_nationkey % 5
          |ORDER BY cntrycode ASC NULLS FIRST""".stripMargin)
    },

    // TPC-H Q19-shaped disjunctive-predicate join (discounted revenue for
    // three OR'd brand/size/quantity bands): the predicate-pushdown
    // stress — the WHERE is an OR of conjunction groups referencing BOTH
    // join sides, so no single conjunct is pushable as written; Catalyst's
    // CNF conversion (PushExtraPredicateThroughJoin) must DERIVE the
    // per-side implications — p_brand ∈ {…} ∧ p_size ≤ 15 to the part
    // scan, the l_quantity band union to the lineitem scan — while the
    // join itself stays the plain partkey hash join with the residual
    // disjunction evaluated post-join. PlanSpec asserts the derived
    // pushdowns and no nested loops. Exact-decimal revenue, one output
    // row.
    "join_multiway_q19" -> { (s, d) =>
      val bands =
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#17" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(bands)
        .agg(count(lit(1)).as("n_items"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
            "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
            "AS DOUBLE)").as("revenue"))
    },

    // TPC-H Q20-shaped excess-stock supplier probe — the DEEPEST nesting
    // in the suite: an IN subquery whose aggregate HAVING contains a
    // scalar subquery CORRELATED ON A GROUPING COLUMN (suppliers shipping
    // > 10% of a small part's total volume). Catalyst must decorrelate
    // the inner scalar into a partkey aggregate joined against the
    // grouped rows, then turn the IN into a LeftSemi — per-row execution
    // here would scan lineitem once per (supplier, part) group. All
    // quantity arithmetic in exact DECIMAL; the 0.10 multiplier widens
    // the decimal exactly in both engines, so the > cut is exact.
    "join_multiway_q20" -> { (s, d) =>
      Tables.supplier(s, d).createOrReplaceTempView("graft_q20_supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q20_lineitem")
      Tables.part(s, d).createOrReplaceTempView("graft_q20_part")
      s.sql(
        """SELECT s_suppkey, s_name
          |FROM graft_q20_supplier
          |WHERE s_suppkey IN (
          |  SELECT l.l_suppkey FROM graft_q20_lineitem l
          |  WHERE l.l_partkey IN (SELECT p_partkey FROM graft_q20_part
          |                        WHERE p_size <= 3)
          |  GROUP BY l.l_suppkey, l.l_partkey
          |  HAVING sum(CAST(l.l_quantity AS DECIMAL(12,2))) > 0.10 * (
          |    SELECT sum(CAST(l2.l_quantity AS DECIMAL(12,2)))
          |    FROM graft_q20_lineitem l2
          |    WHERE l2.l_partkey = l.l_partkey))
          |ORDER BY s_suppkey ASC NULLS FIRST""".stripMargin)
    },

    // TPC-H Q12-shaped shipping-priority split (l_returnflag standing in
    // for the shipmode column the fixture lacks): one fact⋈fact join with
    // the year window pushed to the lineitem scan, then two CONDITIONAL
    // sums per group — the conditional-aggregation composition pattern
    // (no second pass, no pivot; the CASE folds into the partial
    // aggregate map-side).
    "join_multiway_q12" -> { (s, d) =>
      val urgent = Seq("1-URGENT", "2-HIGH")
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("o_orderpriority").isInCollection(urgent), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isInCollection(urgent), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag").asc)
    },

    // TPC-H Q13-shaped customer distribution — the count-of-counts shape
    // with the Q13 trap intact: the order filter lives in the OUTER
    // JOIN'S ON CLAUSE, not a WHERE (a WHERE would silently turn the
    // outer join inner and drop the zero-order customers — the
    // distribution's most important bucket). Two cascaded aggregates;
    // count(o_orderkey) over the null-extended rows yields the honest 0.
    "join_multiway_q13" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT",
          "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q15-shaped top supplier: quarterly revenue per supplier as a
    // derived table, then the supplier(s) hitting the GLOBAL MAX via a
    // scalar subquery over the same derivation. The classic
    // aggregate-of-aggregate + scalar-subquery composition; the revenue
    // comparison runs in EXACT DECIMAL on both sides of the equality (a
    // double round-trip could split ties), cast to double only at
    // output.
    "join_multiway_q15" -> { (s, d) =>
      Tables.supplier(s, d).createOrReplaceTempView("graft_q15_supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q15_lineitem")
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |         sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          |             (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
          |  FROM graft_q15_lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
          |FROM graft_q15_supplier JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
          |ORDER BY s_suppkey ASC NULLS FIRST""".stripMargin)
    },

    // TPC-H Q17-shaped small-quantity-order revenue: lines of one brand
    // whose quantity is below 20% of that PART's average quantity — a
    // correlated AVG scalar subquery (the third decorrelation flavor
    // after Q2's min and Q20's grouped sum), folded by Catalyst into one
    // partkey aggregate joined back to the brand-filtered lines.
    // Determinism: l_quantity is integer-valued (fixture-wide, asserted
    // by the oracle matching), so avg = exact-integer sum / count is the
    // same double in any aggregation order, and 0.2 is cast to double
    // explicitly on both engines (the bare-literal rule). Output is one
    // double division of an exact decimal sum.
    "join_multiway_q17" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_q17_part")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q17_lineitem")
      s.sql(
        """SELECT count(*) AS n_lines,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
          |         / CAST(7.0 AS DOUBLE) AS avg_yearly
          |FROM graft_q17_lineitem l
          |JOIN graft_q17_part ON p_partkey = l.l_partkey
          |WHERE p_brand = 'Brand#2'
          |  AND l.l_quantity < CAST(0.2 AS DOUBLE) * (
          |    SELECT avg(l2.l_quantity) FROM graft_q17_lineitem l2
          |    WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
    },

    // TPC-H Q8 shape (national market share): of the AMERICA-customer
    // STANDARD-part trade over two years, what fraction of each year's
    // volume did NATION_3's suppliers ship? Completes the conditional-
    // ratio-over-a-star family: an 8-table join where every dimension
    // chain (customer→nation→region, supplier→nation, part) collapses to
    // broadcasts and the only big work is the lineitem⋈orders fact
    // shuffle — at 100 TB AQE picks build sides, and the year grouping is
    // 2 rows out of the fact join. Determinism: both the nation-filtered
    // and total volumes are EXACT decimal sums (the conditional sum's
    // ELSE is decimal 0, so no NULL-group hole), each cast to double
    // once, and the share is ONE double division (the cross-engine ratio
    // rule). year() is cast BIGINT on both engines (Spark INT vs DuckDB
    // BIGINT).
    "join_multiway_q8" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_q8_part")
      Tables.supplier(s, d).createOrReplaceTempView("graft_q8_supplier")
      Tables.customer(s, d).createOrReplaceTempView("graft_q8_customer")
      Tables.orders(s, d).createOrReplaceTempView("graft_q8_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q8_lineitem")
      Tables.nation(s, d).createOrReplaceTempView("graft_q8_nation")
      Tables.region(s, d).createOrReplaceTempView("graft_q8_region")
      s.sql(
        """SELECT o_year,
          |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol
          |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
          |         / CAST(sum(vol) AS DOUBLE) AS mkt_share
          |FROM (
          |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
          |              (CAST(1.00 AS DECIMAL(3,2)) -
          |               CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS vol,
          |         n2.n_name AS supp_nation
          |  FROM graft_q8_part
          |  JOIN graft_q8_lineitem ON l_partkey = p_partkey
          |  JOIN graft_q8_orders ON l_orderkey = o_orderkey
          |  JOIN graft_q8_customer ON o_custkey = c_custkey
          |  JOIN graft_q8_nation n1 ON c_nationkey = n1.n_nationkey
          |  JOIN graft_q8_region ON n1.n_regionkey = r_regionkey
          |  JOIN graft_q8_supplier ON l_suppkey = s_suppkey
          |  JOIN graft_q8_nation n2 ON s_nationkey = n2.n_nationkey
          |  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
          |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
          |GROUP BY o_year
          |ORDER BY o_year ASC NULLS FIRST""".stripMargin)
    },

    // TPC-H Q9 shape (product-type profit by nation and year): profit =
    // revenue − cost over every 'bolt' part, attributed to the SUPPLIER's
    // nation — p_retailprice × 0.50 × quantity standing in for the
    // ps_supplycost × quantity the fixture's missing partsupp would
    // carry. The all-fact star: part (name-filtered, pushed to the scan)
    // and supplier⋈nation broadcast; lineitem⋈orders is the one big
    // shuffle; the group is (nation, year) — 25×6 rows out. Determinism:
    // revenue keeps scale 4, cost keeps scale 6 (price(12,2) × 0.50(3,2)
    // × qty(12,2)), both cast lossless to DECIMAL(24,6) before the exact
    // subtraction; ONE cast to double at output.
    "join_multiway_q9" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_q9_part")
      Tables.supplier(s, d).createOrReplaceTempView("graft_q9_supplier")
      Tables.orders(s, d).createOrReplaceTempView("graft_q9_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q9_lineitem")
      Tables.nation(s, d).createOrReplaceTempView("graft_q9_nation")
      s.sql(
        """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |       CAST(sum(
          |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
          |              (CAST(1.00 AS DECIMAL(3,2)) -
          |               CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(24,6)) -
          |         CAST(CAST(p_retailprice AS DECIMAL(12,2)) *
          |              CAST(0.50 AS DECIMAL(3,2)) *
          |              CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,6))
          |       ) AS DOUBLE) AS sum_profit
          |FROM graft_q9_part
          |JOIN graft_q9_lineitem ON l_partkey = p_partkey
          |JOIN graft_q9_supplier ON l_suppkey = s_suppkey
          |JOIN graft_q9_orders ON l_orderkey = o_orderkey
          |JOIN graft_q9_nation ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%bolt%'
          |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
          |ORDER BY nation ASC NULLS FIRST, o_year DESC NULLS LAST""".stripMargin)
    },

    // TPC-H Q11 shape (important stock): per-part inventory value held by
    // two nations' suppliers, kept only where a part's value exceeds a
    // GLOBAL threshold — the uncorrelated-scalar-subquery-in-HAVING
    // composition (the subquery aggregates the SAME grouped frame the
    // filter applies to, so Catalyst runs the groupBy once per reference
    // and the threshold arrives as a one-row broadcast literal).
    // TPC-H's own fraction scales ∝1/SF (a fixed cut is vacuous at
    // sf0.1 — the round-8 vacuity rule); the scale-free restatement
    // keeps parts above 2× the MEAN part value (~10% of parts at every
    // fixture scale). Determinism: value is exact integer cents × qty
    // (BIGINT through sf100; DECIMAL(38,0) is the 100 TB widening), and
    // the threshold is the all-integer floor-division (2·Σ) div n —
    // Spark `div` ≡ DuckDB `//` on non-negative values, zero doubles
    // anywhere in the query.
    "join_multiway_q11" -> { (s, d) =>
      Tables.supplier(s, d).createOrReplaceTempView("graft_q11_supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q11_lineitem")
      Tables.nation(s, d).createOrReplaceTempView("graft_q11_nation")
      s.sql(
        """WITH v AS (
          |  SELECT l_partkey,
          |         sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
          |             CAST(l_quantity AS BIGINT)) AS val
          |  FROM graft_q11_lineitem
          |  JOIN graft_q11_supplier ON l_suppkey = s_suppkey
          |  JOIN graft_q11_nation ON s_nationkey = n_nationkey
          |  WHERE n_name IN ('NATION_3', 'NATION_7')
          |  GROUP BY l_partkey)
          |SELECT l_partkey, val AS part_value
          |FROM v
          |WHERE val > (SELECT (2 * sum(val)) div count(*) FROM v)
          |ORDER BY part_value DESC NULLS LAST, l_partkey ASC NULLS FIRST""".stripMargin)
    },

    // TPC-H Q14 shape (promotion effect): the share of one ship-month's
    // revenue earned by PROMO-type parts, as the canonical single-row
    // conditional-ratio report. The month filter prunes the lineitem scan
    // (min/max row-group skipping at 100 TB), part broadcasts, and the
    // whole query is one map-side-combined aggregate — no group key at
    // all. Determinism: both decimal sums exact (conditional ELSE is
    // decimal 0), each cast to double once, then 100 × promo / total
    // evaluates left-associatively as the identical two IEEE ops in both
    // engines.
    "join_multiway_q14" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_q14_part")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q14_lineitem")
      s.sql(
        """SELECT count(*) AS n_lines,
          |       CAST(100 AS DOUBLE) *
          |       CAST(sum(CASE WHEN p_type = 'PROMO' THEN vol
          |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
          |         / CAST(sum(vol) AS DOUBLE) AS promo_revenue
          |FROM (
          |  SELECT p_type,
          |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
          |              (CAST(1.00 AS DECIMAL(3,2)) -
          |               CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS vol
          |  FROM graft_q14_lineitem
          |  JOIN graft_q14_part ON l_partkey = p_partkey
          |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00')""".stripMargin)
    },

    // TPC-H Q16 shape (parts/supplier relationship): how many distinct
    // suppliers ship each surviving (brand, type, size) bucket, excluding
    // a blocklist of suppliers via NOT IN — the null-aware anti-join
    // decorrelation no other query exercises (Catalyst compiles the NOT
    // IN subquery to a broadcast null-aware anti join, never a per-row
    // probe; PlanSpec asserts it). The brand/type/size predicates push to
    // the part scan, the blocklist is a 6-row broadcast, and the distinct
    // count shuffles (brand, type, size, suppkey) once through Expand.
    "join_multiway_q16" -> { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("graft_q16_part")
      Tables.supplier(s, d).createOrReplaceTempView("graft_q16_supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q16_lineitem")
      s.sql(
        """SELECT p_brand, p_type, p_size,
          |       count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM graft_q16_part
          |JOIN graft_q16_lineitem ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM graft_q16_supplier
          |                        WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS FIRST,
          |         p_type ASC NULLS FIRST, p_size ASC NULLS FIRST""".stripMargin)
    },

    // Bucketed co-located fact ⋈ fact (Scale.writeBucketed wired into a
    // driver-checked path): both sides live as catalog tables bucketed 8
    // ways on the join key, so the forced sort-merge join reads bucket i
    // against bucket i with NO exchange on either side — the one-time
    // write is the shuffle, amortized over every subsequent join at 100 TB
    // (the layout ETL pipelines maintain on their hub keys). Bucketing
    // moves only the physical layout, never the rows, so the oracle is the
    // plain SQL join; ScaleSpec asserts the exchange-free plan.
    "join_bucketed_colocated" -> { (s, d) =>
      val l = bucketed(s, d, "lineitem", "l_orderkey")
      val o = bucketed(s, d, "orders", "o_orderkey")
      l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsumD(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderpriority").asc)
    }
  )

  /** Fixture table as an 8-bucket catalog table, memoized per session: the
    * catalog is in-memory (session-scoped), so `tableExists` IS the
    * freshness check — a new session (every verify/bench invocation) rewrites
    * from the current fixture, repeats within a session reuse the write.
    * The sf dir is baked into the table name so two dirs never collide
    * inside one session (suites run sf0.001 while bench runs sf0.1). */
  private def bucketed(s: SparkSession, d: String, table: String,
      key: String): DataFrame = {
    val name = s"graft_bkt_${table}_${java.lang.Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(name)) {
      // The catalog is session-scoped but the warehouse DIRECTORY is not:
      // a previous session's managed-table location survives as an orphan
      // that saveAsTable refuses to overwrite (LOCATION_ALREADY_EXISTS).
      // Unknown-to-the-catalog means stale by definition here — remove it.
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), name)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      Scale.writeBucketed(Tables(s, d, table), name, key, buckets = 8)
    }
    s.table(name)
  }

  val oracles: Seq[(String, String)] = Seq(
    "join_inner_equi" ->
      """SELECT o_orderkey, c_custkey, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_broadcast" ->
      """SELECT p_brand, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,

    "join_multiway_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC NULLS LAST, o_orderdate ASC NULLS FIRST,
        |         l_orderkey ASC NULLS FIRST
        |LIMIT 10""".stripMargin,

    "join_multiway_q5" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""".stripMargin,

    "join_null_safe" ->
      """WITH ev AS (SELECT CASE WHEN event_type = 'error' THEN NULL
        |                        ELSE CAST(json_extract_string(props, 'k') AS BIGINT) % 10 END AS bucket,
        |                   CAST(round(value * 10000, 0) AS BIGINT) AS iv
        |            FROM events),
        |dim AS (SELECT CAST(range AS BIGINT) AS bucket,
        |               'bucket_' || range AS bucket_name FROM range(0, 10)
        |        UNION ALL SELECT NULL, 'unknown')
        |SELECT bucket_name, count(*) AS n_events,
        |       CAST(sum(iv) AS BIGINT) AS sum_v10k
        |FROM ev JOIN dim ON ev.bucket IS NOT DISTINCT FROM dim.bucket
        |GROUP BY bucket_name
        |ORDER BY bucket_name ASC NULLS FIRST""".stripMargin,

    "join_multiway_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS FIRST
        |LIMIT 20""".stripMargin,

    "join_multiway_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(qsum AS DOUBLE) AS sum_qty
        |FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qsum
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 240) big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 100""".stripMargin,

    "join_multiway_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate) AS l_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_11', 'NATION_12')
        |  AND n2.n_name IN ('NATION_11', 'NATION_12')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation ASC NULLS FIRST, cust_nation ASC NULLS FIRST,
        |         l_year ASC NULLS FIRST""".stripMargin,

    "join_multiway_q2" ->
      """SELECT p_partkey, p_brand, s_suppkey, s_name,
        |       l_extendedprice AS min_price
        |FROM part
        |JOIN lineitem ON l_partkey = p_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_size <= 5
        |  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
        |                         FROM lineitem l2
        |                         WHERE l2.l_partkey = p_partkey)
        |ORDER BY min_price DESC NULLS LAST, p_partkey ASC NULLS FIRST,
        |         s_suppkey ASC NULLS FIRST
        |LIMIT 100""".stripMargin,

    "join_multiway_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS FIRST
        |LIMIT 100""".stripMargin,

    "join_multiway_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    "join_multiway_q22" ->
      """SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
        |       count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_nationkey % 5 IN (0, 1, 2)
        |  AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE)
        |                          / count(*)
        |                   FROM customer
        |                   WHERE c_acctbal > 0.00
        |                     AND c_nationkey % 5 IN (0, 1, 2))
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey % 5
        |ORDER BY cntrycode ASC NULLS FIRST""".stripMargin,

    "join_multiway_q19" ->
      """SELECT count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "join_multiway_q20" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l.l_suppkey FROM lineitem l
        |  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 3)
        |  GROUP BY l.l_suppkey, l.l_partkey
        |  HAVING sum(CAST(l.l_quantity AS DECIMAL(12,2))) > 0.10 * (
        |    SELECT sum(CAST(l2.l_quantity AS DECIMAL(12,2)))
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = l.l_partkey))
        |ORDER BY s_suppkey ASC NULLS FIRST""".stripMargin,

    "join_multiway_q12" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "join_multiway_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin,

    "join_multiway_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey ASC NULLS FIRST""".stripMargin,

    "join_multiway_q17" ->
      """SELECT count(*) AS n_lines,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |         / CAST(7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem l
        |JOIN part ON p_partkey = l.l_partkey
        |WHERE p_brand = 'Brand#2'
        |  AND l.l_quantity < CAST(0.2 AS DOUBLE) * (
        |    SELECT avg(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "join_multiway_q8" ->
      """SELECT o_year,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |         / CAST(sum(vol) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |              (CAST(1.00 AS DECIMAL(3,2)) -
        |               CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS vol,
        |         n2.n_name AS supp_nation
        |  FROM part
        |  JOIN lineitem ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY o_year
        |ORDER BY o_year ASC NULLS FIRST""".stripMargin,

    "join_multiway_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |              (CAST(1.00 AS DECIMAL(3,2)) -
        |               CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(24,6)) -
        |         CAST(CAST(p_retailprice AS DECIMAL(12,2)) *
        |              CAST(0.50 AS DECIMAL(3,2)) *
        |              CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,6))
        |       ) AS DOUBLE) AS sum_profit
        |FROM part
        |JOIN lineitem ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
        |ORDER BY nation ASC NULLS FIRST, o_year DESC NULLS LAST""".stripMargin,

    "join_multiway_q11" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                  CAST(l_quantity AS BIGINT)) AS BIGINT) AS val
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7')
        |  GROUP BY l_partkey)
        |SELECT l_partkey, val AS part_value
        |FROM v
        |WHERE val > (SELECT (2 * sum(val)) // count(*) FROM v)
        |ORDER BY part_value DESC NULLS LAST, l_partkey ASC NULLS FIRST""".stripMargin,

    "join_multiway_q14" ->
      """SELECT count(*) AS n_lines,
        |       CAST(100 AS DOUBLE) *
        |       CAST(sum(CASE WHEN p_type = 'PROMO' THEN vol
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |         / CAST(sum(vol) AS DOUBLE) AS promo_revenue
        |FROM (
        |  SELECT p_type,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |              (CAST(1.00 AS DECIMAL(3,2)) -
        |               CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS vol
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00')""".stripMargin,

    "join_multiway_q16" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS FIRST,
        |         p_type ASC NULLS FIRST, p_size ASC NULLS FIRST""".stripMargin,

    // Bucketing is layout, not semantics: the oracle is the plain join.
    "join_bucketed_colocated" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    "join_sortmerge" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "join_right_outer" ->
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_full_outer" ->
      """SELECT c_custkey, o_orderkey
        |FROM (SELECT * FROM customer WHERE c_custkey < 600) c
        |FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey >= 400 AND o_custkey < 800) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey ASC NULLS FIRST, n_nationkey ASC NULLS FIRST""".stripMargin,

    "join_theta_range" ->
      """SELECT s_suppkey, c_custkey
        |FROM supplier JOIN customer
        |  ON s_acctbal > c_acctbal - 10.0 AND s_acctbal < c_acctbal
        |ORDER BY s_suppkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    "join_range_banded" ->
      """SELECT s_suppkey, c_custkey
        |FROM supplier JOIN customer
        |  ON s_acctbal > c_acctbal - 10.0 AND s_acctbal < c_acctbal
        |ORDER BY s_suppkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    "join_interval" ->
      """WITH b AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events)
        |SELECT b.h AS h, count(*) AS n_events
        |FROM events e JOIN b ON e.ts >= b.h AND e.ts < b.h + INTERVAL 30 MINUTE
        |GROUP BY b.h
        |ORDER BY h ASC NULLS FIRST""".stripMargin,

    "join_asof" ->
      """WITH probes AS (
        |  SELECT DISTINCT user_id, p_ts
        |  FROM events, (VALUES (TIMESTAMP '2024-01-10 00:00:00'),
        |                       (TIMESTAMP '2024-01-20 00:00:00')) v(p_ts)
        |), j AS (
        |  SELECT p.user_id, p.p_ts, e.event_id, e.ts,
        |         row_number() OVER (PARTITION BY p.user_id, p.p_ts
        |                            ORDER BY e.ts DESC NULLS LAST, e.event_id DESC NULLS LAST) AS rn
        |  FROM probes p LEFT JOIN events e ON e.user_id = p.user_id AND e.ts <= p.p_ts
        |)
        |SELECT user_id, p_ts, event_id, ts FROM j WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, p_ts ASC NULLS FIRST""".stripMargin,

    // The backward oracle with the staleness bound folded into the
    // candidate predicate: too-old matches never qualify, so the LEFT
    // JOIN's NULL row wins for stale probes.
    "join_asof_tolerance" ->
      """WITH probes AS (
        |  SELECT DISTINCT user_id, p_ts
        |  FROM events, (VALUES (TIMESTAMP '2024-01-10 00:00:00'),
        |                       (TIMESTAMP '2024-01-20 00:00:00')) v(p_ts)
        |), j AS (
        |  SELECT p.user_id, p.p_ts, e.event_id, e.ts,
        |         row_number() OVER (PARTITION BY p.user_id, p.p_ts
        |                            ORDER BY e.ts DESC NULLS LAST, e.event_id DESC NULLS LAST) AS rn
        |  FROM probes p LEFT JOIN events e ON e.user_id = p.user_id
        |    AND e.ts <= p.p_ts AND e.ts >= p.p_ts - INTERVAL 2 DAY
        |)
        |SELECT user_id, p_ts, event_id, ts FROM j WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, p_ts ASC NULLS FIRST""".stripMargin,

    "join_asof_native" ->
      """WITH probes AS (
        |  SELECT DISTINCT user_id, p_ts
        |  FROM events, (VALUES (TIMESTAMP '2024-01-10 00:00:00'),
        |                       (TIMESTAMP '2024-01-20 00:00:00')) v(p_ts)
        |), j AS (
        |  SELECT p.user_id, p.p_ts, e.event_id, e.ts,
        |         row_number() OVER (PARTITION BY p.user_id, p.p_ts
        |                            ORDER BY e.ts DESC NULLS LAST, e.event_id DESC NULLS LAST) AS rn
        |  FROM probes p LEFT JOIN events e ON e.user_id = p.user_id AND e.ts <= p.p_ts
        |)
        |SELECT user_id, p_ts, event_id, ts FROM j WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, p_ts ASC NULLS FIRST""".stripMargin,

    "join_asof_forward" ->
      """WITH probes AS (
        |  SELECT DISTINCT user_id, p_ts
        |  FROM events, (VALUES (TIMESTAMP '2024-01-10 00:00:00'),
        |                       (TIMESTAMP '2024-01-20 00:00:00')) v(p_ts)
        |), j AS (
        |  SELECT p.user_id, p.p_ts, e.event_id, e.ts,
        |         row_number() OVER (PARTITION BY p.user_id, p.p_ts
        |                            ORDER BY e.ts ASC NULLS LAST, e.event_id ASC NULLS LAST) AS rn
        |  FROM probes p LEFT JOIN events e ON e.user_id = p.user_id AND e.ts >= p.p_ts
        |)
        |SELECT user_id, p_ts, event_id, ts FROM j WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, p_ts ASC NULLS FIRST""".stripMargin,

    "join_asof_nearest" ->
      """WITH probes AS (
        |  SELECT DISTINCT user_id, p_ts
        |  FROM events, (VALUES (TIMESTAMP '2024-01-10 00:00:00'),
        |                       (TIMESTAMP '2024-01-20 00:00:00')) v(p_ts)
        |), j AS (
        |  SELECT p.user_id, p.p_ts, e.event_id, e.ts,
        |         row_number() OVER (PARTITION BY p.user_id, p.p_ts
        |                            ORDER BY abs(epoch_us(e.ts) - epoch_us(p.p_ts)) ASC NULLS LAST,
        |                                     (CASE WHEN e.ts <= p.p_ts THEN 0 ELSE 1 END) ASC,
        |                                     (CASE WHEN e.ts <= p.p_ts THEN -e.event_id ELSE e.event_id END) ASC) AS rn
        |  FROM probes p LEFT JOIN events e ON e.user_id = p.user_id AND e.ts IS NOT NULL
        |)
        |SELECT user_id, p_ts, event_id, ts FROM j WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, p_ts ASC NULLS FIRST""".stripMargin,

    "join_self" ->
      """SELECT a.user_id AS user_id, a.event_id AS eid_a, b.event_id AS eid_b
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |ORDER BY eid_a ASC NULLS FIRST, eid_b ASC NULLS FIRST""".stripMargin,

    "join_skew_salted" ->
      """WITH ud AS (SELECT user_id, count(*) AS user_events
        |            FROM events GROUP BY user_id)
        |SELECT event_type, count(*) AS n,
        |       CAST(sum(user_events) AS BIGINT) AS sum_ue
        |FROM events e JOIN ud USING (user_id)
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin
  )
}
