package graft.ops

import graft.Tables
import graft.Tables.{dsumD, dec2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.D — aggregation operators.
  *
  * Scale notes (100 TB): every query here is a hash aggregate with map-side
  * partial aggregation — Spark plans partial+final HashAggregate pairs
  * automatically, so the shuffle carries only per-group partials, not rows.
  * Group counts are tiny relative to input (flags, types, nations), so the
  * final stage is never the bottleneck. Decimal casts keep cross-engine sums
  * exact without sacrificing codegen.
  */
object Aggregates {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "agg_global" -> { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(col("l_orderkey")).as("sum_okey"),
        dsumD(col("l_extendedprice")).as("sum_price"))
    },

    "agg_groupby_pricing" -> { (s, d) =>
      // TPC-H Q1 shape: the flagship partial-aggregation benchmark.
      // All money arithmetic in exact decimal (see Tables.dsum scaladoc).
      import Tables.{dec2, rate2, oneD, Money}
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsumD(col("l_quantity")).as("sum_qty"),
          dsumD(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (oneD - rate2(col("l_discount")))).cast(Money).cast("double").as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) * (oneD - rate2(col("l_discount"))) * (oneD + rate2(col("l_tax")))).cast(DecimalType(38, 6)).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Column profiling (the DESCRIBE-EXTENDED / data-quality shape every
    // warehouse exposes): per-column null and exact distinct counts plus
    // the row count, ONE pass over the table. Multiple exact
    // count(DISTINCT) in one aggregate plan via Catalyst's Expand — one
    // duplicated stream per distinct column, the honest exact plan. SCALE
    // NOTE: at 100 TB the Expand multiplies the scan |cols| times;
    // production swaps countDistinct for approx_count_distinct (same
    // query shape, no Expand) or profiles column groups in separate
    // passes — the exact twin here is what the oracle can check.
    "agg_profile_stats" -> { (s, d) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val aggs = cols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")) }
      Tables.orders(s, d)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(explode(array(cols.map(c => struct(
            lit(c).as("col_name"), col(s"nn_$c").as("n_null"),
            col(s"nd_$c").as("n_distinct"), col("n_rows"))): _*)).as("p"))
        .select(col("p.col_name"), col("p.n_null"), col("p.n_distinct"),
          col("p.n_rows"))
        .orderBy(col("col_name").asc)
    },

    // Declarative data-quality constraint suite (the deequ/expectations
    // shape every ingestion pipeline gates on): six column constraints —
    // not-null, uniqueness, non-negativity, value domain, date range,
    // plus a DELIBERATELY failing uniqueness check on a non-key column so
    // the violation path is exercised, not just the zeros — evaluated in
    // ONE aggregate pass over the table, and a referential-integrity
    // constraint as a single left_anti count against the dim. Output is
    // the audit row per constraint: (name, n_violations, pass). Scale:
    // the whole suite costs one scan + one map-side-combined aggregate +
    // one broadcast anti-join regardless of how many column constraints
    // are declared — violations never materialize as rows (a 100 TB gate
    // reports counts; sampling offending rows is a separate targeted
    // query). The uniqueness checks ride count − countDistinct through
    // Catalyst's Expand, the agg_profile_stats trade. NULL semantics
    // (three-valued, shared with StreamOps.startDqGateSink and the SQL
    // oracle): a NULL gated value makes a domain/range predicate NULL,
    // which `when` counts as not-violated — nullness is its own
    // constraint (the not-null check), never an implicit violation of
    // every range check.
    "dq_constraint_check" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val lo = lit("1990-01-01").cast("timestamp_ntz")
      val hi = lit("2005-01-01").cast("timestamp_ntz")
      val a = o.agg(
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_nn"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uk"),
        sum(when(col("o_totalprice") < 0.0, 1L).otherwise(0L)).as("v_neg"),
        sum(when(!col("o_orderstatus").isInCollection(Seq("F", "O", "P")), 1L)
          .otherwise(0L)).as("v_dom"),
        sum(when(col("o_orderdate") < lo || col("o_orderdate") >= hi, 1L)
          .otherwise(0L)).as("v_rng"),
        (count(lit(1)) - countDistinct(col("o_custkey"))).as("v_uc"))
      val fk = o.join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk"))
      a.crossJoin(fk)
        .select(explode(array(
          struct(lit("domain_o_orderstatus").as("constraint_name"),
            col("v_dom").as("n_violations")),
          struct(lit("fk_o_custkey_customer").as("constraint_name"),
            col("v_fk").as("n_violations")),
          struct(lit("not_null_o_orderkey").as("constraint_name"),
            col("v_nn").as("n_violations")),
          struct(lit("nonneg_o_totalprice").as("constraint_name"),
            col("v_neg").as("n_violations")),
          struct(lit("range_o_orderdate").as("constraint_name"),
            col("v_rng").as("n_violations")),
          struct(lit("unique_o_custkey").as("constraint_name"),
            col("v_uc").as("n_violations")),
          struct(lit("unique_o_orderkey").as("constraint_name"),
            col("v_uk").as("n_violations")))).as("c"))
        .select(col("c.constraint_name").as("constraint_name"),
          col("c.n_violations").as("n_violations"),
          (col("c.n_violations") === 0L).as("pass"))
        .orderBy(col("constraint_name").asc)
    },

    // TPC-H Q6-shaped forecasting-revenue scan: the pure
    // filter-and-aggregate classic — no join, no group — whose entire
    // cost at 100 TB is how little the scan reads: all three predicates
    // (date window, discount band, quantity cut) push to parquet
    // row-group stats, and the projection prunes to 4 columns. Revenue
    // Σ price·discount in exact DECIMAL, double once at output.
    "agg_filtered_revenue_q6" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_items"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
            "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)").as("revenue"))
    },

    "agg_having" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsumD(col("o_totalprice")).as("sum_price"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("o_custkey").asc)
    },

    // Incremental aggregate maintenance (the materialized-view merge
    // algebra): the historical partition and the new-day delta are
    // aggregated SEPARATELY into mergeable partials (count, decimal sum),
    // then folded by a second-level aggregate — merge(partial(A),
    // partial(B)) ≡ agg(A ∪ B), which the oracle computes directly over
    // the union. This is the 100 TB nightly-refresh shape: the base
    // partials are a tiny summary table read back from storage, only the
    // delta scans new data, and both levels are map-side combinable. The
    // sums stay DECIMAL(38,4) through the merge; double only at output.
    "agg_incremental_merge" -> { (s, d) =>
      val split = lit("2000-01-01").cast("timestamp_ntz")
      val o = Tables.orders(s, d)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            expr("sum(CAST(o_totalprice AS DECIMAL(38,4)))").as("s"))
      partial(o.filter(col("o_orderdate") < split))
        .unionAll(partial(o.filter(col("o_orderdate") >= split)))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("s")).cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority").asc)
    },

    "agg_count_distinct" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type").asc)
    },

    // Mergeable-sketch persistence — agg_incremental_merge's algebra
    // extended to the approx family, the way a 100 TB profile job
    // actually runs: per-epoch Datasketches HLL partials (a binary
    // column) are PERSISTED to parquet once per fixture signature, and
    // the query answers by hll_union_agg-merging the STORED partials —
    // the raw data is scanned only by the control arms. Two
    // deterministic flags make it oracle-backed (the
    // agg_approx_distinct bounded-flag discipline):
    //  - `persist_exact`: disk-merged ≡ inline-merged of the same
    //    decomposition — TRUE by construction at ANY cardinality (the
    //    parquet roundtrip of the sketch blob is lossless and a union's
    //    result depends only on the input SET, never arrival order).
    //    Deliberately NOT merged-vs-direct equality: a union gadget
    //    promotes coupon-mode inputs to dense HLL earlier than a
    //    straight sketch of the same data, so at cardinalities near the
    //    lgK=12 sparse/dense boundary (measured: 1290 exact → direct
    //    1290 vs merged 1278 at sf0.01) the two estimators legitimately
    //    differ by <1% — that gap is bounded in AggregatesSpec, not
    //    asserted zero here, and would make the flag cardinality-fragile
    //    under fixture regeneration.
    //  - `hll_ok`: the merged estimate sits within 6%-or-2 of the exact
    //    count (≈3.7σ at lgK=12's 1.6% rsd).
    // AggregatesSpec additionally proves the persisted partials survive
    // reshuffling and two-stage re-merge (the mergeability a profile
    // job's daily rollup leans on).
    "agg_hll_sketch_merge" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val split = lit("2000-01-01").cast("timestamp_ntz")
      def partial(df: DataFrame, half: Int) =
        df.groupBy(col("o_orderpriority"))
          .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
          .withColumn("half", lit(half))
      def inlinePartials =
        partial(o.filter(col("o_orderdate") < split), 0)
          .unionByName(partial(o.filter(col("o_orderdate") >= split), 1))
      val dir = sketchDir(d)
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        inlinePartials.write.mode("overwrite").parquet(dir)
      def mergeEst(partials: DataFrame, out: String) =
        partials.groupBy(col("o_orderpriority"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as(out))
      val fromDisk = mergeEst(s.read.parquet(dir), "est_merged")
      val inline = mergeEst(inlinePartials, "est_inline")
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      exact.join(fromDisk, Seq("o_orderpriority"))
        .join(inline, Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("n_exact"),
          (col("est_merged") === col("est_inline")).as("persist_exact"),
          (abs(col("est_merged") - col("n_exact")) <=
            greatest(round(col("n_exact") * 0.06), lit(2))).as("hll_ok"))
        .orderBy(col("o_orderpriority").asc)
    },

    // Theta-sketch SET ALGEBRA over persisted partials — the question HLL
    // cannot answer: segment-overlap distinct counts (|A∩B|, |A\B|)
    // WITHOUT joining the raw rows of A and B. The 100 TB shape:
    // per-(segment, epoch) compact theta blobs (~8 B/retained key) are
    // persisted once, signature-keyed like the HLL partials; every
    // overlap question is then answered from the k-row summary table —
    // union/intersection/difference are O(k) blob operations on the
    // driver-sized pair frame (5 segments → 10 pairs), the raw fact
    // table is never rescanned and never self-joined. Oracle-backed
    // EXACTLY (not flag-bounded): theta sketches are deterministic
    // (k smallest MurmurHash3 values, no RNG) and below the lgK=14
    // nominal (16384) they are in exact mode, where estimates equal
    // true distinct counts — per-segment distinct customers peak at
    // ~12.9k and two-segment unions ~14.7k at sf0.1, both under
    // nominal (ThetaSketchSpec covers the >nominal estimation path on
    // a synthetic corpus, plus reshuffle/re-merge invariance).
    // persist_exact = disk-merged ≡ inline-merged estimate, TRUE by
    // construction (lossless blob roundtrip, order-independent union).
    "agg_theta_sketch_setops" -> { (s, d) =>
      import graft.functions.ThetaSketch
      val o = Tables.orders(s, d)
      val split = lit("2000-01-01").cast("timestamp_ntz")
      def partial(df: DataFrame, half: Int) =
        df.groupBy(col("o_orderpriority"))
          .agg(ThetaSketch.thetaSketchAgg(col("o_custkey")).as("sk"))
          .withColumn("half", lit(half))
      def inlinePartials =
        partial(o.filter(col("o_orderdate") < split), 0)
          .unionByName(partial(o.filter(col("o_orderdate") >= split), 1))
      val dir = sketchDir(d, "thetasketch")
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        inlinePartials.write.mode("overwrite").parquet(dir)
      def merged(partials: DataFrame, out: String) =
        partials.groupBy(col("o_orderpriority"))
          .agg(ThetaSketch.thetaUnionAgg(col("sk")).as(out))
      val est = udf(ThetaSketch.estimate)
      val uni = udf(ThetaSketch.unionEstExact)
      val inter = udf(ThetaSketch.intersectEst)
      val anotb = udf(ThetaSketch.aNotBEst)
      // requireExactMode: runtime tripwire on the ≤k-row merged frame —
      // if a regenerated fixture pushes any segment past the lgK nominal,
      // fail with a diagnostic instead of a bare oracle hash mismatch.
      val exact = udf(ThetaSketch.requireExactMode)
      val per = merged(s.read.parquet(dir), "sk_d")
        .join(merged(inlinePartials, "sk_i"), Seq("o_orderpriority"))
        .select(col("o_orderpriority").as("p"), exact(col("sk_d")).as("sk_d"),
          (est(col("sk_d")) === est(exact(col("sk_i")))).as("pe"))
      val a = per.select(col("p").as("pri_a"), col("sk_d").as("ska"), col("pe").as("pea"))
      val b = per.select(col("p").as("pri_b"), col("sk_d").as("skb"), col("pe").as("peb"))
      a.join(b, col("pri_a") < col("pri_b"))
        .select(col("pri_a"), col("pri_b"),
          est(col("ska")).as("n_a"), est(col("skb")).as("n_b"),
          uni(col("ska"), col("skb")).as("n_union"),
          inter(col("ska"), col("skb")).as("n_intersect"),
          anotb(col("ska"), col("skb")).as("n_anotb"),
          (col("pea") && col("peb")).as("persist_exact"))
        .orderBy(col("pri_a").asc, col("pri_b").asc)
    },

    // Deterministic mergeable QUANTILES over persisted partials — the
    // third member of the summary family (HLL union / theta set-algebra /
    // this): per-(segment, epoch) HdrHistogram-style log₂-bucket counters
    // persisted once, merged by plain per-bucket SUM, percentiles
    // answered from the merged counters with ≤1/32 relative error — see
    // functions/HdrHistogram.scala for why this beats KLL/t-digest here
    // (those compact with RNG coin flips: non-reproducible, ungateable).
    // Fully hash-exact cross-engine: bucket math is all-BIGINT
    // shift/floor-div and extraction uses cum·b ≥ a instead of ⌈a/b⌉.
    // At 100 TB the partials are a few KB per (segment, epoch)
    // regardless of row count; only the delta epoch ever rescans data,
    // and the quantile read is a ~100-row-per-group window, shuffled by
    // segment. AggregatesSpec pins merge invariance and the
    // lower-bound-bracket guarantee against the exact percentile.
    "agg_hdr_quantile_merge" -> { (s, d) =>
      import graft.functions.HdrHistogram
      val o = Tables.orders(s, d)
      val split = lit("2000-01-01").cast("timestamp_ntz")
      def partial(df: DataFrame, half: Int) =
        df.select(col("o_orderpriority").as("p"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
          .withColumn("bkt", expr(HdrHistogram.bucketSql("v")))
          .groupBy(col("p"), col("bkt")).agg(count(lit(1)).as("cnt"))
          .withColumn("half", lit(half))
      val dir = sketchDir(d, "hdrhist")
      if (!new java.io.File(s"$dir/_SUCCESS").exists())
        partial(o.filter(col("o_orderdate") < split), 0)
          .unionByName(partial(o.filter(col("o_orderdate") >= split), 1))
          .write.mode("overwrite").parquet(dir)
      val mergedHist = s.read.parquet(dir)
        .groupBy(col("p"), col("bkt")).agg(sum(col("cnt")).as("cnt"))
      val cum = mergedHist
        .withColumn("cum", sum(col("cnt"))
          .over(Window.partitionBy(col("p")).orderBy(col("bkt").asc)))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("p"))))
      cum.groupBy(col("p"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") * 2 >= col("n"), col("bkt"))).as("p50_cents"),
          min(when(col("cum") * 20 >= col("n") * 19, col("bkt"))).as("p95_cents"),
          min(when(col("cum") * 100 >= col("n") * 99, col("bkt"))).as("p99_cents"))
        .select(col("p").as("o_orderpriority"), col("n"),
          col("p50_cents"), col("p95_cents"), col("p99_cents"))
        .orderBy(col("o_orderpriority").asc)
    },

    // HLL sketch values differ across engines, so the sketch itself cannot
    // hash-match an oracle. The declared output is the exact count plus a
    // BOUNDED-ERROR flag on the HLL estimate (|approx-exact| within 3σ of
    // rsd=0.02, floor 2): deterministic TRUE in both engines, which turns
    // the round-1 `no_oracle` row into a full oracle-backed check while the
    // query still exercises the sketch. AggregatesSpec pins the raw
    // estimate separately.
    "agg_approx_distinct" -> { (s, d) =>
      Tables.supplier(s, d)
        .groupBy(col("s_nationkey"))
        .agg(countDistinct(col("s_suppkey")).as("n_exact"),
          approx_count_distinct(col("s_suppkey"), 0.02).as("approx"))
        .select(col("s_nationkey"), col("n_exact"),
          (abs(col("approx") - col("n_exact")) <=
            greatest(round(col("n_exact") * 0.06), lit(2))).as("hll_ok"))
        .orderBy(col("s_nationkey").asc)
    },

    "agg_grouping_sets" -> { (s, d) =>
      val v = Tables.lineitem(s, d)
      v.createOrReplaceTempView("graft_li_gsets")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
          |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
          |       count(*) AS n,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
          |FROM graft_li_gsets
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY g_flag ASC, g_status ASC,
          |         l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    "agg_rollup" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsumD(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    "agg_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsumD(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "agg_collect_sorted" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        // list output joined to one string: the driver's pandas comparator
        // cannot sort/hash ndarray cells (round-1 comparator error).
        .agg(array_join(sort_array(collect_list(col("o_orderpriority"))), "|")
          .as("prios"))
        .orderBy(col("o_custkey").asc)
    },

    "agg_first_last_minmax_by" -> { (s, d) =>
      // argmax with deterministic tie-break: max over struct orders by
      // (price, name) lexicographically — ties on price resolve by name.
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(max(struct(col("p_retailprice"), col("p_name"))).as("mx"),
          min(struct(col("p_retailprice"), col("p_name"))).as("mn"))
        .select(col("p_brand"),
          col("mx.p_retailprice").as("max_price"), col("mx.p_name").as("max_name"),
          col("mn.p_retailprice").as("min_price"), col("mn.p_name").as("min_name"))
        .orderBy(col("p_brand").asc)
    },

    "agg_stddev_var" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_pop(col("l_quantity")), 6).as("vp_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc)
    },

    // Higher moments — population skewness g1 and excess kurtosis g2 — from
    // EXACT integer power sums, because the builtin skewness/kurtosis
    // DEFINITIONS diverge across engines (Spark emits population g1/g2,
    // DuckDB bias-corrected sample statistics), so no rounding can align
    // them. l_quantity is integral (1..50), so S1..S4 = Σxᵏ are exact
    // BIGINTs (S4 ≤ 50⁴·n); the central-moment combinations run in
    // DECIMAL(38,0) (peak |n³·S4| ≈ 10²⁸ at sf0.1 ≪ 10³⁸, and DuckDB's
    // HUGEINT bound likewise), and each output is deterministic IEEE
    // arithmetic over exactly-converted integers: g1 = √n·m3 / (m2·√m2)
    // (IEEE sqrt is correctly rounded, so both engines compute identical
    // doubles), g2 = m4/m2² − 3 with an all-integer numerator and
    // denominator (the nᵏ scalings cancel: m2 = n·M2, m3 = n²·M3,
    // m4 = n³·M4, so m3/m2^1.5 = M3/(M2)^1.5·n⁰ — worked witness in
    // AggregatesSpec). round(,6) matches the repo's double-stat discipline.
    // ONE map-side-combinable aggregate over |flags| groups — at 100 TB
    // this is a pure partial-agg scan, no shuffle beyond 3 groups.
    "agg_skew_kurt" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), expr("CAST(l_quantity AS BIGINT)").as("iq"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("iq")).as("s1"),
          sum(expr("iq * iq")).as("s2"),
          sum(expr("iq * iq * iq")).as("s3"),
          sum(expr("iq * iq * iq * iq")).as("s4"))
        .withColumn("dn", col("n").cast("decimal(38,0)"))
        .withColumn("m2", expr("dn * s2 - CAST(s1 AS DECIMAL(38,0)) * s1"))
        .withColumn("m3", expr(
          "dn * dn * s3 - 3 * dn * s1 * s2 + 2 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1"))
        .withColumn("m4", expr(
          "dn * dn * dn * s4 - 4 * dn * dn * s1 * s3" +
            " + 6 * dn * CAST(s1 AS DECIMAL(38,0)) * s1 * s2" +
            " - 3 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1 * s1"))
        .select(col("l_returnflag"),
          expr("round(CAST(m3 AS DOUBLE)" +
            " / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))), 6)").as("skew_qty"),
          expr("round(CAST(m4 AS DOUBLE) / CAST(m2 * m2 AS DOUBLE) - 3, 6)")
            .as("kurt_qty"),
          col("n"))
        .orderBy(col("l_returnflag").asc)
    },

    "agg_mode_bool" -> { (s, d) =>
      // mode() is deterministic here: the most frequent l_linenumber per
      // flag is unique in the fixture (verified) — ties would be
      // engine-arbitrary and may not be declared with an oracle.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(mode(col("l_linenumber")).as("mode_line"),
          bool_and(col("l_quantity") > 0.0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc"))
        .orderBy(col("l_returnflag").asc)
    },

    "agg_regression" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy(col("l_returnflag").asc)
    },

    "agg_corr_covar" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc)
    },

    // Declared at accuracy→exact (accuracy ≥ group size): Spark's GK summary
    // then returns the exact discrete percentile, which matches DuckDB's
    // quantile_disc convention bit-for-bit (verified on odd AND even group
    // sizes at sf0.01). Production callers tune accuracy down for the real
    // sketch; AggregatesSpec bounds that mode against the exact percentile.
    // SCALE BOUND: exactness holds only while every o_orderstatus group has
    // < 10,000,000 rows (~sf100 for the largest group). Past that the GK
    // summary silently becomes approximate again and the quantile_disc
    // oracle would mismatch — raise accuracy with SF or expect FAIL.
    "agg_approx_percentile" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(expr("approx_percentile(o_totalprice, 0.5, 10000000)").as("ap50"))
        .orderBy(col("o_orderstatus").asc)
    },

    "agg_percentile" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy(col("o_orderstatus").asc)
    },

    // Gini coefficient of order totals per status — the standard
    // inequality/concentration metric (how skewed is revenue across
    // orders). Closed form over the SORTED values: G = (2·Σ i·xᵢ −
    // (n+1)·Σxᵢ) / (n·Σxᵢ) with xᵢ ascending at rank i. Prices scale to
    // integer cents (2-dp money, exact), ranks come from one
    // status-sharded window, and both the numerator and denominator are
    // exact BIGINTs — the whole statistic is ONE double division.
    // Overflow: Σ i·x ≤ n²·max_cents ≈ 150k²·10⁸ ≈ 2·10¹⁸ at sf0.1 ...
    // within 2⁶³ with the n² term dominating; a 100 TB deployment
    // shards by a finer group key or scales to DECIMAL(38,0) sums (the
    // shape is unchanged — rank window + one aggregate).
    "agg_gini" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("cents").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("i") * col("cents")).as("six"))
        .select(col("o_orderstatus"), col("n"),
          (col("sx").cast("double") / lit(100.0)).as("total"),
          round((lit(2L) * col("six") - (col("n") + lit(1L)) * col("sx"))
            .cast("double") /
            (col("n") * col("sx")).cast("double"), 9).as("gini"))
        .orderBy(col("o_orderstatus").asc)
    },

    // Winsorized mean — the robust-statistics aggregate: clamp each value
    // into the group's exact [P5, P95] band, then average. The bounds are
    // RANK SELECTIONS, not interpolated percentiles (engines disagree on
    // interpolation): k_lo = ⌈5n/100⌉ and k_hi = ⌈95n/100⌉ in pure
    // integer arithmetic, the value AT that rank picked by a conditional
    // aggregate over one group-sharded window. Clamping and summing stay
    // exact DECIMAL; the mean is one double division at output. Plan
    // shape: one window pass for ranks, a 3-row broadcast join-back of
    // the group bounds (the ts_mad_outliers idiom), one final aggregate —
    // at 100 TB the window shards by the group key and the bounds table
    // stays tiny by construction.
    "agg_winsorized_mean" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          dec2(col("o_totalprice")).as("price"))
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("price").asc, col("o_orderkey").asc)
      val ranked = o
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("o_orderstatus"))).cast("long"))
      val bounds = ranked
        .groupBy(col("o_orderstatus"))
        .agg(max(when(col("r") === expr("(n * 5 + 99) div 100"), col("price")))
            .as("lo"),
          max(when(col("r") === expr("(n * 95 + 99) div 100"), col("price")))
            .as("hi"))
      o.join(broadcast(bounds), Seq("o_orderstatus"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          min(col("lo")).as("lo_d"), min(col("hi")).as("hi_d"),
          sum(greatest(col("lo"), least(col("hi"), col("price"))))
            .as("wsum"))
        .select(col("o_orderstatus"), col("n"),
          col("lo_d").cast("double").as("p05"),
          col("hi_d").cast("double").as("p95"),
          round(col("wsum").cast("double") / col("n").cast("double"), 6)
            .as("wins_mean"))
        .orderBy(col("o_orderstatus").asc)
    },

    // Equi-width histogram of order totals: 10 bins of 50k with the
    // overflow clamped into the top bin. The bin id is a plain projection,
    // so this is one map-side-combined groupBy — the distributed histogram
    // shape (no sort, no window). floor-division binning instead of
    // width_bucket keeps the expression portable to the oracle engine.
    "agg_histogram" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(least(lit(9.0), floor(col("o_totalprice") / 50000.0))
          .cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          Tables.dsumD(col("o_totalprice")).as("sum_total"))
        .orderBy(col("bin").asc)
    },

    // Exact MODE with a deterministic tie-break (most frequent market
    // segment per nation; ties resolve to the lexicographically smallest
    // segment): two map-side-combinable groupBys — counts, then the
    // round-3 argmin idiom min(struct(-cnt, segment)) — never a window
    // over the raw rows, and never the builtin mode() whose tie choice is
    // engine-dependent.
    "agg_mode" -> { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("c_nationkey"))
        .agg(min(struct((-col("cnt")).as("negc"), col("c_mktsegment").as("seg")))
          .as("m"),
          sum(col("cnt")).as("n"))
        .select(col("c_nationkey"), col("m.seg").as("mode_segment"),
          (-col("m.negc")).as("mode_count"), col("n"))
        .orderBy(col("c_nationkey").asc)
    },

    // Ordered string aggregation (LISTAGG/string_agg): per nation the
    // comma-joined DISTINCT market-segment list in lexicographic order.
    // Determinism: collect_set is partition-order-dependent but
    // sort_array canonicalizes BEFORE the join, so the string is
    // engine/partitioning-independent — the only portable way to emit an
    // aggregated string cross-engine. Map-side partial aggregation still
    // applies (set-union partials); the value size is bounded by the
    // distinct-segment domain, the usual LISTAGG caveat at scale.
    "agg_string_concat" -> { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          expr("array_join(sort_array(collect_set(c_mktsegment)), ',')")
            .as("segments"),
          expr("CAST(size(collect_set(c_mktsegment)) AS BIGINT)").as("n_segments"))
        .orderBy(col("c_nationkey").asc)
    },

    // Exact lower weighted median — the robust-statistics sibling of
    // agg_winsorized_mean: per return flag, the quantity-weighted median
    // of line prices, i.e. the first price (in (price, orderkey,
    // linenumber) order — the unique tie-break makes it total) whose
    // running weight reaches half the group's total. All-integer: prices
    // in exact cents, weights in exact quantity-centi units, the pick
    // condition 2·cumw ≥ W is integer, and the flagged set is a SUFFIX
    // of the sort order so the answer is ONE min(struct) aggregate over
    // it — the argmin idiom, map-side combinable, no second window. One
    // group-sharded window pass computes cumw and W together (same
    // partition key, two frames — a single shuffle).
    "agg_weighted_median" -> { (s, d) =>
      val sortKeys = Seq(col("pc").asc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      val wCum = Window.partitionBy(col("l_returnflag")).orderBy(sortKeys: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("l_returnflag"))
      val flagged = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("pc"),
          expr("CAST(round(l_quantity * 100, 0) AS BIGINT)").as("wq"))
        .withColumn("cumw", sum(col("wq")).over(wCum))
        .withColumn("wtot", sum(col("wq")).over(wAll))
        .filter(lit(2L) * col("cumw") >= col("wtot"))
      flagged.groupBy(col("l_returnflag"))
        .agg(max(col("wtot")).as("w_total"),
          min(struct(col("pc"), col("l_orderkey"), col("l_linenumber"))).as("m"))
        .select(col("l_returnflag"), col("w_total"),
          (col("m.pc").cast("double") / lit(100d)).as("wmedian_price"))
        .orderBy(col("l_returnflag").asc)
    },

    // Shannon entropy of each source's language mix — the mixture-health
    // diagnostic next to llm_domain_mix's share table (and the ln-bearing
    // companion of the Simpson index: here the ln IS the metric, so the
    // repo's proven ln discipline applies instead of avoiding it).
    // H = Σ c·ln(n/c) / n in nats: each ln runs once per (source, lang)
    // GROUP (≤ 5 rows per source, never per document), is rounded to 12
    // and carried as DECIMAL(30,14) scaled EXACTLY by the integer count —
    // so partial-aggregation merge order can't move a bit — and the
    // output is one double division + round(6). Two hash aggregates over
    // the corpus: docs→(source,lang) counts (map-side combined), then the
    // group total via ONE window over the ≤100-row counts table feeding a
    // groupBy(source) — no join-back, no second corpus pass.
    "agg_entropy" -> { (s, d) =>
      // (20,14)×(12,0) → DECIMAL(33,14): inside both engines' 38-digit cap,
      // so the product is exact — wider operands would trip Spark's
      // precision-loss rescale (39 → 38 silently drops a scale digit).
      val counts = Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
      counts.groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"),
          count(lit(1)).as("n_langs"),
          sum(round(log(col("n").cast("double") / col("c")), 12)
            .cast(DecimalType(20, 14)) * col("c").cast(DecimalType(12, 0)))
            .as("hsum"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          round(col("hsum").cast("double") / col("n_docs"), 6).as("entropy"))
        .orderBy(col("source").asc)
    }
  )

  /** Signature-keyed cache dir for the persisted HLL partials — the
    * Sources.fmtDir / LlmOps.annIndexDir discipline: keyed on the source
    * files' (name, size, mtime) so a regenerated fixture never merges
    * stale sketches. */
  private[ops] def sketchDir(d: String, salt: String = "hllsketch"): String = {
    val src = new java.io.File(s"$d/orders.parquet")
    val files = Option(src.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    val sig = files.filter(_.isFile)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").sorted.mkString("|")
    val h = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$d|$salt|$sig"))
    s"${System.getProperty("java.io.tmpdir")}/graft_${salt}_partials_$h"
  }

  val oracles: Seq[(String, String)] = Seq(
    "agg_filtered_revenue_q6" ->
      """SELECT count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "dq_constraint_check" ->
      """WITH viol AS (
        |  SELECT 'not_null_o_orderkey' AS constraint_name,
        |         CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_violations
        |  FROM orders
        |  UNION ALL SELECT 'unique_o_orderkey',
        |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'nonneg_o_totalprice',
        |         CAST(count(*) FILTER (o_totalprice < 0.0) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'domain_o_orderstatus',
        |         CAST(count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'range_o_orderdate',
        |         CAST(count(*) FILTER (o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
        |                               OR o_orderdate >= TIMESTAMP '2005-01-01 00:00:00') AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'unique_o_custkey',
        |         CAST(count(*) - count(DISTINCT o_custkey) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'fk_o_custkey_customer',
        |         (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |          LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |          WHERE c.c_custkey IS NULL))
        |SELECT constraint_name, n_violations, n_violations = 0 AS pass
        |FROM viol
        |ORDER BY constraint_name ASC NULLS FIRST""".stripMargin,

    // Disk-merge ≡ inline-merge is exact by construction (lossless blob
    // roundtrip + set-semantics union), and the lgK=12 estimate sits
    // inside the 6%-or-2 bound — both flags deterministic TRUE.
    "agg_hll_sketch_merge" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_exact,
        |       TRUE AS persist_exact,
        |       TRUE AS hll_ok
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    // Exact-mode theta estimates ARE the true distinct counts, so the
    // oracle recomputes every set cardinality from the raw rows:
    // |A∪B| = |A|+|B|−|A∩B|, |A\B| = |A|−|A∩B|.
    "agg_theta_sketch_setops" ->
      """WITH ca AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS c
        |            FROM orders),
        |n AS (SELECT p, count(*) AS n FROM ca GROUP BY p),
        |pairs AS (SELECT a.p AS pa, b.p AS pb, a.n AS na, b.n AS nb
        |          FROM n a JOIN n b ON a.p < b.p),
        |inter AS (SELECT x.p AS pa, y.p AS pb, count(*) AS ni
        |          FROM ca x JOIN ca y ON x.c = y.c AND x.p < y.p
        |          GROUP BY x.p, y.p)
        |SELECT pairs.pa AS pri_a, pairs.pb AS pri_b, na AS n_a, nb AS n_b,
        |       na + nb - coalesce(ni, 0) AS n_union,
        |       coalesce(ni, 0) AS n_intersect,
        |       na - coalesce(ni, 0) AS n_anotb,
        |       TRUE AS persist_exact
        |FROM pairs LEFT JOIN inter ON pairs.pa = inter.pa AND pairs.pb = inter.pb
        |ORDER BY pri_a ASC NULLS FIRST, pri_b ASC NULLS FIRST""".stripMargin,

    // Identical bucket/extraction math in DuckDB dialect; merge = sum is
    // replayed directly over the raw rows (the persistence is layout,
    // not semantics). CASTs: DuckDB sum(BIGINT) widens to HUGEINT.
    "agg_hdr_quantile_merge" ->
      s"""WITH c AS (SELECT o_orderpriority AS p,
         |            CAST(round(o_totalprice * 100) AS BIGINT) AS v
         |           FROM orders),
         |b AS (SELECT p, ${graft.functions.HdrHistogram.bucketSqlDuck("v")} AS bkt,
         |       count(*) AS cnt FROM c GROUP BY p, bkt),
         |m AS (SELECT p, bkt,
         |       CAST(sum(cnt) OVER (PARTITION BY p ORDER BY bkt) AS BIGINT) AS cum,
         |       CAST(sum(cnt) OVER (PARTITION BY p) AS BIGINT) AS n FROM b)
         |SELECT p AS o_orderpriority, max(n) AS n,
         |       min(CASE WHEN cum * 2 >= n THEN bkt END) AS p50_cents,
         |       min(CASE WHEN cum * 20 >= n * 19 THEN bkt END) AS p95_cents,
         |       min(CASE WHEN cum * 100 >= n * 99 THEN bkt END) AS p99_cents
         |FROM m GROUP BY p
         |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    "agg_global" ->
      """SELECT count(*) AS n_rows,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        |FROM lineitem""".stripMargin,

    "agg_groupby_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_profile_stats" ->
      """WITH b AS (
        |  SELECT count(*) AS n_rows,
        |         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
        |         count(DISTINCT o_orderkey) AS nd1,
        |         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
        |         count(DISTINCT o_custkey) AS nd2,
        |         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn3,
        |         count(DISTINCT o_orderstatus) AS nd3,
        |         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn4,
        |         count(DISTINCT o_totalprice) AS nd4,
        |         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn5,
        |         count(DISTINCT o_orderdate) AS nd5,
        |         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn6,
        |         count(DISTINCT o_orderpriority) AS nd6
        |  FROM orders
        |)
        |SELECT col_name, n_null, n_distinct, n_rows FROM (
        |  SELECT 'o_orderkey' AS col_name, nn1 AS n_null, nd1 AS n_distinct, n_rows FROM b
        |  UNION ALL SELECT 'o_custkey', nn2, nd2, n_rows FROM b
        |  UNION ALL SELECT 'o_orderstatus', nn3, nd3, n_rows FROM b
        |  UNION ALL SELECT 'o_totalprice', nn4, nd4, n_rows FROM b
        |  UNION ALL SELECT 'o_orderdate', nn5, nd5, n_rows FROM b
        |  UNION ALL SELECT 'o_orderpriority', nn6, nd6, n_rows FROM b
        |)
        |ORDER BY col_name ASC NULLS FIRST""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 15
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin,

    // Merging partials is algebra, not semantics: the oracle aggregates
    // the union directly.
    "agg_incremental_merge" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,

    "agg_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_flag ASC, g_status ASC,
        |         l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT o_custkey, string_agg(o_orderpriority, '|' ORDER BY o_orderpriority ASC) AS prios
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin,

    "agg_first_last_minmax_by" ->
      """WITH r AS (
        |  SELECT p_brand, p_retailprice, p_name,
        |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_name DESC) AS rx,
        |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_name ASC) AS r02
        |  FROM part)
        |SELECT mx.p_brand,
        |       mx.p_retailprice AS max_price, mx.p_name AS max_name,
        |       mn.p_retailprice AS min_price, mn.p_name AS min_name
        |FROM (SELECT * FROM r WHERE rx = 1) mx
        |JOIN (SELECT * FROM r WHERE r02 = 1) mn USING (p_brand)
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,

    "agg_stddev_var" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 6) AS sd_qty,
        |       round(var_pop(l_quantity), 6) AS vp_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    // Identical exact-power-sum algebra: DuckDB lifts the BIGINT sums to
    // HUGEINT in the central-moment products (peak ~10²⁸ ≪ 10³⁸), and the
    // final expressions are the same correctly-rounded IEEE ops.
    "agg_skew_kurt" ->
      """WITH b AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS iq
        |           FROM lineitem),
        |m AS (SELECT l_returnflag, count(*) AS n, sum(iq) AS s1,
        |             sum(iq * iq) AS s2, sum(iq * iq * iq) AS s3,
        |             sum(iq * iq * iq * iq) AS s4
        |      FROM b GROUP BY l_returnflag),
        |c AS (SELECT l_returnflag, n,
        |             n * s2 - s1 * s1 AS m2,
        |             n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS m3,
        |             n * n * n * s4 - 4 * n * n * s1 * s3
        |               + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS m4
        |      FROM m)
        |SELECT l_returnflag,
        |       round(CAST(m3 AS DOUBLE)
        |             / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))), 6) AS skew_qty,
        |       round(CAST(m4 AS DOUBLE) / CAST(m2 * m2 AS DOUBLE) - 3, 6) AS kurt_qty,
        |       n
        |FROM c
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_mode_bool" ->
      """SELECT l_returnflag,
        |       mode(l_linenumber) AS mode_line,
        |       bool_and(l_quantity > 0.0) AS all_pos,
        |       bool_or(l_discount > 0.09) AS any_big_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_regression" ->
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_corr_covar" ->
      """SELECT l_returnflag,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_approx_distinct" ->
      """SELECT s_nationkey,
        |       count(DISTINCT s_suppkey) AS n_exact,
        |       TRUE AS hll_ok
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin,

    "agg_approx_percentile" ->
      """SELECT o_orderstatus,
        |       quantile_disc(o_totalprice, 0.5) AS ap50
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "agg_percentile" ->
      """SELECT o_orderstatus,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    // Same closed form; DuckDB's HUGEINT sums cast straight to DOUBLE for
    // the single division (divisors CAST AS DOUBLE per the bare-literal
    // rule).
    "agg_gini" ->
      """WITH b AS (SELECT o_orderstatus, o_orderkey,
        |                  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |           FROM orders),
        |r AS (SELECT o_orderstatus, cents,
        |             row_number() OVER (PARTITION BY o_orderstatus
        |               ORDER BY cents ASC, o_orderkey ASC) AS i
        |      FROM b),
        |g AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |             sum(cents) AS sx, sum(i * cents) AS six
        |      FROM r GROUP BY 1)
        |SELECT o_orderstatus, n,
        |       CAST(sx AS DOUBLE) / CAST(100.0 AS DOUBLE) AS total,
        |       round(CAST(2 * six - (n + 1) * sx AS DOUBLE) /
        |             CAST(n * sx AS DOUBLE), 9) AS gini
        |FROM g
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    // Same rank-selection algebra (never an interpolating quantile);
    // the clamp and sum stay DECIMAL until the final double division.
    "agg_winsorized_mean" ->
      """WITH o AS (SELECT o_orderstatus, o_orderkey,
        |                  CAST(o_totalprice AS DECIMAL(12,2)) AS price
        |           FROM orders),
        |rk AS (SELECT o_orderstatus, price,
        |              row_number() OVER (PARTITION BY o_orderstatus
        |                ORDER BY price ASC, o_orderkey ASC) AS r,
        |              count(*) OVER (PARTITION BY o_orderstatus) AS n
        |       FROM o),
        |b AS (SELECT o_orderstatus,
        |             max(CASE WHEN r = (n * 5 + 99) // 100 THEN price END) AS lo,
        |             max(CASE WHEN r = (n * 95 + 99) // 100 THEN price END) AS hi
        |      FROM rk GROUP BY o_orderstatus)
        |SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(b.lo) AS DOUBLE) AS p05,
        |       CAST(min(b.hi) AS DOUBLE) AS p95,
        |       round(CAST(sum(greatest(b.lo, least(b.hi, o.price))) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS wins_mean
        |FROM o JOIN b USING (o_orderstatus)
        |GROUP BY o.o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(least(9.0, floor(o_totalprice / 50000.0)) AS BIGINT) AS bin,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_total
        |FROM orders
        |GROUP BY 1
        |ORDER BY bin ASC NULLS FIRST""".stripMargin,

    // The same argmin: row_number over (cnt DESC, segment ASC) = 1.
    "agg_mode" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
        |                  CAST(count(*) AS BIGINT) AS cnt
        |           FROM customer GROUP BY 1, 2),
        |r AS (SELECT c_nationkey, c_mktsegment, cnt,
        |             sum(cnt) OVER (PARTITION BY c_nationkey) AS n,
        |             row_number() OVER (PARTITION BY c_nationkey
        |               ORDER BY cnt DESC, c_mktsegment ASC) AS rn
        |      FROM c)
        |SELECT c_nationkey, c_mktsegment AS mode_segment,
        |       cnt AS mode_count, CAST(n AS BIGINT) AS n
        |FROM r WHERE rn = 1
        |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin,

    // string_agg over the DISTINCT sorted values ≡ Spark's
    // array_join(sort_array(collect_set)) — both canonicalize before the
    // join, so the strings match byte-for-byte.
    "agg_string_concat" ->
      """SELECT c_nationkey, count(*) AS n,
        |       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment ASC)
        |         AS segments,
        |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin,

    "agg_weighted_median" ->
      """WITH b AS (SELECT l_returnflag,
        |                  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc,
        |                  CAST(round(l_quantity * 100, 0) AS BIGINT) AS wq,
        |                  l_orderkey, l_linenumber
        |           FROM lineitem),
        |w AS (SELECT l_returnflag, pc, l_orderkey, l_linenumber,
        |             sum(wq) OVER (PARTITION BY l_returnflag
        |               ORDER BY pc ASC, l_orderkey ASC, l_linenumber ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |             sum(wq) OVER (PARTITION BY l_returnflag) AS wtot
        |      FROM b),
        |f AS (SELECT l_returnflag, pc, wtot,
        |             row_number() OVER (PARTITION BY l_returnflag
        |               ORDER BY pc ASC, l_orderkey ASC, l_linenumber ASC) AS rn
        |      FROM w WHERE 2 * cumw >= wtot)
        |SELECT l_returnflag, CAST(wtot AS BIGINT) AS w_total,
        |       CAST(pc AS DOUBLE) / 100 AS wmedian_price
        |FROM f WHERE rn = 1
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "agg_entropy" ->
      """WITH c AS (SELECT source, lang, count(*) AS c
        |           FROM documents GROUP BY source, lang),
        |w AS (SELECT source, c,
        |             sum(c) OVER (PARTITION BY source) AS n FROM c)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |       count(*) AS n_langs,
        |       round(CAST(sum(CAST(round(ln(CAST(n AS DOUBLE) / c), 12) AS DECIMAL(20,14)) * CAST(c AS DECIMAL(12,0))) AS DOUBLE)
        |             / CAST(max(n) AS BIGINT), 6) AS entropy
        |FROM w
        |GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin
  )
}
