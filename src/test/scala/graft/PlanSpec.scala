package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions (SURVEY.md §4): the scale-critical physical
  * properties — pushdown, pruning, broadcast, top-k — must be visible in the
  * optimized plan, not assumed. */
class PlanSpec extends SparkSpec {

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("src_scan_pruned reads only the two projected columns") {
    val plan = physicalPlan("src_scan_pruned")
    assert(plan.contains("ReadSchema"))
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"))
  }

  test("src_scan_partition_filter pushes the shipdate predicate to parquet") {
    val plan = physicalPlan("src_scan_partition_filter")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"))
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    assert(physicalPlan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_sortmerge honors the merge hint") {
    assert(physicalPlan("join_sortmerge").contains("SortMergeJoin"))
  }

  test("join_asof_native runs on the custom AsOfJoinExec and matches the window idiom") {
    // execute FIRST: the AQE-finalized plan is the one to inspect
    // (CLAUDE.md round-4 rule), and result equality is checked on the
    // same Dataset.
    val native = SparkEntry.queries("join_asof_native")(spark, sf)
    val nativeRows = native.collect().map(_.toSeq.toList).toList
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom operator missing from:\n$plan")
    assert(!plan.contains("WindowExec"), "native as-of must not fall back to a window")
    val idiom = SparkEntry.queries("join_asof")(spark, sf)
      .collect().map(_.toSeq.toList).toList
    assert(nativeRows === idiom)
  }

  test("limit_topk_global compiles to TakeOrderedAndProject (no full sort)") {
    assert(physicalPlan("limit_topk_global").contains("TakeOrderedAndProject"))
  }

  test("join_multiway_q3: filters pushed to all three scans, top-10 without a global sort") {
    val plan = physicalPlan("join_multiway_q3")
    assert(plan.contains("TakeOrderedAndProject"),
      s"Q3's LIMIT 10 must be a top-k, not sort+limit:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)") ||
      plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment filter must reach the customer scan:\n$plan")
    assert(plan.contains("LessThan(o_orderdate") && plan.contains("GreaterThan(l_shipdate"),
      s"date filters must reach the orders/lineitem scans:\n$plan")
  }

  test("join_multiway_q5: dims broadcast, date window pushed to the orders scan") {
    val plan = physicalPlan("join_multiway_q5")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      s"the order-year window must reach the orders scan:\n$plan")
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      s"region filter must reach the region scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the supplier⋈nation⋈region dim chain must broadcast:\n$plan")
  }

  test("join_multiway_q7: both nation-filtered dims broadcast, ship window pushed to lineitem") {
    val plan = physicalPlan("join_multiway_q7")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"),
      s"the ship-date window must reach the lineitem scan:\n$plan")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"supplier and customer sides must both broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q7:\n$plan")
  }

  test("src_scan_partitioned_dpp: the dim filter prunes fact partitions at runtime") {
    val df = SparkEntry.queries("src_scan_partitioned_dpp")(spark, sf)
    df.collect() // AQE-finalize before inspecting (round-4 rule)
    // A dynamic-pruning SubqueryBroadcast nests its own AdaptiveSparkPlan,
    // whose Final/Initial markers appear mid-tree — so don't split on the
    // Initial marker (round-7 rule); search the whole string.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
    assert(plan.contains("PartitionFilters"),
      s"dt must be a partition filter, not a row filter:\n$plan")
  }

  test("join_multiway_q2: the correlated min decorrelates to one aggregate, top-k without global sort") {
    val df = SparkEntry.queries("join_multiway_q2")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"the per-part min must be a map-side-combined aggregate (decorrelated), " +
        s"not a per-row subquery:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"Q2's LIMIT 100 must be a distributed top-k:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q2:\n$plan")
  }

  test("join_multiway_q21: EXISTS/NOT-EXISTS compile to semi/anti joins, never per-row subqueries") {
    val df = SparkEntry.queries("join_multiway_q21")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"EXISTS must compile to a left-semi join:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must compile to a left-anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q21:\n$plan")
  }

  test("join_multiway_q4: outer-column EXISTS compiles to a semi join with a residual condition") {
    val df = SparkEntry.queries("join_multiway_q4")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"EXISTS must compile to a left-semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q4:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"the quarter window must reach the orders scan:\n$plan")
  }

  test("join_multiway_q22: scalar avg evaluates once; NOT EXISTS compiles to an anti join") {
    val df = SparkEntry.queries("join_multiway_q22")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must compile to a left-anti join:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"the average must be a once-evaluated scalar subquery:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q22:\n$plan")
  }

  test("join_multiway_q19: per-side predicates derived from the OR-of-ANDs reach both scans") {
    val df = SparkEntry.queries("join_multiway_q19")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // CNF conversion must derive p_brand/p_size implications for the part
    // scan and the quantity band union for the lineitem scan
    val partScan = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("p_brand")).toSeq
    assert(partScan.nonEmpty,
      s"no derived brand predicate pushed to the part scan:\n$plan")
    val liScan = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("l_quantity")).toSeq
    assert(liScan.nonEmpty,
      s"no derived quantity band pushed to the lineitem scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"Q19 must stay an equi hash join with a residual disjunction:\n$plan")
  }

  test("join_multiway_q20: nested IN + grouped correlated scalar decorrelate to joins") {
    val df = SparkEntry.queries("join_multiway_q20")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"both IN subqueries must compile to semi joins:\n$plan")
    assert(plan.contains("partial_sum"),
      s"the correlated per-part total must be a map-side-combined aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q20:\n$plan")
  }

  test("join_multiway_q13 keeps the ON-clause-filtered join OUTER; q17's correlated avg decorrelates") {
    val q13 = SparkEntry.queries("join_multiway_q13")(spark, sf)
    q13.collect()
    val p13 = q13.queryExecution.executedPlan.toString
    assert(p13.contains("LeftOuter"),
      s"the ON-clause filter must not degrade the outer join to inner:\n$p13")
    val q17 = SparkEntry.queries("join_multiway_q17")(spark, sf)
    q17.collect()
    val p17 = q17.queryExecution.executedPlan.toString
    assert(p17.contains("partial_avg"),
      s"the per-part average must be a map-side-combined aggregate " +
        s"(decorrelated), not a per-row subquery:\n$p17")
    assert(!p17.contains("CartesianProduct") &&
      !p17.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q17:\n$p17")
  }

  test("join_multiway_q16: NOT IN compiles to a null-aware anti join, never a per-row probe") {
    val df = SparkEntry.queries("join_multiway_q16")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT IN must compile to an anti join:\n$plan")
    // BroadcastHashJoinExec prints isNullAwareAntiJoin as the trailing
    // boolean: "LeftAnti, BuildRight, true".
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"the anti join must carry NOT IN's null-aware semantics:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian in Q16:\n$plan")
  }

  test("join_multiway_q8/q9: every dimension chain broadcasts; no nested loops") {
    for (name <- Seq("join_multiway_q8", "join_multiway_q9")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: dims must broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name: no nested-loop join:\n$plan")
    }
  }

  test("join_multiway_q11: the HAVING threshold is one reused scalar, not a per-row subquery") {
    val df = SparkEntry.queries("join_multiway_q11")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // The CTE is referenced twice (grouped frame + its global sum); the
    // threshold must arrive as a scalar subquery broadcast into the
    // filter — never a join per part row.
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"threshold must be a scalar subquery:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join in Q11:\n$plan")
  }

  test("llm_phrase_search: the postings probe is a broadcast hash join, never a BNLJ") {
    val df = SparkEntry.queries("llm_phrase_search")(spark, sf)
    df.collect() // AQE-finalized plan (round-4 rule)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the winning phrase must probe postings via broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop in the phrase lookup:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-df bigram must be a top-k, not a global sort:\n$plan")
  }

  test("agg_winsorized_mean: bounds join back via broadcast, clamp never nested-loops") {
    val plan = physicalPlan("agg_winsorized_mean")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 3-row bounds table must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop in the winsorize join-back:\n$plan")
  }

  test("join_asof_tolerance runs on the custom AsOfJoinExec") {
    val df = SparkEntry.queries("join_asof_tolerance")(spark, sf)
    df.collect() // AQE-finalized plan (round-4 rule)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom operator missing from:\n$plan")
    assert(!plan.contains("WindowExec"),
      "tolerance variant must not fall back to the window idiom")
  }

  test("ts_ewma_dyadic evaluates all 16 taps in ONE WindowExec pass") {
    val plan = physicalPlan("ts_ewma_dyadic")
    val windows = plan.linesIterator.count(l => l.contains("Window [")
      || l.trim.startsWith("Window "))
    assert(windows === 1,
      s"the 16 lag taps share one window spec and must compile to a single " +
        s"Window node, got $windows:\n$plan")
  }

  test("llm_ngram_novelty: first-occurrence via window, no join back to the gram rows") {
    val plan = physicalPlan("llm_ngram_novelty")
    assert(!plan.contains("Join"),
      s"novelty must not groupBy+join-back (one gram-partitioned window " +
        s"instead):\n$plan")
  }

  test("llm_word_cooccur_lift cuts the vocab top-50 via TakeOrderedAndProject, not a global window") {
    // The df-rank cut runs over the WHOLE vocabulary table — at web scale
    // that is 10⁸–10⁹ rows, so a global-ordering WindowExec (one task
    // sorts everything) is the failure mode; orderBy+limit compiles to a
    // distributed TakeOrderedAndProject (each task keeps its local top
    // 50). The only windows allowed in this plan are the bounded ones.
    val df = SparkEntry.queries("llm_word_cooccur_lift")(spark, sf)
    df.collect() // AQE-finalize before inspecting (round-4 rule)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-50 must be a distributed top-k:\n$plan")
    assert(!plan.contains("WindowExec"),
      s"no unbounded global-ordering window allowed in the cooccur plan:\n$plan")
  }

  test("ts_theil_sen_windowed: every exchange carries the (event_type, dt) cell key — no global shuffle") {
    // The calendar-windowed Theil–Sen's scale contract: the day key joins
    // every shuffle key, so cells peel independently on a cluster. A
    // hashpartitioning on event_type ALONE (or an empty partitioning /
    // global singlePartition window) would funnel a whole key's history
    // through one task at 100 TB. The final ORDER BY's rangepartitioning
    // is the one allowed non-hash exchange (round-10 rule: count it, not
    // forbid it).
    val df = SparkEntry.queries("ts_theil_sen_windowed")(spark, sf)
    df.collect() // AQE-finalize before inspecting (round-4 rule)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val hashEx = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(hashEx.nonEmpty, s"expected hash exchanges in:\n$plan")
    assert(hashEx.forall(l => l.contains("event_type") && l.contains("dt")),
      s"an exchange dropped the day key (single-key funnel at scale):\n" +
        hashEx.mkString("\n"))
    assert(!plan.contains("SinglePartition"),
      s"no global single-partition stage allowed:\n$plan")
  }

  test("win_row_number_topk gets a WindowGroupLimit (per-group top-k prune before the sort)") {
    // Spark 4's InferWindowGroupLimit turns `row_number() <= k` into a
    // WindowGroupLimit, so each partition keeps only k candidate rows per
    // group ahead of the window sort — the difference between sorting k
    // rows and sorting the whole group at 100 TB. If this assert ever
    // breaks, the filter stopped being recognized as a rank limit.
    assert(physicalPlan("win_row_number_topk").contains("WindowGroupLimit"))
  }

  test("agg_groupby_pricing uses two-phase hash aggregation") {
    val plan = physicalPlan("agg_groupby_pricing")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial_"), "map-side partial aggregation missing")
  }

  test("whole-stage codegen covers the flagship aggregation") {
    // AQE finalizes the plan lazily — execute first, then inspect.
    val df = SparkEntry.queries("agg_groupby_pricing")(spark, sf)
    df.collect()
    // in the finalized AQE plan, codegen stages appear as "*(n)" markers
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"no whole-stage codegen span in:\n$plan")
  }

  test("sortWithinPartitions plans a local (non-global) sort") {
    val df = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .sortWithinPartitions(col("l_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && !plan.contains("Exchange rangepartitioning"),
      s"expected partition-local sort without a range-exchange:\n$plan")
  }

  test("partitioned layout prunes partitions on dt filter") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("plan_pp").toString
    Tables.orders(spark, sf)
      .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .write.partitionBy("dt").mode("overwrite").parquet(out)
    val read = spark.read.parquet(out).filter(col("dt") === "1995-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"dt filter not applied as a partition filter:\n$plan")
    // and the data filter must NOT appear as a row-level PushedFilter
    assert(!plan.replaceAll("(?s)PartitionFilters.*", "").contains("EqualTo(dt"))
  }

  test("dynamic partition pruning fires on a partitioned fact ⋈ filtered dim") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("plan_dpp").toString
    Tables.orders(spark, sf)
      .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.partitionBy("dt").mode("overwrite").parquet(out)
    import spark.implicits._
    // dim must be file-backed: a LocalRelation folds the filter away and
    // the DPP rule never sees a filtered build side.
    val dimPath = java.nio.file.Files.createTempDirectory("plan_dpp_dim").toString
    Seq(("1995-01", "keep"), ("1995-02", "keep"), ("1999-09", "drop"))
      .toDF("dt", "tag").write.mode("overwrite").parquet(dimPath)
    val joined = spark.read.parquet(out)
      .join(spark.read.parquet(dimPath).filter(col("tag") === "keep"), "dt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
  }

  test("dimension join without hints auto-broadcasts under the threshold") {
    val df = Tables.lineitem(spark, sf)
      .join(Tables.nation(spark, sf), col("l_suppkey") % 25 === col("n_nationkey"))
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("CBO with ANALYZE statistics reorders a join chain to put the selective table first") {
    // Cost-based join reorder needs catalog statistics — a bare parquet
    // path has none. ANALYZE ... COMPUTE STATISTICS FOR ALL COLUMNS fills
    // rowCount + column NDVs, and CostBasedJoinReorder may then rewrite
    // the syntactic join order. Asserted observable: with CBO on, the
    // optimized plan's leaf order differs from the syntactic
    // big ⋈ big ⋈ tiny order (the tiny selective dim moves off the last
    // position); with CBO off it does not.
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(spark, sf).write.mode("overwrite").saveAsTable("cbo_lineitem")
      Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("cbo_orders")
      Tables.region(spark, sf).limit(2).selectExpr("r_regionkey AS rk")
        .write.mode("overwrite").saveAsTable("cbo_tiny")
      Seq("cbo_lineitem", "cbo_orders", "cbo_tiny").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
      def leafOrder(): Seq[String] = {
        val plan = spark.sql(
          """SELECT count(*) FROM cbo_lineitem l
            |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
            |JOIN cbo_tiny t ON o.o_orderkey % 5 = t.rk""".stripMargin)
          .queryExecution.optimizedPlan.toString
        Seq("cbo_lineitem", "cbo_orders", "cbo_tiny")
          .sortBy(t => plan.indexOf(t))
      }
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val syntactic = leafOrder()
      assert(syntactic === Seq("cbo_lineitem", "cbo_orders", "cbo_tiny"))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = leafOrder()
      assert(reordered !== syntactic,
        s"CostBasedJoinReorder left the syntactic order: $reordered")
    } finally {
      Seq("cbo_lineitem", "cbo_orders", "cbo_tiny").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("runtime bloom filter reduces the probe side of a selective fact ⋈ dim join") {
    // Spark's InjectRuntimeFilter puts a bloom filter built from the
    // filtered dim keys in front of the fact scan — at 100 TB this is the
    // semi-join reduction that keeps a selective join from reading the
    // whole fact shuffle. Size thresholds are production-tuned, so pin
    // them down to fixture scale to observe the mechanism.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") || optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join_range_banded pairs via a bucket equi-join, not a BNLJ") {
    val plan = physicalPlan("join_range_banded")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded range join fell back to nested loops:\n$plan")
  }

  test("llm_dedup_fuzzy_lev blocks on a length-bucket equi-join, not a BNLJ") {
    val plan = physicalPlan("llm_dedup_fuzzy_lev")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fuzzy dedup fell back to nested loops:\n$plan")
  }

  test("llm_dedup_containment_lsh generates candidates via posting-list equi-joins, not a BNLJ") {
    // The prefix-filter path must stay pure hash-join: prefixes join
    // postings on the shingle hash h, candidates join the signature table
    // on doc ids. Any BNLJ/cartesian would mean the doc×doc pair space is
    // being enumerated — the exact failure mode prefix filtering exists
    // to avoid.
    val plan = physicalPlan("llm_dedup_containment_lsh")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"containment candidates fell back to nested loops:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"no hash/merge join in containment plan:\n$plan")
  }

  test("llm_dedup_incremental generates candidates via posting equi-joins, never a BNLJ") {
    val plan = physicalPlan("llm_dedup_incremental")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"incremental dedup must stay on the directed prefix-filter equi-joins:\n$plan")
  }

  test("llm_decontaminate probes the eval grams via a broadcast hash join") {
    // The scale contract: the eval-benchmark gram set is the tiny side by
    // construction, so the corpus-side gram stream must probe a broadcast
    // — a shuffle of the exploded corpus grams on `g` would be the 100 TB
    // bottleneck. The per-doc count and the final doc_id join may shuffle.
    val plan = physicalPlan("llm_decontaminate")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"decontamination fell back to nested loops:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram membership test is not a broadcast hash join:\n$plan")
  }

  test("llm_passage_dedup counts and joins windows via hash shuffles, not a BNLJ") {
    val plan = physicalPlan("llm_passage_dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"passage dedup fell back to nested loops:\n$plan")
  }

  test("llm_winnow_fingerprint is a pure projection: no shuffle before the output sort") {
    // Winnowing must stay embarrassingly parallel — the only exchange in
    // the plan is the range partitioning of the final ORDER BY. A second
    // exchange would mean the fingerprint computation itself shuffles.
    val plan = physicalPlan("llm_winnow_fingerprint")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly the sort exchange, got $exchanges:\n$plan")
  }

  test("llm_sim_threshold_join enumerates pairs via a cid equi-join, not an O(n²) BNLJ") {
    // The only nested-loop joins allowed are the bounded codebook shapes
    // (vectors × the ≤ ivfNlistExact(n)-row broadcast centroid table —
    // ~45 rows at fixture scale, capped at 4096 — and its self cross
    // join). The
    // va < vb pair enumeration of a quadratic brute-force form must be GONE
    // from every BNLJ/cartesian condition: pairs now come from the
    // admissible-cell hash join on ci/cj.
    val plan = physicalPlan("llm_sim_threshold_join")
    val nestedLines = plan.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct")).toSeq
    assert(nestedLines.forall(l => !(l.contains("va") && l.contains("vb"))),
      s"pair enumeration still nested-loop:\n${nestedLines.mkString("\n")}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"no hash/merge join for candidate pairs in:\n$plan")
  }

  test("ts_ohlc_resample aggregates in one hash shuffle (min_by/max_by partials combine map-side)") {
    // One Exchange hashpartitioning for the two-phase aggregate; the only
    // other exchange is the final ORDER BY's range partitioning. A second
    // hash exchange would mean the OHLC selections aren't partial-agg'd.
    // (The struct tie-break key downgrades HashAggregate to SortAggregate
    // — struct buffers aren't hash-aggregable — which still partial-aggs
    // map-side; that determinism trade is intended.)
    val df = SparkEntry.queries("ts_ohlc_resample")(spark, sf)
    df.collect() // AQE-finalize before inspecting (round-4 rule)
    // AQE toString appends the pre-execution "== Initial Plan ==" section;
    // count exchanges in the final section only.
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly one hash exchange, got $hashEx:\n$plan")
    assert(plan.contains("partial_min_by"),
      s"min_by must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"OHLC must not funnel through one partition:\n$plan")
  }

  test("ts_gapfill_ffill joins the spine to the fact aggregate via a hash join, facts never BNLJ") {
    // The spine construction may nested-loop (distinct types × the 1-row
    // bounds frame — both tiny by construction); the fact-side join that
    // carries the aggregated events MUST be a hash join on (type, hr).
    val df = SparkEntry.queries("ts_gapfill_ffill")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"spine-to-aggregate join is not a hash/merge join:\n$plan")
    val nested = plan.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct")).toSeq
    assert(nested.forall(l => !l.contains("sv") && !l.contains("value")),
      s"fact rows entered a nested-loop join:\n${nested.mkString("\n")}")
  }

  test("scale_range_bounds: one pinned range partitioning; the data-sized window is pid-partitioned") {
    // The pid-stamped frame is localCheckpoint'ed, so the RangePartitioner
    // sampling runs ONCE and every branch reads the pinned LogicalRDD —
    // correctness must not depend on plan-level exchange reuse. Hence the
    // consuming plan (a) scans the checkpointed RDD, (b) contains NO
    // range-partitioning exchange of its own, and (c) its only
    // row_number window partitions by pid (the lone unpartitioned window
    // is the ≤32-row offset cumsum, whose funnel is harmless).
    val df = SparkEntry.queries("scale_range_bounds")(spark, sf)
    df.collect() // AQE-finalize before inspecting (round-4 rule)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"the pid frame must come from the pinned checkpoint:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning(c#"),
      s"no branch may re-run the range exchange on the data column:\n$plan")
    val rn = plan.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("windowspecdefinition(pid")),
      s"the data-sized rank window must be partitioned by pid:\n${rn.mkString("\n")}")
  }

  test("agg_hdr_quantile_merge answers from the persisted partials only, never the fact table") {
    // First run materializes the signature-keyed partials; the inspected
    // run must then read ONLY the summary table — the whole point of the
    // mergeable-histogram shape at 100 TB.
    SparkEntry.queries("agg_hdr_quantile_merge")(spark, sf).collect()
    val df = SparkEntry.queries("agg_hdr_quantile_merge")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("orders.parquet"),
      s"the quantile read path re-scanned the fact table:\n$plan")
    assert(plan.contains("graft_hdrhist_partials"),
      s"the quantile read path must scan the persisted histogram partials:\n$plan")
  }

  test("agg_theta_sketch_setops: answers come from the persisted blob table; only the persist_exact differential rescans facts") {
    // The ANSWER path (disk-merged blobs → set algebra) reads the
    // signature-keyed partials dir; the fact table appears ONLY in the
    // inline-partials differential that backs the persist_exact flag
    // (same intentional shape as agg_hll_sketch_merge) — exactly the two
    // half-scans, never a third for the answers.
    SparkEntry.queries("agg_theta_sketch_setops")(spark, sf).collect()
    val df = SparkEntry.queries("agg_theta_sketch_setops")(spark, sf)
    df.collect()
    // no DPP subqueries here, so the round-6 first-marker split is safe
    // (the round-7 nested-AQE trap doesn't apply)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("graft_thetasketch_partials"),
      s"the answer path must scan the persisted sketch partials:\n$plan")
    val factScans = plan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("orders.parquet"))
    assert(factScans <= 2,
      s"more fact scans than the two inline-differential halves ($factScans):\n$plan")
  }

  test("scale_compaction_plan: every window partitions by dt — no data-sized funnel") {
    // The bin assignment and the bin-fill rollup are both dt-partitioned
    // windows over the FILE INVENTORY (one row per (dt, hr) file), so
    // stage width scales with days × slots, never events. An
    // unpartitioned window anywhere here would be the single-task funnel
    // the repo bans on data-sized frames.
    val df = SparkEntry.queries("scale_compaction_plan")(spark, sf)
    df.collect() // AQE-finalize before inspecting (round-4 rule)
    val plan = df.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"expected window operators in the plan:\n$plan")
    assert(windows.forall(_.contains("dt#")),
      s"every window must be dt-partitioned:\n${windows.mkString("\n")}")
  }

  test("graph_components and graph_modularity answer from the persisted label table, never re-propagating") {
    // componentLabelsP materializes the label-propagation fixed point once
    // per dataset signature; both consumers must then be pure readers —
    // the finalized plan scans the cclabels parquet and contains NO
    // iterative-propagation machinery (no LogicalRDD-backed label rounds,
    // which would show as ExistingRDD scans) and never re-derives the
    // backbone from lineitem.
    for (name <- Seq("graph_components", "graph_modularity")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // AQE-finalize before inspecting (round-4 rule)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_cclabels_"),
        s"$name must scan the persisted component labels:\n$plan")
      assert(!plan.contains("lineitem.parquet"),
        s"$name must not re-derive the backbone from the fact table:\n$plan")
      assert(!plan.contains("Scan ExistingRDD"),
        s"$name must not contain checkpointed propagation state:\n$plan")
    }
  }

  test("llm_sample_pps: pinned range partitioning; the data-sized cumsum window is pid-partitioned") {
    // Same machinery and same contract as scale_range_bounds: the
    // pid-stamped frame is localCheckpoint-pinned (one RangePartitioner
    // assignment for every branch), the consuming plan never re-runs the
    // range exchange, and the only unpartitioned window is the ≤32-row
    // offset cumsum.
    val df = SparkEntry.queries("llm_sample_pps")(spark, sf)
    df.collect()
    // no DPP subqueries here, so the round-6 first-marker split is safe
    // (the round-7 nested-AQE trap doesn't apply)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Scan ExistingRDD"),
      s"the pid frame must come from the pinned checkpoint:\n$plan")
    // exactly ONE doc_id range exchange: the output ORDER BY's sort. The
    // 32-way base partitioning ran once at checkpoint time and must not
    // reappear in any branch.
    val rangeEx = plan.linesIterator
      .count(_.contains("Exchange rangepartitioning(doc_id#"))
    assert(rangeEx == 1,
      s"expected only the output-sort range exchange, found $rangeEx:\n$plan")
    val dataWin = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("w#")).toSeq
    assert(dataWin.forall(_.contains("windowspecdefinition(pid")),
      s"the data-sized cumsum window must be partitioned by pid:\n${dataWin.mkString("\n")}")
  }

  test("llm_shard_assign: pinned range partitioning; every data-sized window is pid-partitioned") {
    // The two-pass prefix-rank contract, per-shard: the (shard, h, doc_id)
    // range partitioning runs ONCE at checkpoint time, the per-partition
    // row_number window is (pid, shard)-partitioned (never a data-sized
    // single-task window), and the only unpartitioned work is the
    // ≤ 32×16-row offset table.
    val df = SparkEntry.queries("llm_shard_assign")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("Scan ExistingRDD"),
      s"the pid frame must come from the pinned checkpoint:\n$plan")
    // exactly ONE doc_id range exchange: the output ORDER BY's sort
    val rangeEx = plan.linesIterator
      .count(_.contains("Exchange rangepartitioning(doc_id#"))
    assert(rangeEx == 1,
      s"expected only the output-sort range exchange, found $rangeEx:\n$plan")
    // the local-rank window runs partitioned by (pid, shard); the tiny
    // offset cumsum is shard-partitioned — nothing is unpartitioned
    val wins = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(wins.nonEmpty, s"expected window nodes:\n$plan")
    assert(wins.forall(l =>
      l.contains("windowspecdefinition(pid") ||
        l.contains("windowspecdefinition(shard")),
      s"every window must be pid- or shard-partitioned:\n${wins.mkString("\n")}")
  }
}
