package graft

/** Entry point 2 (SURVEY.md §3.3): the same library semantics must be
  * reachable through `spark.sql` over registered views — users of the
  * reference pipeline query the parquet through SQL (Athena-style), so the
  * SQL text form of each shape must agree with the DataFrame form the
  * declared queries use. */
class SqlEntrySpec extends SparkSpec {

  private def viewed[T](f: => T): T = {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    Tables.customer(spark, sf).createOrReplaceTempView("customer")
    Tables.events(spark, sf).createOrReplaceTempView("events")
    Tables.documents(spark, sf).createOrReplaceTempView("documents")
    try f finally {
      Seq("lineitem", "orders", "customer", "events", "documents")
        .foreach(spark.catalog.dropTempView(_))
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame): List[List[Any]] =
    df.collect().map(_.toSeq.toList).toList

  test("flagship pricing aggregation: SQL text == DataFrame form") {
    viewed {
      val sql = spark.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base,
          |       count(*) AS n_rows
          |FROM lineitem
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin)
      val df = Tables.lineitem(spark, sf)
        .groupBy(org.apache.spark.sql.functions.col("l_returnflag"),
          org.apache.spark.sql.functions.col("l_linestatus"))
        .agg(Tables.dsumD(org.apache.spark.sql.functions.col("l_quantity")).as("sum_qty"),
          Tables.dsumD(org.apache.spark.sql.functions.col("l_extendedprice")).as("sum_base"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
      assert(rows(sql) === rows(df))
    }
  }

  test("join + window SQL matches the declared DataFrame queries") {
    viewed {
      val sqlJoin = spark.sql(
        """SELECT o_orderkey, c_custkey, c_name
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_orderkey ASC""".stripMargin)
      assert(rows(sqlJoin) ===
        rows(SparkEntry.queries("join_inner_equi")(spark, sf)))

      val sqlWin = spark.sql(
        """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |         CAST(row_number() OVER (PARTITION BY o_custkey
          |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
          |  FROM orders) t
          |WHERE rn <= 3
          |ORDER BY o_custkey ASC, rn ASC""".stripMargin)
      assert(rows(sqlWin) ===
        rows(SparkEntry.queries("win_row_number_topk")(spark, sf)))
    }
  }

  test("ten representative declared queries run as SQL text and match the DataFrame form") {
    // These oracle texts live in the Spark ∩ DuckDB common dialect, so
    // the SAME string the DuckDB gate executes runs through spark.sql
    // over registered views — pinning entry point 2 (SURVEY §3.3) across
    // projection/filter, aggregation (global, grouped+having, distinct),
    // anti-join, set ops, sort/limit, and a running window. Queries whose
    // oracles use DuckDB-only functions (sha256, //, list ops) are
    // exercised via hand-adapted texts below instead.
    val verbatim = Seq(
      "agg_having", "agg_global", "agg_count_distinct",
      "filter_conjunctive", "join_left_anti",
      "sort_multi_col", "limit_topk_global", "distinct_rows",
      "set_union_all", "set_intersect", "win_running_sum_rows")
    viewed {
      for (name <- verbatim) {
        val sqlRows = rows(spark.sql(SparkEntry.oracleSql(name)))
        val dfRows = rows(SparkEntry.queries(name)(spark, sf))
        assert(sqlRows === dfRows, s"$name: SQL text diverged from DataFrame form")
      }
      // llm_dedup_exact's oracle says sha256(x); Spark spells it sha2(x, 256)
      val dedupSql = spark.sql(
        """SELECT doc_id, lang, h FROM (
          |  SELECT doc_id, lang, sha2(lower(trim(text)), 256) AS h,
          |         row_number() OVER (PARTITION BY sha2(lower(trim(text)), 256)
          |                            ORDER BY doc_id ASC) AS rn
          |  FROM documents) t
          |WHERE rn = 1
          |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
      assert(rows(dedupSql) ===
        rows(SparkEntry.queries("llm_dedup_exact")(spark, sf)),
        "llm_dedup_exact: SQL text diverged from DataFrame form")
    }
  }

  test("native kernel functions are callable from SQL text") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
    assert(r.head().getDouble(0) === 32.0)
  }
}
