package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 appears once in `queries` (and, where
  * oracle-able, once in `oracleSql` with identical output column aliases).
  * The implementations live in `graft.ops.*`, one object per §2 category.
  */
object SparkEntry {

  private val categories: Seq[(Seq[(String, (SparkSession, String) => DataFrame)], Seq[(String, String)])] =
    Seq(
      (ops.Sources.queries, ops.Sources.oracles),
      (ops.Basics.queries, ops.Basics.oracles),
      (ops.Joins.queries, ops.Joins.oracles),
      (ops.Aggregates.queries, ops.Aggregates.oracles),
      (ops.Windows.queries, ops.Windows.oracles),
      (ops.Scalars.queries, ops.Scalars.oracles),
      (ops.LlmOps.queries, ops.LlmOps.oracles),
      (ops.Udfs.queries, ops.Udfs.oracles),
      (ops.StreamBatch.queries, ops.StreamBatch.oracles),
      (ops.Reshape.queries, ops.Reshape.oracles),
      (ops.EventAnalytics.queries, ops.EventAnalytics.oracles),
      (ops.Graph.queries, ops.Graph.oracles),
      (flowlog.FlowLogQueries.queries, flowlog.FlowLogQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_groupby_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    categories.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    categories.flatMap(_._2).toMap
}
