package graft.ops

import graft.Tables
import graft.Tables.dsumD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.A — source scan shapes.
  *
  * Scale notes (100 TB): these three queries are the plan-shape probes for the
  * scan path. `src_scan_pruned` must show a 2-column ReadSchema (column
  * pruning into the vectorized Parquet reader) and `src_scan_partition_filter`
  * must show PushedFilters on l_shipdate — at 100 TB those two properties are
  * the difference between reading 2 columns of a few row groups and reading
  * the whole dataset. Verified via `.explain` in PlanSpec.
  */
object Sources {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "src_scan_parquet" -> { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_linenumber")).as("sum_linenumber"),
        sum(col("l_partkey")).as("sum_partkey"))
    },

    "src_scan_pruned" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
        .orderBy(col("l_orderkey").asc, col("l_quantity").asc)
        .limit(1000)
    },

    "src_scan_partition_filter" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz"))
        .agg(count(lit(1)).as("n_rows"),
          dsumD(col("l_extendedprice")).as("sum_price"))
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "src_scan_parquet" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(l_linenumber) AS BIGINT) AS sum_linenumber,
        |       CAST(sum(l_partkey) AS BIGINT) AS sum_partkey
        |FROM lineitem""".stripMargin,

    "src_scan_pruned" ->
      """SELECT l_orderkey, l_quantity FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_quantity ASC NULLS FIRST
        |LIMIT 1000""".stripMargin,

    "src_scan_partition_filter" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin
  )
}
