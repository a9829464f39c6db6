package graft.ops

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
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
        dsum(col("l_extendedprice")).as("sum_price"))
    },

    "agg_groupby_pricing" -> { (s, d) =>
      // TPC-H Q1 shape: the flagship partial-aggregation benchmark.
      // All money arithmetic in exact decimal (see Tables.dsum scaladoc).
      import Tables.{dec2, rate2, oneD, Money}
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (oneD - rate2(col("l_discount")))).cast(Money).as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) * (oneD - rate2(col("l_discount"))) * (oneD + rate2(col("l_tax")))).cast(DecimalType(38, 6)).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "agg_global" ->
      """SELECT count(*) AS n_rows,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       sum(l_orderkey) AS sum_okey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sum_price
        |FROM lineitem""".stripMargin,

    "agg_groupby_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(38,6)) AS sum_charge,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
