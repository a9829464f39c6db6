package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshaping and subquery operators: pivot/unpivot and (correlated) scalar
  * subqueries — completing the relational surface beyond SURVEY §2's tables.
  *
  * Scale notes (100 TB): pivot compiles to a single hash aggregate with one
  * output column per (small, explicit) pivot value — never pivot on an
  * unbounded domain. Unpivot is a generate (row explosion) with no shuffle.
  * Correlated scalar subqueries decorrelate into aggregate+join (Catalyst
  * RewriteCorrelatedScalarSubquery), so they scale like the equivalent
  * manual join.
  */
object Reshape {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "agg_pivot" -> { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy(col("user_id").asc)
    },

    "reshape_unpivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount")),
          "metric", "value")
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("metric").asc, col("value").asc)
    },

    "filter_scalar_subquery" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_ssq")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM graft_orders_ssq
          |WHERE o_totalprice > 2 * (
          |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
          |  FROM graft_orders_ssq)
          |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
    },

    "filter_correlated_subquery" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_csq")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM graft_orders_csq o
          |WHERE o_totalprice > 1.5 * (
          |  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
          |  FROM graft_orders_csq i WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "agg_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'error') AS error,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'view') AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    "reshape_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS value FROM lineitem
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |         metric ASC NULLS FIRST, value ASC NULLS FIRST""".stripMargin,

    "filter_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |  FROM orders)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "filter_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin
  )
}
