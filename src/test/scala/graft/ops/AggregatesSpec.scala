package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bounds for the sketch-based aggregates that have no cross-engine oracle. */
class AggregatesSpec extends SparkSpec {

  test("approx_percentile is within tolerance of the exact percentile") {
    val approx = graft.SparkEntry.queries("agg_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, p) =>
      assert(math.abs(approx(k) - p) / p <= 0.05,
        s"status $k: approx ${approx(k)} vs exact $p")
    }
  }

  test("approx_percentile with high accuracy equals the exact percentile on small groups") {
    // with accuracy >= group size, the GK sketch is exact
    val a = Tables.orders(spark, sf)
      .agg(expr("approx_percentile(o_totalprice, 0.5, 100000)")).head.getDouble(0)
    val e = Tables.orders(spark, sf)
      .agg(expr("percentile(o_totalprice, 0.5)")).head.getDouble(0)
    assert(math.abs(a - e) / e < 0.001)
  }
}
