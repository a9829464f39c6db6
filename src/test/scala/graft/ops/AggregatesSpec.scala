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

  /** Naive double-precision population g1 / excess g2 over a sample. */
  private def naiveMoments(xs: Seq[Long]): (Double, Double) = {
    val n = xs.length.toDouble
    val mu = xs.sum.toDouble / n
    def c(k: Int) = xs.map(x => math.pow(x - mu, k)).sum / n
    (c(3) / math.pow(c(2), 1.5), c(4) / (c(2) * c(2)) - 3.0)
  }

  test("skew/kurt: integer power-sum algebra matches naive central moments") {
    // Closed-form witness {0, 0, 1}: m2=2, m3=2, m4=6 →
    // g1 = 2/2^1.5 = 1/√2, g2 = 6/4 − 3 = −1.5 — the worked example the
    // agg_skew_kurt scaladoc cites (nᵏ scalings cancel exactly).
    val (w1, w2) = naiveMoments(Seq(0L, 0L, 1L))
    assert(math.abs(w1 - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(math.abs(w2 - (-1.5)) < 1e-12)
    // Fixture differential: the declared query vs a naive double scan of
    // the same quantities, per flag (rel-tol — the query is exact-integer
    // up to its final rounding, the naive path accumulates fp error).
    val naive = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), expr("CAST(l_quantity AS BIGINT)").as("iq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> naiveMoments(v.map(_._2).toSeq) }
    val got = graft.SparkEntry.queries("agg_skew_kurt")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    naive.foreach { case (flag, (g1, g2)) =>
      assert(math.abs(got(flag)._1 - g1) < 1e-6, s"flag $flag skew")
      assert(math.abs(got(flag)._2 - g2) < 1e-6, s"flag $flag kurt")
    }
  }
}
