package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions injection path must expose every graft function
  * without any per-closure registration. Uses its own session (extensions
  * are fixed at session build). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-injected functions resolve in a fresh session") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      val sig = s.sql("SELECT graft_minhash_str(array('a b c', 'b c d')) AS sig")
        .head().getSeq[Long](0)
      assert(sig.length === 64)
      val n = s.sql("SELECT graft_sorted_intersect_long(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS n")
        .head().getInt(0)
      assert(n === 2)
    } finally {
      // do not stop(): the shared context belongs to the suite-wide session
    }
  }
}
