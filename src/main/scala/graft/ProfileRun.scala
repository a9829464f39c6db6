package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Ad-hoc stage-level profiler for optimization rounds (guide §1: measure
  * first). Runs named queries under the bench's session shape with a
  * SparkListener that attributes every completed stage to the query that
  * was running, then prints per-query job/stage counts, summed stage wall
  * time, and the top stages by duration. Not part of any gate — a
  * measurement tool only.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileRun q1 q2 ..."
  */
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var current = "warmup"
    case class StageRec(query: String, name: String, ms: Long, tasks: Int,
      shuffleReadMB: Double, shuffleWriteMB: Double)
    val stages = mutable.ArrayBuffer.empty[StageRec]
    val jobs = mutable.HashMap.empty[String, Int].withDefaultValue(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(current) += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        val m = si.taskMetrics
        stages.synchronized {
          stages += StageRec(current, si.name.takeWhile(_ != '\n').take(90),
            ms, si.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0)
        }
      }
    })

    // same family warmup as Bench so codegen costs don't pollute
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    Seq("agg_approx_distinct", "llm_dedup_embcos", "llm_sim_topk",
        "llm_dedup_exact", "llm_sim_ann_pq",
        "graph_triangle_count", "graph_khop_reach", "graph_pagerank",
        "graph_louvain_full", "flowlog_bytes_per_eni_hour",
        "stream_session_agg_batch").foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache(); System.gc()

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // one untimed pass (indexes/codegen), then the measured pass
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"$name FAILED: ${e.getMessage}") }
      spark.catalog.clearCache(); System.gc()
      current = name
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      current = "between"
      spark.catalog.clearCache(); System.gc()
      val ss = stages.synchronized { stages.filter(_.query == name).toSeq }
      println(f"== $name wall=$wall%.3f s jobs=${jobs(name)} stages=${ss.size} " +
        f"stageSum=${ss.map(_.ms).sum / 1000.0}%.3f s")
      ss.sortBy(-_.ms).take(12).foreach { r =>
        println(f"   ${r.ms}%6d ms t=${r.tasks}%3d r=${r.shuffleReadMB}%7.1fMB " +
          f"w=${r.shuffleWriteMB}%7.1fMB  ${r.name}")
      }
    }
    spark.stop()
  }
}
