package graft.flowlog

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end streaming replica of the reference pipeline: envelope bytes →
  * decode → parse → dt/hr-partitioned Parquet with checkpointed
  * exactly-once delivery. MemoryStream stands in for the Kinesis source
  * with byte-identical payloads (SURVEY.md §2.I seam). */
class FlowLogStreamSpec extends SparkSpec {

  private def gzip(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(s.getBytes(UTF_8)); gz.close()
    bos.toByteArray
  }

  private def envelope(eventId: Int, msg: String): Array[Byte] = gzip(
    s"""{"messageType":"DATA_MESSAGE","owner":"1","logGroup":"g","logStream":"s",
       |"subscriptionFilters":[],"logEvents":[
       |{"id":"$eventId","timestamp":1704067200000,"message":"$msg"}]}"""
      .stripMargin.replace("\n", ""))

  test("streaming pipeline: envelopes to partitioned parquet, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("flowlog_stream").toString
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"

    def run(payloads: Seq[Array[Byte]], mem: MemoryStream[Array[Byte]]): Unit = {
      val parsed = FlowLog.withDatePartitions(
        FlowLog.parseFlowLogs(FlowLog.decodeEnvelopes(mem.toDF())))
        .filter(col("parse_error").isNull)
      val q = parsed.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .partitionBy("dt", "hr").start()
      try { mem.addData(payloads); q.processAllAvailable() } finally q.stop()
    }

    val line = (p: Int) =>
      s"2 1 eni-x 10.0.0.1 10.0.0.2 443 $p 6 1 100 1704067140 1704067200 ACCEPT OK"
    // same source instance across both runs: checkpointed offsets identify
    // what was committed, so the restart resumes exactly after batch 0.
    val mem = MemoryStream[Array[Byte]]
    run(Seq(envelope(1, line(1000)), envelope(2, line(1001))), mem)
    run(Seq(envelope(3, line(1002))), mem)

    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    assert(back.select("dstport").collect().map(_.getInt(0)).sorted ===
      Array(1000, 1001, 1002))
    // hive layout dt=…/hr=… exists
    val dtDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("dt="))
    assert(dtDirs.nonEmpty)
    assert(dtDirs.head.listFiles().exists(_.getName.startsWith("hr=")))
    // partition values derive from flow start time (1704067140 = 23:59 UTC)
    assert(back.select("dt").distinct().head.get(0).toString === "2023-12-31")
  }

  test("streaming rejected-traffic report over decoded envelopes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Array[Byte]]
    val parsed = FlowLog.parseFlowLogs(FlowLog.decodeEnvelopes(mem.toDF()))
    val report = parsed
      .filter(col("action") === "REJECT")
      .withWatermark("start_ts", "1 hour")
      .groupBy(window(col("start_ts"), "1 hour"), col("interface_id"))
      .agg(count(lit(1)).as("n"), sum(col("bytes")).as("bytes"))
    val q = report.writeStream.format("memory").queryName("stream_rejects")
      .outputMode("complete").start()
    try {
      mem.addData(Seq(
        envelope(1, "2 1 eni-a 10.0.0.1 10.0.0.2 443 80 6 1 100 1704067140 1704067200 REJECT OK"),
        envelope(2, "2 1 eni-a 10.0.0.3 10.0.0.2 443 81 6 1 150 1704067145 1704067200 REJECT OK"),
        envelope(3, "2 1 eni-b 10.0.0.1 10.0.0.2 443 82 6 1 999 1704067150 1704067200 ACCEPT OK")))
      q.processAllAvailable()
      val rows = spark.table("stream_rejects").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[String]("interface_id") === "eni-a")
      assert(rows.head.getAs[Long]("n") === 2L)
      assert(rows.head.getAs[Long]("bytes") === 250L)
    } finally q.stop()
  }
}
