package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing tests: schema, determinism, partition
  * preservation, bounded frame explosion. The decode stubs are deterministic
  * fakes (no codec libs on this image) — what's under test is the Spark
  * plumbing that a real codec would drop into. */
class MultimodalSpec extends SparkSpec {

  private def media() =
    Multimodal.syntheticMediaTable(Tables.documents(spark, sf))

  test("synthetic media table: binary payload with typed metadata columns") {
    val m = media()
    val schema = m.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(m.count() === Tables.documents(spark, sf).count())
    assert(m.select("media_type").distinct().collect().map(_.getString(0)).sorted
      === Array("audio", "image", "video"))
  }

  test("image meta extraction is deterministic and total") {
    val meta1 = Multimodal.extractImageMeta(media()).collect().sortBy(_.media_id)
    val meta2 = Multimodal.extractImageMeta(media()).collect().sortBy(_.media_id)
    assert(meta1.toSeq === meta2.toSeq)
    assert(meta1.forall(m => m.width >= 64 && m.height >= 64 &&
      (m.channels == 1 || m.channels == 3)))
    // checksum must reflect payload content: distinct docs → distinct sums
    assert(meta1.map(_.checksum).distinct.length === meta1.length)
  }

  test("mapPartitions decode preserves partitioning (no shuffle in plan)") {
    val m = media().repartition(7)
    val meta = Multimodal.extractImageMeta(m)
    assert(meta.rdd.getNumPartitions === 7)
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"decode step must not shuffle:\n$plan")
  }

  test("feature extraction yields fixed-width vectors in [0,1]") {
    val f = Multimodal.extractFeatures(media()).collect()
    assert(f.forall(_.feature.length == 8))
    assert(f.forall(_.feature.forall(v => v >= 0.0f && v <= 1.0f)))
  }

  test("resize stub bounds payload size and is idempotent") {
    val r1 = Multimodal.resizeStub(media(), 100)
    assert(r1.collect().forall(_.payload.length <= 100))
    val r2 = Multimodal.resizeStub(r1, 100)
    assert(r2.collect().map(r => (r.media_id, r.payload.toSeq)).sortBy(_._1)
      === r1.collect().map(r => (r.media_id, r.payload.toSeq)).sortBy(_._1))
  }

  test("frame sampling emits every n-th bounded slice") {
    val frames = Multimodal.sampleFrames(media().toDF(), frameBytes = 50, everyN = 2)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max(col("frame_idx")).as("max_idx")).collect()
    val sizes = media().select(col("media_id"), octet_length(col("payload")).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byId.foreach { r =>
      val nFrames = math.ceil(sizes(r.getLong(0)) / 50.0).toInt
      val expected = (0 until nFrames).count(_ % 2 == 0)
      assert(r.getLong(1) === expected.toLong)
    }
    // frames are bounded slices
    assert(frames.select(max(octet_length(col("frame")))).head.getInt(0) <= 50)
  }
}
