package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing tests: schema, determinism, partition
  * preservation, bounded frame explosion — plus golden-byte tests for the
  * REAL PNG/JPEG header decode (hand-assembled headers with known
  * dimensions, independent of pngWrap). Pixel decode and feature
  * extraction remain deterministic stubs (no codec libs on this image). */
class MultimodalSpec extends SparkSpec {

  private def media() =
    Multimodal.syntheticMediaTable(Tables.documents(spark, sf))

  test("PNG golden header: hand-built IHDR bytes decode exact dims and channels") {
    // hand-assembled, NOT via pngWrap: signature, IHDR length 13, "IHDR",
    // width 260 (0x104), height 70 (0x46), depth 8, color type 6 (RGBA),
    // zeros, dummy CRC (decode must not require CRC validation to read dims)
    val png = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, // IHDR data length 13
      'I', 'H', 'D', 'R',
      0x00, 0x00, 0x01, 0x04, // width 260
      0x00, 0x00, 0x00, 0x46, // height 70
      0x08, 0x06, // bit depth 8, color type 6 → 4 channels
      0x00, 0x00, 0x00, // compression, filter, interlace
      0xde, 0xad, 0xbe, 0xef // CRC (unchecked)
    ).map(_.toByte)
    assert(Multimodal.decodeImageHeader(png) === Some((260, 70, 4)))
    // each color type maps to its spec channel count
    for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)) {
      val p = png.clone(); p(25) = ct.toByte
      assert(Multimodal.decodeImageHeader(p) === Some((260, 70, ch)), s"color type $ct")
    }
    // pngWrap round-trips through the independent golden-path parser
    val wrapped = Multimodal.pngWrap(1023, 768, 2, "payload".getBytes)
    assert(Multimodal.decodeImageHeader(wrapped) === Some((1023, 768, 3)))
  }

  test("JPEG golden header: SOF0 after skipped segments decodes exact dims") {
    // SOI, APP0 (len 4, skipped), DHT-lookalike skipped by length, then
    // SOF0: len 17, precision 8, height 240, width 320, 3 components
    val jpeg = Array(
      0xff, 0xd8, // SOI
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0, length 4
      0xff, 0xc4, 0x00, 0x05, 0x01, 0x02, 0x03, // DHT (C4 is NOT a SOF), length 5
      0xff, 0xc0, 0x00, 0x11, // SOF0, length 17
      0x08, // precision
      0x00, 0xf0, // height 240
      0x01, 0x40, // width 320
      0x03, // 3 components
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01 // component specs
    ).map(_.toByte)
    assert(Multimodal.decodeImageHeader(jpeg) === Some((320, 240, 3)))
    // progressive marker SOF2 decodes identically
    val prog = jpeg.clone(); prog(17) = 0xc2.toByte
    assert(Multimodal.decodeImageHeader(prog) === Some((320, 240, 3)))
  }

  test("non-image, truncated, and corrupt headers all refuse to decode") {
    assert(Multimodal.decodeImageHeader("just some text".getBytes) === None)
    assert(Multimodal.decodeImageHeader(Array[Byte]()) === None)
    val png = Multimodal.pngWrap(10, 10, 2, Array[Byte]())
    assert(Multimodal.decodeImageHeader(png.take(20)) === None, "truncated IHDR")
    val badChunk = png.clone(); badChunk(12) = 'X'.toByte
    assert(Multimodal.decodeImageHeader(badChunk) === None, "IHDR not first chunk")
    val zeroDim = png.clone(); zeroDim(16) = 0; zeroDim(17) = 0; zeroDim(18) = 0; zeroDim(19) = 0
    assert(Multimodal.decodeImageHeader(zeroDim) === None, "zero width")
    // JPEG that ends before any SOF marker
    val noSof = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00).map(_.toByte)
    assert(Multimodal.decodeImageHeader(noSof) === None)
  }

  test("synthetic media table: binary payload with typed metadata columns") {
    val m = media()
    val schema = m.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(m.count() === Tables.documents(spark, sf).count())
    assert(m.select("media_type").distinct().collect().map(_.getString(0)).sorted
      === Array("audio", "image", "video"))
  }

  test("image meta extraction is deterministic; image rows decode REAL PNG headers") {
    val meta1 = Multimodal.extractImageMeta(media()).collect().sortBy(_.media_id)
    val meta2 = Multimodal.extractImageMeta(media()).collect().sortBy(_.media_id)
    assert(meta1.toSeq === meta2.toSeq)
    val (img, rest) = meta1.partition(_.media_id % 3 == 0)
    // image rows: parsed from the genuine PNG IHDR, matching the injection
    // formula (the oracle-checked mm_image_meta contract)
    assert(img.nonEmpty)
    img.foreach { m =>
      assert(m.width === (m.media_id % 1024 + 16).toInt, s"media ${m.media_id}")
      assert(m.height === (m.media_id % 768 + 16).toInt)
      assert(m.channels === (if (m.media_id % 2 == 0) 3 else 4))
    }
    // non-image rows: the deterministic stub fallback
    assert(rest.forall(m => m.width >= 64 && m.height >= 64 &&
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

  test("feature extraction is a real byte histogram: 16 bins, L1-normalized, hand-checkable") {
    val f = Multimodal.extractFeatures(media()).collect()
    assert(f.nonEmpty)
    assert(f.forall(_.feature.length == 16))
    f.foreach { x =>
      assert(x.feature.forall(v => v >= 0.0f && v <= 1.0f))
      assert(math.abs(x.feature.sum - 1.0f) < 1e-3f, "histogram must be L1-normalized")
    }
    // closed form: a constant payload lands its whole mass in one bin
    val h = Multimodal.extractByteHistogram(Array.fill(40)(0x41.toByte)) // 'A' = 0x41 -> bin 4
    assert(h(4) === 1.0f && h.sum === 1.0f)
    assert(Multimodal.extractByteHistogram(Array.emptyByteArray).forall(_ == 0.0f))
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
