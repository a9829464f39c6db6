package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing tests: schema, determinism, partition
  * preservation, bounded frame explosion — plus golden-byte tests for the
  * REAL PNG/JPEG header decode (hand-assembled headers with known
  * dimensions, independent of pngWrap), the full PNG pixel codec (all
  * five scanline filters), and the WAV/PCM codec (JDK javax.sound
  * differential both ways, LIST-chunk splice, closed-form sums). */
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

  test("cross-res renditions: planted pair shares phash via the REAL resize path, md5s differ") {
    import spark.implicits._
    // one planted doc with a known parity pattern: byte j of the text
    // drives grid cell j — 'a' (97, odd → 112) and 'b' (98, even → 48)
    val text = ("ab" * 32) // 64 bytes: alternating high/low blocks
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val media = Multimodal.crossResTable(docs).collect().sortBy(_.media_id)
    assert(media.map(_.media_id).toSeq === Seq(14L, 15L))
    // the half rendition is a genuinely different container AND different
    // decoded buffer (half the dims), produced by decode→resample→encode
    val Some((fw, fh, fch, fpx)) = Multimodal.decodePng(media(0).payload)
    val Some((hw, hh, hch, hpx)) = Multimodal.decodePng(media(1).payload)
    assert((fw, fh) === (16 * 4, 16 * 2) && (hw, hh) === (fw / 2, fh / 2))
    assert(fch === hch && !java.util.Arrays.equals(fpx, hpx))
    // phash invariance is exact by construction; expected hash from the
    // closed form 64·B[j] > ΣB: B alternates 112/48, mean 80 → bit = (j even)
    val expected = (0 until 64).map(j => if (j % 2 == 0) '1' else '0').mkString
    assert(Multimodal.averageHash(fw, fh, fch, fpx) === expected)
    assert(Multimodal.averageHash(hw, hh, hch, hpx) === expected)
    // the declared query's grouping: one phash group of both renditions,
    // with TWO distinct exact digests — phash reunites what md5 cannot
    val grouped = Multimodal.phashDigest(Multimodal.crossResTable(docs)).toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n"), countDistinct(col("pix_md5")).as("nd"))
      .collect()
    assert(grouped.length === 1)
    assert(grouped(0).getAs[Long]("n") === 2L && grouped(0).getAs[Long]("nd") === 2L)
  }

  test("JPEG codec: block-image roundtrip is bit-exact and agrees with the JDK's independent decoder") {
    // fixture-shaped content: MCU-aligned constant cells, values 48/112
    val px = new Array[Byte](64 * 64)
    for (i <- px.indices) {
      val j = (i / 64 / 8) * 8 + (i % 64) / 8
      px(i) = if (j % 3 == 0) 48.toByte else 112.toByte
    }
    val jpg = Jpeg.encodeGray(64, 64, px)
    // our decoder: bit-exact roundtrip (DC-only blocks, q=16 divides)
    val Some((w, h, ch, got)) = Jpeg.decode(jpg)
    assert((w, h, ch) === (64, 64, 1))
    assert(java.util.Arrays.equals(got, px), "roundtrip must be lossless on DC-only content")
    // the JDK's ImageIO is a fully independent implementation: it must
    // read our stream to the identical pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img.getWidth === 64 && img.getHeight === 64)
    val ref = img.getRaster
    for (y <- 0 until 64; x <- 0 until 64)
      assert(ref.getSample(x, y, 0) === (got(y * 64 + x) & 0xff),
        s"ImageIO disagrees at ($x,$y)")
  }

  test("JPEG codec: decodes an ImageIO-ENCODED gradient (general AC path) within IDCT tolerance") {
    // a smooth gradient exercises real AC coefficients, ZRL runs, and
    // multi-category DC diffs — none of which the DC-only fixture hits
    val w = 56; val h = 40 // non-multiple-of-8 width/height edge blocks too
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0,
        (128 + 80 * math.sin(x / 6.0) * math.cos(y / 5.0)).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpg = bos.toByteArray
    val Some((dw, dh, dch, got)) = Jpeg.decode(jpg)
    assert((dw, dh, dch) === (w, h, 1))
    // the spec permits per-decoder IDCT rounding differences; libjpeg's
    // integer IDCT vs our double IDCT must agree within ±2 everywhere
    // and ±0.5 on average
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg)).getRaster
    var sumAbs = 0L
    var maxAbs = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(ref.getSample(x, y, 0) - (got(y * w + x) & 0xff))
      sumAbs += d; maxAbs = math.max(maxAbs, d)
    }
    assert(maxAbs <= 2, s"max IDCT deviation $maxAbs")
    assert(sumAbs.toDouble / (w * h) <= 0.5, s"mean IDCT deviation ${sumAbs.toDouble / (w * h)}")
  }

  test("cross-format renditions: PNG and JPEG of one image digest identically, containers differ") {
    import spark.implicits._
    val docs = Seq((3L, "ab" * 40)).toDF("doc_id", "text")
    val media = Multimodal.crossFormatTable(docs).collect().sortBy(_.media_id)
    assert(media.map(_.media_id).toSeq === Seq(6L, 7L))
    // different containers (PNG signature vs JPEG SOI) …
    assert((media(0).payload(0) & 0xff) === 0x89)
    assert((media(1).payload(0) & 0xff) === 0xff && (media(1).payload(1) & 0xff) === 0xd8)
    // … same decoded pixels through each format's own real codec
    val digs = Multimodal.formatDigest(Multimodal.crossFormatTable(docs))
      .collect().sortBy(_.media_id)
    assert(digs.map(_.format).toSeq === Seq("png", "jpeg"))
    assert(digs(0).pix_md5 === digs(1).pix_md5)
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

  test("PNG codec golden: encode→decode round-trips exact pixels for all 4 channel layouts") {
    for (ch <- Seq(1, 2, 3, 4)) {
      val w = 5; val h = 3
      val px = Array.tabulate(w * h * ch)(i => ((i * 37 + ch * 11) % 256).toByte)
      val png = Multimodal.encodePng(w, h, ch, px)
      val Some((dw, dh, dch, dpx)) = Multimodal.decodePng(png)
      assert((dw, dh, dch) === ((w, h, ch)), s"ch=$ch dims")
      assert(dpx.toSeq === px.toSeq, s"ch=$ch pixels")
      // the header-level decoder agrees with the full decoder
      assert(Multimodal.decodeImageHeader(png) === Some((w, h, ch)), s"ch=$ch header")
    }
  }

  /** Hand-assembled PNG with CHOSEN per-scanline filter types: deflate the
    * given (filter byte + filtered bytes) rows verbatim into one IDAT. */
  private def pngWithFilters(w: Int, h: Int, ch: Int,
      rows: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val raw = new java.io.ByteArrayOutputStream()
    rows.foreach { case (ft, data) =>
      assert(data.length === w * ch)
      raw.write(ft); raw.write(data)
    }
    val deflater = new java.util.zip.Deflater()
    val zipped = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(zipped, deflater)
    dos.write(raw.toByteArray); dos.close(); deflater.end()
    // reuse the real encoder for the container, then splice our IDAT by
    // rebuilding: signature+IHDR from a 1-row encode, custom IDAT, IEND
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong))
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
    }
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val colorType = ch match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(w.toLong)); ihdr.write(be32(h.toLong))
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("PNG decode golden: all five scanline filters reconstruct hand-computed pixels") {
    // 3px-wide greyscale (bpp=1). Expected recon computed by hand per the
    // spec: Sub adds left, Up adds above, Average adds (left+up)/2 floored,
    // Paeth picks the predictor minimizing |p−x|.
    val png = pngWithFilters(3, 5, 1, Seq(
      (0, Array[Byte](10, 20, 30)),          // None    → 10 20 30
      (1, Array[Byte](5, 5, 5)),             // Sub     → 5 10 15
      (2, Array[Byte](1, 2, 3)),             // Up      → 6 12 18
      (3, Array[Byte](4, 4, 4)),             // Average → a=0,b=6→7; a=7,b=12→13; a=13,b=18→19
      (4, Array[Byte](1, 1, 1))              // Paeth   → p(0,7,0)=7→8; p(8,13,7)=13→14... see below
    ))
    val Some((w, h, ch, px)) = Multimodal.decodePng(png)
    assert((w, h, ch) === ((3, 5, 1)))
    // Paeth row by hand: x=0: a=0,b=7,c=0 → p=7 ⇒ pred 7, recon 8.
    //   x=1: a=8,b=13,c=7 → p=14: pa=6,pb=1,pc=7 ⇒ pred 13, recon 14.
    //   x=2: a=14,b=19,c=13 → p=20: pa=6,pb=1,pc=7 ⇒ pred 19, recon 20.
    assert(px.map(_ & 0xff).toSeq === Seq(
      10, 20, 30,
      5, 10, 15,
      6, 12, 18,
      7, 13, 19,
      8, 14, 20))
  }

  test("nearest-neighbor resample golden: exact source-pixel picks, and resize round-trips") {
    // 4×4 RGB gradient: pixel (x,y) = (x*10, y*10, x+y)
    val src = Array.tabulate(4 * 4 * 3) { i =>
      val p = i / 3; val x = p % 4; val y = p / 4
      (i % 3 match { case 0 => x * 10; case 1 => y * 10; case 2 => x + y }).toByte
    }
    val half = Multimodal.resampleNearest(4, 4, 3, src, 2, 2)
    // out(x,y) = in(2x, 2y): picks source pixels (0,0) (2,0) (0,2) (2,2)
    def pix(x: Int, y: Int) = Seq(src((y * 4 + x) * 3), src((y * 4 + x) * 3 + 1),
      src((y * 4 + x) * 3 + 2))
    assert(half.toSeq === (pix(0, 0) ++ pix(2, 0) ++ pix(0, 2) ++ pix(2, 2)))
    // identity resample is a no-op
    assert(Multimodal.resampleNearest(4, 4, 3, src, 4, 4).toSeq === src.toSeq)

    // end-to-end over a Dataset: a real 4×4 PNG shrinks into the 2×2 box
    // with exactly the golden bytes; undecodable payloads pass through
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.encodePng(4, 4, 3, src)),
      Multimodal.MediaRow(2L, "audio", Array[Byte](1, 2, 3)))
    val resized = Multimodal.resizeImages(rows.toDS(), 2, 2).collect()
      .sortBy(_.media_id)
    val Some((rw, rh, rch, rpx)) = Multimodal.decodePng(resized(0).payload)
    assert((rw, rh, rch) === ((2, 2, 3)))
    assert(rpx.toSeq === half.toSeq)
    assert(resized(1).payload.toSeq === Seq[Byte](1, 2, 3), "non-PNG must pass through")
    // already-fitting images are untouched (idempotence on the fixed point)
    val again = Multimodal.resizeImages(resized.toSeq.toDS(), 2, 2).collect()
      .sortBy(_.media_id)
    assert(again.map(_.payload.toSeq).toSeq === resized.map(_.payload.toSeq).toSeq)
  }

  test("pixel table: every payload is a fully-valid PNG whose decoded sum matches the closed form") {
    import spark.implicits._
    val docs = Seq((0L, "ab cd"), (1L, "xyz"), (63L, "hello world"))
      .toDF("doc_id", "text")
    val stats = Multimodal.pixelStats(Multimodal.syntheticPixelTable(docs))
      .collect().map(s => s.media_id -> s).toMap
    Seq((0L, "ab cd"), (1L, "xyz"), (63L, "hello world")).foreach { case (id, text) =>
      val st = stats(id)
      val (w, h, ch) = (math.floorMod(id, 64) + 8, math.floorMod(id, 48) + 8,
        if (id % 2 == 0) 3L else 4L)
      assert((st.width, st.height, st.channels) === (w, h, ch), s"id=$id dims")
      // closed form: cycled text bytes over n positions
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val n = (w * h * ch).toInt
      val expect = (n / bytes.length).toLong * bytes.sum +
        bytes.take(n % bytes.length).sum
      assert(st.pix_sum === expect, s"id=$id pixel sum")
    }
    // and the payloads survive an independent re-decode (full round-trip)
    Multimodal.syntheticPixelTable(docs).collect().foreach { r =>
      assert(Multimodal.decodePng(r.payload).nonEmpty, s"media ${r.media_id}")
    }
  }

  test("PNG decode refuses what it cannot faithfully decode") {
    // header-only fixture PNGs (pngWrap appends raw text, no IDAT) → None
    val wrapped = Multimodal.pngWrap(10, 10, 2, "hello world".getBytes("UTF-8"))
    assert(Multimodal.decodePng(wrapped) === None)
    assert(Multimodal.decodeImageHeader(wrapped) === Some((10, 10, 3)),
      "header-level decode must still succeed on the same payload")
    // truncated IDAT → None
    val good = Multimodal.encodePng(4, 4, 3, new Array[Byte](48))
    assert(Multimodal.decodePng(good.take(good.length - 20) ++
      good.takeRight(12)) === None)
    // non-PNG → None
    assert(Multimodal.decodePng("not a png at all".getBytes("UTF-8")) === None)
  }

  test("encodePngWith: Up filter and any level round-trip the exact pixels") {
    val w = 7; val h = 4; val ch = 3
    val px = Array.tabulate(w * h * ch)(i => ((i * 53 + 9) % 256).toByte)
    val a = Multimodal.encodePngWith(w, h, ch, px, filterType = 0, level = 9)
    val b = Multimodal.encodePngWith(w, h, ch, px, filterType = 2, level = 1)
    // genuinely different container bytes, identical decoded pixels
    assert(!java.util.Arrays.equals(a, b))
    for (p <- Seq(a, b)) {
      val Some((dw, dh, dch, dpx)) = Multimodal.decodePng(p)
      assert((dw, dh, dch) === ((w, h, ch)))
      assert(dpx.toSeq === px.toSeq)
    }
  }

  test("rendition table deduplicates by pixel digest: every doc yields exactly 2 copies") {
    val dig = Multimodal.pixelDigest(
      Multimodal.renditionTable(Tables.documents(spark, sf).limit(40))).toDF()
    val grouped = dig.groupBy("pix_md5")
      .agg(count(lit(1)).as("n"), min("media_id").as("lo"), max("media_id").as("hi"))
      .collect()
    assert(grouped.nonEmpty)
    grouped.foreach { r =>
      assert(r.getLong(1) === 2L, "both renditions digest identically")
      assert(r.getLong(3) === r.getLong(2) + 1, "renditions are 2k and 2k+1")
    }
    // digest is the md5 of the cycled text, computable independently
    val docs = Tables.documents(spark, sf).limit(40)
      .select("doc_id", "text").collect()
    val byDoc = dig.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    docs.foreach { r =>
      val id = r.getLong(0); val text = r.getString(1)
      val bytes = text.getBytes("UTF-8")
      val w = math.floorMod(id, 64).toInt + 8
      val h = math.floorMod(id, 48).toInt + 8
      val c = if (id % 2 == 0) 3 else 4
      val buf = Array.tabulate(w * h * c)(i => bytes(i % bytes.length))
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = md.digest(buf).map(x => f"${x & 0xff}%02x").mkString
      assert(byDoc(2 * id) === expect)
      assert(byDoc(2 * id + 1) === expect)
    }
  }

  test("averageHash golden: hand-built gradient and flat images hash as computed by hand") {
    // flat image: every block mean EQUALS the global mean, strict > ⇒ all 0
    val flat = Array.fill(16 * 16)(100.toByte)
    assert(Multimodal.averageHash(16, 16, 1, flat) === "0" * 64)
    // left-dark/right-bright split at x=8: right half blocks (bx ≥ 4) are 1
    val split = Array.tabulate(16 * 16)(i => if (i % 16 < 8) 10.toByte else 200.toByte)
    val expected = (0 until 64).map(b => if (b % 8 >= 4) '1' else '0').mkString
    assert(Multimodal.averageHash(16, 16, 1, split) === expected)
    // hash is resolution-dependent data, but deterministic: same buffer twice
    val px = Array.tabulate(24 * 16 * 3)(i => ((i * 31) % 256).toByte)
    assert(Multimodal.averageHash(24, 16, 3, px) === Multimodal.averageHash(24, 16, 3, px))
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

  test("WAV codec: JDK javax.sound differential both ways, chunk-walk survives a LIST chunk") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // our stream → JDK decoder: every header field and sample must agree
    val samples = Array.tabulate(300)(i => ((i * 37 % 4001) - 2000).toShort)
    val wav = Multimodal.encodeWav(11025, samples)
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val f = ais.getFormat
    assert(f.getSampleRate === 11025.0f)
    assert(f.getChannels === 1)
    assert(f.getSampleSizeInBits === 16)
    assert(f.getEncoding === AudioFormat.Encoding.PCM_SIGNED)
    assert(!f.isBigEndian)
    val raw = ais.readAllBytes()
    assert(raw.length === samples.length * 2)
    val jdk = Array.tabulate(samples.length)(i =>
      ((raw(i * 2) & 0xff) | ((raw(i * 2 + 1) & 0xff) << 8)).toShort)
    assert(jdk.toSeq === samples.toSeq)
    // JDK-encoded stream → our decoder: independent writer, same samples
    val srcFmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(i * 2) = samples(i).toByte
      pcm(i * 2 + 1) = (samples(i) >> 8).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), srcFmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val decoded = Multimodal.decodeWav(bos.toByteArray)
    assert(decoded.isDefined, "our decoder refused a JDK-written WAV")
    val (rate, chans, got) = decoded.get
    assert(rate === 8000)
    assert(chans === 1)
    assert(got.toSeq === samples.toSeq)
    // chunk walking is load-bearing: splice a LIST chunk between fmt and
    // data (fixed-offset parsers read garbage samples here)
    val head = wav.slice(0, 36) // RIFF..fmt chunk end
    val tail = wav.slice(36, wav.length) // data chunk
    val listChunk = "LIST".getBytes ++ Array[Byte](6, 0, 0, 0) ++
      "INFOab".getBytes // 6-byte payload, even — no pad
    val spliced = head ++ listChunk ++ tail
    // fix the RIFF size field (+14 bytes)
    val riffLen = (wav.length - 8) + listChunk.length
    spliced(4) = riffLen.toByte; spliced(5) = (riffLen >>> 8).toByte
    spliced(6) = (riffLen >>> 16).toByte; spliced(7) = (riffLen >>> 24).toByte
    val walked = Multimodal.decodeWav(spliced)
    assert(walked.isDefined, "chunk walk broke on a LIST chunk")
    assert(walked.get._3.toSeq === samples.toSeq)
    // and it refuses non-PCM: flip the format tag to 3 (IEEE float)
    val bad = wav.clone(); bad(20) = 3
    assert(Multimodal.decodeWav(bad).isEmpty)
  }

  test("WAV decode: a malformed 0xFFFFFFF8 chunk length returns None, never loops or throws") {
    // Regression: an Int-truncated u32 chunk length goes negative (−8),
    // passes an Int-arithmetic bounds check (off+8−8 == off ≤ len), then
    // zero-advances the cursor (8 + (−8) + ((−8)&1) == 0) — an infinite
    // loop — or NegativeArraySizeException in the data branch. The Long
    // bounds check must reject it up front.
    val samples = Array.tabulate(100)(i => (i * 13 - 650).toShort)
    val wav = Multimodal.encodeWav(8000, samples)
    // corrupt the data-chunk length field (bytes 40..43) to 0xFFFFFFF8
    val evil = wav.clone()
    evil(40) = 0xF8.toByte; evil(41) = 0xFF.toByte
    evil(42) = 0xFF.toByte; evil(43) = 0xFF.toByte
    assert(Multimodal.decodeWav(evil).isEmpty)
    // same corruption on the fmt chunk length (bytes 16..19)
    val evil2 = wav.clone()
    evil2(16) = 0xF8.toByte; evil2(17) = 0xFF.toByte
    evil2(18) = 0xFF.toByte; evil2(19) = 0xFF.toByte
    assert(Multimodal.decodeWav(evil2).isEmpty)
    // a large-but-positive overflowing length is also refused
    val evil3 = wav.clone()
    evil3(40) = 0xFF.toByte; evil3(41) = 0xFF.toByte
    evil3(42) = 0xFF.toByte; evil3(43) = 0x7F.toByte // 0x7FFFFFFF
    assert(Multimodal.decodeWav(evil3).isEmpty)
  }

  test("cross-rate audio dedup: the real half-rate decimation reunites with the full clip, distinct content separates") {
    import spark.implicits._
    // block-per-byte texts (L = 64, so block b reads byte b): energy
    // profile low-then-high vs its mirror — distinct sign patterns
    val docs = Seq((0L, "a" * 32 + "z" * 32), (1L, "z" * 32 + "a" * 32))
      .toDF("doc_id", "text")
    val media = Multimodal.crossRateAudioTable(docs).collect()
    assert(media.length === 4)
    // the half rendition is a GENUINE decimation of the full one
    val full0 = media.find(_.media_id == 0L).get.payload
    val half0 = media.find(_.media_id == 1L).get.payload
    val (fr, _, fs) = Multimodal.decodeWav(full0).get
    val (hr, _, hs) = Multimodal.decodeWav(half0).get
    assert(fr === 8000 && hr === 4000)
    assert(fs.length === 1024 && hs.length === 512)
    assert(hs.toSeq === fs.indices.collect { case i if i % 2 == 0 => fs(i) }.toSeq)
    val fp = Multimodal.audioFingerprint(
      Multimodal.crossRateAudioTable(docs)).collect()
    val byDoc = fp.groupBy(_.media_id / 2)
    byDoc.values.foreach { arr =>
      assert(arr.length === 2)
      assert(arr.map(_.fingerprint).distinct.length === 1,
        s"rate variant changed the fingerprint: ${arr.toSeq}")
    }
    val f0 = byDoc(0L).head.fingerprint
    val f1 = byDoc(1L).head.fingerprint
    assert(f0 === "0" * 32 + "1" * 32) // 64·e_b > Σe only for the 'z' half
    assert(f1 === "1" * 32 + "0" * 32)
  }

  test("cross-fps video dedup: frame-doubling invariance is structural (run-collapse), fixture pairs reunite") {
    import spark.implicits._
    // fixture pairs: doc 0 → 2 frames, doc 4 → 3 frames; each pair must
    // share clip_sig with doubled n_frames on the odd rendition
    val docs = Seq((0L, "spark catalyst tungsten whole stage codegen"),
      (4L, "structured streaming state store watermark"))
      .toDF("doc_id", "text")
    val sigs = Multimodal.videoClipSignature(
      Multimodal.crossFpsVideoTable(docs)).collect()
    val byDoc = sigs.groupBy(_.media_id / 2)
    byDoc.foreach { case (docId, arr) =>
      assert(arr.map(_.clip_sig).distinct.length === 1,
        s"fps variant changed the signature for doc $docId")
      val base = arr.find(_.media_id % 2 == 0).get
      val dbl = arr.find(_.media_id % 2 == 1).get
      assert(dbl.n_frames === base.n_frames * 2)
    }
    assert(byDoc(0L).head.clip_sig !== byDoc(4L).head.clip_sig,
      "distinct clips collided")
    // structural invariance beyond the fixture shape: a clip that ALREADY
    // contains a run (A A B) and its frame-doubled form (A A A A B B)
    // must collapse to the same signature — run-collapse of a
    // duplicate-expanded sequence equals run-collapse of the original.
    def parityFrame(seed: Int): Array[Byte] = {
      val px = new Array[Byte](64 * 64)
      var i = 0
      while (i < px.length) {
        val j = (i / 64 / 8) * 8 + (i % 64) / 8
        px(i) = if ((j + seed) % 3 == 0) 48.toByte else 112.toByte
        i += 1
      }
      px
    }
    val jA = Jpeg.encodeGray(64, 64, parityFrame(0))
    val jB = Jpeg.encodeGray(64, 64, parityFrame(1))
    val clips = Seq(
      Multimodal.MediaRow(0L, "video", Multimodal.encodeVideo(Seq(jA, jA, jB))),
      Multimodal.MediaRow(1L, "video",
        Multimodal.encodeVideo(Seq(jA, jA, jA, jA, jB, jB))))
    val s2 = Multimodal.videoClipSignature(clips.toDS()).collect()
    assert(s2.map(_.clip_sig).distinct.length === 1,
      "run-collapse failed on a clip with a pre-existing run")
  }

  test("video container: frame roundtrip through the real JPEG codec, malformed payloads refused") {
    // three constant-cell frames with distinct patterns survive the
    // container + lossy JPEG roundtrip bit-exactly (DC-only blocks)
    val frames = (0 until 3).map { f =>
      val px = Array.tabulate(64 * 64) { i =>
        val j = (i / 64 / 8) * 8 + (i % 64) / 8
        if ((j + f) % 2 == 0) 48.toByte else 112.toByte
      }
      (px, Jpeg.encodeGray(64, 64, px))
    }
    val clip = Multimodal.encodeVideo(frames.map(_._2))
    val decoded = Multimodal.decodeVideo(clip)
    assert(decoded.isDefined && decoded.get.length === 3)
    decoded.get.zip(frames).foreach { case (fb, (px, _)) =>
      val (w, h, ch, got) = Jpeg.decode(fb).get
      assert((w, h, ch) === ((64, 64, 1)))
      assert(got.toSeq === px.toSeq)
    }
    // empty clip is valid; malformed payloads are refused, not misread
    assert(Multimodal.decodeVideo(Multimodal.encodeVideo(Seq.empty)).exists(_.isEmpty))
    val badMagic = clip.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeVideo(badMagic).isEmpty)
    assert(Multimodal.decodeVideo(clip.dropRight(1)).isEmpty, "truncated frame accepted")
    assert(Multimodal.decodeVideo(clip :+ 0.toByte).isEmpty, "trailing garbage accepted")
  }

  test("audio table: every payload is a fully-valid WAV whose decoded sums match the closed form") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val stats = Multimodal.audioStats(
      Multimodal.syntheticAudioTable(Tables.documents(spark, sf)))
      .collect()
    assert(stats.length === docs.size)
    stats.foreach { st =>
      val text = docs(st.media_id)
      val vs = text.map(c => (c.toInt - 96).toLong)
      assert(st.sample_rate === 8000L + math.floorMod(st.media_id, 8) * 1000L)
      assert(st.n_samples === text.length.toLong)
      assert(st.sum_pcm === 128L * vs.sum)
      assert(st.sumsq_pcm === 16384L * vs.map(v => v * v).sum)
    }
  }
}
