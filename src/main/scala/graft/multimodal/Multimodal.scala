package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support (builder-prompt mandate): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature-extract
  * / resize / frame-sample operators.
  *
  * Image METADATA decode is REAL: [[decodeImageHeader]] parses PNG IHDR and
  * JPEG SOFn headers from the public format specs, pure JVM, no codec libs
  * (see its scaladoc). Feature extraction is REAL too —
  * [[extractByteHistogram]] is an exact 16-bin byte-value histogram, the
  * standard cheap binary-content signature. Only full pixel decode and
  * resize remain clearly-marked deterministic `*Stub` fakes — those need
  * codec libraries this zero-egress image cannot carry; a production build
  * replaces only those function bodies. The Spark-side plumbing is real and
  * is the part that matters at scale: binary columns ride Parquet as-is,
  * the decode step runs as `mapPartitions` over the typed Dataset
  * (batch-at-a-time, no per-row driver involvement, partitioning preserved —
  * the Scala analogue of a Pandas-batch UDF), and downstream metadata is
  * ordinary columnar data.
  *
  * Scale notes (100 TB): payloads dominate byte volume, so operators must
  * never shuffle payload bytes — metadata extraction projects the payload
  * away before any wide transform, and frame sampling explodes bounded
  * slices, not full payloads. All decode paths are pure functions of the
  * bytes — idempotent re-runs, safe speculative execution.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])
  case class ImageMeta(media_id: Long, width: Int, height: Int, channels: Int,
      n_bytes: Long, checksum: Long)
  case class Feature(media_id: Long, feature: Array[Float])

  /** Deterministic payload checksum (FNV-1a 64). */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    h
  }

  /** REAL image metadata decode — (width, height, channels) parsed from the
    * container header, pure JVM, public specs only:
    *
    *  - PNG (ISO/IEC 15948 / RFC 2083): 8-byte signature, then IHDR must be
    *    the first chunk — 4-byte length, "IHDR", width u32 BE, height u32
    *    BE, bit depth u8, color type u8. Channels from color type:
    *    0 greyscale→1, 2 truecolor→3, 3 indexed→1, 4 grey+alpha→2,
    *    6 truecolor+alpha→4.
    *  - JPEG (ITU-T T.81 §B): SOI (FF D8), then marker segments, each
    *    FF <marker> <len u16 incl. itself>; the frame header SOFn
    *    (C0–CF minus C4 DHT / C8 JPG / CC DAC) carries precision u8,
    *    height u16 BE, width u16 BE, component count u8.
    *
    * Returns None for anything that is neither (callers fall back to
    * [[decodeImageStub]] for fixture payloads that carry no real header). */
  def decodeImageHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length >= 26 && pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      // IHDR is mandatory-first; anything else is a corrupt PNG → None
      if (!(u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R'))
        return None
      val w = u32(16); val h = u32(20)
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some((w.toInt, h.toInt, channels))
      else None
    } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < p.length) {
        if (u8(i) != 0xff) return None // lost marker alignment: corrupt
        var j = i
        while (j + 1 < p.length && u8(j + 1) == 0xff) j += 1 // fill bytes
        val m = u8(j + 1)
        if (m >= 0xd0 && m <= 0xd7) i = j + 2 // RSTn: standalone
        else if (m == 0xd9) return None // EOI before any SOF
        else {
          if (j + 3 >= p.length) return None
          val len = u16(j + 2)
          if (len < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (j + 9 >= p.length) return None
            val h = u16(j + 5); val w = u16(j + 7); val ch = u8(j + 9)
            return if (w > 0 && h > 0 && ch > 0) Some((w, h, ch)) else None
          }
          i = j + 2 + len
        }
      }
      None
    } else None
  }

  /** STUB — the fallback for payloads with no parseable image header
    * (fixture audio/video rows). Deterministic fake: dimensions derived
    * from payload bytes. A production build replaces ONLY this body (full
    * pixel decode needs codec libs this image cannot carry); real headers
    * never reach it — [[decodeImageHeader]] wins first. */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = fnv1a(payload)
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >>> 20, 768).toInt
    val ch = if (math.floorMod(h >>> 40, 4) == 0L) 1 else 3
    (w, ht, ch)
  }

  /** Minimal REAL PNG container: signature + IHDR (bit depth 8, real CRC32
    * over type+data per the spec) + `data` appended as opaque trailing
    * bytes. Enough container for any header-level tool — and
    * [[decodeImageHeader]] round-trips it — while the payload stays
    * inspectable fixture bytes. Header overhead: 33 bytes exactly
    * (8 signature + 25 IHDR), which the mm_* oracles account for. */
  def pngWrap(width: Int, height: Int, colorType: Int, data: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "png dims must be positive")
    val out = new java.io.ByteArrayOutputStream(33 + data.length)
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](17) // "IHDR" + 13 data bytes
    ihdr(0) = 'I'; ihdr(1) = 'H'; ihdr(2) = 'D'; ihdr(3) = 'R'
    def be32(a: Array[Byte], off: Int, v: Long): Unit = {
      a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
      a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
    }
    be32(ihdr, 4, width.toLong); be32(ihdr, 8, height.toLong)
    ihdr(12) = 8 // bit depth
    ihdr(13) = colorType.toByte
    ihdr(14) = 0; ihdr(15) = 0; ihdr(16) = 0 // deflate, adaptive, no interlace
    val lenAndCrc = new Array[Byte](4)
    be32(lenAndCrc, 0, 13L); out.write(lenAndCrc)
    out.write(ihdr)
    val crc = new java.util.zip.CRC32(); crc.update(ihdr)
    be32(lenAndCrc, 0, crc.getValue); out.write(lenAndCrc)
    out.write(data)
    out.toByteArray
  }

  /** REAL content feature — a 16-bin L1-normalized byte-value histogram
    * of the payload: the classic cheap binary-content signature (used for
    * payload grouping and near-duplicate detection), computable without
    * any codec or model, exact and deterministic at any scale. A
    * production vision/audio embedding would REPLACE this body with a
    * model call behind the same `Dataset[Feature]` seam — the Spark-side
    * plumbing (partition-preserving map, fixed-width vector schema) is
    * what the pipeline contracts on. */
  def extractByteHistogram(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      out((payload(i) & 0xff) >>> 4) += 1.0f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < 16) { out(j) /= payload.length.toFloat; j += 1 }
    }
    out
  }

  /** Documents → synthetic media table: "image" rows are REAL minimal PNGs
    * ([[pngWrap]] — parseable by any header-level tool) whose dimensions
    * derive from doc_id by a SQL-expressible formula, so the decode path is
    * DuckDB-oracle-checkable (mm_image_meta); audio/video rows carry the
    * raw UTF-8 text bytes. Either way fixtures exercise real binary-column
    * plumbing without external media files. */
  def syntheticMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      math.floorMod(id, 3) match {
        case 0 =>
          // dims/color mirrored by the mm_image_meta oracle SQL: width
          // doc_id%1024+16, height doc_id%768+16, RGB for even ids else RGBA
          val colorType = if (id % 2 == 0) 2 else 6
          MediaRow(id, "image", pngWrap(math.floorMod(id, 1024).toInt + 16,
            math.floorMod(id, 768).toInt + 16, colorType, bytes))
        case 1 => MediaRow(id, "audio", bytes)
        case _ => MediaRow(id, "video", bytes)
      }
    }
  }

  /** Decode step: batch-at-a-time over partitions — the Scala analogue of
    * mapInPandas. No shuffle: partitioning of the input is preserved.
    * Header-bearing payloads (PNG/JPEG) decode REAL dimensions; anything
    * else falls back to the deterministic stub. */
  def extractImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = decodeImageHeader(r.payload).getOrElse(decodeImageStub(r.payload))
        ImageMeta(r.media_id, w, h, c, r.payload.length.toLong, fnv1a(r.payload))
      }
    }
  }

  /** Feature extraction as a partition-batch transform. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => Feature(r.media_id, extractByteHistogram(r.payload))))
  }

  /** "Resize": STUB for a pixel-resample — here a deterministic payload
    * truncation preserving the checksum-derived header semantics. */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r =>
      if (r.payload.length <= maxBytes) r
      else r.copy(payload = r.payload.take(maxBytes))))
  }

  /** Frame sampling: treat the payload as fixed-size frames, emit every
    * n-th frame as a bounded slice — explodes bounded chunks, never the
    * whole payload per row. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int"))
      // greatest(..., 1) guard: sequence(0, -1) in Spark is the DESCENDING
      // sequence [0, -1], not empty, so an empty payload (n_frames = 0)
      // would emit a phantom frame 0; the residual i < n_frames predicate
      // makes the empty case genuinely empty.
      .withColumn("frame_idx",
        explode(expr(s"filter(sequence(0, greatest(n_frames, 1) - 1)," +
          s" i -> i % $everyN = 0 AND i < n_frames)")))
      .select(col("media_id"), col("media_type"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))
}
