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
  * standard cheap binary-content signature. Full PIXEL decode, resample and
  * re-encode are REAL as well for the 8-bit PNG family: [[decodePng]]
  * (chunk walk + JDK zlib inflate + all five scanline filters),
  * [[resampleNearest]] (exact integer nearest-neighbor), [[encodePng]]
  * (spec-complete writer) — no codec library needed, the JDK carries zlib.
  * AUDIO is real since round 10: [[encodeWav]]/[[decodeWav]] implement the
  * RIFF/WAVE 16-bit PCM container both directions (chunk-walking parse,
  * JDK javax.sound differential in MultimodalSpec). Only
  * [[decodeImageStub]] remains a clearly-marked deterministic fallback
  * for payloads that carry no parseable media container at all (fixture
  * video rows). The Spark-side plumbing is real and
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

  /** (doc_id, text) source rows for every synthetic media builder, with
    * scale-adaptive parallelism restoration (guide §2, round-17,
    * measured): a fixture-scale documents.parquet is ONE file → ONE
    * partition, so each builder's codec work — real JPEG/PNG/WAV
    * encode+decode per row, the dominant CPU of the mm family — ran
    * serially on one core (profiled: mm_dedup_video spent 1.8 s of its
    * 2.0 s in a single-task stage). Repartition only when the source is
    * under-parallel and never beyond the session's core count: at
    * cluster scale the parquet layout already exceeds it and this is a
    * no-op. Results are unchanged — every consumer is a per-row
    * map/flatMap feeding order-independent aggregates, and every
    * declared mm query ends in a total ORDER BY (oracle-pinned). */
  private def docPairs(docs: DataFrame): Dataset[(Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id"), col("text"))
    val p = spark.sparkContext.defaultParallelism
    (if (base.rdd.getNumPartitions < p) base.repartition(p) else base)
      .as[(Long, String)]
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
    docPairs(docs).map { case (id, text) =>
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

  /** Documents → a FULLY-VALID pixel-bearing PNG table: every document
    * becomes a real [[encodePng]] image (signature, IHDR, deflated IDAT,
    * IEND — decodable by any conformant reader) whose pixel bytes are the
    * document's ASCII text CYCLED over the w·h·ch buffer. Cycling makes
    * the pixel CONTENT closed-form: Σ pixels = (N div L)·Σ text-bytes +
    * prefix-sum(N mod L) with N = w·h·ch, L = |text| — so the full decode
    * path (inflate + unfilter + pixel walk) is DuckDB-oracle-checkable
    * (`mm_pixel_stats`) even though no SQL engine can read a PNG: the
    * oracle recomputes the sums from `documents.text` alone. Dimensions
    * derive from doc_id (w = id%64+8, h = id%48+8, RGB even ids / RGBA
    * odd) — small enough that the whole sf0.1 table is ~40 MB of pixels. */
  def syntheticPixelTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val w = math.floorMod(id, 64).toInt + 8
      val h = math.floorMod(id, 48).toInt + 8
      val ch = if (id % 2 == 0) 3 else 4
      val n = w * h * ch
      val px = new Array[Byte](n)
      var i = 0
      while (i < n) { px(i) = bytes(i % bytes.length); i += 1 }
      MediaRow(id, "image", encodePng(w, h, ch, px))
    }
  }

  case class PixelStats(media_id: Long, width: Long, height: Long,
      channels: Long, pix_sum: Long)

  /** Decoded per-image pixel statistics over a [[syntheticPixelTable]]-style
    * table: REAL [[decodePng]] per payload (chunk walk → inflate →
    * unfilter), then an exact integer sum over every decoded pixel byte.
    * Partition-preserving batch map; the payload never shuffles — only the
    * 5-column stats row leaves the partition. Throws on an undecodable
    * payload rather than silently skipping: this table is pixel-bearing by
    * construction, so a decode failure is corruption, not a media type. */
  def pixelStats(media: Dataset[MediaRow]): Dataset[PixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, ch, px) = decodePng(r.payload).getOrElse(
        throw new IllegalStateException(
          s"undecodable pixel-table payload for media_id=${r.media_id}"))
      var s = 0L
      var i = 0
      while (i < px.length) { s += px(i) & 0xff; i += 1 }
      PixelStats(r.media_id, w.toLong, h.toLong, ch.toLong, s)
    })
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

  /** REAL full PNG decode (ISO/IEC 15948): chunk walk → IHDR validation →
    * IDAT concatenation → zlib inflate (java.util.zip, in the JDK) → per-
    * scanline unfiltering (all five filter types: None/Sub/Up/Average/
    * Paeth). Supports the 8-bit-depth non-interlaced truecolor/greyscale
    * family (color types 0, 2, 4, 6 — 1/3/2/4 channels); anything else
    * (16-bit, indexed, interlaced, or a non-PNG payload) returns None and
    * callers pass the row through untouched. Returns (width, height,
    * channels, pixels row-major w·h·ch bytes). */
  def decodePng(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def u32(i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length < 45 || !pngSig.indices.forall(i => u8(i) == pngSig(i))) return None
    if (!(u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')) return None
    val w = u32(16); val h = u32(20)
    // bounded dims: the inflated buffer is (w·ch+1)·h — refuse anything a
    // single executor row shouldn't hold
    if (w <= 0 || h <= 0 || w > 65536L || h > 65536L) return None
    if (u8(24) != 8 || u8(28) != 0) return None // bit depth 8, no interlace
    val ch = u8(25) match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // chunk walk from the end of IHDR (8 sig + 4 len + 4 type + 13 + 4 crc)
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33
    var ended = false
    while (!ended) {
      if (off + 8 > p.length) return None
      val len = u32(off)
      if (len < 0 || off + 8 + len + 4 > p.length) return None
      val ctype = new String(p, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (ctype == "IDAT") idat.write(p, off + 8, len.toInt)
      if (ctype == "IEND") ended = true
      off += 8 + len.toInt + 4
    }
    if (idat.size() == 0) return None
    val stride = (w * ch).toInt
    val raw = new Array[Byte]((stride + 1) * h.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter (spec §9): recon bytes per scanline, a = left, b = up, c = up-left
    val out = new Array[Byte](stride * h.toInt)
    val bpp = ch
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pv = a + b - c
      val pa = math.abs(pv - a); val pb = math.abs(pv - b); val pc = math.abs(pv - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < h.toInt) {
      val ft = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(rowIn + i) & 0xff
        val a = if (i >= bpp) out(rowOut + i - bpp) & 0xff else 0
        val b = if (y > 0) out(rowOut - stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) out(rowOut - stride + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 => x + paeth(a, b, c)
          case _ => return None
        }
        out(rowOut + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some((w.toInt, h.toInt, ch, out))
  }

  /** REAL full PNG encode: signature + IHDR + one zlib-deflated IDAT
    * (filter type 0 on every scanline — deterministic: Deflater with a
    * fixed level, no timestamps) + IEND, all CRCs per the spec. The exact
    * inverse of [[decodePng]] (round-trip spec-pinned). */
  def encodePng(width: Int, height: Int, channels: Int, pixels: Array[Byte]): Array[Byte] =
    encodePngWith(width, height, channels, pixels,
      filterType = 0, level = java.util.zip.Deflater.DEFAULT_COMPRESSION)

  /** [[encodePng]] with an explicit per-scanline filter type (0 = None,
    * 2 = Up — the two that need no bytes-per-pixel bookkeeping) and an
    * explicit deflate level. Two calls with different (filterType, level)
    * produce DIFFERENT container bytes for the SAME pixels — exactly the
    * "one image, many encodings" situation a content-dedup pipeline must
    * see through ([[pixelDigest]] / `mm_dedup_pixels`). */
  def encodePngWith(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterType: Int, level: Int): Array[Byte] = {
    require(width > 0 && height > 0, "png dims must be positive")
    require(filterType == 0 || filterType == 2, s"unsupported filter type $filterType")
    val colorType = channels match {
      case 1 => 0; case 3 => 2; case 2 => 4; case 4 => 6
      case n => throw new IllegalArgumentException(s"unsupported channel count $n")
    }
    require(pixels.length == width * height * channels, "pixel buffer size mismatch")
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val off = y * (stride + 1)
      raw(off) = filterType.toByte
      if (filterType == 0) {
        System.arraycopy(pixels, y * stride, raw, off + 1, stride)
      } else {
        // Up filter (spec §9.2): raw = pixel − pixel-above, mod 256
        var i = 0
        while (i < stride) {
          val up = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
          raw(off + 1 + i) = (((pixels(y * stride + i) & 0xff) - up) & 0xff).toByte
          i += 1
        }
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(level)
    val zipped = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(zipped, deflater)
    dos.write(raw); dos.close(); deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length.toLong))
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(width.toLong)); ihdr.write(be32(height.toLong))
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Exact nearest-neighbor resample: out(x, y) = in(⌊x·srcW/outW⌋,
    * ⌊y·srcH/outH⌋) per channel — all-integer index arithmetic, so the
    * result is bit-deterministic on any engine/partitioning. */
  def resampleNearest(w: Int, h: Int, ch: Int, pixels: Array[Byte],
      outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH * ch)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sx = x * w / outW
        var c = 0
        while (c < ch) {
          out((y * outW + x) * ch + c) = pixels((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL pixel resize over decodable PNGs: decode → aspect-preserving
    * integer fit inside (maxW, maxH) → nearest-neighbor resample →
    * re-encode. Payloads [[decodePng]] rejects (fixture header-only PNGs,
    * audio/video bytes, foreign formats) pass through UNCHANGED — resizing
    * what cannot be decoded would corrupt data. Partition-preserving
    * batch-at-a-time map, payload bytes never shuffled. */
  def resizeImages(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaRow] = {
    require(maxW > 0 && maxH > 0, "target box must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      decodePng(r.payload) match {
        case Some((w, h, ch, px)) if w > maxW || h > maxH =>
          // integer aspect fit: the tighter of the two ratios wins; ties
          // prefer the width fit (deterministic, no floating point)
          val (ow, oh) =
            if (maxW.toLong * h <= maxH.toLong * w)
              (maxW, math.max(1, (h.toLong * maxW / w).toInt))
            else (math.max(1, (w.toLong * maxH / h).toInt), maxH)
          r.copy(payload = encodePng(ow, oh, ch, resampleNearest(w, h, ch, px, ow, oh)))
        case _ => r
      }
    })
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

  case class PhashRow(media_id: Long, width: Long, height: Long,
      channels: Long, phash: String)

  /** 8×8 average hash over decoded pixels — the classic perceptual image
    * signature, in its EXACT integer form: luma of block (by, bx) is the
    * byte sum over rows [by·h/8, (by+1)·h/8) × cols [bx·w/8, (bx+1)·w/8)
    * (all channels — a channel-weighted luma would only rescale every
    * comparison identically), and bit i = 1 iff
    * blockSum · (w·h) > totalSum · blockPixels — the strict cross-
    * multiplied form of blockMean > globalMean, so the 64-bit signature is
    * bit-deterministic on any engine. Returned as a 64-char '0'/'1' string
    * (a packed i64 would overflow SIGNED BIGINT when bit 63 is set). */
  def averageHash(w: Int, h: Int, ch: Int, px: Array[Byte]): String = {
    var total = 0L
    var i = 0
    while (i < px.length) { total += px(i) & 0xff; i += 1 }
    val npix = w.toLong * h
    val sb = new java.lang.StringBuilder(64)
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var k = (y * w + x0) * ch
          val end = (y * w + x1) * ch
          while (k < end) { s += px(k) & 0xff; k += 1 }
          y += 1
        }
        val bp = (y1 - y0).toLong * (x1 - x0)
        sb.append(if (s * npix > total * bp) '1' else '0')
        bx += 1
      }
      by += 1
    }
    sb.toString
  }

  /** Per-image perceptual hash over a pixel-bearing table: REAL
    * [[decodePng]] then [[averageHash]] — partition-preserving batch map,
    * payload bytes never shuffled (only the 64-char signature leaves the
    * partition). Throws on undecodable payloads, same contract as
    * [[pixelStats]]. */
  def pixelPhash(media: Dataset[MediaRow]): Dataset[PhashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, ch, px) = decodePng(r.payload).getOrElse(
        throw new IllegalStateException(
          s"undecodable pixel-table payload for media_id=${r.media_id}"))
      PhashRow(r.media_id, w.toLong, h.toLong, ch.toLong, averageHash(w, h, ch, px))
    })
  }

  /** Documents → TWO renditions per document of the SAME pixel buffer
    * (the [[syntheticPixelTable]] cycled-text buffer and dims), encoded
    * differently: media_id 2·doc_id is filter-None at deflate level 9,
    * media_id 2·doc_id+1 is filter-Up at level 1. Container bytes differ
    * rendition-to-rendition (different filters AND different deflate
    * streams); decoded pixels are identical — the fixture for
    * content-addressed image dedup (`mm_dedup_pixels`), and the Up
    * rendition makes the decoder's unfilter path load-bearing in an
    * oracle-backed query. */
  def renditionTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).flatMap { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val w = math.floorMod(id, 64).toInt + 8
      val h = math.floorMod(id, 48).toInt + 8
      val ch = if (id % 2 == 0) 3 else 4
      val n = w * h * ch
      val px = new Array[Byte](n)
      var i = 0
      while (i < n) { px(i) = bytes(i % bytes.length); i += 1 }
      Seq(
        MediaRow(2 * id, "image", encodePngWith(w, h, ch, px, filterType = 0, level = 9)),
        MediaRow(2 * id + 1, "image", encodePngWith(w, h, ch, px, filterType = 2, level = 1)))
    }
  }

  /** Documents → cross-RESOLUTION rendition pairs of one BLOCK-STRUCTURED
    * image: an 8×8 grid of constant-value blocks (value 48 or 112 by the
    * parity of the doc's text byte j for grid cell j — printable ASCII, so
    * the oracle's string md5 ≡ byte md5), encoded at full size (w, h
    * multiples of 16) as media_id 2·doc_id and at EXACT HALF SIZE as
    * 2·doc_id+1 — the half rendition runs the REAL pipeline (decode the
    * full container → [[resampleNearest]] → re-encode), not a shortcut.
    *
    * Why block-structured, not the cycled-text pixels: the average hash
    * is a LOW-frequency signature — on [[syntheticPixelTable]]'s
    * pseudo-random text pixels a resize decorrelates the 64 block means
    * (measured: mean Hamming ≈ 30/64, i.e. chance), which is the honest
    * limit of aHash, not a bug. Real photos are low-frequency, which is
    * where aHash earns its keep; this fixture models that regime, and
    * makes the invariance EXACT: 8 | dims on both sides ⇒ every
    * half-size sample sy = 2y lands in the source pixel's own grid cell,
    * all 64 blocks have equal pixel counts, so block-mean comparisons
    * reduce to 64·B[j] > ΣB at BOTH resolutions — bit-identical hashes
    * by construction, recomputable from text alone (the mm_dedup_phash
    * oracle). */
  def crossResTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).flatMap { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bl = bytes.length
      val w = 16 * (math.floorMod(id, 4).toInt + 1)
      val h = 16 * (math.floorMod(id, 3).toInt + 1)
      val ch = if (id % 2 == 0) 3 else 4
      val px = new Array[Byte](w * h * ch)
      var i = 0
      while (i < px.length) {
        val p = i / ch
        val j = ((p / w) * 8 / h) * 8 + ((p % w) * 8 / w)
        px(i) = if ((bytes(j % bl) & 1) == 0) 48.toByte else 112.toByte
        i += 1
      }
      val full = encodePng(w, h, ch, px)
      val (dw, dh, dch, dpx) = decodePng(full).get
      val half = encodePng(dw / 2, dh / 2, dch,
        resampleNearest(dw, dh, dch, dpx, dw / 2, dh / 2))
      Seq(MediaRow(2 * id, "image", full), MediaRow(2 * id + 1, "image", half))
    }
  }

  case class PhashDigestRow(media_id: Long, width: Long, height: Long,
      channels: Long, phash: String, pix_md5: String)

  /** [[averageHash]] + MD5 content digest in ONE decode pass — the
    * near-dup + exact-dup signatures a cross-resolution image dedup needs,
    * without decoding the payload twice. Partition-preserving batch map;
    * only the two signatures leave the partition. */
  def phashDigest(media: Dataset[MediaRow]): Dataset[PhashDigestRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, ch, px) = decodePng(r.payload).getOrElse(
          throw new IllegalStateException(
            s"undecodable pixel-table payload for media_id=${r.media_id}"))
        md.reset()
        val dig = md.digest(px)
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < dig.length) {
          sb.append(Character.forDigit((dig(i) >> 4) & 0xf, 16))
          sb.append(Character.forDigit(dig(i) & 0xf, 16))
          i += 1
        }
        PhashDigestRow(r.media_id, w.toLong, h.toLong, ch.toLong,
          averageHash(w, h, ch, px), sb.toString)
      }
    }
  }

  /** Documents → cross-FORMAT rendition pairs: ONE 64×64 grayscale
    * block-structured image per document (8×8 grid of 8×8 cells — each
    * cell exactly one JPEG MCU — valued 48/112 by text-byte parity, the
    * [[crossResTable]] pattern), encoded BOTH as a real PNG
    * (media_id 2·doc_id) and as a real baseline JPEG (2·doc_id+1,
    * [[Jpeg.encodeGray]]). MCU-aligned constant cells make every JPEG
    * block DC-only, and the flat q=16 table divides the shifted DC
    * values 8·(48−128) and 8·(112−128) exactly, so the LOSSY codec is
    * bit-exact on this content: both containers decode to the SAME pixel
    * buffer, recomputable from text alone — the fixture for
    * cross-format content dedup (`mm_dedup_formats`). */
  def crossFormatTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).flatMap { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bl = bytes.length
      val px = new Array[Byte](64 * 64)
      var i = 0
      while (i < px.length) {
        val j = (i / 64 / 8) * 8 + (i % 64) / 8
        px(i) = if ((bytes(j % bl) & 1) == 0) 48.toByte else 112.toByte
        i += 1
      }
      Seq(MediaRow(2 * id, "image", encodePng(64, 64, 1, px)),
        MediaRow(2 * id + 1, "image", Jpeg.encodeGray(64, 64, px)))
    }
  }

  /** Format-dispatching pixel decode: PNG first (signature check is
    * cheap), then baseline JPEG. Returns the detected container format
    * with the decoded plane data. */
  def decodeAnyImage(p: Array[Byte]): Option[(String, (Int, Int, Int, Array[Byte]))] =
    decodePng(p).map("png" -> _).orElse(Jpeg.decode(p).map("jpeg" -> _))

  /** Pixel statistics through the REAL JPEG decoder — the [[pixelStats]]
    * contract (partition-preserving, payload never shuffles, throws on
    * undecodable) over baseline JPEG payloads. */
  def jpegStats(media: Dataset[MediaRow]): Dataset[PixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, ch, px) = Jpeg.decode(r.payload).getOrElse(
        throw new IllegalStateException(
          s"undecodable jpeg payload for media_id=${r.media_id}"))
      var s = 0L
      var i = 0
      while (i < px.length) { s += px(i) & 0xff; i += 1 }
      PixelStats(r.media_id, w.toLong, h.toLong, ch.toLong, s)
    })
  }

  case class FormatDigest(media_id: Long, format: String, width: Long,
      height: Long, channels: Long, pix_md5: String)

  /** Content digest across CONTAINER FORMATS: each payload decodes through
    * its own real codec ([[decodeAnyImage]]) and the PIXELS are md5'd —
    * one decode pass, signatures only leave the partition. */
  def formatDigest(media: Dataset[MediaRow]): Dataset[FormatDigest] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (fmt, (w, h, ch, px)) = decodeAnyImage(r.payload).getOrElse(
          throw new IllegalStateException(
            s"undecodable payload for media_id=${r.media_id}"))
        md.reset()
        val dig = md.digest(px)
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < dig.length) {
          sb.append(Character.forDigit((dig(i) >> 4) & 0xf, 16))
          sb.append(Character.forDigit(dig(i) & 0xf, 16))
          i += 1
        }
        FormatDigest(r.media_id, fmt, w.toLong, h.toLong, ch.toLong, sb.toString)
      }
    }
  }

  case class PixelDigest(media_id: Long, width: Long, height: Long,
      channels: Long, pix_md5: String)

  /** Content digest of the DECODED pixels (not the container bytes): two
    * renditions of one image — different filter strategy, different
    * compression level, byte-wise different files — digest identically,
    * which is what lets a 100 TB multimodal pipeline dedup by content
    * across re-encodes. MD5 hex (lowercase) to match SQL engines' md5(). */
  def pixelDigest(media: Dataset[MediaRow]): Dataset[PixelDigest] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, ch, px) = decodePng(r.payload).getOrElse(
          throw new IllegalStateException(
            s"undecodable pixel-table payload for media_id=${r.media_id}"))
        md.reset()
        val dig = md.digest(px)
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < dig.length) {
          sb.append(Character.forDigit((dig(i) >> 4) & 0xf, 16))
          sb.append(Character.forDigit(dig(i) & 0xf, 16))
          i += 1
        }
        PixelDigest(r.media_id, w.toLong, h.toLong, ch.toLong, sb.toString)
      }
    }
  }

  // ---- Video (length-prefixed motion-JPEG clip container) ----
  // The video modality's analogue of the PNG/WAV paths: a clip is a real
  // frame container (magic + frame count + length-prefixed baseline-JPEG
  // frames — the motion-JPEG idea reduced to its framing essence), every
  // frame decoded by the REAL Jpeg codec. Frame pixels reuse the
  // crossFormatTable 8×8 constant-cell construction (DC-only blocks →
  // bit-exact lossy roundtrip, the round-8 result) with the cell→byte map
  // ROTATED by the frame index, so Σ pixels per frame has a closed form
  // the mm_video_frame_stats oracle recomputes from documents.text.

  /** Container writer: "GVID" + u32be frame count, then per frame
    * u32be length + the frame's JPEG bytes. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
      bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
    }
    bos.write('G'); bos.write('V'); bos.write('I'); bos.write('D')
    be32(frames.length)
    frames.foreach { f => be32(f.length); bos.write(f, 0, f.length) }
    bos.toByteArray
  }

  /** Container reader: validates the magic and every frame's length
    * prefix against the payload bounds; None on anything malformed. */
  def decodeVideo(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (p.length < 8 || p(0) != 'G' || p(1) != 'V' || p(2) != 'I' || p(3) != 'D')
      return None
    def be32(i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    val n = be32(4)
    if (n < 0) return None
    val out = Seq.newBuilder[Array[Byte]]
    var off = 8
    var k = 0
    while (k < n) {
      if (off + 4 > p.length) return None
      val len = be32(off)
      if (len < 0 || off + 4 + len > p.length) return None
      out += java.util.Arrays.copyOfRange(p, off + 4, off + 4 + len)
      off += 4 + len
      k += 1
    }
    if (off != p.length) return None // trailing garbage = malformed
    Some(out.result())
  }

  /** Documents → a real motion-JPEG clip table: 2 + (doc_id mod 3) frames
    * of the 64×64 8×8-cell parity image, frame f reading text byte
    * (cell + f) mod |text| — a rotating cell pattern, so consecutive
    * frames differ and every frame's pixel sum is closed-form. */
  def syntheticVideoTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bl = bytes.length
      val nFrames = 2 + math.floorMod(id, 3).toInt
      val frames = (0 until nFrames).map { f =>
        val px = new Array[Byte](64 * 64)
        var i = 0
        while (i < px.length) {
          val j = (i / 64 / 8) * 8 + (i % 64) / 8
          px(i) = if ((bytes((j + f) % bl) & 1) == 0) 48.toByte else 112.toByte
          i += 1
        }
        Jpeg.encodeGray(64, 64, px)
      }
      MediaRow(id, "video", encodeVideo(frames))
    }
  }

  case class VideoFrameStats(media_id: Long, frame_idx: Long, width: Long,
      height: Long, pix_sum: Long)

  /** Per-frame decoded pixel statistics over a [[syntheticVideoTable]]-style
    * table: REAL [[decodeVideo]] container walk, REAL [[Jpeg.decode]] per
    * frame, exact integer pixel sum — the video twin of [[pixelStats]] /
    * [[audioStats]], same partition-preserving no-payload-shuffle shape,
    * same throw-on-corruption contract. */
  def videoFrameStats(media: Dataset[MediaRow]): Dataset[VideoFrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val frames = decodeVideo(r.payload).getOrElse(
        throw new IllegalStateException(
          s"undecodable video-table payload for media_id=${r.media_id}"))
      frames.iterator.zipWithIndex.map { case (fb, idx) =>
        val (w, h, _, px) = Jpeg.decode(fb).getOrElse(
          throw new IllegalStateException(
            s"undecodable frame $idx for media_id=${r.media_id}"))
        var s = 0L
        var i = 0
        while (i < px.length) { s += px(i) & 0xff; i += 1 }
        VideoFrameStats(r.media_id, idx.toLong, w.toLong, h.toLong, s)
      }
    })
  }

  // ---- WAV / PCM audio (RIFF container, 16-bit mono PCM) ----
  // The audio modality's analogue of the PNG path: real container both
  // directions (RIFF spec: Microsoft/IBM Multimedia Programming
  // Interface, 1991 — the format every `.wav` reader implements), sample
  // content derived from document text so the full parse is
  // DuckDB-oracle-checkable even though no SQL engine reads a WAV.

  /** Canonical 44-byte RIFF/WAVE PCM header + little-endian 16-bit mono
    * samples. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def tag(off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16) // PCM fmt chunk is 16 bytes
    le16(20, 1) // audio format 1 = linear PCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toInt
      out(44 + i * 2) = s.toByte
      out(44 + i * 2 + 1) = (s >>> 8).toByte
      i += 1
    }
    out
  }

  /** Parse a PCM WAV by WALKING the RIFF chunk list (never fixed offsets —
    * a 'LIST'/'fact' chunk between 'fmt ' and 'data', as many encoders
    * emit, must not break the parse; chunks pad to even length per the
    * spec). Returns (sampleRate, channels, samples) for 16-bit linear PCM;
    * None for anything that is not a valid PCM WAV. */
  def decodeWav(p: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1
    var chans = -1
    var ok = false
    var samples: Array[Short] = null
    while (off + 8 <= p.length && (samples == null || !ok)) {
      val ct = tag(off)
      // Chunk length stays Long through the bounds check: a malformed
      // length like 0xFFFFFFF8 truncated to Int goes NEGATIVE, passes an
      // Int-arithmetic bounds test, and then either zero-advances the
      // cursor (infinite loop) or throws NegativeArraySizeException —
      // violating the None-on-invalid contract. u32 is always in
      // [0, 2^32) as a Long, so one Long comparison rejects it.
      val clenL = u32(off + 4)
      if (off.toLong + 8L + clenL > p.length.toLong) return None
      val clen = clenL.toInt // safe: clenL <= p.length - off - 8 < 2^31
      if (ct == "fmt ") {
        val fmt = u16(off + 8)
        val bits = u16(off + 22)
        chans = u16(off + 10)
        rate = u32(off + 12).toInt
        ok = fmt == 1 && bits == 16 && chans >= 1
        if (!ok) return None
      } else if (ct == "data") {
        val n = clen / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ((p(off + 8 + i * 2) & 0xff) |
            ((p(off + 8 + i * 2 + 1) & 0xff) << 8)).toShort
          i += 1
        }
        samples = out
      }
      off += 8 + clen + (clen & 1) // chunks pad to even length
    }
    if (ok && samples != null) Some((rate, chans, samples)) else None
  }

  /** Documents → a fully-valid WAV table: one 16-bit mono PCM clip per
    * document, sample i = (text byte i − 96)·128 (lowercase text centers
    * near 0; the ×128 uses the 16-bit range), N = |text| samples, sample
    * rate 8000 + (doc_id mod 8)·1000 so the rate FIELD is load-bearing in
    * the parse. Content is a pure function of the text, so Σ samples and
    * Σ samples² have closed forms the mm_audio_stats oracle recomputes
    * from `documents.text` alone. */
  def syntheticAudioTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).map { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val samples = new Array[Short](bytes.length)
      var i = 0
      while (i < bytes.length) {
        samples(i) = (((bytes(i) & 0xff) - 96) * 128).toShort
        i += 1
      }
      MediaRow(id, "audio",
        encodeWav(8000 + math.floorMod(id, 8).toInt * 1000, samples))
    }
  }

  case class AudioStats(media_id: Long, sample_rate: Long, n_samples: Long,
      sum_pcm: Long, sumsq_pcm: Long)

  /** Decoded per-clip PCM statistics over a [[syntheticAudioTable]]-style
    * table: REAL [[decodeWav]] per payload (chunk walk → sample read),
    * then exact integer Σs and Σs² over every decoded sample — the audio
    * twin of [[pixelStats]], same partition-preserving no-payload-shuffle
    * shape, same throw-on-corruption contract. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, _, samples) = decodeWav(r.payload).getOrElse(
        throw new IllegalStateException(
          s"undecodable audio-table payload for media_id=${r.media_id}"))
      var s1 = 0L
      var s2 = 0L
      var i = 0
      while (i < samples.length) {
        val v = samples(i).toLong
        s1 += v
        s2 += v * v
        i += 1
      }
      AudioStats(r.media_id, rate.toLong, samples.length.toLong, s1, s2)
    })
  }

  /** REAL half-rate audio resample — the audio twin of [[resizeImages]]:
    * decode the container, keep every 2nd sample (even indices — plain
    * decimation, the zero-order resample), re-encode at rate/2. Output
    * length ⌈n/2⌉ keeps the final odd sample. Partition-preserving map;
    * payloads never shuffle; throws on undecodable input (the
    * [[audioStats]] contract). */
  def resampleAudioHalf(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, _, samples) = decodeWav(r.payload).getOrElse(
        throw new IllegalStateException(
          s"undecodable audio payload for media_id=${r.media_id}"))
      MediaRow(r.media_id, "audio", encodeWav(rate / 2, decimateHalf(samples)))
    })
  }

  /** Every-2nd-sample decimation (even indices, length ⌈n/2⌉ — the final
    * odd sample survives). The ONE half-rate contract, shared by
    * [[resampleAudioHalf]] and [[crossRateAudioTable]] so both paths agree
    * on odd-length clips. */
  private def decimateHalf(samples: Array[Short]): Array[Short] =
    Array.tabulate((samples.length + 1) / 2)(i => samples(2 * i))

  // ---- Audio near-dup (cross-sample-rate block-energy fingerprint) ----
  // The audio analogue of crossResTable/mm_dedup_phash: the SAME logical
  // clip stored at two sample rates must reunite under a rate-invariant
  // signature while no byte- or sample-exact dedup can pair them
  // (different sample counts, different headers).

  /** Documents → cross-RATE rendition pairs of one BLOCK-STRUCTURED clip:
    * 64 constant-amplitude blocks (block b holds value
    * (text byte ⌊b·L/64⌋ − 96)·128 — the [[syntheticAudioTable]] sample
    * map applied per block, sampling the WHOLE text), 16 samples per
    * block at 8000 Hz (media_id 2·doc_id), and a REAL half-rate rendition
    * (2·doc_id+1): decodeWav(full) → decimate by 2 (every other sample —
    * the zero-order resample) → encodeWav(4000). Same duration, half the
    * samples. Why block-structured, not per-byte samples: like aHash on
    * images, the block-energy fingerprint is a LOW-frequency signature —
    * decimating pseudo-random per-byte samples decorrelates block
    * energies, while constant blocks survive ANY within-block subsample
    * exactly, so the invariance is exact by construction and the whole
    * pipeline stays recomputable from documents.text (the mm_dedup_phash
    * recipe applied to audio). */
  def crossRateAudioTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).flatMap { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bl = bytes.length
      val samples = new Array[Short](64 * 16)
      var b = 0
      while (b < 64) {
        val v = ((((bytes((b * bl) / 64) & 0xff)) - 96) * 128).toShort
        var i = 0
        while (i < 16) { samples(b * 16 + i) = v; i += 1 }
        b += 1
      }
      val full = encodeWav(8000, samples)
      // the half-rate rendition runs the REAL pipeline (parse the
      // container back, decimate, re-encode), not a shortcut
      val (_, _, dec) = decodeWav(full).getOrElse(
        throw new IllegalStateException(s"self-encoded WAV unreadable for doc $id"))
      val half = encodeWav(4000, decimateHalf(dec))
      Seq(MediaRow(2 * id, "audio", full), MediaRow(2 * id + 1, "audio", half))
    }
  }

  case class AudioFingerprint(media_id: Long, sample_rate: Long,
      n_samples: Long, fingerprint: String)

  /** 64-block energy-sign fingerprint over REAL decoded PCM — the audio
    * [[averageHash]]: split the clip into 64 equal-duration blocks
    * (boundaries ⌊i·64/N⌋, so any N works), per-block Σs² as exact Longs,
    * bit b = blockSumsq·N > totalSumsq·blockCount — the cross-multiplied
    * mean-energy comparison, so the bit rule is integer-exact and
    * sample-RATE-invariant on block-structured content (a decimated
    * constant block keeps its mean energy exactly: both sides of the
    * comparison scale by the same count). Partition-preserving decode
    * map; only the 64-char signature leaves the partition. Overflow
    * envelope: each side of the comparison is bounded by N²·2²⁴ at
    * full-scale 16-bit PCM (block sums hold ≤ N/64 samples of v² ≤ 2³⁰),
    * which stays under 2⁶³ for clips up to ~740k samples — and far
    * beyond that at fixture amplitudes (|v| ≤ 8192 ⇒ v² ≤ 2²⁶, ~8.4M
    * samples). A deployment ingesting longer full-scale clips would
    * compare mean energies via Math.multiplyHigh or BigInt. */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioFingerprint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, _, samples) = decodeWav(r.payload).getOrElse(
        throw new IllegalStateException(
          s"undecodable audio payload for media_id=${r.media_id}"))
      val n = samples.length
      val sq = new Array[Long](64)
      val cnt = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < n) {
        val v = samples(i).toLong
        val e = v * v
        val bi = (i.toLong * 64 / n).toInt
        sq(bi) += e
        cnt(bi) += 1
        total += e
        i += 1
      }
      val sb = new java.lang.StringBuilder(64)
      var b = 0
      while (b < 64) {
        sb.append(if (sq(b) * n > total * cnt(b)) '1' else '0')
        b += 1
      }
      AudioFingerprint(r.media_id, rate.toLong, n.toLong, sb.toString)
    })
  }

  // ---- Video near-dup (frame-rate-invariant collapsed signature) ----

  /** Documents → cross-FRAME-RATE rendition pairs of one clip: the base
    * [[syntheticVideoTable]] clip (2 + doc_id mod 3 rotating-pattern
    * 64×64 JPEG frames, media_id 2·doc_id) and a REAL 2× frame-rate
    * upsample (2·doc_id+1): decodeVideo(base) → every frame repeated
    * twice → encodeVideo — the frame-duplication variant a clip acquires
    * when re-encoded at a higher frame rate. Different frame counts,
    * different payload bytes, same content. */
  def crossFpsVideoTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docPairs(docs).flatMap { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bl = bytes.length
      val nFrames = 2 + math.floorMod(id, 3).toInt
      val frames = (0 until nFrames).map { f =>
        val px = new Array[Byte](64 * 64)
        var i = 0
        while (i < px.length) {
          val j = (i / 64 / 8) * 8 + (i % 64) / 8
          px(i) = if ((bytes((j + f) % bl) & 1) == 0) 48.toByte else 112.toByte
          i += 1
        }
        Jpeg.encodeGray(64, 64, px)
      }
      val base = encodeVideo(frames)
      // the doubled rendition runs the REAL pipeline: container walk back
      // out, duplicate each frame, re-containerize
      val doubled = encodeVideo(decodeVideo(base).getOrElse(
        throw new IllegalStateException(s"self-encoded clip unreadable for doc $id"))
        .flatMap(fb => Seq(fb, fb)))
      Seq(MediaRow(2 * id, "video", base), MediaRow(2 * id + 1, "video", doubled))
    }
  }

  case class VideoSignature(media_id: Long, n_frames: Long, clip_sig: String)

  /** Frame-rate-invariant clip signature over the REAL container walk:
    * every frame decodes through the real [[Jpeg]] codec and reduces to
    * its 64 cell bits (8×8 cell means thresholded at 80 — exact on the
    * DC-only fixture where cells decode to 48/112 bit-exactly), then
    * CONSECUTIVE identical frame signatures collapse to one (run-length
    * dedup) and the clip signature is the md5 of the collapsed sequence
    * joined by '|'. Run-collapse of a duplicate-expanded sequence equals
    * run-collapse of the original, so a clip and its frame-doubled
    * re-encode share the signature for ANY content — the invariance is
    * structural, not a fixture artifact. One decode pass per payload;
    * only (n_frames, 32-char md5) leaves the partition. */
  def videoClipSignature(media: Dataset[MediaRow]): Dataset[VideoSignature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val frames = decodeVideo(r.payload).getOrElse(
          throw new IllegalStateException(
            s"undecodable video payload for media_id=${r.media_id}"))
        val sigs = frames.map { fb =>
          val (w, h, _, px) = Jpeg.decode(fb).getOrElse(
            throw new IllegalStateException(
              s"undecodable frame for media_id=${r.media_id}"))
          val sb = new java.lang.StringBuilder(64)
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              var sum = 0L
              var npx = 0L
              var y = cy * h / 8
              val y1 = (cy + 1) * h / 8
              while (y < y1) {
                var x = cx * w / 8
                val x1 = (cx + 1) * w / 8
                while (x < x1) { sum += px(y * w + x) & 0xff; npx += 1; x += 1 }
                y += 1
              }
              sb.append(if (sum > 80L * npx) '1' else '0')
              cx += 1
            }
            cy += 1
          }
          sb.toString
        }
        val collapsed = scala.collection.mutable.ArrayBuffer.empty[String]
        sigs.foreach { s =>
          if (collapsed.isEmpty || collapsed.last != s) collapsed += s
        }
        md.reset()
        val dig = md.digest(collapsed.mkString("|")
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val hex = new java.lang.StringBuilder(32)
        var i = 0
        while (i < dig.length) {
          hex.append(Character.forDigit((dig(i) >> 4) & 0xf, 16))
          hex.append(Character.forDigit(dig(i) & 0xf, 16))
          i += 1
        }
        VideoSignature(r.media_id, frames.length.toLong, hex.toString)
      }
    }
  }
}
