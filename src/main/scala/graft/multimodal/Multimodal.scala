package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support (builder-prompt mandate): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature-extract
  * / resize / frame-sample operators.
  *
  * The actual codecs (JPEG/PNG/WAV decode) are NOT available in this image —
  * every `*Stub` below is a clearly-marked deterministic fake derived from
  * the payload bytes. The Spark-side plumbing is real and is the part that
  * matters at scale: binary columns ride Parquet as-is, the decode step runs
  * as `mapPartitions` over the typed Dataset (batch-at-a-time, no per-row
  * driver involvement, partitioning preserved — the Scala analogue of a
  * Pandas-batch UDF), and downstream metadata is ordinary columnar data.
  *
  * Scale notes (100 TB): payloads dominate byte volume, so operators must
  * never shuffle payload bytes — metadata extraction projects the payload
  * away before any wide transform, and frame sampling explodes bounded
  * slices, not full payloads. All stubs are pure functions of the bytes —
  * idempotent re-runs, safe speculative execution.
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

  /** STUB — stands in for a real image decode (no codec libs in this image).
    * Deterministic fake: dimensions derived from payload bytes. A production
    * build replaces ONLY this function body with e.g. javax.imageio. */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = fnv1a(payload)
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >>> 20, 768).toInt
    val ch = if (math.floorMod(h >>> 40, 4) == 0L) 1 else 3
    (w, ht, ch)
  }

  /** STUB — stands in for a real feature extractor (e.g. a vision model).
    * Deterministic 8-d fake derived from byte statistics. */
  def extractFeatureStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(payload.length / 8, 1)
    out.map(_ / n)
  }

  /** Documents → synthetic media table: the text bytes ARE the payload
    * (UTF-8), so fixtures exercise real binary-column plumbing without
    * external media files. */
  def syntheticMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Decode step: batch-at-a-time over partitions — the Scala analogue of
    * mapInPandas. No shuffle: partitioning of the input is preserved. */
  def extractImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = decodeImageStub(r.payload)
        ImageMeta(r.media_id, w, h, c, r.payload.length.toLong, fnv1a(r.payload))
      }
    }
  }

  /** Feature extraction as a partition-batch transform. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => Feature(r.media_id, extractFeatureStub(r.payload))))
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
