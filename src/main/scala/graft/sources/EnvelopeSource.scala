package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source seam for the envelope stream (SURVEY.md §2.I).
  *
  * The production deployment reads a Kinesis Data Stream via a connector
  * (e.g. spark-sql-kinesis) — not shippable in this zero-egress image, so
  * the seam keeps the contract: any implementation yields a streaming
  * DataFrame with a single `value: BinaryType` column holding one gzip JSON
  * envelope per row. Everything downstream (decode → parse → sink) is
  * connector-agnostic.
  */
trait EnvelopeSource {
  /** A (possibly streaming) DataFrame with column `value: BinaryType`. */
  def load(spark: SparkSession): DataFrame
}

/** Kinesis connector configuration — resolved reflectively at runtime so the
  * library compiles without the connector jar; fails fast with a clear
  * message when the format is absent. */
final class KinesisEnvelopeSource(streamName: String, region: String,
    format: String = "aws-kinesis") extends EnvelopeSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream
      .format(format)
      .option("streamName", streamName)
      .option("region", region)
      .load()
      .selectExpr("CAST(data AS BINARY) AS value")
}

/** File-based envelope source: each binary file is one envelope payload —
  * used for replay/backfill and as the test stand-in with identical bytes. */
final class BinaryFileEnvelopeSource(path: String) extends EnvelopeSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.format("binaryFile").load(path)
      .selectExpr("content AS value")
}
