package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampNTZType}

/** Central table loader for the driver-generated parquet fixtures.
  *
  * Every declared query loads via this object, never a bare
  * `spark.read.parquet`, because two fixture quirks must be handled
  * uniformly (see FIXTURES.md §3):
  *
  *  - `events.ts` has shipped as BOTH parquet timestamp[ns] (rounds ≤5)
  *    and timestamp[us] (round-6 fixture refresh) — the loader handles
  *    either. ns: Spark 4.1.2 refuses the read unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces the
  *    column as epoch-nanos LongType; we convert to a microsecond
  *    timestamp (`ts div 1000`, exact integer division). µs: the read is
  *    native. Both paths end cast to TIMESTAMP_NTZ so the column compares
  *    bit-for-bit with DuckDB's native µs read of the same file.
  *  - `o_orderdate` / `l_shipdate` arrive as TIMESTAMP_NTZ already and are
  *    left untouched.
  *
  * At 100 TB these reads parallelize by parquet row-group; no driver-side
  * work happens here — the ns→µs conversion is a codegen'd projection.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Runtime SQL conf: settable per-session even though the harness
      // builds its own SparkSession.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      val tsCol = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // ns fixture, read as epoch-nanos
          expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType)
        case TimestampNTZType => // µs NTZ fixture (round-6 refresh): no-op cast
          col("ts")
        case _ =>
          // µs LTZ fixture (isAdjustedToUTC=true). LTZ→NTZ cast reads the
          // session timezone; every entry point (SmokeEntry/Verify/Bench/
          // specs) pins spark.sql.session.timeZone=UTC, under which the
          // cast is the identity on the stored micros — matching DuckDB's
          // timezone-free read of the same file.
          col("ts").cast(TimestampNTZType)
      }
      raw.withColumn("ts", tsCol)
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")

  /** Exact, order-independent money/quantity aggregation: decimal addition is
    * exact, so Spark's and DuckDB's different partial-aggregation orders give
    * bit-identical sums (SURVEY.md §5.3).
    *
    * Arithmetic on money columns must happen IN decimal, not on doubles with
    * a final cast: Spark converts double→decimal via the shortest string
    * representation while DuckDB converts the exact binary value, so per-row
    * roundings of compound double products disagree at the last digit
    * (observed on sum_charge at sf0.01). The fixture money columns are exact
    * 2-dp values, so a per-column DECIMAL(12,2)/(4,2) cast is lossless and
    * identical in both engines; all downstream products/sums are then exact.
    */
  val Money: DecimalType = DecimalType(38, 4)
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(Money)).cast(Money)
  /** `dsum` projected to DOUBLE for declared-query output.
    *
    * The driver's comparator reads Spark output with pandas (decimal →
    * object) and the oracle with duckdb .df() (decimal → float64), so a
    * decimal OUTPUT column can never hash-match even when values are
    * equal. The aggregation itself stays exact decimal —
    * order-independent across partial-agg schedules — and only the final
    * projection casts to double. Both engines convert the same exact decimal
    * to the same nearest-double, so the cast is cross-engine deterministic.
    * Oracle twin: CAST(sum(CAST(x AS DECIMAL(38,4))) AS DOUBLE).
    *
    * SCALE BOUND: cross-engine determinism requires the UNSCALED sum
    * (value × 10^4) to stay below 2^53. Beyond that DuckDB's
    * HUGEINT→double-then-/10^4 path double-rounds while BigDecimal
    * .doubleValue rounds once, and the doubles can differ in the last ulp.
    * 2^53/10^4 ≈ 9×10^11 in money units — far above any fixture SF, but a
    * real 100 TB global sum of large prices could cross it; split such sums
    * by group or fall back to the decimal-output [[dsum]], which stays exact
    * at any magnitude (TablesSpec pins the bound with a 2^53+3 witness). */
  def dsumD(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(Money)).cast("double")
  /** Lossless decimal view of a 2-dp money column (prices < 1e10). */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(12, 2))
  /** Lossless decimal view of a 2-dp rate column (discount/tax, < 100). */
  def rate2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(4, 2))
  /** Exact decimal literal 1.00 for (1 - discount)-style factors. */
  val oneD: org.apache.spark.sql.Column =
    lit(new java.math.BigDecimal("1.00"))
}
