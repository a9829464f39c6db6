package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities (SURVEY.md §4, 100 TB design notes): skew-salted joins
  * and bucketed-table co-located joins. These are the patterns the per-
  * operator Scaladocs reference; they live as library code so callers (and
  * tests) exercise the real mechanics, not prose.
  */
object Scale {

  /** Skew-salted equi-join: replicate each build-side row `salt` times and
    * scatter probe-side rows uniformly across the replicas, so one hot key
    * spreads over `salt` reducers instead of melting a single task.
    *
    * Use when AQE's skew-join split can't help (e.g. the skew is in a
    * stream-stream or stateful op, or statistics hide the hot key).
    * The join result is identical to `probe.join(build, keys)`.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    // Salt from row CONTENT, not monotonically_increasing_id(): a task retry
    // renumbers ids, which would scatter the retried partition's rows across
    // different salts than the first attempt (correct results, but join-side
    // row placement — and any downstream file layout — becomes retry-
    // unstable). xxhash64 over all probe columns is deterministic per row.
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(probe(_)): _*), lit(salt)).cast("int"))
    val saltedBuild = build.withColumn("_salt",
      explode(expr(s"sequence(0, ${salt - 1})")))
    saltedProbe.join(saltedBuild,
        saltedProbe(key) === saltedBuild(key) &&
          saltedProbe("_salt") === saltedBuild("_salt"))
      .drop(saltedBuild(key)).drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * exchange-free (bucket-local sort-merge). Spark's bucketed tables need
    * the table catalog — saveAsTable, not a bare parquet path. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Repartition by a time-derived key before a partitioned write so each
    * output partition receives a bounded number of files (the classic
    * small-files fix for dt=/hr= layouts). */
  def coalescePartitionedWrite(df: DataFrame, partitionCols: Seq[Column],
      filesPerPartition: Int = 1): DataFrame =
    // Content-derived sub-key (same retry-stability argument as saltedJoin):
    // identical input rows always land in the same output file.
    df.repartition(partitionCols :+
      (pmod(xxhash64(df.columns.map(df(_)): _*), lit(filesPerPartition))): _*)
}
