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

  /** Fact ⋈ fact banded range join: pairs where
    * `left.x ∈ (right.y − width, right.y)` — without a BNLJ between two
    * large sides. The right row keeps its single bucket floor(y/w); the left
    * row replicates into the only two buckets its band can overlap
    * (floor(x/w) and floor(x/w)+1 — since x < y < x+w implies
    * floor(y/w) ∈ {floor(x/w), floor(x/w)+1}). The pair-up becomes an
    * equi-join on the bucket key plus the residual strict range filter, and
    * each qualifying pair matches exactly once (the right side's bucket is
    * unique), so no dedup pass is needed. Replication factor is a constant
    * 2× of the left side — at 100 TB this is one hash shuffle on the bucket
    * key, the standard interval/band decomposition.
    *
    * Column names must be disjoint between the two sides. */
  def bandedRangeJoin(left: DataFrame, right: DataFrame,
      leftCol: String, rightCol: String, width: Double): DataFrame = {
    val lb = left.withColumn("_bucket",
      explode(array(floor(col(leftCol) / width).cast("long"),
        floor(col(leftCol) / width).cast("long") + 1L)))
    val rb = right.withColumn("_bucket", floor(col(rightCol) / width).cast("long"))
    lb.join(rb,
        lb("_bucket") === rb("_bucket") &&
          lb(leftCol) > rb(rightCol) - width && lb(leftCol) < rb(rightCol))
      .drop("_bucket")
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
