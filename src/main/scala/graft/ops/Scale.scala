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
    * DECISION RULE: for a plain batch equi-join, prefer AQE — its
    * OptimizeSkewedJoin sees the hot partition in runtime shuffle stats and
    * splits it with no query change (ScaleSpec "AQE alone splits a skewed
    * shuffle join" demonstrates this on a 95%-hot-key fixture). Reach for
    * saltedJoin only where AQE can't help: stream-stream or stateful ops
    * (no AQE re-plan), or skew the map stats can't see. The join result is
    * identical to `probe.join(build, keys)` either way.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    // Salt from the row ID, not row content: content-derived salts collapse
    // byte-identical probe rows onto ONE salt — precisely the hot-duplicate
    // case salting exists for. Task-retry id renumbering only moves rows
    // between salt replicas, which is unobservable in a join result (a
    // multiset with no placement guarantees), so retry stability is not a
    // concern here — unlike coalescePartitionedWrite below, where layout IS
    // the output and the salt is content-derived for that reason.
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
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
    * equi-join on the bucket key plus the residual strict range filter
    * (evaluated on the RAW values — exact), and each qualifying pair
    * matches exactly once (the right side's bucket is unique), so no dedup
    * pass is needed. Replication factor is a constant 2× of the left side —
    * at 100 TB this is one hash shuffle on the bucket key, the standard
    * interval/band decomposition.
    *
    * PRECONDITION for the two-bucket cover: the quantization error of
    * v/width must stay well below one bucket, i.e. |v|/width ≲ 2⁵⁰ —
    * true for any decimal-scaled key (prices, epochs, 2-dp balances). For
    * |v|/width approaching 2⁵³ the floor can be off by a whole bucket and
    * boundary pairs could miss; rescale the key or widen the replication
    * before using raw astronomical doubles.
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

  /** Quantize a numeric column onto [0, 2^bits) for [[zOrderKey]]:
    * rank-free linear bucketing against a known [lo, hi] domain (domain
    * bounds are metadata a 100 TB pipeline already tracks; an unknown
    * domain would need a quantile pass). Values are clamped, so out-of-
    * range stragglers cluster at the edges instead of corrupting the
    * interleave. */
  def zQuantize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(hi > lo, s"zQuantize domain must be non-degenerate: [$lo, $hi]")
    val buckets = (1L << bits) - 1
    least(lit(buckets), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * buckets).cast("long")))
  }

  /** Morton (Z-order) interleave of already-quantized [0, 2^bits) columns:
    * bit b of column i lands at output position b·n + i. Range-partitioning
    * and sorting a table by this ONE key clusters rows that are close in
    * EVERY dimension into the same output files, so a selective predicate
    * on ANY single dimension (or a box on several) prunes to the few files
    * whose z-range intersects it — where a lexicographic (row-major) sort
    * serves only its leading column and a predicate on a trailing column
    * touches every file. This is the layout primitive behind
    * OPTIMIZE-ZORDER-style table maintenance; pair with
    * [[coalescePartitionedWrite]] for the write itself. The interleave is
    * a flat bitwiseOR tree of shiftlefts — pure codegen, no UDF.
    * ScaleSpec measures the file-pruning asymmetry on a 2-d layout. */
  def zOrderKey(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"z-key of ${cols.size} cols x $bits bits must fit a signed long")
    val n = cols.size
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map(b => shiftleft(c.bitwiseAND(lit(1L << b)), b * (n - 1) + i))
    }.reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve index of two already-quantized [0, 2^bits) columns —
    * the locality-superior alternative to [[zOrderKey]]: consecutive key
    * values are ALWAYS adjacent cells (Manhattan distance 1), so a range
    * of the key covers a compact blob with no Z-shaped jumps, which tightens
    * file min/max ranges and prunes better on box predicates (the reason
    * OPTIMIZE implementations offer Hilbert next to Z-order).
    *
    * The classic xy2d walk, unrolled: `bits` steps from the top bit down,
    * each extracting the quadrant (rx, ry), accumulating the area digit
    * s²·((3·rx) xor ry), and rotating/reflecting the frame for the next
    * level. Appended as one NARROW PROJECTION PER STEP (x, y rewritten, d
    * accumulated) rather than a single Column: each step reads the previous
    * x and y twice, and separate projections keep the plan linear in
    * `bits` — Catalyst's CollapseProject declines to inline non-cheap
    * duplicated expressions, where one inlined tree would grow ~3^bits
    * nodes. Pure bitwise/CASE codegen, no UDF. */
  def hilbertKey(df: DataFrame, bits: Int, xCol: String, yCol: String,
      out: String): DataFrame = {
    require(2 * bits <= 62, s"hilbert key of 2 x $bits bits must fit a long")
    var cur = df.withColumn("_hx", col(xCol).cast("long"))
      .withColumn("_hy", col(yCol).cast("long"))
      .withColumn(out, lit(0L))
    // The reflection complements against the FULL grid (N−1−v, N = 2^bits),
    // not s−1: x/y keep their already-consumed high bits, and N−1−v
    // complements every bit at once — only the not-yet-consumed low bits
    // matter downstream, and those come out exactly complemented. (s−1−v
    // would go negative whenever v ≥ s.)
    val full = (1L << bits) - 1
    for (k <- (bits - 1) to 0 by -1) {
      val s = 1L << k
      val rx = when(col("_hx").bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      val ry = when(col("_hy").bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn("_hd2", col(out) + lit(s * s) * (rx * lit(3L)).bitwiseXOR(ry))
        // reflect (rx = 1 quadrants mirror) then swap x/y — skipped when
        // ry = 1, where the frame carries through unrotated
        .withColumn("_hx2",
          when(ry === 0,
            when(rx === 1, lit(full) - col("_hy")).otherwise(col("_hy")))
            .otherwise(col("_hx")))
        .withColumn("_hy2",
          when(ry === 0,
            when(rx === 1, lit(full) - col("_hx")).otherwise(col("_hx")))
            .otherwise(col("_hy")))
        .drop("_hx", "_hy", out)
        .withColumnRenamed("_hx2", "_hx")
        .withColumnRenamed("_hy2", "_hy")
        .withColumnRenamed("_hd2", out)
    }
    cur.drop("_hx", "_hy")
  }

  /** Repartition by a time-derived key before a partitioned write so each
    * output partition receives a bounded number of files (the classic
    * small-files fix for dt=/hr= layouts). */
  def coalescePartitionedWrite(df: DataFrame, partitionCols: Seq[Column],
      filesPerPartition: Int = 1): DataFrame =
    // Content-derived sub-key: a task retry must reproduce the same file
    // layout (layout IS the observable output of a write), which
    // monotonically_increasing_id cannot guarantee. Identical rows land in
    // the same file — the file-COUNT bound still holds, only balance
    // degrades, and only for fully-duplicate partitions. Requires
    // xxhash64-able column types (no MapType).
    df.repartition(partitionCols :+
      (pmod(xxhash64(df.columns.toIndexedSeq.map(df(_)): _*), lit(filesPerPartition))): _*)
}
