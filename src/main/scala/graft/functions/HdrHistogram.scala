package graft.functions

/** HdrHistogram-style log₂-bucketed mergeable quantiles — the
  * DETERMINISTIC member of the mergeable-summary family (HLL =
  * distinct-union, theta = distinct set-algebra, this = quantiles).
  *
  * Why not a KLL/REQ/t-digest sketch: every one of those compacts with
  * RANDOM coin flips, so two runs over the same data emit different
  * summaries — unusable under this repo's hash-exact cross-engine
  * gate, and operationally annoying (non-reproducible dashboards).
  * The production latency-histogram trick (HdrHistogram, Prometheus
  * native histograms) is deterministic instead: bucket the value space
  * logarithmically with fixed sub-bucket resolution; the histogram is
  * then a pure function of the data MULTISET, merge = per-bucket
  * counter addition (associative, commutative, lossless), and any
  * quantile is answered from the merged counters with bounded relative
  * error. That is exactly the 100 TB profile-job shape: per-epoch
  * partial histograms persist as (bucket, count) rows — a few KB per
  * group regardless of data volume — and every later percentile
  * question reads only the summary table.
  *
  * Bucket rule (5 sub-bucket bits → 32 sub-buckets per octave →
  * relative error ≤ 1/32 ≈ 3.1%): for v < 32 the bucket is v itself
  * (exact); otherwise with m = number of binary digits of v (= MSB
  * position, via length(bin(v)) — exact INTEGER cross-engine, no
  * transcendental log), the bucket lower bound is
  *   2^(m−1) + ((v − 2^(m−1)) div 2^(m−6)) · 2^(m−6).
  * All BIGINT shifts/divides — identical in Spark (`div`,
  * `shiftleft`) and DuckDB (`//`, `<<`), zero doubles anywhere.
  *
  * Quantile extraction never divides at all: the q-th lower quantile
  * bucket is the smallest bucket whose cumulative count reaches
  * ⌈q·n⌉, and `cum ≥ ⌈a/b⌉ ⇔ cum·b ≥ a` keeps it in exact integer
  * products. The reported value is the bucket LOWER bound, so the
  * guarantee is `reported ≤ exact_disc_quantile < reported + width`
  * (AggregatesSpec pins it against the exact percentile).
  */
object HdrHistogram {

  /** Spark-SQL fragment computing the bucket lower bound of BIGINT
    * column/expression `c` (values ≥ 1). The single bucket seam — the
    * batch query and the streaming sink both route through this, so
    * streamed-merge ≡ batch-histogram is structural. */
  def bucketSql(c: String): String =
    s"""CASE WHEN $c < 32L THEN $c
       |ELSE shiftleft(1L, length(bin($c)) - 1) +
       |     (($c - shiftleft(1L, length(bin($c)) - 1))
       |       div shiftleft(1L, length(bin($c)) - 6)) *
       |     shiftleft(1L, length(bin($c)) - 6) END""".stripMargin.replace("\n", " ")

  /** The same fragment in DuckDB dialect (`<<`, `//`) for oracles. */
  def bucketSqlDuck(c: String): String =
    s"""CASE WHEN $c < 32 THEN $c
       |ELSE (CAST(1 AS BIGINT) << (length(bin($c)) - 1)) +
       |     ((($c - (CAST(1 AS BIGINT) << (length(bin($c)) - 1)))
       |       // (CAST(1 AS BIGINT) << (length(bin($c)) - 6))) *
       |      (CAST(1 AS BIGINT) << (length(bin($c)) - 6))) END""".stripMargin.replace("\n", " ")
}
