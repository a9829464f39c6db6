package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract integrity for the driver interface: the silent-failure mode of
  * Verify (SURVEY.md §5.1) makes structural mistakes expensive, so they are
  * caught here instead. */
class SparkEntrySpec extends AnyFunSuite {

  test("no category registers duplicate query names") {
    val all = Seq(
      ops.Sources.queries, ops.Basics.queries, ops.Joins.queries,
      ops.Aggregates.queries, ops.Windows.queries, ops.Scalars.queries,
      ops.LlmOps.queries, ops.Udfs.queries, ops.StreamBatch.queries,
      ops.Reshape.queries, ops.EventAnalytics.queries, ops.Graph.queries,
      flowlog.FlowLogQueries.queries)
      .flatten.map(_._1)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(all.size === SparkEntry.queries.size)
  }

  test("every oracle key has a query; rows-only queries are the known thirteen") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).mkString(", ")}")
    val rowsOnly = q -- o
    // xxhash64-based signatures (simhash, the LSH/IVF ANN forms) and the
    // PQ-approximated cosine have no DuckDB twin; these stay rows-only by
    // design and are property-tested instead (PropertySpec / LlmOpsSpec).
    // llm_sim_ann_{ivf,pq}_persisted joined in round 6: each is its
    // retrain path's row-identical twin (asserted structurally in
    // LlmOpsSpec), so they inherit the same oracle-less status.
    // llm_dedup_containment_lsh left this set in round 5 when its
    // candidates became the lossless prefix filter (exact → full-corpus
    // oracle).
    // llm_sim_ann_ivf_upsert and _compact joined in round 7: the
    // incremental-index route and its compaction step through the same
    // fixed-codebook machinery (upsert ≡ full re-encode and
    // compact ≡ upsert, both asserted structurally in LlmOpsSpec).
    // llm_sim_ann_ivfpq joined in round 10: the IVF-PQ composition's
    // score is PQ-approximated like its pq siblings (retrain
    // determinism, error/inflation bounds, and cell-visible recall all
    // pinned in LlmOpsSpec).
    // llm_sim_ann_ivfpq_refined joined in round 12: its output SCORES are
    // exact cosines, but the pair SET is still cell-visibility + PQ-screen
    // bounded, so no DuckDB twin exists; recall lift, score exactness, and
    // reshuffle determinism are pinned in LlmOpsSpec.
    // llm_sim_ann_ivf_multiprobe joined in round 13: exact scores over the
    // nprobe-cell candidate set — same fixed-codebook status as its
    // siblings; recall monotonicity in nprobe, nprobe=1 ≡ single-cell,
    // and reshuffle determinism pinned in LlmOpsSpec.
    // llm_sim_ann_ivfpq_multiprobe joined in round 14: PQ-approximated
    // scores over the nprobe-cell candidate set (the composition of the
    // two statuses above); nprobe=1 ≡ llm_sim_ann_ivfpq bit-identically,
    // the subset chain with score stability, recall monotonicity, and
    // reshuffle determinism pinned in LlmOpsSpec.
    assert(rowsOnly === Set("llm_dedup_simhash", "llm_sim_ann_lsh",
      "llm_sim_ann_ivf", "llm_sim_ann_pq", "llm_sim_ann_ivf_persisted",
      "llm_sim_ann_pq_persisted", "llm_sim_ann_ivf_upsert",
      "llm_sim_ann_ivf_compact", "llm_sim_ann_ivfpq",
      "llm_sim_ann_ivfpq_refined", "llm_sim_ann_ivfpq_upsert",
      "llm_sim_ann_ivf_multiprobe", "llm_sim_ann_ivfpq_multiprobe"),
      s"unexpected oracle-less queries: ${rowsOnly.mkString(", ")}")
  }

  test("oracle SQL strings contain no unescapable control characters") {
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(!v.contains("\u0000"), s"$k contains NUL")
      assert(v.trim.nonEmpty, s"$k oracle empty")
    }
  }
}
