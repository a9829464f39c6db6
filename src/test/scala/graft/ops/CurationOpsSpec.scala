package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form / invariant tests for the round-5 third-pass curation ops —
  * the oracle compare proves engine equality; these pin first-principles
  * properties a matching-but-wrong pair of engines could not satisfy. */
class CurationOpsSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("pii_redact: injected pattern counts follow the doc_id residues exactly") {
    val rows = q("llm_pii_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 1L, s"doc $id: exactly one injected email")
      assert(r.getLong(2) === (if (id % 2 == 0) 1L else 0L), s"doc $id: ip residue")
      assert(r.getLong(3) === (if (id % 3 == 0) 1L else 0L), s"doc $id: card residue")
      // every injected pattern was scrubbed: the redacted text can retain
      // no digit runs (corpus text is digit-free, replacements are tags)
      assert(r.getString(5).length === 32, "md5 hex")
    }
  }

  test("domain_mix: shares sum to 1 and weights rebalance every source to the same token mass") {
    val rows = q("llm_domain_mix").collect()
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"token shares sum to $shareSum")
    // tokens_s x weight_s = T/S for every source (the uniform target),
    // up to the declared rounding of weight
    val masses = rows.map(r => r.getLong(2) * r.getDouble(4))
    val mean = masses.sum / masses.length
    masses.foreach(m => assert(math.abs(m - mean) / mean < 1e-3,
      s"rebalanced mass $m deviates from $mean"))
  }

  test("len_bucket: buckets partition the corpus and bound the padding waste") {
    val rows = q("llm_len_bucket").collect()
    val nDocs = q("llm_text_stats").collect().map(_.getLong(1)).sum
    assert(rows.map(_.getLong(1)).sum === nDocs, "buckets must partition all docs")
    rows.foreach { r =>
      val (bucket, n, minT, maxT, sumT, waste) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(minT >= bucket * 16 && maxT < (bucket + 1) * 16,
        s"bucket $bucket bounds violated: [$minT, $maxT]")
      assert(waste === (bucket + 1) * 16 * n - sumT, s"bucket $bucket waste identity")
      assert(waste >= 0 && waste <= 16 * n, s"bucket $bucket waste range")
    }
  }

  test("unigram_rarity: fractions are probabilities and mean_inv_tf is bounded by the rarest band") {
    val rows = q("llm_unigram_rarity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rare, inv) = (r.getDouble(2), r.getDouble(3))
      assert(rare >= 0.0 && rare <= 1.0)
      // every term occurs at least once -> 1/tf <= 1, and tf >= 1 -> > 0
      assert(inv > 0.0 && inv <= 1.0)
    }
  }

  test("sample_temperature: membership is the pure doc_id hash test, rates invert the skew") {
    val kept = q("llm_sample_temperature").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val n = docs.groupBy(_._2).map { case (l, v) => l -> v.length.toLong }
    val thr = n.map { case (l, c) =>
      val ws = math.sqrt(c.toDouble).toLong
      l -> (4294967296L * math.min(4 * ws, c)) / c
    }
    // exact membership: kept iff the Knuth hash clears the lang threshold
    val expect = docs.filter { case (id, l) =>
      (id * 2654435761L) % 4294967296L < thr(l)
    }.sortBy(_._1).toSeq
    assert(kept.toSeq === expect)
    // temperature flattening: the dominant language keeps the smallest
    // fraction, and every language keeps at least one document
    val frac = kept.groupBy(_._2).map { case (l, v) => l -> v.length.toDouble / n(l) }
    assert(n.keySet === frac.keySet)
    val enFrac = frac("en")
    frac.foreach { case (l, f) => if (l != "en") assert(enFrac < f, s"$l") }
  }

  test("zorder_key: the interleave is invertible back to both quantized coordinates") {
    val rows = q("scale_zorder_key").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qp, qs, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      var dp = 0L; var ds = 0L
      (0 until 8).foreach { b =>
        dp |= ((z >> (2 * b)) & 1L) << b
        ds |= ((z >> (2 * b + 1)) & 1L) << b
      }
      assert(dp === qp && ds === qs,
        s"z=$z deinterleaves to ($dp,$ds), expected ($qp,$qs)")
      assert(qp >= 0 && qp <= 255 && qs >= 0 && qs <= 255)
    }
  }

  test("doc_chunking: chunks tile every document with stride 24 and 8-token overlap") {
    val rows = q("llm_doc_chunking").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    val nTok = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // dense chunk_idx from 0, starts at stride 24
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i.toLong, s"doc $doc chunk_idx dense")
        assert(r.getLong(2) === 24L * i, s"doc $doc start stride")
        assert(r.getLong(3) === math.min(32L, nTok(doc) - 24L * i),
          s"doc $doc chunk length")
        assert(r.getString(4).split(" ").length.toLong === r.getLong(3),
          s"doc $doc chunk text token count")
      }
      // full coverage: last chunk reaches the document end
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) === nTok(doc),
        s"doc $doc chunks must cover the final token")
      // (stride 24 + full-chunk length 32, both asserted above, imply the
      // 8-token overlap between consecutive full chunks)
    }
  }

  test("hybrid_search: rrf is exactly the rank-reciprocal sum and the fused list is rrf-sorted") {
    val rows = q("llm_hybrid_search").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val rt = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val rv = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(rt.isDefined || rv.isDefined, "a fused row must come from some system")
      rt.foreach(x => assert(x >= 1L && x <= 100L))
      rv.foreach(x => assert(x >= 1L && x <= 100L))
      val exp = rt.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(5) - exp) < 1e-6,
        s"rrf must be the reciprocal-rank sum for doc ${r.getLong(0)}")
      // a ranked side carries its score, an unranked side carries null
      assert(rt.isDefined === !r.isNullAt(1) && rv.isDefined === !r.isNullAt(2))
    }
    val rrfs = rows.map(_.getDouble(5))
    assert(rrfs.sameElements(rrfs.sortBy(x => -x)), "fused list sorted by rrf desc")
    assert(rows.exists(r => !r.isNullAt(3)) && rows.exists(r => !r.isNullAt(4)),
      "both retrieval systems must contribute ranks to the fused top-20")
  }

  test("ngram_novelty: first doc is fully novel, novel counts partition the distinct-gram universe") {
    val rows = q("llm_ngram_novelty").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1),
        "0 <= n_novel <= n_grams")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // the lowest doc_id in the result introduced every one of its grams
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(2) === first.getLong(1))
    assert(first.getDouble(3) === 1.0)
    // each distinct gram's first occurrence is attributed to exactly one
    // doc, so Σ n_novel = |distinct grams in the corpus|
    import org.apache.spark.sql.functions._
    val totalDistinct = graft.Tables.documents(spark, sf)
      .select(split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 8), i -> concat_ws(' ', slice(toks, i + 1, 8)))"))
        .as("g"))
      .select(countDistinct(col("g"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum === totalDistinct,
      "novel counts must partition the distinct-gram universe")
  }
}
