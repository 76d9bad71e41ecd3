package graft

import org.apache.spark.sql.SaveMode

/** Empirical scale-growth gate (round-7 verdict task #3): SCALE.md argues
  * the fanout shapes in prose; this spec pins them. The worst-fanout
  * operators run at sf0.01 AND sf0.1 (10x the data) in one harness and the
  * wall-time growth must stay linear-ish: t(sf0.1) <= slack + c * 10 *
  * t(sf0.01). A quadratic operator shows ~100x growth, far beyond any noise
  * this box produces (documented ~2x run-to-run), so c = 3 with a small
  * fixed slack separates the two regimes decisively while staying
  * noise-proof: min-of-2 on both sides, one warmup run first so codegen/JIT
  * is paid outside the measurement.
  *
  * The gated set is exactly the verdict's worst-fanout list: the basket
  * self-join (sum of basket^2 fanout), token-pair PMI (df-banded vocabulary
  * self-join), span dedup (per-row window explosion) and triangle counting
  * (degeneracy-oriented wedge join).
  */
class ScaleSpec extends SparkSuite {

  private val small = "/root/testdata/sf0.01"
  private val big = "/root/testdata/sf0.1"

  private def run(name: String, dir: String): Unit =
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode(SaveMode.Overwrite).save()

  private def timeMinOf2(name: String, dir: String): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      run(name, dir)
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  // the r7-verdict worst-fanout list, plus round 8's heaviest additions:
  // PQ trains + encodes the corpus (vocabulary-of-codes work), BPE encode
  // runs a kernel over the distinct vocabulary, k-core iterates semi-joins;
  // round 10 adds the winnow fingerprint self-join (df-banded postings —
  // the maxDf² bound must hold empirically, not just in prose)
  // round-10 session 2 adds the covariance self-join (d² per-vector fanout
  // must stay corpus-LINEAR) and link prediction (wedge fanout through
  // intermediates — the maxDeg·|E| bound on a constant-degree graph)
  // round-10 session 3 adds the banded pHash pair join (the lossless
  // 4-band candidate equi-join must stay cohort-linear, not all-pairs)
  // and LLR collocations (the pair-domain aggregate — vocabulary², never
  // corpus²)
  // round 13 adds the unigram-LM family (r12 verdict #4): training EM and
  // greedy encode both join the corpus against the DISTINCT-WORD
  // vocabulary — growth must stay vocabulary-bounded (the BPE precedent),
  // and fertility is the same composition through the eval layer
  // round 14 adds its three heaviest new shapes: chrF (6 char-n-gram
  // sweeps — gram-stream-linear, never pairwise), ROUGE-L (quadratic
  // PER PAIR in the JITed kernel but linear in pairs), and seed-set
  // betweenness (O(seeds × reach) frontier joins — the truncation fix
  // must keep it linear, not just fast once)
  // round 16 adds the two remaining topology-driven fixpoints (r15 verdict
  // #6): full SCC decomposition (rounds bounded by SCC-DAG depth — the
  // fixture pins depth constant as keys grow, so growth must track data,
  // not explode with it) and k-truss (support peeling over the oriented
  // triangle join — clique-block-linear)
  for (q <- Seq("basket_part_pairs", "text_token_pmi", "dedup_spans", "graph_triangles",
      "knn_pq", "text_bpe_encode", "graph_kcore", "dedup_winnow_pairs",
      "emb_covariance", "graph_common_neighbors",
      "mm_phash_pairs", "text_collocations_llr",
      "text_unigram_encode", "eval_tokenizer_fertility",
      "eval_chrf", "eval_rouge_l", "graph_betweenness",
      "graph_scc_full", "graph_ktruss"))
    test(s"$q wall-time grows at most ~linearly from sf0.01 to sf0.1") {
      run(q, small) // warmup: codegen + JIT + class-load outside the clock
      val tSmall = timeMinOf2(q, small)
      val tBig = timeMinOf2(q, big)
      val bound = 1.0 + 3.0 * 10.0 * tSmall
      info(f"$q: sf0.01 $tSmall%.2f s, sf0.1 $tBig%.2f s (${tBig / tSmall}%.1fx, bound ${bound}%.1f s)")
      assert(
        tBig <= bound,
        f"$q grew superlinearly: $tSmall%.2f s -> $tBig%.2f s at 10x data (bound $bound%.2f s)")
    }
}
