package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN / embedding maintenance: brute force, LSH, IVF (in-memory, indexed, appended), PQ, IVF-PQ, eval gates, embedding transforms.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait SimilarityQueries extends QueryHelpers {

  protected def similarityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- similarity search over embeddings ---
    "knn_bruteforce" -> ((s, dir) => {
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.bruteForceKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    "emb_norm_histogram" -> ((s, dir) => {
      // embedding-feed health: squared-norm histogram centered on the
      // unit-norm mass (collapsed vectors pile into bucket 0, scale bugs
      // into the top bucket) — all integer, tails clamped
      graft.operators.Embeddings.normHistogram(
        spread(t(s, dir, "embeddings")), "embedding",
        width = 500000L, buckets = 12, offset = 999997000000L)
        .orderBy(col("bucket"))
    }),


    "emb_centroid_outliers" -> ((s, dir) => {
      // mislabeled-embedding detector: integer-mean centroid per label,
      // BIGINT squared distance to own centroid, robust 1.5×-median flag
      // on doubled-median integers — flags themselves hash-match
      graft.operators.Embeddings.centroidOutliers(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding", "label")
        .orderBy(col("id"))
    }),


    "eval_sq_rank_tau" -> ((s, dir) => {
      // compression-fidelity eval: Kendall tau between full-precision and
      // SQ-RECONSTRUCTED cosine over the brute top-10 — the go/no-go number
      // for serving per-dim scalar-quantized vectors; pure composition of
      // three gated operators (brute knn, quantizeScalar, kendallTau)
      import graft.operators.{Embeddings, Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      // persisted: brute feeds the dot join AND the scored join (the SQ
      // reconstruction was also tried persisted r17 — slower: forcing the
      // full per-dim materialization beats re-deriving the pruned columns
      // each consumer actually needs)
      val brute = Similarity.bruteForceKnn(
        embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 10)
        .transform(graft.operators.Residuals.persist)
      val recon = Embeddings.quantizeScalar(embs, "vec_id", "embedding")
        .select(col("vec_id"), col("dim"), col("recon"))
      val n2 = recon.groupBy(col("vec_id"))
        .agg(sum(col("recon") * col("recon")).as("n2"))
      val dots = brute.select(col("query_id"), col("neighbor_id"))
        .join(recon.select(col("vec_id").as("query_id"), col("dim"), col("recon").as("rq")),
          "query_id")
        .join(recon.select(col("vec_id").as("neighbor_id"), col("dim"), col("recon").as("rn")),
          Seq("neighbor_id", "dim"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(sum(col("rq") * col("rn")).as("dot"))
      val scored = brute
        .join(dots, Seq("query_id", "neighbor_id"))
        .join(n2.select(col("vec_id").as("query_id"), col("n2").as("qn2")), "query_id")
        .join(n2.select(col("vec_id").as("neighbor_id"), col("n2").as("cn2")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("cos_full"),
          (col("dot").cast("double") /
            (sqrt(col("qn2").cast("double")) * sqrt(col("cn2").cast("double"))))
            .as("cos_sq"))
      Eval.kendallTau(scored, "query_id", "neighbor_id", "cos_full", "cos_sq")
        .orderBy(col("query_id"))
    }),


    "emb_hard_negatives" -> ((s, dir) => {
      // contrastive hard-negative mining: per anchor, the 3 most-similar
      // DIFFERENT-label vectors — the margin-defining complement to
      // emb_negatives' uniform sampling; label filter BEFORE the rank
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.hardNegatives(embs, embs.filter(col("vec_id") < 20),
        "vec_id", "embedding", "label", 3)
        .orderBy(col("anchor_id"), col("rank"))
    }),


    "knn_lsh" -> ((s, dir) => {
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.lshKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    "knn_ivf" -> ((s, dir) => {
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.ivfKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    "knn_ivf_indexed" -> ((s, dir) => {
      // the persisted-index serving path: same parameters and output as
      // knn_ivf (shares its oracle) but probing the hive-partitioned
      // on-disk inverted file with static partition pruning
      val embs = spread(t(s, dir, "embeddings"))
      val path = ivfIndexPath(s, dir)
      Similarity.ivfIndexKnn(
        s.read.parquet(path), embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    "eval_silhouette" -> ((s, dir) => {
      // squared-L2 silhouette of the 8-cell md5-seeded Voronoi partition,
      // computed scan-speed from cluster moments (n_C·‖x‖² − 2x·S_C + Q_C)
      // on 1e-3-quantized vectors — "is the clustering real" before a
      // pipeline trusts cell routing for sampling or IVF
      graft.operators.Eval.silhouette(
          spread(t(s, dir, "embeddings")), "vec_id", "embedding", cells = 8)
        .orderBy(col("cell"))
    }),


    "eval_ivf_recall" -> ((s, dir) => {
      // recall@10 of IVF (nprobe=4) against brute force, per query — the
      // CurationSpec floor as a first-class oracle-gated relation
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val queries = embs.filter(col("vec_id") < 20)
      val truth = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 10)
      val cand = Similarity.ivfKnn(embs, queries, "vec_id", "embedding", 10)
      Eval.recallAtK(truth, cand, "query_id", "neighbor_id")
        .orderBy(col("query_id"))
    }),


    "sample_kcenter" -> ((s, dir) => {
      // greedy k-center coreset (Gonzalez): seed at min id, then 5 rounds
      // of farthest-point selection under EXACT integer squared L2 over
      // the quantized vectors; (round, vec_id, d2) is the radius curve
      graft.operators.Similarity.kcenterSelect(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding", k = 6)
        .orderBy(col("round"))
    }),


    "eval_mrr" -> ((s, dir) => {
      // reciprocal rank of the first true neighbor in the IVF ranking —
      // same truth/candidate pair as eval_ivf_recall, the "how fast" axis
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val queries = embs.filter(col("vec_id") < 20)
      val truth = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 10)
      val cand = Similarity.ivfKnn(embs, queries, "vec_id", "embedding", 10)
      Eval.mrrAtK(truth, cand, "query_id", "neighbor_id", "rank")
        .orderBy(col("query_id"))
    }),


    "eval_ndcg" -> ((s, dir) => {
      // graded ranking quality of the IVF probe (nprobe=4) against exact
      // cosine: grade = 11 - exact rank over the brute-force top-10, so
      // ndcg_micro = 1e6 iff IVF returns the exact list in the exact order
      // — the position-weighted companion to eval_ivf_recall's set overlap
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val queries = embs.filter(col("vec_id") < 20)
      val graded = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"), (lit(11L) - col("rank")).as("grade"))
      val cand = Similarity.ivfKnn(embs, queries, "vec_id", "embedding", 10)
      Eval.ndcgAtK(graded, cand, "query_id", "neighbor_id", "grade", "rank")
        .orderBy(col("query_id"))
    }),


    "eval_rp_rank_tau" -> ((s, dir) => {
      // rank-fidelity eval: per query, Kendall tau between full-dim cosine
      // and JL-projected (16-dim ±1) cosine over the brute-force top-10 —
      // the number that says whether the cheap projection preserves ORDER,
      // not just distance bands
      import graft.functions.VectorFns
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val brute = Similarity.bruteForceKnn(
        embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 10)
      val rp = embs
        .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("qv"))
        .withColumn("rq", array((0 until 16).map(j =>
          VectorFns.dotQ(col("qv"), array((0 until 64).map(i =>
            lit(Similarity.hyperplaneWeight(42L, j, i))): _*))): _*))
        .withColumn("rn2", VectorFns.norm2Q(col("rq")))
        .select(col("vec_id"), col("rq"), col("rn2"))
      val scored = brute
        .join(rp.select(col("vec_id").as("query_id"),
          col("rq").as("qr"), col("rn2").as("qn")), "query_id")
        .join(rp.select(col("vec_id").as("neighbor_id"),
          col("rq").as("cr"), col("rn2").as("cn")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("cos_full"),
          VectorFns.cosinePre(col("qr"), col("qn"), col("cr"), col("cn")).as("cos_rp"))
      Eval.kendallTau(scored, "query_id", "neighbor_id", "cos_full", "cos_rp")
        .orderBy(col("query_id"))
    }),


    "eval_matryoshka_tau" -> ((s, dir) => {
      // matryoshka-truncation eval: Kendall tau between full-dim cosine and
      // FIRST-16-DIMS cosine over the brute-force top-10 — the fidelity
      // number behind serving truncated (matryoshka) embeddings at 4x less
      // memory; same harness as eval_rp_rank_tau, prefix slice instead of a
      // projection matrix
      import graft.functions.VectorFns
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val brute = Similarity.bruteForceKnn(
        embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 10)
      val pre = embs
        .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("qv"))
        .withColumn("pq", slice(col("qv"), 1, 16))
        .withColumn("pn2", VectorFns.norm2Q(col("pq")))
        .select(col("vec_id"), col("pq"), col("pn2"))
      val scored = brute
        .join(pre.select(col("vec_id").as("query_id"),
          col("pq").as("qp"), col("pn2").as("qn")), "query_id")
        .join(pre.select(col("vec_id").as("neighbor_id"),
          col("pq").as("cp"), col("pn2").as("cn2")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("cos_full"),
          VectorFns.cosinePre(col("qp"), col("qn"), col("cp"), col("cn2")).as("cos_pre"))
      Eval.kendallTau(scored, "query_id", "neighbor_id", "cos_full", "cos_pre")
        .orderBy(col("query_id"))
    }),


    "knn_pq" -> ((s, dir) => {
      // product quantization + ADC + exact re-rank: the compressed-domain
      // linear scan (32x smaller corpus bytes); shortlist fetches full
      // vectors for re-ranking
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.pqKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    "knn_ivfpq" -> ((s, dir) => {
      // the faiss-style IVF+PQ serving architecture: Voronoi-cell prune,
      // ADC shortlist over codes, exact re-rank of the shortlist only
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.ivfPqKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    "emb_negatives" -> ((s, dir) => {
      // contrastive-training negative mining: per anchor, 3 deterministic
      // hash-ranked negatives from OUTSIDE the anchor's semantic cell
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.negativeSample(embs, embs.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 3)
        .orderBy(col("anchor_id"), col("rank"))
    }),


    "emb_meanpool" -> ((s, dir) => {
      // chunk -> document pooling: element-wise truncating integer mean of
      // the quantized member vectors per group (vec_id div 10 stands in for
      // the chunk->doc mapping) — the pooling step between chunk encoding
      // and document retrieval, oracle-exact like kmeans centroids
      graft.operators.Embeddings.meanPool(
        spread(t(s, dir, "embeddings")), expr("vec_id div 10"), "embedding")
        .orderBy(col("grp"), col("dim"))
    }),


    "emb_rp_project" -> ((s, dir) => {
      // Johnson-Lindenstrauss random projection 64 -> 16 dims: deterministic
      // md5-derived ±1 sign matrix as literals, integer dot products over
      // the quantized vectors — the cheap dim reduction in front of ANN
      graft.operators.Embeddings.randomProject(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding", outDims = 16)
        .orderBy(col("vec_id"), col("dim"))
    }),


    "emb_kmeans_refine" -> ((s, dir) => {
      // one Lloyd step over the deterministic IVF seeding: integer-mean
      // centroids keep even the TRAINED assignment oracle-exact
      graft.operators.Similarity.kmeansRefine(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    }),


    "knn_ivf_appended" -> ((s, dir) => {
      // incremental index maintenance: base index + partition-local append
      // must probe bit-identically to the full rebuild (shares knn_ivf's
      // oracle); the untouched-cells property is pinned in OperatorsSpec
      val embs = spread(t(s, dir, "embeddings"))
      val path = ivfAppendedIndexPath(s, dir)
      Similarity.ivfIndexKnn(
        s.read.parquet(path), embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),


    "eval_brier" -> ((s, dir) => {
      // Brier score over the calibration fixture: the unbinned MSE twin
      // of eval_calibration/eval_ece — compensating within-bin errors
      // can't hide from it; per-term 1e-6 quantization (PSI pattern)
      import graft.operators.Eval
      val e = t(s, dir, "embeddings").select(
        pmod(TextFns.md5Long(col("vec_id").cast("string"), 100), lit(1000001L)).as("p"),
        when(col("label") % 2 === 0, 1L).otherwise(0L).as("y"))
      Eval.brierScore(e, col("p"), col("y"))
    }),


    "eval_calibration" -> ((s, dir) => {
      // reliability-bin calibration audit over a deterministic md5-derived
      // micro-probability (family 100 = md5("50:"+id) chars 1-15) against
      // even-label positives; gates the binning, integer means and
      // decomposed positive-rate machinery
      import graft.operators.Eval
      val e = t(s, dir, "embeddings").select(
        pmod(TextFns.md5Long(col("vec_id").cast("string"), 100), lit(1000001L)).as("p"),
        when(col("label") % 2 === 0, 1L).otherwise(0L).as("y"))
      Eval.calibration(e, col("p"), col("y"), bins = 10)
        .orderBy(col("bin"))
    }),

    // --- embedding maintenance ---
    "eval_rrf_fusion" -> ((s, dir) => {
      // hybrid-retrieval rank fusion: RRF of the full-dim cosine top-10 and
      // the prefix-16-dim (matryoshka) cosine top-10 — integer 1e12 div
      // (60+rank) contributions, full-outer on the candidate lists, fused
      // re-rank; the standard dense ⊕ cheap combiner made oracle-exact
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val queries = embs.filter(col("vec_id") < 20)
      val full = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 10)
      val pre = Similarity.bruteForceKnn(
        embs.withColumn("embedding", slice(col("embedding"), 1, 16)),
        queries.withColumn("embedding", slice(col("embedding"), 1, 16)),
        "vec_id", "embedding", 10)
      Eval.rrfFuse(full, pre, "query_id", "neighbor_id", "rank")
        .orderBy(col("query_id"), col("fused_rank"))
    }),


    "emb_abtt" -> ((s, dir) => {
      // all-but-the-top: project the dominant principal direction out of
      // every embedding (anisotropy fix) — the direction collects to d
      // literal longs, so the correction is one scan-speed pass, no join
      graft.operators.Embeddings.removeTopComponent(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding", rounds = 2)
        .orderBy(col("vec_id"), col("dim"))
    }),


    "emb_pca_power" -> ((s, dir) => {
      // top principal direction by integer power iteration over the
      // covariance numerators (2 rounds, all-ones start, ∞-norm fixed-point
      // renormalization) — the PCA step behind whitening and
      // all-but-the-top common-direction removal; corpus touched once, the
      // iteration runs over d² metadata
      graft.operators.Embeddings.pcaPower(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding", rounds = 2)
        .orderBy(col("dim"))
    }),


    "emb_covariance" -> ((s, dir) => {
      // upper-triangle covariance numerators of the embedding cloud —
      // the mergeable integer second-moment matrix PCA/whitening/
      // Mahalanobis drift consume; d(d+1)/2 = 2080 output rows at d=64
      graft.operators.Embeddings.covarianceNum(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("i"), col("j"))
    }),


    "emb_normalized" -> ((s, dir) => {
      graft.operators.Embeddings
        .normalizedQ(spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))
    }),


    "emb_int8" -> ((s, dir) => {
      graft.operators.Embeddings
        .quantizeInt8(spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))
    }),


    "emb_binary_quantize" -> ((s, dir) => {
      // 1-bit-per-dim binary embeddings against per-dim integer-mean
      // thresholds, packed into two non-negative 32-bit words — the 32x
      // compression tier below int8/SQ; Hamming over the words is the
      // serving-time similarity surrogate
      graft.operators.Embeddings.binaryQuantize(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("id"))
    }),


    "eval_bq_rank_tau" -> ((s, dir) => {
      // binary-compression fidelity: Kendall tau between full-precision
      // cosine and NEGATED Hamming distance over the brute top-10 — the
      // go/no-go for serving sign-bit embeddings (ties in the coarse
      // 0..64 Hamming domain count as neither concordant nor discordant,
      // exactly tau-a's contract); composition of three gated operators
      import graft.operators.{Embeddings, Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      // persisted: brute feeds both sides of the scored join; the sign-bit
      // words feed both lookup legs (r17)
      val brute = Similarity.bruteForceKnn(
        embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 10)
        .transform(graft.operators.Residuals.persist)
      val bq = Embeddings.binaryQuantize(embs, "vec_id", "embedding")
        .transform(graft.operators.Residuals.persist)
      val scored = brute
        .join(bq.select(col("id").as("query_id"),
          col("word_lo").as("ql"), col("word_hi").as("qh")), "query_id")
        .join(bq.select(col("id").as("neighbor_id"),
          col("word_lo").as("nl"), col("word_hi").as("nh")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("cos_full"),
          (-(bit_count(col("ql").bitwiseXOR(col("nl")))
            + bit_count(col("qh").bitwiseXOR(col("nh"))))).cast("double")
            .as("neg_hamming"))
      Eval.kendallTau(scored, "query_id", "neighbor_id", "cos_full", "neg_hamming")
        .orderBy(col("query_id"))
    }),


    "eval_map" -> ((s, dir) => {
      // average precision@10 of the IVF probe against the brute top-10 —
      // the order-sensitive set metric between eval_mrr (first hit) and
      // eval_ndcg (graded); same truth/candidate pair as eval_ivf_recall
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val queries = embs.filter(col("vec_id") < 20)
      val truth = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 10)
      val cand = Similarity.ivfKnn(embs, queries, "vec_id", "embedding", 10)
      Eval.apAtK(truth, cand, "query_id", "neighbor_id", "rank")
        .orderBy(col("query_id"))
    }),


    "emb_mips_transform" -> ((s, dir) => {
      // MIPS -> cosine reduction: one completion dim floor(sqrt(M2 - n2))
      // appended per vector so max-inner-product search rides every gated
      // cosine ANN index; sqrt is IEEE-correctly-rounded in both engines
      graft.operators.Embeddings.mipsTransform(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))
    }),


    "emb_residual_quantize" -> ((s, dir) => {
      // two-stage residual quantization: trained-range SQ, then SQ over
      // the (non-negative) residual — 16 bits/dim, err monotonically
      // refines stage 1; all truncating-integer, both stages oracle-exact
      graft.operators.Embeddings.residualQuantize(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))
    }),


    "eval_ece" -> ((s, dir) => {
      // expected calibration error: the one-number rollup of
      // eval_calibration's reliability bins — sum(n_b * gap_b) div N,
      // same md5-derived scores and even-label positives
      import graft.operators.Eval
      val e = t(s, dir, "embeddings").select(
        pmod(TextFns.md5Long(col("vec_id").cast("string"), 100), lit(1000001L)).as("p"),
        when(col("label") % 2 === 0, 1L).otherwise(0L).as("y"))
      Eval.calibration(e, col("p"), col("y"), bins = 10)
        .agg(sum(col("n")).as("n_total"),
          sum(col("n") * col("gap_micro")).as("ws"))
        .select(col("n_total"), expr("ws div n_total").as("ece_micro"))
    }),


    "eval_knn_label_acc" -> ((s, dir) => {
      // embedding linear-probe proxy: predict each query's label by
      // majority vote of its brute top-5 neighbors (ties -> smallest
      // label), compare to its own label — the "do neighborhoods respect
      // labels" eval behind every knn-classifier sanity check
      import graft.operators.Similarity
      val embs = spread(t(s, dir, "embeddings"))
      val labels = embs.select(col("vec_id"), col("label").cast("long").as("l"))
      val brute = Similarity.bruteForceKnn(
        embs, embs.filter(col("vec_id") < 50), "vec_id", "embedding", 5)
      val votes = brute
        .join(labels.select(col("vec_id").as("neighbor_id"), col("l")), "neighbor_id")
        .groupBy(col("query_id"), col("l")).agg(count(lit(1)).as("c"))
        .groupBy(col("query_id"))
        .agg(min(struct((-col("c")).as("nc"), col("l").as("l"))).as("m"))
        .select(col("query_id"), col("m.l").as("pred_label"))
      votes.join(labels.select(col("vec_id").as("query_id"), col("l").as("true_label")),
          "query_id")
        .select(col("query_id"), col("true_label"), col("pred_label"),
          (col("pred_label") === col("true_label")).cast("long").as("correct"))
        .orderBy(col("query_id"))
    }),


    "drift_cov_shift" -> ((s, dir) => {
      // second-moment drift: per dimension pair, |unbiased covariance
      // difference| between the even-label (reference) and odd-label
      // (current) populations — the correlation-rotation axis mean-shift
      // drift can't see; top-50 most-drifted pairs
      val embs = spread(t(s, dir, "embeddings"))
      graft.operators.Drift.covShift(
        embs.filter(col("label") % 2 === 0), embs.filter(col("label") % 2 === 1),
        "vec_id", "embedding")
        .orderBy(col("shift").desc, col("i"), col("j"))
        .limit(50)
    }))

  /** Generated unrolled k-center oracle (the unigram-LM generated-CTE
    * precedent): seed CTE + 5 rounds of (argmax by (d2 desc, id), running
    * least() distance update) — the exact same integer squared-L2 chain
    * the operator runs, re-derived independently. */
  private val kcenterOracle: String = {
    def d2(a: String, c: String): String =
      s"list_sum([($a.qv[i] - $c.qv[i]) * ($a.qv[i] - $c.qv[i]) FOR i IN range(1, len($a.qv) + 1)])"
    val sb = new StringBuilder(
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), c0 AS (
        |  SELECT vec_id, qv FROM q WHERE vec_id = (SELECT min(vec_id) FROM q)
        |), d1 AS (
        |  SELECT q.vec_id, q.qv, """.stripMargin)
    sb ++= d2("q", "c") + " AS d2 FROM q CROSS JOIN c0 c\n)"
    for (r <- 1 to 5) {
      sb ++= s", c$r AS (\n  SELECT vec_id, qv, d2 FROM d$r ORDER BY d2 DESC, vec_id LIMIT 1\n)"
      if (r < 5)
        sb ++= s", d${r + 1} AS (\n  SELECT d.vec_id, d.qv, least(d.d2, " + d2("d", "c") +
          s") AS d2 FROM d$r d CROSS JOIN c$r c\n)"
    }
    sb ++= "\nSELECT CAST(0 AS BIGINT) AS round, vec_id, CAST(0 AS BIGINT) AS d2 FROM c0"
    for (r <- 1 to 5)
      sb ++= s"\nUNION ALL SELECT CAST($r AS BIGINT), vec_id, CAST(d2 AS BIGINT) FROM c$r"
    sb ++= "\nORDER BY round"
    sb.toString
  }

  protected def similarityOracles: Map[String, String] = Map(

    "sample_kcenter" -> kcenterOracle,

    // RRF: both rankings re-derived (full-dim and prefix-16 brute cosine),
    // fused via integer 1e12 // (60+rank) sums, item-id tie-break
    "eval_brier" ->
      """WITH s AS (
        |  SELECT greatest(0, least(1000000,
        |    ('0x' || substr(md5('50:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000001)) AS p,
        |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum((p - y * 1000000) * (p - y * 1000000) // 1000000) AS BIGINT) AS sse_q,
        |  CAST(CAST(sum((p - y * 1000000) * (p - y * 1000000) // 1000000) AS BIGINT) AS DOUBLE)
        |    / (CAST(CAST(count(*) AS BIGINT) AS DOUBLE) * 1000000.0) AS brier
        |FROM s""".stripMargin,

    "eval_calibration" ->
      """WITH s AS (
        |  SELECT ('0x' || substr(md5('50:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
        |           % 1000001 AS p,
        |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), b AS (
        |  SELECT least(9, p * 10 // 1000000) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(p) AS BIGINT) AS sp
        |  FROM s GROUP BY 1
        |)
        |SELECT bin, n, n_pos,
        |  CAST(sp // n AS BIGINT) AS mean_pred_micro,
        |  CAST((n_pos // n) * 1000000 + (n_pos % n) * 1000000 // n AS BIGINT) AS pos_rate_micro,
        |  CAST(abs(sp // n - ((n_pos // n) * 1000000 + (n_pos % n) * 1000000 // n)) AS BIGINT) AS gap_micro
        |FROM b ORDER BY bin""".stripMargin,

    "eval_rrf_fusion" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), fr AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM n a CROSS JOIN n b
        |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id) z WHERE rank <= 10
        |), pn AS (
        |  SELECT vec_id, qv[1:16] AS pq, list_sum([x*x FOR x IN qv[1:16]]) AS pn2 FROM q
        |), pr AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.pq[i] * b.pq[i] FOR i IN range(1, len(a.pq) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.pn2 AS DOUBLE)) * sqrt(CAST(b.pn2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM pn a CROSS JOIN pn b
        |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id) z WHERE rank <= 10
        |), f AS (
        |  SELECT coalesce(fr.query_id, pr.query_id) AS query_id,
        |    coalesce(fr.neighbor_id, pr.neighbor_id) AS item,
        |    coalesce(1000000000000 // (60 + fr.rank), 0)
        |      + coalesce(1000000000000 // (60 + pr.rank), 0) AS rrf_scaled
        |  FROM fr FULL OUTER JOIN pr
        |    ON fr.query_id = pr.query_id AND fr.neighbor_id = pr.neighbor_id
        |), ranked AS (
        |  SELECT query_id, item, rrf_scaled,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_scaled DESC, item) AS fused_rank
        |  FROM f
        |)
        |SELECT query_id, CAST(fused_rank AS BIGINT) AS fused_rank, item,
        |  CAST(rrf_scaled AS BIGINT) AS rrf_scaled
        |FROM ranked WHERE fused_rank <= 10
        |ORDER BY query_id, fused_rank""".stripMargin,


    // ABTT: the pca chain through v2, then x' = x − ((proj//1e3)·v)//(vn2//1e3)
    // — staged downscale keeps products in BIGINT; truncation toward zero on
    // both engines
    "emb_abtt" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, i.range AS i, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |ms AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM el GROUP BY 1),
        |up AS (
        |  SELECT a.i AS i, b.i AS j,
        |    ((SELECT n FROM nn) * CAST(sum(a.x * b.x) AS BIGINT) - ma.s * mb.s) // 1000000000 AS c
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  JOIN ms ma ON ma.i = a.i JOIN ms mb ON mb.i = b.i
        |  GROUP BY a.i, b.i, ma.s, mb.s
        |),
        |cov AS (SELECT i, j, c FROM up UNION ALL SELECT j AS i, i AS j, c FROM up WHERE i != j),
        |v0 AS (SELECT DISTINCT j, CAST(1000000 AS BIGINT) AS v FROM cov),
        |u1 AS (
        |  SELECT cov.i, CAST(sum(cov.c * v0.v) AS BIGINT) // 1000000 AS u
        |  FROM cov JOIN v0 ON v0.j = cov.j GROUP BY 1
        |),
        |m1 AS (SELECT max(abs(u)) AS m FROM u1),
        |v1 AS (SELECT i AS j, u * 1000000 // (SELECT m FROM m1) AS v FROM u1),
        |u2 AS (
        |  SELECT cov.i, CAST(sum(cov.c * v1.v) AS BIGINT) // 1000000 AS u
        |  FROM cov JOIN v1 ON v1.j = cov.j GROUP BY 1
        |),
        |m2 AS (SELECT max(abs(u)) AS m FROM u2),
        |v2 AS (SELECT i AS j, u * 1000000 // (SELECT m FROM m2) AS v FROM u2),
        |vn AS (SELECT CAST(sum(v * v) AS BIGINT) AS vn2 FROM v2),
        |pr AS (
        |  SELECT el.vec_id, CAST(sum(el.x * v2.v) AS BIGINT) AS proj
        |  FROM el JOIN v2 ON v2.j = el.i GROUP BY 1
        |)
        |SELECT el.vec_id, CAST(el.i + 1 AS BIGINT) AS dim,
        |  CAST(el.x - (pr.proj // 1000) * v2.v // ((SELECT vn2 FROM vn) // 1000) AS BIGINT) AS corrected
        |FROM el
        |JOIN pr ON pr.vec_id = el.vec_id
        |JOIN v2 ON v2.j = el.i
        |ORDER BY el.vec_id, dim""".stripMargin,


    // two unrolled power-iteration rounds over the mirrored covariance
    // matrix; every step truncating integer arithmetic (div == // on
    // negatives too, the r7 kmeans precedent), all-ones start — no sign
    // ambiguity, no transcendentals
    "emb_pca_power" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, i.range AS i, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |ms AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM el GROUP BY 1),
        |up AS (
        |  SELECT a.i AS i, b.i AS j,
        |    ((SELECT n FROM nn) * CAST(sum(a.x * b.x) AS BIGINT) - ma.s * mb.s) // 1000000000 AS c
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  JOIN ms ma ON ma.i = a.i JOIN ms mb ON mb.i = b.i
        |  GROUP BY a.i, b.i, ma.s, mb.s
        |),
        |cov AS (SELECT i, j, c FROM up UNION ALL SELECT j AS i, i AS j, c FROM up WHERE i != j),
        |v0 AS (SELECT DISTINCT j, CAST(1000000 AS BIGINT) AS v FROM cov),
        |u1 AS (
        |  SELECT cov.i, CAST(sum(cov.c * v0.v) AS BIGINT) // 1000000 AS u
        |  FROM cov JOIN v0 ON v0.j = cov.j GROUP BY 1
        |),
        |m1 AS (SELECT max(abs(u)) AS m FROM u1),
        |v1 AS (SELECT i AS j, u * 1000000 // (SELECT m FROM m1) AS v FROM u1),
        |u2 AS (
        |  SELECT cov.i, CAST(sum(cov.c * v1.v) AS BIGINT) // 1000000 AS u
        |  FROM cov JOIN v1 ON v1.j = cov.j GROUP BY 1
        |),
        |m2 AS (SELECT max(abs(u)) AS m FROM u2),
        |v2 AS (SELECT i AS j, u * 1000000 // (SELECT m FROM m2) AS v FROM u2)
        |SELECT CAST(j AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_scaled
        |FROM v2 ORDER BY dim""".stripMargin,


    // covariance numerators: three BIGINT sums combined n*s_ij - s_i*s_j —
    // order-free, bit-identical; pairs via a 1-based-list index cross join
    "emb_covariance" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, i.range AS i, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |m AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM el GROUP BY 1),
        |p AS (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS s_ij
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
        |  (SELECT n FROM nn) AS n, p.s_ij,
        |  CAST((SELECT n FROM nn) * p.s_ij - ma.s * mb.s AS BIGINT) AS cov_num
        |FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
        |ORDER BY i, j""".stripMargin,


    "emb_normalized" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(e AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, CAST(list_sum([x*x FOR x IN qv]) AS BIGINT) AS n2 FROM q
        |), u AS (
        |  SELECT vec_id, n2, unnest(range(1, len(qv)+1)) AS dim, unnest(qv) AS qval FROM n
        |)
        |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |  CASE WHEN n2 = 0 THEN 0
        |       ELSE CAST(floor(qval*1000000.0 / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) END AS nq
        |FROM u ORDER BY vec_id, dim""".stripMargin,


    "emb_int8" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(e AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_max([abs(x) FOR x IN qv]) AS mq FROM q
        |), u AS (
        |  SELECT vec_id, mq, unnest(range(1, len(qv)+1)) AS dim, unnest(qv) AS qval FROM n
        |)
        |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |  CASE WHEN mq = 0 THEN 0
        |       ELSE CAST(floor(qval*127.0 / CAST(mq AS DOUBLE) + 0.5) AS BIGINT) END AS q8,
        |  CAST(mq AS BIGINT) AS scale_q
        |FROM u ORDER BY vec_id, dim""".stripMargin,


    "emb_negatives" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, c AS cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |    FROM dots)
        |  WHERE cr = 1
        |), ranked AS (
        |  SELECT a.vec_id AS anchor_id, c.vec_id AS neg_id,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY md5(a.vec_id || ':' || c.vec_id), c.vec_id) AS rank
        |  FROM assign a JOIN assign c ON c.cell != a.cell
        |  WHERE a.vec_id < 20
        |)
        |SELECT anchor_id, CAST(rank AS BIGINT) AS rank, neg_id
        |FROM ranked WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,


    "knn_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < 20 AND b.vec_id != a.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    // clamped offset-centered buckets over the quantized squared norms
    "emb_norm_histogram" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, CAST(list_sum([x*x FOR x IN qv]) AS BIGINT) AS n2 FROM q
        |)
        |SELECT CAST(greatest(least((n2 - 999997000000) // 500000, 11), 0) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(min(n2) AS BIGINT) AS min_n2, CAST(max(n2) AS BIGINT) AS max_n2
        |FROM n GROUP BY 1 ORDER BY bucket""".stripMargin,

    // centroid, distance, median and flag all re-derived in BIGINT
    "emb_centroid_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, label, i.range AS dim, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), cent AS (
        |  SELECT label, dim, CAST(sum(x) // count(*) AS BIGINT) AS c
        |  FROM el GROUP BY 1, 2
        |), dist AS (
        |  SELECT el.vec_id AS id, el.label,
        |    CAST(sum((el.x - cent.c) * (el.x - cent.c)) AS BIGINT) AS dist2
        |  FROM el JOIN cent USING (label, dim) GROUP BY 1, 2
        |), med AS (
        |  SELECT label, CAST(quantile_cont(dist2 * 2, 0.5) AS BIGINT) AS med_x2
        |  FROM dist GROUP BY 1
        |)
        |SELECT d.id, d.label, d.dist2, m.med_x2,
        |  CAST(CASE WHEN d.dist2 * 4 > 3 * m.med_x2 THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_outlier
        |FROM dist d JOIN med m USING (label) ORDER BY d.id""".stripMargin,

    // brute top-10 from full vectors, SQ reconstruction re-derived from
    // per-dim min/max, tau over sign pairs — the matryoshka harness with
    // the compressed scoring swapped in
    "eval_sq_rank_tau" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored0 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_full
        |  FROM n a CROSS JOIN n b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id
        |), top AS (
        |  SELECT query_id, neighbor_id, cos_full FROM (
        |    SELECT query_id, neighbor_id, cos_full,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS rank
        |    FROM scored0) WHERE rank <= 10
        |), el AS (
        |  SELECT vec_id, i.range AS dim, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), st AS (
        |  SELECT dim, min(x) AS mn, max(x) AS mx FROM el GROUP BY 1
        |), rc AS (
        |  SELECT el.vec_id, el.dim,
        |    CASE WHEN st.mx = st.mn THEN st.mn
        |         ELSE st.mn + ((el.x - st.mn) * 255 // (st.mx - st.mn)) * (st.mx - st.mn) // 255
        |    END AS recon
        |  FROM el JOIN st USING (dim)
        |), rn2 AS (
        |  SELECT vec_id, CAST(sum(recon * recon) AS BIGINT) AS n2 FROM rc GROUP BY 1
        |), dots AS (
        |  SELECT t.query_id, t.neighbor_id, CAST(sum(a.recon * b.recon) AS BIGINT) AS dot
        |  FROM top t
        |  JOIN rc a ON a.vec_id = t.query_id
        |  JOIN rc b ON b.vec_id = t.neighbor_id AND b.dim = a.dim
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT t.query_id, t.neighbor_id, t.cos_full,
        |    CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(qa.n2 AS DOUBLE)) * sqrt(CAST(qb.n2 AS DOUBLE))) AS cos_sq
        |  FROM top t
        |  JOIN dots d ON d.query_id = t.query_id AND d.neighbor_id = t.neighbor_id
        |  JOIN rn2 qa ON qa.vec_id = t.query_id
        |  JOIN rn2 qb ON qb.vec_id = t.neighbor_id
        |), pairs AS (
        |  SELECT l.query_id,
        |    (CASE WHEN l.cos_full > r.cos_full THEN 1 WHEN l.cos_full < r.cos_full THEN -1 ELSE 0 END)
        |    * (CASE WHEN l.cos_sq > r.cos_sq THEN 1 WHEN l.cos_sq < r.cos_sq THEN -1 ELSE 0 END) AS sgn
        |  FROM scored l JOIN scored r
        |    ON l.query_id = r.query_id AND l.neighbor_id < r.neighbor_id
        |)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
        |     - sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS tau
        |FROM pairs GROUP BY 1 ORDER BY query_id""".stripMargin,

    // the brute oracle with the label-mismatch filter inside the join
    "emb_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id, label, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, qv,
        |    list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored AS (
        |  SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id, b.label AS neg_label,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < 20 AND b.label != a.label
        |), ranked AS (
        |  SELECT anchor_id, negative_id, neg_label, cosine,
        |    row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, negative_id) AS rank
        |  FROM scored)
        |SELECT anchor_id, rank, negative_id, neg_label, cosine FROM ranked
        |WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

    "knn_lsh" ->
      """WITH w AS (
        |  SELECT h.range AS h, d.range AS d,
        |    CASE WHEN ('0x' || substr(md5('lsh:42:' || h.range || ':' || d.range), 1, 15))::BIGINT & 1 = 1
        |         THEN 1 ELSE -1 END AS wt
        |  FROM range(0, 8) h, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), dots AS (
        |  SELECT q.vec_id, w.h, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.h
        |), sigs AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << h ELSE 0 END) AS BIGINT) AS sig
        |  FROM dots GROUP BY vec_id
        |), probes AS (
        |  SELECT vec_id, sig AS probe FROM sigs WHERE vec_id < 20
        |  UNION ALL
        |  SELECT s.vec_id, xor(s.sig, CAST(1 << h.range AS BIGINT)) AS probe
        |  FROM sigs s CROSS JOIN range(0, 8) h WHERE s.vec_id < 20
        |), cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM probes p JOIN sigs c ON c.sig = p.probe AND c.vec_id != p.vec_id
        |), scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM cand
        |  JOIN n a ON a.vec_id = cand.query_id
        |  JOIN n b ON b.vec_id = cand.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    "knn_ivf" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), cand AS (
        |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |), scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM cand
        |  JOIN n a ON a.vec_id = cand.query_id
        |  JOIN n b ON b.vec_id = cand.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    // cells via the knn_ivf weight/argmax derivation (8 cells); moments
    // per cell, then a/b/s per point with the SAME parenthesization —
    // a and b one IEEE division each, s quantized 1e-9 before the exact
    // per-cell SUM (no division on the signed sum)
    "eval_silhouette" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 8) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id,
        |    [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv,
        |    [CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT) FOR x IN embedding] AS qm
        |  FROM embeddings
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM (
        |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |    FROM dots) r WHERE cr = 1
        |), pts AS (
        |  SELECT q.vec_id, a.cell, q.qm,
        |    CAST(list_sum([x * x FOR x IN qm]) AS BIGINT) AS x2
        |  FROM q JOIN assign a ON a.vec_id = q.vec_id
        |), mom AS (
        |  SELECT cell, CAST(count(*) AS BIGINT) AS n_c, sum(x2) AS q_c FROM pts GROUP BY 1
        |), sd AS (
        |  SELECT cell, d.range AS d, sum(qm[d.range + 1]) AS s
        |  FROM pts CROSS JOIN range(0, 64) d GROUP BY 1, 2
        |), sv AS (
        |  SELECT cell, list(s ORDER BY d) AS sv FROM sd GROUP BY 1
        |), m AS (
        |  SELECT mom.cell AS mc, mom.n_c, mom.q_c, sv.sv
        |  FROM mom JOIN sv ON sv.cell = mom.cell
        |), scored AS (
        |  SELECT p.vec_id, p.cell,
        |    max(CASE WHEN p.cell = m.mc THEN
        |      m.n_c * p.x2 - 2 * CAST(list_sum([p.qm[i] * m.sv[i] FOR i IN range(1, 65)]) AS BIGINT) + m.q_c
        |      END) AS a_num,
        |    max(CASE WHEN p.cell = m.mc THEN m.n_c END) AS n_own,
        |    min(CASE WHEN p.cell != m.mc THEN
        |      CAST(m.n_c * p.x2 - 2 * CAST(list_sum([p.qm[i] * m.sv[i] FOR i IN range(1, 65)]) AS BIGINT) + m.q_c AS DOUBLE)
        |        / CAST(m.n_c AS DOUBLE) END) AS b
        |  FROM pts p CROSS JOIN m GROUP BY 1, 2
        |), sil AS (
        |  SELECT cell,
        |    CASE WHEN n_own = 1 OR b IS NULL THEN CAST(0.0 AS DOUBLE)
        |         WHEN greatest(CAST(a_num AS DOUBLE) / CAST(n_own - 1 AS DOUBLE), b) = 0.0 THEN CAST(0.0 AS DOUBLE)
        |         ELSE (b - CAST(a_num AS DOUBLE) / CAST(n_own - 1 AS DOUBLE))
        |              / greatest(CAST(a_num AS DOUBLE) / CAST(n_own - 1 AS DOUBLE), b) END AS s
        |  FROM scored
        |)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(sum(CAST(floor(s * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_s_nano
        |FROM sil GROUP BY 1 ORDER BY cell""".stripMargin,

    "eval_ivf_recall" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM n a CROSS JOIN n b
        |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id) q WHERE rank <= 10
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        CAST(list_sum([na.qv[i] * nb.qv[i] FOR i IN range(1, len(na.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, a.vec_id) AS rank
        |    FROM probes p
        |    JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |    JOIN n na ON na.vec_id = p.vec_id
        |    JOIN n nb ON nb.vec_id = a.vec_id) q WHERE rank <= 10
        |), hit AS (
        |  SELECT t.query_id, count(*) AS n_hit
        |  FROM truth t JOIN cand c ON c.query_id = t.query_id AND c.neighbor_id = t.neighbor_id
        |  GROUP BY 1
        |)
        |SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_truth,
        |  CAST(COALESCE(max(hit.n_hit), 0) AS BIGINT) AS n_hit,
        |  CAST(COALESCE(max(hit.n_hit), 0) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
        |FROM truth t LEFT JOIN hit ON hit.query_id = t.query_id
        |GROUP BY 1 ORDER BY t.query_id""".stripMargin,

    // Same truth/cand re-derivation as eval_ivf_recall; first_rank = min
    // candidate rank among true neighbors, rr = 1e6 // first_rank
    "eval_mrr" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM n a CROSS JOIN n b
        |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id) q WHERE rank <= 10
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), cand AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        CAST(list_sum([na.qv[i] * nb.qv[i] FOR i IN range(1, len(na.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, a.vec_id) AS rank
        |    FROM probes p
        |    JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |    JOIN n na ON na.vec_id = p.vec_id
        |    JOIN n nb ON nb.vec_id = a.vec_id) q WHERE rank <= 10
        |), fr AS (
        |  SELECT c.query_id, min(c.rank) AS first_rank
        |  FROM cand c JOIN truth t
        |    ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
        |  GROUP BY 1
        |), qs AS (SELECT DISTINCT query_id FROM truth)
        |SELECT qs.query_id,
        |  CAST(COALESCE(fr.first_rank, 0) AS BIGINT) AS first_rank,
        |  CASE WHEN COALESCE(fr.first_rank, 0) = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(1000000 // fr.first_rank AS BIGINT) END AS rr_micro
        |FROM qs LEFT JOIN fr USING (query_id)
        |ORDER BY qs.query_id""".stripMargin,

    // Same truth/cand re-derivation as eval_ivf_recall (ranks kept), plus
    // the literal micro discount table floor(1e6/log2(r+1)) — no log2 is
    // evaluated in either engine (Eval.NdcgWeightsMicro mirror)
    "eval_ndcg" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), truth AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM n a CROSS JOIN n b
        |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id) q WHERE rank <= 10
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), cand AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        CAST(list_sum([na.qv[i] * nb.qv[i] FOR i IN range(1, len(na.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, a.vec_id) AS rank
        |    FROM probes p
        |    JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |    JOIN n na ON na.vec_id = p.vec_id
        |    JOIN n nb ON nb.vec_id = a.vec_id) q WHERE rank <= 10
        |), wt(r, wm) AS (
        |  VALUES (1, 1000000), (2, 630929), (3, 500000), (4, 430676), (5, 386852),
        |         (6, 356207), (7, 333333), (8, 315464), (9, 301029), (10, 289064)
        |), grades AS (
        |  SELECT query_id, neighbor_id, 11 - rank AS g FROM truth
        |), dcg AS (
        |  SELECT c.query_id, CAST(sum(COALESCE(g.g, 0) * wt.wm) AS BIGINT) AS dcg_micro
        |  FROM cand c
        |  JOIN wt ON wt.r = c.rank
        |  LEFT JOIN grades g ON g.query_id = c.query_id AND g.neighbor_id = c.neighbor_id
        |  GROUP BY 1
        |), ideal AS (
        |  SELECT query_id, g, row_number() OVER (
        |    PARTITION BY query_id ORDER BY g DESC, neighbor_id) AS p
        |  FROM grades
        |), idcg AS (
        |  SELECT query_id, CAST(sum(g * wt.wm) AS BIGINT) AS idcg_micro
        |  FROM ideal JOIN wt ON wt.r = ideal.p WHERE p <= 10 GROUP BY 1
        |)
        |SELECT i.query_id, COALESCE(d.dcg_micro, CAST(0 AS BIGINT)) AS dcg_micro,
        |  i.idcg_micro,
        |  CASE WHEN i.idcg_micro = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(COALESCE(d.dcg_micro, 0) * 1000000 // i.idcg_micro AS BIGINT) END AS ndcg_micro
        |FROM idcg i LEFT JOIN dcg d USING (query_id)
        |ORDER BY i.query_id""".stripMargin,


    "eval_rp_rank_tau" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored0 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_full
        |  FROM n a CROSS JOIN n b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id
        |), top AS (
        |  SELECT query_id, neighbor_id, cos_full FROM (
        |    SELECT query_id, neighbor_id, cos_full,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS rank
        |    FROM scored0) WHERE rank <= 10
        |), w AS (
        |  SELECT j.range AS j, d.range AS d,
        |    CASE WHEN ('0x' || substr(md5('lsh:42:' || j.range || ':' || d.range), 1, 15))::BIGINT & 1 = 1
        |         THEN 1 ELSE -1 END AS wt
        |  FROM range(0, 16) j, range(0, 64) d
        |), rq AS (
        |  SELECT q.vec_id, w.j, CAST(sum(w.wt * q.qv[w.d + 1]) AS BIGINT) AS y
        |  FROM q CROSS JOIN w GROUP BY 1, 2
        |), rn AS (
        |  SELECT vec_id, CAST(sum(y * y) AS BIGINT) AS rn2 FROM rq GROUP BY 1
        |), rdot AS (
        |  SELECT t.query_id, t.neighbor_id, t.cos_full,
        |    CAST(sum(qa.y * qb.y) AS BIGINT) AS dt
        |  FROM top t
        |  JOIN rq qa ON qa.vec_id = t.query_id
        |  JOIN rq qb ON qb.vec_id = t.neighbor_id AND qb.j = qa.j
        |  GROUP BY 1, 2, 3
        |), scored AS (
        |  SELECT r.query_id, r.neighbor_id, r.cos_full,
        |    CAST(r.dt AS DOUBLE) / (sqrt(CAST(na.rn2 AS DOUBLE)) * sqrt(CAST(nb.rn2 AS DOUBLE))) AS cos_rp
        |  FROM rdot r
        |  JOIN rn na ON na.vec_id = r.query_id
        |  JOIN rn nb ON nb.vec_id = r.neighbor_id
        |), pairs AS (
        |  SELECT l.query_id,
        |    (CASE WHEN l.cos_full > r.cos_full THEN 1 WHEN l.cos_full < r.cos_full THEN -1 ELSE 0 END)
        |    * (CASE WHEN l.cos_rp > r.cos_rp THEN 1 WHEN l.cos_rp < r.cos_rp THEN -1 ELSE 0 END) AS sgn
        |  FROM scored l JOIN scored r
        |    ON l.query_id = r.query_id AND l.neighbor_id < r.neighbor_id
        |)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
        |     - sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS tau
        |FROM pairs GROUP BY 1 ORDER BY query_id""".stripMargin,


    // prefix-truncation twin of eval_rp_rank_tau: same top-10 base, the
    // cheap scoring is cosine over the first 16 quantized dims
    "eval_matryoshka_tau" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored0 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_full
        |  FROM n a CROSS JOIN n b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id
        |), top AS (
        |  SELECT query_id, neighbor_id, cos_full FROM (
        |    SELECT query_id, neighbor_id, cos_full,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS rank
        |    FROM scored0) WHERE rank <= 10
        |), pn AS (
        |  SELECT vec_id, qv[1:16] AS pq,
        |    list_sum([x*x FOR x IN qv[1:16]]) AS pn2
        |  FROM q
        |), scored AS (
        |  SELECT t.query_id, t.neighbor_id, t.cos_full,
        |    CAST(list_sum([a.pq[i] * b.pq[i] FOR i IN range(1, len(a.pq) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.pn2 AS DOUBLE)) * sqrt(CAST(b.pn2 AS DOUBLE))) AS cos_pre
        |  FROM top t
        |  JOIN pn a ON a.vec_id = t.query_id
        |  JOIN pn b ON b.vec_id = t.neighbor_id
        |), pairs AS (
        |  SELECT l.query_id,
        |    (CASE WHEN l.cos_full > r.cos_full THEN 1 WHEN l.cos_full < r.cos_full THEN -1 ELSE 0 END)
        |    * (CASE WHEN l.cos_pre > r.cos_pre THEN 1 WHEN l.cos_pre < r.cos_pre THEN -1 ELSE 0 END) AS sgn
        |  FROM scored l JOIN scored r
        |    ON l.query_id = r.query_id AND l.neighbor_id < r.neighbor_id
        |)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
        |     - sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS tau
        |FROM pairs GROUP BY 1 ORDER BY query_id""".stripMargin,


    "knn_pq" ->
      """WITH w0 AS (
        |  SELECT m.range AS m, c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('pq:42:' || m.range || ':' || c.range || ':' || d.range), 1, 15))::BIGINT % 250001 - 125000 AS wt
        |  FROM range(0, 8) m, range(0, 16) c, range(0, 8) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), sdist0 AS (
        |  SELECT q.vec_id, w0.m, w0.c,
        |    CAST(sum((q.qv[w0.m*8 + w0.d + 1] - w0.wt) * (q.qv[w0.m*8 + w0.d + 1] - w0.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN w0 GROUP BY 1, 2, 3
        |), codes0 AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist0) WHERE rn = 1
        |), trained AS (
        |  SELECT co.m, co.code AS c, d.range AS d,
        |    CAST(sum(q.qv[co.m*8 + d.range + 1]) AS BIGINT) // count(*) AS wt
        |  FROM codes0 co JOIN q USING (vec_id) CROSS JOIN range(0, 8) d
        |  GROUP BY 1, 2, 3
        |), books AS (
        |  SELECT w0.m, w0.c, w0.d, COALESCE(t.wt, w0.wt) AS wt
        |  FROM w0 LEFT JOIN trained t ON t.m = w0.m AND t.c = w0.c AND t.d = w0.d
        |), sdist AS (
        |  SELECT q.vec_id, b.m, b.c,
        |    CAST(sum((q.qv[b.m*8 + b.d + 1] - b.wt) * (q.qv[b.m*8 + b.d + 1] - b.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN books b GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist) WHERE rn = 1
        |), adist AS (
        |  SELECT qd.vec_id AS query_id, co.vec_id AS neighbor_id, CAST(sum(qd.dist) AS BIGINT) AS ad
        |  FROM codes co JOIN sdist qd ON qd.m = co.m AND qd.c = co.code
        |  WHERE qd.vec_id < 20 AND qd.vec_id != co.vec_id
        |  GROUP BY 1, 2
        |), short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY ad, neighbor_id) AS arank
        |    FROM adist) WHERE arank <= 40
        |), scored AS (
        |  SELECT short.query_id, short.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM short
        |  JOIN n a ON a.vec_id = short.query_id
        |  JOIN n b ON b.vec_id = short.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    "knn_ivfpq" ->
      """WITH cw AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), dots AS (
        |  SELECT q.vec_id, cw.c, sum(cw.wt * q.qv[cw.d + 1]) AS dot
        |  FROM q CROSS JOIN cw GROUP BY q.vec_id, cw.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), w0 AS (
        |  SELECT m.range AS m, c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('pq:42:' || m.range || ':' || c.range || ':' || d.range), 1, 15))::BIGINT % 250001 - 125000 AS wt
        |  FROM range(0, 8) m, range(0, 16) c, range(0, 8) d
        |), sdist0 AS (
        |  SELECT q.vec_id, w0.m, w0.c,
        |    CAST(sum((q.qv[w0.m*8 + w0.d + 1] - w0.wt) * (q.qv[w0.m*8 + w0.d + 1] - w0.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN w0 GROUP BY 1, 2, 3
        |), codes0 AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist0) WHERE rn = 1
        |), trained AS (
        |  SELECT co.m, co.code AS c, d.range AS d,
        |    CAST(sum(q.qv[co.m*8 + d.range + 1]) AS BIGINT) // count(*) AS wt
        |  FROM codes0 co JOIN q USING (vec_id) CROSS JOIN range(0, 8) d
        |  GROUP BY 1, 2, 3
        |), books AS (
        |  SELECT w0.m, w0.c, w0.d, COALESCE(t.wt, w0.wt) AS wt
        |  FROM w0 LEFT JOIN trained t ON t.m = w0.m AND t.c = w0.c AND t.d = w0.d
        |), sdist AS (
        |  SELECT q.vec_id, b.m, b.c,
        |    CAST(sum((q.qv[b.m*8 + b.d + 1] - b.wt) * (q.qv[b.m*8 + b.d + 1] - b.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN books b GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist) WHERE rn = 1
        |), adist AS (
        |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id, CAST(sum(qd.dist) AS BIGINT) AS ad
        |  FROM probes p
        |  JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |  JOIN codes co ON co.vec_id = a.vec_id
        |  JOIN sdist qd ON qd.vec_id = p.vec_id AND qd.m = co.m AND qd.c = co.code
        |  GROUP BY 1, 2
        |), short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY ad, neighbor_id) AS arank
        |    FROM adist) WHERE arank <= 40
        |), scored AS (
        |  SELECT short.query_id, short.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM short
        |  JOIN n a ON a.vec_id = short.query_id
        |  JOIN n b ON b.vec_id = short.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    "emb_meanpool" ->
      """WITH q AS (
        |  SELECT vec_id // 10 AS grp,
        |    [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), e AS (
        |  SELECT grp, d.range AS pos, qv[d.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) d
        |)
        |SELECT grp, CAST(pos + 1 AS BIGINT) AS dim,
        |  CAST(sum(x) AS BIGINT) // count(*) AS pooled
        |FROM e GROUP BY 1, 2 ORDER BY grp, dim""".stripMargin,


    "emb_rp_project" ->
      """WITH w AS (
        |  SELECT j.range AS j, d.range AS d,
        |    CASE WHEN ('0x' || substr(md5('lsh:42:' || j.range || ':' || d.range), 1, 15))::BIGINT & 1 = 1
        |         THEN 1 ELSE -1 END AS wt
        |  FROM range(0, 16) j, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |)
        |SELECT q.vec_id, CAST(w.j + 1 AS BIGINT) AS dim,
        |  CAST(sum(w.wt * q.qv[w.d + 1]) AS BIGINT) AS y
        |FROM q CROSS JOIN w GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin,


    // one Lloyd refinement step: initial cells from the md5 centroids (same
    // CTEs as knn_ivf), new centroids = per-(cell, dim) truncating integer
    // mean, re-assignment by max dot (ties to the smaller cell id)
    "emb_kmeans_refine" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), dots0 AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY 1, 2
        |), a0 AS (
        |  SELECT vec_id, c AS cell0 FROM (
        |    SELECT vec_id, c,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
        |    FROM dots0) WHERE rn = 1
        |), cent AS (
        |  SELECT a0.cell0 AS cell, d.range AS d,
        |    CAST(sum(q.qv[d.range + 1]) AS BIGINT) // count(*) AS wt
        |  FROM q JOIN a0 USING (vec_id) CROSS JOIN range(0, 64) d
        |  GROUP BY 1, 2
        |), dots1 AS (
        |  SELECT q.vec_id, cent.cell AS c, sum(cent.wt * q.qv[cent.d + 1]) AS dot
        |  FROM q CROSS JOIN cent GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, c AS cell1 FROM (
        |    SELECT vec_id, c,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
        |    FROM dots1) WHERE rn = 1
        |)
        |SELECT a0.vec_id, CAST(a0.cell0 AS BIGINT) AS cell_init,
        |  CAST(a1.cell1 AS BIGINT) AS cell_refined
        |FROM a0 JOIN a1 USING (vec_id) ORDER BY vec_id""".stripMargin,


    // sign-bit packing re-derived: per-dim truncating integer means, bits
    // from strict > comparisons, words as Σ b·2^(d mod 32) (DuckDB << on
    // BIGINT == Spark shiftleft — r10 precedent)
    "emb_binary_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, i.range AS d, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), m AS (
        |  SELECT d, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
        |  FROM el GROUP BY 1
        |), b AS (
        |  SELECT el.vec_id, el.d, CASE WHEN el.x > m.m THEN 1 ELSE 0 END AS b
        |  FROM el JOIN m USING (d)
        |)
        |SELECT vec_id AS id,
        |  CAST(sum(CASE WHEN d < 32 THEN b * (CAST(1 AS BIGINT) << CAST(d AS INT)) ELSE 0 END) AS BIGINT) AS word_lo,
        |  CAST(sum(CASE WHEN d >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(d - 32 AS INT)) ELSE 0 END) AS BIGINT) AS word_hi,
        |  CAST(sum(b) AS BIGINT) AS bits_set
        |FROM b GROUP BY 1 ORDER BY id""".stripMargin,


    // tau between exact cosine and negated Hamming over the brute top-10:
    // the top/tau scaffolding of eval_matryoshka_tau around the
    // emb_binary_quantize bit derivation (bit_count/xor cross-engine exact)
    "eval_bq_rank_tau" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored0 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_full
        |  FROM n a CROSS JOIN n b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id
        |), top AS (
        |  SELECT query_id, neighbor_id, cos_full FROM (
        |    SELECT query_id, neighbor_id, cos_full,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS rank
        |    FROM scored0) WHERE rank <= 10
        |), el AS (
        |  SELECT vec_id, i.range AS d, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), m AS (
        |  SELECT d, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
        |  FROM el GROUP BY 1
        |), bb AS (
        |  SELECT el.vec_id, el.d, CASE WHEN el.x > m.m THEN 1 ELSE 0 END AS b
        |  FROM el JOIN m USING (d)
        |), words AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN d < 32 THEN b * (CAST(1 AS BIGINT) << CAST(d AS INT)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN d >= 32 THEN b * (CAST(1 AS BIGINT) << CAST(d - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM bb GROUP BY 1
        |), scored AS (
        |  SELECT t.query_id, t.neighbor_id, t.cos_full,
        |    -CAST(bit_count(xor(wq.lo, wn.lo)) + bit_count(xor(wq.hi, wn.hi)) AS DOUBLE) AS neg_hamming
        |  FROM top t
        |  JOIN words wq ON wq.vec_id = t.query_id
        |  JOIN words wn ON wn.vec_id = t.neighbor_id
        |), pairs AS (
        |  SELECT l.query_id,
        |    (CASE WHEN l.cos_full > r.cos_full THEN 1 WHEN l.cos_full < r.cos_full THEN -1 ELSE 0 END)
        |    * (CASE WHEN l.neg_hamming > r.neg_hamming THEN 1 WHEN l.neg_hamming < r.neg_hamming THEN -1 ELSE 0 END) AS sgn
        |  FROM scored l JOIN scored r
        |    ON l.query_id = r.query_id AND l.neighbor_id < r.neighbor_id
        |)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
        |     - sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS tau
        |FROM pairs GROUP BY 1 ORDER BY query_id""".stripMargin,


    // Same truth/cand re-derivation as eval_mrr; AP terms are integer
    // hits_so_far·1e6 // rank over the relevant candidate positions
    "eval_map" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM n a CROSS JOIN n b
        |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id) q WHERE rank <= 10
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), cand AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        CAST(list_sum([na.qv[i] * nb.qv[i] FOR i IN range(1, len(na.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, a.vec_id) AS rank
        |    FROM probes p
        |    JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |    JOIN n na ON na.vec_id = p.vec_id
        |    JOIN n nb ON nb.vec_id = a.vec_id) q WHERE rank <= 10
        |), hits AS (
        |  SELECT c.query_id, c.rank
        |  FROM cand c JOIN truth t
        |    ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
        |), terms AS (
        |  SELECT query_id,
        |    count(*) OVER (PARTITION BY query_id ORDER BY rank) * 1000000 // rank AS term
        |  FROM hits
        |), perq AS (
        |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
        |    CAST(sum(term) AS BIGINT) AS ap_sum_micro
        |  FROM terms GROUP BY 1
        |), nt AS (
        |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY 1
        |)
        |SELECT nt.query_id, nt.n_truth,
        |  COALESCE(p.n_hits, CAST(0 AS BIGINT)) AS n_hits,
        |  COALESCE(p.ap_sum_micro, CAST(0 AS BIGINT)) AS ap_sum_micro,
        |  CAST(COALESCE(p.ap_sum_micro, 0) // least(nt.n_truth, 10) AS BIGINT) AS ap_micro
        |FROM nt LEFT JOIN perq p USING (query_id)
        |ORDER BY nt.query_id""".stripMargin,


    // completion dim = floor(sqrt(m2 - n2)) against the corpus max norm
    "emb_mips_transform" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, CAST(list_sum([x*x FOR x IN qv]) AS BIGINT) AS n2 FROM q
        |), m AS (SELECT max(n2) AS m2 FROM n),
        |base AS (
        |  SELECT vec_id, unnest(range(1, len(qv) + 1)) AS dim, unnest(qv) AS v FROM n
        |), extra AS (
        |  SELECT vec_id, len(qv) + 1 AS dim,
        |    CAST(floor(sqrt(CAST((SELECT m2 FROM m) - n2 AS DOUBLE))) AS BIGINT) AS v
        |  FROM n
        |)
        |SELECT vec_id, CAST(dim AS BIGINT) AS dim, CAST(v AS BIGINT) AS v
        |FROM (SELECT * FROM base UNION ALL SELECT * FROM extra) u
        |ORDER BY vec_id, dim""".stripMargin,


    // two SQ stages over (value, then residual) ranges; residuals are
    // non-negative because truncating recon never overshoots
    "emb_residual_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, i.range AS pos, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), s1 AS (
        |  SELECT pos, CAST(min(x) AS BIGINT) AS mn1, CAST(max(x) AS BIGINT) AS mx1
        |  FROM el GROUP BY 1
        |), q1 AS (
        |  SELECT el.vec_id, el.pos, el.x, s1.mn1, s1.mx1,
        |    CASE WHEN s1.mx1 = s1.mn1 THEN 0
        |         ELSE (el.x - s1.mn1) * 255 // (s1.mx1 - s1.mn1) END AS code1
        |  FROM el JOIN s1 USING (pos)
        |), q1b AS (
        |  SELECT *, mn1 + code1 * (mx1 - mn1) // 255 AS recon1 FROM q1
        |), q1c AS (SELECT *, x - recon1 AS r FROM q1b),
        |s2 AS (
        |  SELECT pos, CAST(min(r) AS BIGINT) AS mn2, CAST(max(r) AS BIGINT) AS mx2
        |  FROM q1c GROUP BY 1
        |), q2 AS (
        |  SELECT q1c.*, s2.mn2, s2.mx2,
        |    CASE WHEN s2.mx2 = s2.mn2 THEN 0
        |         ELSE (q1c.r - s2.mn2) * 255 // (s2.mx2 - s2.mn2) END AS code2
        |  FROM q1c JOIN s2 USING (pos)
        |), q2b AS (
        |  SELECT *, mn2 + code2 * (mx2 - mn2) // 255 AS recon2 FROM q2
        |)
        |SELECT vec_id, CAST(pos + 1 AS BIGINT) AS dim,
        |  CAST(code1 AS BIGINT) AS code1, CAST(code2 AS BIGINT) AS code2,
        |  CAST(recon1 + recon2 AS BIGINT) AS recon,
        |  CAST(x - recon1 - recon2 AS BIGINT) AS err
        |FROM q2b ORDER BY vec_id, dim""".stripMargin,


    // eval_calibration's bins rolled up: ece = sum(n * gap) // N
    "eval_ece" ->
      """WITH s AS (
        |  SELECT ('0x' || substr(md5('50:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
        |           % 1000001 AS p,
        |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y
        |  FROM embeddings
        |), b AS (
        |  SELECT least(9, p * 10 // 1000000) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(p) AS BIGINT) AS sp
        |  FROM s GROUP BY 1
        |), g AS (
        |  SELECT n,
        |    abs(sp // n - ((n_pos // n) * 1000000 + (n_pos % n) * 1000000 // n)) AS gap
        |  FROM b
        |)
        |SELECT CAST(sum(n) AS BIGINT) AS n_total,
        |  CAST(CAST(sum(n * gap) AS BIGINT) // CAST(sum(n) AS BIGINT) AS BIGINT) AS ece_micro
        |FROM g""".stripMargin,


    // brute top-5 re-derivation + majority vote with the (count desc,
    // label asc) argmin-struct tie-break
    "eval_knn_label_acc" ->
      """WITH q AS (
        |  SELECT vec_id, label, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, label, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), top AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM n a CROSS JOIN n b
        |    WHERE a.vec_id < 50 AND a.vec_id != b.vec_id) s WHERE rank <= 5
        |), votes AS (
        |  SELECT t.query_id, CAST(nb.label AS BIGINT) AS l, count(*) AS c
        |  FROM top t JOIN n nb ON nb.vec_id = t.neighbor_id
        |  GROUP BY 1, 2
        |), pred AS (
        |  SELECT query_id, l AS pred_label FROM (
        |    SELECT query_id, l, row_number() OVER (
        |      PARTITION BY query_id ORDER BY c DESC, l ASC) AS rk
        |    FROM votes) v WHERE rk = 1
        |)
        |SELECT p.query_id, CAST(qq.label AS BIGINT) AS true_label, p.pred_label,
        |  CAST(CASE WHEN p.pred_label = CAST(qq.label AS BIGINT) THEN 1 ELSE 0 END AS BIGINT) AS correct
        |FROM pred p JOIN q qq ON qq.vec_id = p.query_id
        |ORDER BY p.query_id""".stripMargin,


    // two emb_covariance re-derivations (label parity populations), each
    // numerator divided by its own n(n-1), joined and diffed; total order
    // incl. the i,j tie-break makes the top-50 cut deterministic
    "drift_cov_shift" ->
      """WITH qa AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings WHERE label % 2 = 0
        |), ela AS (
        |  SELECT vec_id, i.range AS i, qv[i.range + 1] AS x
        |  FROM qa CROSS JOIN range(0, 64) i
        |), na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qa),
        |ma AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM ela GROUP BY 1),
        |pa AS (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS s_ij
        |  FROM ela a JOIN ela b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2
        |), ca AS (
        |  SELECT p.i, p.j,
        |    CAST(((SELECT n FROM na) * p.s_ij - m1.s * m2.s)
        |      // ((SELECT n FROM na) * ((SELECT n FROM na) - 1)) AS BIGINT) AS cov_ref
        |  FROM pa p JOIN ma m1 ON m1.i = p.i JOIN ma m2 ON m2.i = p.j
        |), qb AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings WHERE label % 2 = 1
        |), elb AS (
        |  SELECT vec_id, i.range AS i, qv[i.range + 1] AS x
        |  FROM qb CROSS JOIN range(0, 64) i
        |), nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qb),
        |mb AS (SELECT i, CAST(sum(x) AS BIGINT) AS s FROM elb GROUP BY 1),
        |pb AS (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS s_ij
        |  FROM elb a JOIN elb b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2
        |), cb AS (
        |  SELECT p.i, p.j,
        |    CAST(((SELECT n FROM nb) * p.s_ij - m1.s * m2.s)
        |      // ((SELECT n FROM nb) * ((SELECT n FROM nb) - 1)) AS BIGINT) AS cov_cur
        |  FROM pb p JOIN mb m1 ON m1.i = p.i JOIN mb m2 ON m2.i = p.j
        |)
        |SELECT CAST(ca.i AS BIGINT) AS i, CAST(ca.j AS BIGINT) AS j,
        |  ca.cov_ref, cb.cov_cur, abs(ca.cov_ref - cb.cov_cur) AS shift
        |FROM ca JOIN cb ON cb.i = ca.i AND cb.j = ca.j
        |ORDER BY shift DESC, i, j LIMIT 50""".stripMargin)
}
