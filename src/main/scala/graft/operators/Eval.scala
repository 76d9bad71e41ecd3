package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval/ranking evaluation operators — the harness that answers "how
  * faithful is the cheap ranking to the expensive one" when a pipeline
  * swaps brute-force scoring for a compressed or projected variant.
  */
object Eval {

  /** Per-query recall@k of a candidate top-k list against a truth top-k
    * list: |truth ∩ candidate| / |truth| — the completeness complement to
    * [[kendallTau]]'s ordering fidelity (an ANN can find the right
    * neighbors in the wrong order, or rank perfectly over the wrong
    * candidates; monitoring needs both numbers). One equi-join on
    * (query, item) + one count per side — fanout bounded by k·queries.
    * Queries absent from `candidate` report recall 0 rather than
    * disappearing. */
  def recallAtK(
      truth: DataFrame, candidate: DataFrame,
      qCol: String, itemCol: String): DataFrame = {
    val t = truth.select(col(qCol).as("query_id"), col(itemCol).as("i"))
    val c = candidate.select(col(qCol).as("query_id"), col(itemCol).as("i"))
    val hit = t.join(c, Seq("query_id", "i"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    t.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
      .join(hit, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_truth").cast("double"))
  }

  /** Per-query Kendall tau-a between two score columns over the same item
    * set: every unordered item pair contributes +1 (both scores order it
    * the same way), −1 (opposite), or 0 (a tie in either score);
    * tau = (concordant − discordant) / n_pairs. All counting is exact
    * integers over sign comparisons of bit-identical doubles, so the
    * metric itself is oracle-checkable — an eval number you can trust
    * across engines.
    *
    * Shape: one self equi-join on the query key with `item < item` — the
    * fanout is Σ per-query k², bounded by the top-k lists being compared,
    * never the corpus. */
  def kendallTau(
      scored: DataFrame, qCol: String, itemCol: String,
      scoreA: String, scoreB: String): DataFrame = {
    val l = scored.select(col(qCol).as("q"), col(itemCol).as("i"),
      col(scoreA).as("a"), col(scoreB).as("b"))
    val r = scored.select(col(qCol).as("q2"), col(itemCol).as("i2"),
      col(scoreA).as("a2"), col(scoreB).as("b2"))
    l.join(r, col("q") === col("q2") && col("i") < col("i2"))
      .select(col("q").as("query_id"),
        (signum(col("a") - col("a2")) * signum(col("b") - col("b2"))).as("sgn"))
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("sgn") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("sgn") < 0, 1L).otherwise(0L)).as("discordant"))
      .withColumn("tau",
        (col("concordant") - col("discordant")).cast("double")
          / col("n_pairs").cast("double"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR'09) of two per-query
    * rankings — the standard hybrid-retrieval combiner (BM25 ⊕ dense, full
    * ⊕ compressed): each list contributes `1/(k + rank)` for the items it
    * holds, fused score = the sum, re-ranked. Here the contribution is the
    * INTEGER `10¹² div (k + rank)`, so the fused score is an order-free
    * integer sum — ties broken by item id — and the fused ranking is
    * bit-identical across engines.
    *
    * Shape: one full-outer equi-join on (query, item) — candidate lists,
    * never the corpus — and a window over ≤ |A|+|B| rows per query.
    * Items missing from a list contribute nothing (coalesce 0), the
    * defined RRF behavior. */
  def rrfFuse(a: DataFrame, b: DataFrame,
      qCol: String, itemCol: String, rankCol: String,
      kConst: Long = 60L, topK: Int = 10): DataFrame = {
    require(kConst >= 1 && topK >= 1, "kConst and topK must be positive")
    val l = a.select(col(qCol).as("query_id"), col(itemCol).as("item"),
      col(rankCol).cast("long").as("ra"))
    val r = b.select(col(qCol).as("query_id"), col(itemCol).as("item"),
      col(rankCol).cast("long").as("rb"))
    val fused = l.join(r, Seq("query_id", "item"), "full_outer")
      .select(col("query_id"), col("item"),
        (coalesce(expr(s"1000000000000 div ($kConst + ra)"), lit(0L))
          + coalesce(expr(s"1000000000000 div ($kConst + rb)"), lit(0L))).as("rrf_scaled"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_scaled").desc, col("item").asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
      .select(col("query_id"), col("fused_rank"), col("item"), col("rrf_scaled"))
  }

  /** Calibration audit (reliability bins) for a probabilistic scorer —
    * the "is the quality classifier's 0.9 actually a 90%?" check run
    * before trusting model scores as curation thresholds. Scores arrive in
    * micro-probability units [0, 1e6] and bucket into `bins` equal bins;
    * per bin: count, mean predicted micro-probability (integer mean — the
    * score sum is bounded by n·10⁶, stated bound n < 9.2e12 per bin), the
    * positive rate ×10⁶ via the decomposed product (exact at any n — the
    * r11 overflow lesson), and the absolute calibration gap. Expected
    * calibration error derives as Σ n_b·gap_b / N from the output.
    * One map-side-combined aggregation; output is bin-domain-sized. */
  def calibration(df: DataFrame, scoreMicro: Column, positive: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least two bins")
    df.select(scoreMicro.cast("long").as("p"), positive.cast("long").as("y"))
      // clamp p ITSELF first (the r7 PSI negative-clamp precedent, plus
      // the r11 advice: clamping the derived bin is not enough — a score
      // beyond Long.Max/bins overflows `p * bins` BEFORE the bin clamp
      // sees it). A clamped p ∈ [0, 1e6] makes the product overflow-free
      // and the bin non-negative by construction.
      .withColumn("bin",
        least(lit(bins.toLong - 1),
          expr(s"greatest(0L, least(1000000L, p)) * $bins div 1000000")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"), sum(col("y")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("sp div n").as("mean_pred_micro"),
        expr("(n_pos div n) * 1000000 + ((n_pos % n) * 1000000) div n")
          .as("pos_rate_micro"))
      .withColumn("gap_micro", abs(col("mean_pred_micro") - col("pos_rate_micro")))
  }

  /** Brier score — the mean-squared-error companion of [[calibration]]'s
    * binned gaps (ECE can hide compensating errors inside a bin; the Brier
    * score can't): each squared error (p − y·10⁶)² is quantized by a
    * truncating div 10⁶ BEFORE the order-free integer sum (the PSI
    * pattern), bounding terms at 10⁶ so the sum is exact to ~9.2e12 rows;
    * the single final division is IEEE-exact on identical operands.
    * Scores clamp into [0, 10⁶] micro-probabilities like [[calibration]].
    * Returns ONE row (n, sse_q, brier) with brier = sse_q/(n·10⁶). */
  def brierScore(df: DataFrame, scoreMicro: Column, positive: Column): DataFrame =
    df.select(
        greatest(lit(0L), least(lit(1000000L), scoreMicro.cast("long"))).as("p"),
        positive.cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(expr("(p - y * 1000000) * (p - y * 1000000) div 1000000")).as("sse_q"))
      .select(col("n"), col("sse_q"),
        (col("sse_q").cast("double") /
          (col("n").cast("double") * 1000000.0d)).as("brier"))

  /** Per-query reciprocal rank of the FIRST relevant candidate (MRR's
    * per-query term, micro-scaled): rr = 10⁶ div rank_of_first_hit — the
    * "how fast does the user hit something relevant" number, the companion
    * of [[recallAtK]] (how much) and [[ndcgAtK]] (how well ordered).
    * Relevance = membership in the truth list; integer division keeps it
    * cross-engine exact. Queries in `truth` whose candidate list has no
    * relevant item (or is absent) report first_rank 0 / rr 0 — never
    * dropped. Shape: one left-semi equi-join bounded by k·queries + one
    * min per query. */
  def mrrAtK(truth: DataFrame, candidate: DataFrame, qCol: String,
      itemCol: String, rankCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be positive")
    val t = truth.select(col(qCol).as("query_id"), col(itemCol).as("i"))
    val c = candidate.filter(col(rankCol) <= k)
      .select(col(qCol).as("query_id"), col(itemCol).as("i"),
        col(rankCol).cast("long").as("r"))
    val first = c.join(t, Seq("query_id", "i"), "left_semi")
      .groupBy(col("query_id")).agg(min(col("r")).as("first_rank"))
    t.select(col("query_id")).distinct()
      .join(first, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("first_rank"), lit(0L)).as("first_rank"))
      .withColumn("rr_micro",
        when(col("first_rank") === 0L, lit(0L))
          .otherwise(expr("1000000 div first_rank")))
  }

  /** Exact tie-aware ROC AUC of a score column against a 0/1 label — the
    * "can this score rank positives above negatives at all" gate run before
    * any score becomes a curation threshold (the discrimination complement
    * to [[calibration]]'s honesty check). AUC is the Mann–Whitney
    * statistic: over all positive×negative pairs, (concordant + ties/2) /
    * (n_pos·n_neg). No pair is ever materialized — scores aggregate to the
    * DISTINCT-VALUE relation (per score: positive and negative counts), a
    * cumulative window over that relation counts negatives strictly below
    * each score, and `conc2 = Σ np·(2·cumneg + nn)` carries 2·concordant +
    * ties exactly. The scores themselves are only COMPARED, never
    * accumulated, so doubles are safe (bit-identical comparisons).
    *
    * Shape: one map-side-combined aggregation to the distinct-score
    * relation, then a single-partition cumulative window over it — bounded
    * by the VALUE DOMAIN, not the corpus (the [[Drift.ksDistance]] scale
    * argument verbatim). Overflow: conc2 ≤ 2·n_pos·n_neg, and auc_micro
    * uses the exact nonneg decomposition, so the only bound is
    * 2·n_pos·n_neg fitting a BIGINT (~2·10⁹ of each per evaluated slice).
    * The label must be 0/1 — anything else raises at execution
    * (plan-embedded, the scd2 precedent), because a stray 2 would silently
    * skew every count. */
  def aucExact(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val y0 = positive.cast("long")
    val y = when(y0.isNull || (y0 =!= 0L && y0 =!= 1L),
      raise_error(concat(lit("aucExact: positive column must be 0/1, got "),
        coalesce(y0.cast("string"), lit("NULL"))))).otherwise(y0)
    // a NULL score has no rank, and worse, the two engines ORDER nulls
    // differently (Spark first, DuckDB last) — silently accepting one
    // breaks the bit-identical contract, so refuse as loudly as a bad label
    val s = when(score.isNull,
      raise_error(lit("aucExact: NULL score has no rank — filter or impute first")))
      .otherwise(score)
    val g = df.select(s.as("s"), y.as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("np"), (count(lit(1)) - sum(col("y"))).as("nn"))
    val w = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumneg", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cumneg") + col("nn"))).as("conc2"))
      .select(col("n_pos"), col("n_neg"), col("conc2"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(0 AS BIGINT)
                ELSE (conc2 div (2 * n_pos * n_neg)) * 1000000
                     + ((conc2 % (2 * n_pos * n_neg)) * 1000000) div (2 * n_pos * n_neg)
                END""").as("auc_micro"))
  }

  /** Per-class precision/recall/F1 from (actual, predicted) label pairs —
    * the confusion-matrix audit for any categorical predictor this library
    * hosts (lang-id vs ground truth, quality band vs human label, …).
    * Counting needs only the two per-class marginals (n_actual with its
    * true-positive count; n_pred with the same), full-outer-joined so a
    * class that appears only in predictions (all false positives) or only
    * in truth (all misses) still reports. All three metrics are integer
    * per-mille via truncating division; F1 uses the division-free identity
    * f1 = 2·tp / (2·tp + fp + fn), so no nested rounding. NULL labels
    * bucket as the literal "(null)" class rather than vanishing into a
    * never-matching join key.
    *
    * Shape: two map-side-combined aggregations to the CLASS domain + one
    * tiny full-outer join — corpus touched twice at scan speed, output
    * class-domain-sized. */
  def classMetrics(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val p = df.select(
      coalesce(actual.cast("string"), lit("(null)")).as("a"),
      coalesce(predicted.cast("string"), lit("(null)")).as("pr"))
    val hit = when(col("a") === col("pr"), 1L).otherwise(0L)
    val byA = p.groupBy(col("a").as("cls"))
      .agg(count(lit(1)).as("n_actual"), sum(hit).as("tp_a"))
    val byP = p.groupBy(col("pr").as("cls"))
      .agg(count(lit(1)).as("n_pred"), sum(hit).as("tp_p"))
    byA.join(byP, Seq("cls"), "full_outer")
      .select(col("cls"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        // tp(c) = #(a = c ∧ pr = c) — identical from either marginal, so
        // whichever side survived the outer join carries it
        coalesce(col("tp_a"), col("tp_p"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_actual") - col("tp"))
      .withColumn("precision_milli",
        expr("CASE WHEN n_pred = 0 THEN CAST(0 AS BIGINT) ELSE tp * 1000 div n_pred END"))
      .withColumn("recall_milli",
        expr("CASE WHEN n_actual = 0 THEN CAST(0 AS BIGINT) ELSE tp * 1000 div n_actual END"))
      .withColumn("f1_milli",
        expr("""CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
                ELSE 2 * tp * 1000 div (2 * tp + fp + fn) END"""))
  }

  /** Per-query average precision@k (MAP's per-query term, micro-scaled) —
    * the order-sensitive set metric between [[mrrAtK]] (first hit only) and
    * [[ndcgAtK]] (graded): ap = (Σ over hit ranks r of precision@r) /
    * min(|truth|, k). Each term is the integer `hits_so_far·10⁶ div r`
    * (cumulative hit count over the candidate ranking), summed order-free,
    * one final truncating division — cross-engine exact throughout.
    * Queries with no relevant candidate report 0, never vanish.
    *
    * Shape: one left-semi equi-join bounded by k·queries + a per-query
    * window over ≤ k hits — corpus never enters. */
  def apAtK(truth: DataFrame, candidate: DataFrame, qCol: String,
      itemCol: String, rankCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be positive")
    val t = truth.select(col(qCol).as("query_id"), col(itemCol).as("i"))
    val c = candidate.filter(col(rankCol) <= k)
      .select(col(qCol).as("query_id"), col(itemCol).as("i"),
        col(rankCol).cast("long").as("r"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("r"))
    val terms = c.join(t, Seq("query_id", "i"), "left_semi")
      .withColumn("h", count(lit(1)).over(w))
      .select(col("query_id"), expr("h * 1000000 div r").as("term"))
    val perQ = terms.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("term")).as("ap_sum_micro"))
    t.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
      .join(perQ, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("ap_sum_micro"), lit(0L)).as("ap_sum_micro"))
      .withColumn("ap_micro",
        expr(s"ap_sum_micro div least(n_truth, CAST($k AS BIGINT))"))
  }

  /** Micro-scaled DCG position discounts: floor(10⁶ / log₂(r+1)) for ranks
    * 1..10, as LITERALS — the r7 "literal weight tables for curves" rule:
    * no transcendental is evaluated in either engine, so the metric
    * hash-matches bit-for-bit. */
  private[operators] val NdcgWeightsMicro: Array[Long] = Array(
    1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  /** Per-query nDCG@k over integer relevance grades — the graded companion
    * to [[recallAtK]] (set overlap) and [[kendallTau]] (pair ordering):
    * position-weighted gain that rewards putting the MOST relevant items
    * FIRST, the standard retrieval-quality number.
    *
    * `graded` carries (query, item, grade >= 0); `candidate` carries the
    * ranking under evaluation as (query, item, rank 1-based). DCG sums
    * grade·w(rank) over candidate positions <= k (ungraded items gain 0);
    * IDCG re-ranks the query's own grades descending (grade desc, item asc
    * tie-break) and pays the same discounts — so ndcg = 1e6 exactly when
    * the candidate order is a perfect grade sort. All arithmetic is
    * integer: micro-discount literals ([[NdcgWeightsMicro]]), order-free
    * integer sums, one final truncating division (`div` == DuckDB `//`).
    * Caller contract: grade·10⁶·k must fit a signed 64-bit (grades are
    * small ordinals by construction; 10-point grades at k=10 sit 11 orders
    * below the edge).
    *
    * Shape: one equi-join on (query, item) + one window over the graded
    * top-k — fanout bounded by k·queries, corpus never enters. Queries
    * whose candidate list is empty report ndcg 0, not absence. */
  def ndcgAtK(graded: DataFrame, candidate: DataFrame, qCol: String,
      itemCol: String, gradeCol: String, rankCol: String, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= NdcgWeightsMicro.length,
      s"k must be in [1, ${NdcgWeightsMicro.length}] (extend NdcgWeightsMicro for deeper cuts)")
    val wArr = array(NdcgWeightsMicro.take(k).map(lit(_)): _*)
    val g = graded.select(col(qCol).as("query_id"), col(itemCol).as("i"),
      col(gradeCol).cast("long").as("g"))
    val c = candidate.filter(col(rankCol) <= k)
      .select(col(qCol).as("query_id"), col(itemCol).as("i"),
        col(rankCol).cast("int").as("r"))
    val dcg = c.join(g, Seq("query_id", "i"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("g"), lit(0L)) * element_at(wArr, col("r"))).as("dcg_micro"))
    val iw = Window.partitionBy(col("query_id")).orderBy(col("g").desc, col("i").asc)
    val idcg = g.withColumn("p", row_number().over(iw))
      .filter(col("p") <= k)
      .groupBy(col("query_id"))
      .agg(sum(col("g") * element_at(wArr, col("p").cast("int"))).as("idcg_micro"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"), col("idcg_micro"))
      .withColumn("ndcg_micro",
        when(col("idcg_micro") === 0L, lit(0L))
          .otherwise(expr("dcg_micro * 1000000 div idcg_micro")))
  }

  /** Full precision/recall/F1 threshold sweep for a binary classifier
    * score — the curve behind "pick the curation cutoff": for every
    * DISTINCT score value t (predict positive iff score ≥ t), the
    * confusion counts and fixed-point P/R/F1. [[aucExact]] summarizes the
    * ranking in one number; this emits the operating points so a pipeline
    * can pick the threshold meeting a target precision.
    *
    * Exactness: scores are integers (micro-units by contract); per distinct
    * score the positive/total counts aggregate first, then ONE global
    * cumulative window (scores descending, explicit ROWS frame — the frame
    * defaults differ across engines, r12 AUC lesson) yields tp and
    * predicted-positive counts. `f1_micro = 2·tp·1e6 div (2·tp+fp+fn)` —
    * division-free numerators, denominator > 0 whenever any positive
    * exists (required).
    *
    * Scale shape: the aggregate is map-side combined; the window runs over
    * the DISTINCT-score relation — bounded by the score domain (≤ 1e6+1
    * values for micro-unit scores), metadata-sized by construction, same
    * contract as the frequency spectrum. NULL scores are refused loudly
    * (they rank differently across engines — aucExact precedent). */
  def f1Sweep(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val base = df.select(
      when(score.isNull, raise_error(lit("f1Sweep: NULL score — clean inputs first")))
        .otherwise(score.cast("long")).as("s"),
      positive.cast("long").as("y"))
    val perScore = base.groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    val cum = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perScore.agg(sum(col("np")).as("pos"))
    perScore
      .withColumn("tp", sum(col("np")).over(cum))
      .withColumn("pp", sum(col("n")).over(cum))
      .crossJoin(broadcast(totals))
      .select(col("s").as("threshold"), col("tp"),
        (col("pp") - col("tp")).as("fp"), (col("pos") - col("tp")).as("fn"))
      .withColumn("prec_micro", expr("tp * 1000000 div (tp + fp)"))
      .withColumn("rec_micro", expr("tp * 1000000 div nullif(tp + fn, 0)"))
      .withColumn("f1_micro", expr("2 * tp * 1000000 div (2 * tp + fp + fn)"))
  }

  /** Mean squared-L2 silhouette per Voronoi cell — the cluster-quality
    * number that tells "the clustering is real" from "the centroids landed
    * in one blob" before a pipeline trusts IVF routing or k-means cells
    * for sampling. For each point: a = mean squared distance to its OWN
    * cell's other members, b = min over other cells of the mean squared
    * distance to that cell, s = (b − a) / max(a, b) ∈ [−1, 1].
    *
    * The naive form is O(n²) pairwise; this is scan-speed via cluster
    * moments: Σ_{y∈C} ‖x−y‖² = n_C·‖x‖² − 2·x·S_C + Q_C with S_C the
    * per-dim sum vector and Q_C = Σ‖y‖² — so one pass builds the moments
    * (cells·dims longs, metadata-sized) and one broadcast cross join
    * scores every point against every cell. Exactness: vectors quantized
    * to 1e-3 (NOT the usual 1e-6 — the n_C·‖x‖² term must stay in BIGINT
    * at corpus-scale n_C; milli units bound it by n_C·2.6e8, safe to
    * ~3e10 rows/cell), all numerators exact integers, a and b one IEEE
    * division each, s one subtraction + one division of bit-identical
    * doubles (the ab_test/kappa precedent), then 1e-9 quantization before
    * the order-free per-cell integer mean. Singleton cells take s = 0 by
    * convention; a degenerate all-identical cell pair (max(a,b) = 0) also
    * scores 0. Cell assignment is the md5-seeded [[Similarity]] Voronoi
    * partition on the standard 1e-6 quantization, so the oracle re-derives
    * it exactly like knn_ivf. */
  def silhouette(embs: DataFrame, idCol: String, vecCol: String,
      cells: Int = 8, seed: Long = 42L, dims: Int = 64): DataFrame = {
    val base = embs.select(col(idCol).as("id"),
        graft.functions.VectorFns.quantize(col(vecCol)).as("qv"),
        expr(s"transform(CAST($vecCol AS ARRAY<DOUBLE>), " +
          "x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))").as("qm"))
      .withColumn("cell", Similarity.cellOf(col("qv"), cells, seed, dims))
      .withColumn("x2", graft.functions.Kernels.norm2Q(col("qm")))
      .transform(Residuals.persist)
    val svec = base.select(col("cell"), posexplode(col("qm")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d")).agg(sum(col("x")).as("sd"))
      .groupBy(col("cell"))
      .agg(map_from_arrays(collect_list(col("d")), collect_list(col("sd"))).as("m"))
      .select(col("cell").as("c"),
        expr(s"transform(sequence(0, ${dims - 1}), d -> m[d])").as("sv"))
    val mom = base.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_c"), sum(col("x2")).as("q_c"))
      .join(svec, col("cell") === col("c")).drop("c")
      .withColumnRenamed("cell", "mc")
    val scored = base.crossJoin(broadcast(mom))
      .withColumn("num",
        col("n_c") * col("x2") - lit(2L) * graft.functions.Kernels.dotQ(col("qm"), col("sv")) + col("q_c"))
      .groupBy(col("id"), col("cell"))
      .agg(
        max(when(col("cell") === col("mc"), col("num"))).as("a_num"),
        max(when(col("cell") === col("mc"), col("n_c"))).as("n_own"),
        min(when(col("cell") =!= col("mc"),
          col("num").cast("double") / col("n_c").cast("double"))).as("b"))
      .withColumn("a", col("a_num").cast("double") / (col("n_own") - 1).cast("double"))
      .withColumn("s",
        when(col("n_own") === 1 || col("b").isNull, lit(0.0d))
          .when(greatest(col("a"), col("b")) === 0.0d, lit(0.0d))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      .withColumn("s_nano", floor(col("s") * 1e9 + lit(0.5)).cast("long"))
    // exact SUM, not an integer mean — s_nano is signed and truncating
    // division semantics on negative sums are the one cross-engine edge
    // this repo refuses to bet on (r11 decomposition lesson)
    scored.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_points"), sum(col("s_nano")).as("sum_s_nano"))
  }

  /** Cohen's kappa — chance-corrected agreement between two labelers
    * (annotator vs annotator, heuristic vs ground truth): κ = (p_o − p_e) /
    * (1 − p_e) with p_e the marginal-product chance agreement. The raw
    * accuracy [[classMetrics]] reports is inflated by class imbalance; κ is
    * the number annotation QA actually compares against 0.4/0.6/0.8 bars.
    *
    * Exactness: all counts integer (n, agreement, per-class marginal
    * products summed distributively — `pe_n2 = Σ_k row_k·col_k`); κ itself
    * is the IEEE double `(n·agree − pe_n2) / (n² − pe_n2)` — one division
    * of two exactly-representable integer operands with identical
    * parenthesization on both engines (the events_ab_test χ² precedent).
    * Stated bound: n < 3e9 keeps n² inside the 2^63 integer domain (and
    * products inside 2^53-exact doubles for the final division) — beyond
    * that, sample the audit (κ is an agreement RATE; it does not need the
    * full corpus). Degenerate marginals (p_e = 1: both labelers constant)
    * return κ = 0 by convention rather than 0/0.
    *
    * Scale shape: one map-side-combined cell aggregation (cells ≤
    * classes², metadata-sized), then class-domain joins. Returns ONE row
    * (n, agree_n, pe_n2, kappa). */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.cast("string").as("ca"), b.cast("string").as("cb"))
      .groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("m"))
    val rowTot = cells.groupBy(col("ca").as("k")).agg(sum(col("m")).as("rk"))
    val colTot = cells.groupBy(col("cb").as("k")).agg(sum(col("m")).as("ck"))
    val pe = rowTot.join(colTot, "k")
      .agg(sum(col("rk") * col("ck")).as("pe_n2"))
    cells.agg(sum(col("m")).as("n"),
        sum(when(col("ca") === col("cb"), col("m")).otherwise(0L)).as("agree_n"))
      .crossJoin(pe)
      .withColumn("kappa",
        when(col("n") * col("n") === col("pe_n2"), lit(0.0d))
          .otherwise((col("n") * col("agree_n") - col("pe_n2")).cast("double") /
            (col("n") * col("n") - col("pe_n2")).cast("double")))
  }

  /** Corpus BLEU components — the text-generation/extraction fidelity
    * number (Papineni et al.): per n in 1..`maxN`, CLIPPED n-gram matches
    * Σ_g min(count_cand, count_ref) against the candidate n-gram total,
    * plus the brevity penalty over corpus token sums. Every component is
    * an exact integer (per-n inner join on (pair, gram) bounds the work by
    * the candidate corpus, never a cross join), so the gate hashes the
    * full confusion of the metric, not a float score; the one transcendental
    * — log-BLEU — is per-n [[Features.qln]] terms combined as a NONNEGATIVE
    * total-minus-match sum before a single truncating division (negative
    * operands never reach `div`, whose cross-engine contract is only
    * pinned for nonnegatives). Any n with zero matches null-poisons
    * log-BLEU (the survival-curve S=0 convention) — BLEU is 0, its log
    * undefined.
    *
    * bleu_log_micro = bp_micro − (Σ_n qln(T_n)−qln(M_n)) div maxN, with
    * bp_micro = min(0, 1e6 − ref·1e6 div cand): BLEU = exp(micro/1e6).
    * Scale: candidate and reference live in the SAME row, so the clipped
    * intersection is row-local — ONE corpus scan through
    * [[graft.functions.Kernels.clippedNgramMatchesAll]] (all n at once)
    * feeding a single 2·maxN+2-column aggregate; the only Exchange in the
    * whole plan is the final single-partition aggregation. The
    * explode+groupBy+join-per-n formulation this replaced (r14 verdict #1)
    * shuffled the corpus 3·maxN times for a per-pair quantity. */
  /** Word and character error rates per (candidate, reference) pair — the
    * ASR/translation audit beside [[bleuComponents]]' n-gram precision:
    * WER = word-level Levenshtein (insert/delete/substitute on tokens)
    * over the reference token count, CER the character-level twin.
    * BLEU rewards overlap; an error RATE localizes how broken each pair
    * is, which is what decides per-document filtering of weak
    * transcriptions/translations in a training corpus.
    *
    * Both distances are row-local ([[graft.functions.Kernels.editDistTokens]]
    * for words — one JITed O(n·m) DP per pair; Spark's built-in code-point
    * `levenshtein` for chars), so the plan is one scan + projections: no
    * join, no shuffle beyond the caller's, embarrassing parallelism at any
    * corpus size. Rates are exact micro fixed-point (dist·1e6 div len;
    * token/char counts of a trimmed split are ≥ 1, so the divisions are
    * total). Corpus-level WER = Σdist/Σref_len — derivable from this
    * relation with one aggregate, left to the caller's grain. */
  def werAudit(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    import graft.functions.{Kernels, TextFns}
    pairs.select(col(idCol),
        TextFns.tokens(col(candCol)).as("ct"), TextFns.tokens(col(refCol)).as("rt"),
        col(candCol).as("cs"), col(refCol).as("rs"))
      .select(col(idCol),
        Kernels.editDistTokensCol(col("ct"), col("rt")).as("dist"),
        size(col("rt")).cast("long").as("ref_len"),
        levenshtein(col("cs"), col("rs")).cast("long").as("cer_dist"),
        length(col("rs")).cast("long").as("ref_chars"))
      // ref_len >= 1 (a trimmed split yields at least one token); ref_chars
      // CAN be 0 on an empty reference, so the CER division floors the
      // denominator at 1 on BOTH engines (ANSI division is total or loud)
      .withColumn("wer_micro", expr("dist * 1000000 div ref_len"))
      .withColumn("cer_micro", expr("cer_dist * 1000000 div greatest(ref_chars, 1L)"))
  }

  def bleuComponents(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN in [1, 8]")
    import graft.functions.{Kernels, TextFns}
    val base = pairs.select(col(idCol).as("id"),
      TextFns.tokens(col(candCol)).as("ct"), TextFns.tokens(col(refCol)).as("rt"))
    val row = base.select(
      Kernels.clippedNgramMatchesAllCol(col("ct"), col("rt"), maxN).as("ms"),
      size(col("ct")).cast("long").as("cl"), size(col("rt")).cast("long").as("rl"))
    val aggCols = (1 to maxN).flatMap { n => Seq(
      coalesce(sum(element_at(col("ms"), n)), lit(0L)).as(s"m$n"),
      sum(greatest(col("cl") - lit(n - 1), lit(0L))).as(s"t$n"))
    } ++ Seq(sum(col("cl")).as("cand_tokens"), sum(col("rl")).as("ref_tokens"))
    val one = row.agg(aggCols.head, aggCols.drop(1): _*)
    // unpivot the 1-row aggregate into the maxN-row component relation —
    // metadata-sized from here on
    val perN = one.select(
      explode(array((1 to maxN).map(n => struct(lit(n.toLong).as("n"),
        col(s"m$n").as("matches"), col(s"t$n").as("total"))): _*)).as("c"),
      col("cand_tokens"), col("ref_tokens"))
      .select(col("c.n").as("n"), col("c.matches").as("matches"),
        col("c.total").as("total"), col("cand_tokens"), col("ref_tokens"))
    // the log-BLEU rollup runs over the maxN-row component relation — a
    // metadata-sized single-partition window by construction
    val winAll = "OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    perN
      .withColumn("p_micro", expr("matches * 1000000 div nullif(total, 0)"))
      .withColumn("bp_micro",
        least(lit(0L), lit(1000000L) - expr("ref_tokens * 1000000 div nullif(cand_tokens, 0)")))
      .withColumn("lnq_gap",
        Features.qln(col("total")) - Features.qln(when(col("matches") > 0, col("matches"))))
      .withColumn("bleu_log_micro", expr(
        // min(matches) = 0 anywhere null-poisons the corpus score (sum()
        // would silently SKIP a null term); the gap sum is nonnegative so
        // the truncating div stays inside the pinned cross-engine contract
        s"bp_micro - (CASE WHEN min(matches) $winAll > 0 " +
          s"THEN sum(lnq_gap) $winAll END) div $maxN"))
      .select(col("n"), col("matches"), col("total"), col("p_micro"),
        col("cand_tokens"), col("ref_tokens"), col("bp_micro"), col("bleu_log_micro"))
  }

  /** ROUGE-L per pair (Lin 2004, F1 form): the longest-common-SUBSEQUENCE
    * overlap between candidate and reference token streams — order-aware
    * where BLEU/chrF's n-gram multisets are windowed, so a scrambled
    * candidate that fools unigram precision scores low here. LCS runs as
    * ONE JITed kernel call per pair ([[graft.functions.Kernels.lcsTokens]]
    * — a per-cell SQL/HOF formulation would interpret a quadratic lambda
    * storm), and the F1 identity 2·P·R/(P+R) = 2·lcs/(clen+rlen) collapses
    * the score to a single exact integer division. Row-local: scan-speed
    * at any corpus size, no shuffle at all. */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    import graft.functions.{Kernels, TextFns}
    pairs.select(col(idCol).as("id"),
        TextFns.tokens(col(candCol)).as("ct"), TextFns.tokens(col(refCol)).as("rt"))
      .select(col("id"),
        Kernels.lcsTokensCol(col("ct"), col("rt")).as("lcs"),
        size(col("ct")).cast("long").as("cand_tokens"),
        size(col("rt")).cast("long").as("ref_tokens"))
      .withColumn("rouge_l_micro",
        expr("lcs * 2 * 1000000 div nullif(cand_tokens + ref_tokens, 0)"))
  }

  /** chrF components (Popović): character n-gram precision/recall F-score
    * over whitespace-stripped text, n in 1..`maxN`, β² = `beta2` (recall
    * weighted β²×). The per-n score collapses to ONE exact integer
    * division: with P = m/t_c and R = m/t_r,
    * (1+β²)PR / (β²P+R) = (1+β²)·m / (β²·t_r + t_c) — so
    * chrf_micro = (1+β²)·matches·1e6 div (β²·ref_total + cand_total),
    * zero transcendentals anywhere. Clipped multiset matches are row-local
    * exactly as in [[bleuComponents]] — ONE corpus scan through
    * [[graft.functions.Kernels.clippedCharNgramMatchesAllCol]] (all n in a
    * single kernel call), one single-partition aggregate, then a
    * metadata-sized unpivot; no (id, gram) shuffle anywhere. */
  def chrfComponents(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 6, beta2: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN in [1, 8]")
    require(beta2 >= 0, "beta2 must be nonnegative")
    import graft.functions.Kernels
    val ws = "[ \\t\\n\\x0B\\f\\r]+"
    val base = pairs.select(col(idCol).as("id"),
      regexp_replace(col(candCol), ws, "").as("cs"),
      regexp_replace(col(refCol), ws, "").as("rs"))
    val row = base.select(
      Kernels.clippedCharNgramMatchesAllCol(col("cs"), col("rs"), maxN).as("ms"),
      length(col("cs")).cast("long").as("cl"), length(col("rs")).cast("long").as("rl"))
    val aggCols = (1 to maxN).flatMap { n => Seq(
      coalesce(sum(element_at(col("ms"), n)), lit(0L)).as(s"m$n"),
      sum(greatest(col("cl") - lit(n - 1), lit(0L))).as(s"ct$n"),
      sum(greatest(col("rl") - lit(n - 1), lit(0L))).as(s"rt$n"))
    }
    val one = row.agg(aggCols.head, aggCols.drop(1): _*)
    one.select(explode(array((1 to maxN).map(n => struct(lit(n.toLong).as("n"),
        col(s"m$n").as("matches"), col(s"ct$n").as("cand_total"),
        col(s"rt$n").as("ref_total"))): _*)).as("c"))
      .select(col("c.n").as("n"), col("c.matches").as("matches"),
        col("c.cand_total").as("cand_total"), col("c.ref_total").as("ref_total"))
      .withColumn("chrf_micro",
        expr(s"matches * ${1 + beta2} * 1000000 div " +
          s"nullif($beta2 * ref_total + cand_total, 0)"))
  }
}
