package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering and data-profiling operators for curation pipelines.
  *
  * Both operators here are deliberately built WITHOUT a global sort: the
  * naive forms (ntile for binning, ORDER BY for profiling extremes) totally
  * order the corpus — the one operation that cannot scale past a single
  * reducer's worth of data. Quantile binning instead computes k-1 exact
  * percentile THRESHOLDS (one aggregation) and assigns bins by comparison
  * (scan-speed projection); profiling is plain aggregation.
  */
object Features {

  /** Equi-depth (quantile) binning of a BIGINT column into k bins:
    * thresholds are exact `percentile(col, i/k)` cut points — Spark's
    * interpolation is bit-identical to DuckDB `quantile_cont` on BIGINT
    * inputs (pinned r5, corpus_quantiles) — and the assignment
    * `1 + Σ [v > t_i]` is a pure projection against k-1 literal doubles.
    * No global sort, no window: ONE aggregate + one scan, so the operator
    * is corpus-size-indifferent where ntile would funnel 100 TB through a
    * single total order. Returns per-bin (bin, n, min_v, max_v).
    *
    * Values equal to a threshold fall in the lower bin (strict `>` on both
    * engines); heavy ties can therefore make bins uneven — inherent to
    * equi-depth binning on discrete data, not an implementation artifact. */
  def binByQuantiles(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "need at least two bins")
    val aggs = (1 until k).map(i =>
      expr(s"percentile($valueCol, ${i.toDouble / k})").as(s"t$i"))
    val cuts = df.agg(aggs.head, aggs.tail: _*).head()
    val thresholds = (0 until k - 1).map(cuts.getDouble)
    val bin = thresholds.foldLeft(lit(1L)) { (acc, t) =>
      acc + when(col(valueCol) > lit(t), lit(1L)).otherwise(lit(0L))
    }
    df.select(bin.as("bin"), col(valueCol).as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  /** One-pass table profiler — the "ANALYZE TABLE" a pipeline runs after
    * every ingest: per column, row count, null count, exact distinct count,
    * and min/max rendered as strings for a uniform schema. A single
    * aggregation over the scan (Spark plans the multiple DISTINCTs via one
    * Expand — k× the rows map-side, still one pass over storage, no second
    * read of a 100 TB table); the unpivot to one row per column is
    * metadata-sized. */
  /** The profiler's single aggregation — exposed so plan tests can pin the
    * one-scan property ([[profile]]'s returned frame is literal). */
  private[graft] def profileAgg(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // ONE action; the per-column unpivot is built from the collected row
    // (6 values per column — metadata), not by re-running the aggregate
    val row = profileAgg(df, cols).head()
    val spark = df.sparkSession
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(i * 5), row.getLong(i * 5 + 1), row.getLong(i * 5 + 2),
        row.getString(i * 5 + 3), row.getString(i * 5 + 4))
    }.toDF("column", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
  }

  /** Hashing-trick feature vectors (Weinberger et al., ICML'09 — the
    * vocabulary-free featurizer): every token occurrence lands in bucket
    * `h(token) mod numFeatures` with a ±1 sign from an independent hash
    * bit, so collisions cancel in expectation and NO vocabulary is ever
    * built or broadcast — the property that makes the hashing trick the
    * only featurizer whose driver state is zero at any corpus size.
    * Returns per-doc signature stats of the sparse vector (nonzeros, L1,
    * self-dot): integer-exact, so the whole featurization is oracle-
    * checkable. Shape: token explode -> one (doc, bucket) sum (map-side
    * combined) -> one per-doc rollup; both aggregations share the doc key
    * so AQE coalesces to two stages of one shuffle lineage. */
  def hashingTrick(
      docs: DataFrame, idCol: String, textCol: String,
      numFeatures: Int = 64): DataFrame = {
    import graft.functions.TextFns
    val sign = when(TextFns.md5Long(col("token"), 1) % 2 === 0, lit(1L)).otherwise(lit(-1L))
    docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), pmod(TextFns.md5Long(col("token"), 0), lit(numFeatures)).as("bucket"))
      .agg(sum(sign).as("v"))
      .filter(col("v") =!= 0)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_nonzero"),
        sum(abs(col("v"))).as("l1"),
        sum(col("v") * col("v")).as("dot_self"))
  }

  /** k-anonymity audit over quasi-identifier columns: every combination
    * held by fewer than `k` rows — the suppression list a privacy review
    * needs before release. One aggregation; output bounded by the QI
    * domain, not the corpus. */
  /** Mergeable higher-moment sketch: per group, the integer power sums
    * Σx..Σx⁴ plus the truncating fixed-point mean and the integer variance
    * numerator n·Σx² − (Σx)². Power sums are the one-pass, ORDER-FREE,
    * trivially mergeable carrier of mean/variance/skewness/kurtosis — shard
    * sketches add component-wise (spec-pinned merge == direct), so corpus
    * moments maintain incrementally per ingest like
    * [[TextAnalysis.mergeableStats]] maintains counts. Skew/kurtosis ratios
    * derive driver-side from the sums (group-count-sized).
    *
    * Overflow contract (all BIGINT, no silent wrap at the declared bound):
    * with |x| ≤ X, s4 ≤ n·X⁴ — safe while n·X⁴ < 2^63 (e.g. X=10³ → n up to
    * ~9·10⁶ per group; X=10² → ~9·10¹⁰). Beyond that, pre-scale x or shard
    * groups; var_num additionally needs n·s2 < 2^63. */
  def powerSums(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      // decomposed ×10⁶ (the targetEncode overflow lesson): exact at any
      // corpus size for the nonneg sums this profiles
      .withColumn("mean_micro",
        expr("(s1 div n) * 1000000 + ((s1 % n) * 1000000) div n"))
      .withColumn("var_num", col("n") * col("s2") - col("s1") * col("s1"))
  }

  /** Smoothed mean target encoding with a leave-one-out variant — the
    * categorical-feature workhorse of tabular ML, where the encoding of a
    * category is its target mean shrunk toward the global mean:
    * `enc = (Σy_c·10⁶ + m·ḡ) div (n_c + m)` with ḡ the global fixed-point
    * mean and m the smoothing pseudo-count. `enc_loo` excludes the row's OWN
    * target (`(Σy_c − y)·10⁶ + m·ḡ) div (n_c − 1 + m)`) — the leakage-safe
    * form used for training folds; a singleton category degrades to the
    * prior exactly. All integer fixed point (micro-cents), so the encoding
    * is bit-identical across engines — truncating `div` matches on both.
    *
    * Shape: one O(1) global aggregate, one category aggregate (category-
    * count-sized, broadcast back), one scan-speed projection. No window —
    * the naive per-row LOO window over 100 TB is exactly what this avoids. */
  def targetEncode(df: DataFrame, idCol: String, catCol: String,
      targetCents: Column, smoothing: Long = 10L): DataFrame = {
    require(smoothing >= 1, "smoothing pseudo-count must be >= 1")
    val base = df.select(col(idCol).as("id"), col(catCol).as("category"),
      targetCents.cast("long").as("y_cents"))
    val g = base.agg(sum(col("y_cents")).as("s"), count(lit(1)).as("n"),
      min(col("y_cents")).as("mn")).head()
    // NONNEGATIVE targets required: every ×10⁶ below rides the exact
    // decomposition (a·k + c) div d = (a div d)·k + ((a mod d)·k + c) div d,
    // which holds for truncating division only when the operands are ≥ 0
    // (truncation is not translation-invariant across zero). Found at the
    // r11 sf1 scale-proof: the naive Σcents·10⁶ overflows 2⁶³ once the
    // corpus sum passes ~9.2e12 cents (~$92B) — the decomposition is exact
    // at ANY corpus size (residual products bounded by n·10⁶ per divisor).
    require(g.getLong(2) >= 0,
      s"targetEncode needs nonnegative targets (min=${g.getLong(2)}); offset first")
    val s = g.getLong(0)
    val n = g.getLong(1)
    val gmeanMicro = (s / n) * 1000000L + (s % n) * 1000000L / n
    val cat = base.groupBy(col("category"))
      .agg(sum(col("y_cents")).as("s_c"), count(lit(1)).as("n_c"))
    base.join(broadcast(cat), "category")
      .select(col("id"), col("category"), col("y_cents"),
        expr(s"(s_c div (n_c + $smoothing)) * 1000000 + " +
          s"((s_c % (n_c + $smoothing)) * 1000000 + $smoothing * $gmeanMicro) div (n_c + $smoothing)")
          .as("enc_micro"),
        expr(s"((s_c - y_cents) div (n_c - 1 + $smoothing)) * 1000000 + " +
          s"(((s_c - y_cents) % (n_c - 1 + $smoothing)) * 1000000 + $smoothing * $gmeanMicro) div (n_c - 1 + $smoothing)")
          .as("enc_loo_micro"))
  }

  /** Ordinary-least-squares fit over BIGINT (x, y) pairs, entirely in
    * integer arithmetic: ONE aggregation collects the five power sums, then
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` and the intercept are
    * emitted as 1e-6 fixed-point truncating divisions — a regression whose
    * coefficients hash-match across engines. Feed it quantized-ln columns
    * and it fits power laws (Zipf slope, Heaps exponent, scaling-law
    * diagnostics) with zero engine-specific float behavior.
    *
    * Shape: one map-side-combinable aggregate over the pair stream; output
    * is ONE row. Overflow (hard worst-case, uncentered): |x|,|y| ≤ M ⇒ the
    * 1e6-scaled slope numerator is bounded by n²M²·10⁶ — BIGINT-safe while
    * n·M < ~3·10⁶. Quantize ln inputs at 1e-3 (M ≈ 10⁴), not 1e-6, and fit
    * aggregate-then-fit relations (rank/frequency tables), not raw corpora.
    * Degenerate x (all equal) yields a NULL slope rather than a division
    * error. */
  def linearFit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"))
      .withColumn("slope_micro",
        expr("(n * sxy - sx * sy) * 1000000 div nullif(n * sxx - sx * sx, 0)"))
      .withColumn("intercept_micro",
        expr("(sy * 1000000 - slope_micro * sx) div n"))
  }

  /** ABC (Pareto) classification: rank keys by their fixed-point value
    * total, classify by the EXCLUSIVE-prior cumulative share — A while the
    * share before this key is under `aPermille` (the key that crosses the
    * 80% line still counts as A, the standard convention), B under
    * `bPermille`, else C. The "20% of parts carry 80% of revenue" segmenter
    * behind inventory/supplier/corpus-source prioritization.
    *
    * All integer: cents totals, a running BIGINT sum, `(cum−v)·1000 div
    * total` per-mille shares — classification is bit-portable. The global
    * window runs over the AGGREGATED key relation (key-domain-sized, never
    * the fact table); the grand total is one O(1) driver aggregate. */
  def abcClasses(df: DataFrame, keyCol: String, valueCents: Column,
      aPermille: Long = 800L, bPermille: Long = 950L): DataFrame = {
    require(aPermille > 0 && aPermille < bPermille && bPermille <= 1000L,
      "need 0 < aPermille < bPermille <= 1000")
    import org.apache.spark.sql.expressions.Window
    val per = df.groupBy(col(keyCol).as("key")).agg(sum(valueCents).as("v"))
    val total = per.agg(sum(col("v"))).head().getLong(0)
    require(total > 0, "non-positive value total")
    val w = Window.orderBy(col("v").desc, col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.withColumn("cum", sum(col("v")).over(w))
      .select(col("key"), col("v").as("value_cents"), col("cum").as("cum_cents"),
        expr(s"(cum - v) * 1000 div $total").as("prev_permille"))
      .withColumn("abc_class",
        when(col("prev_permille") < aPermille, "A")
          .when(col("prev_permille") < bPermille, "B")
          .otherwise("C"))
  }

  /** Gini coefficient of a grouped total — the inequality scalar behind
    * "is one source dominating the corpus" dashboards (0 = perfectly even
    * contribution, →1 = one group holds everything). Exact mean-absolute-
    * difference form `G = Σᵢⱼ|xᵢ−xⱼ| / (2·n·Σx)` over ORDERED pairs of the
    * GROUP relation — the corpus is touched once by the grouping
    * aggregate; the self cross-join is group-domain²-bounded (metadata),
    * never corpus-sized. 1e-6 fixed point, BIGINT-safe while
    * n²·max(x) < ~9·10¹². Returns one row (n_groups, total, gini_micro). */
  def giniOf(df: DataFrame, groupCol: String, weight: Column): DataFrame = {
    val per = df.groupBy(col(groupCol)).agg(sum(weight).as("x"))
    val a = per.select(col("x").as("xa"))
    val b = per.select(col("x").as("xb"))
    a.crossJoin(b)
      .agg(sum(abs(col("xa") - col("xb"))).as("sad"))
      .crossJoin(per.agg(count(lit(1)).as("n_groups"), sum(col("x")).as("total")))
      .select(col("n_groups"), col("total"),
        // decomposed x1e6: sad is bounded by 2*n_groups*total, so the
        // naive product binds at corpus ~9e12/groups (targetEncode lesson)
        expr("(sad div (2 * n_groups * total)) * 1000000" +
          " + ((sad % (2 * n_groups * total)) * 1000000) div (2 * n_groups * total)")
          .as("gini_micro"))
  }

  /** THE cross-engine quantized-ln contract: `floor(ln(x)·1e6 + 0.5)` on
    * integer-valued inputs — libm parity holds in Spark and DuckDB (the
    * BM25/LM-fit precedent), so qln terms can enter order-free integer
    * sums. ONE definition on purpose: every operator that changes this
    * constant or rounding rule silently breaks oracle parity, so they all
    * share this helper (survival, entropy, WoE, LLR, LM scoring, JSD). */
  private[operators] def qln(c: Column): Column =
    floor(log(c.cast("double")) * 1e6 + lit(0.5)).cast("long")

  /** Robust (median/IQR) feature scaling over a BIGINT column — the
    * outlier-immune standardizer (z-scores move with every extreme value;
    * median and quartiles don't). Quartiles are carried ×4 so the .25/.75
    * interpolation lands on exact integers (the ×2 doubled-median trick
    * extended to quarter fractions): `robust_micro =
    * (x·4 − med_x4)·1e6 div (q75_x4 − q25_x4)`. A constant column (IQR 0)
    * yields NULL, never a division error. One 3-threshold aggregate over
    * the value relation + a scan-speed projection. */
  def robustScale(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val q = df.agg(
      expr(s"percentile($valueCol * 4, 0.25)").cast("long").as("q25_x4"),
      expr(s"percentile($valueCol * 4, 0.5)").cast("long").as("med_x4"),
      expr(s"percentile($valueCol * 4, 0.75)").cast("long").as("q75_x4"))
    df.select(col(idCol), col(valueCol).cast("long").as("value"))
      .crossJoin(broadcast(q))
      .withColumn("robust_micro",
        expr("(value * 4 - med_x4) * 1000000 div nullif(q75_x4 - q25_x4, 0)"))
      .select(col(idCol), col("value"), col("med_x4"),
        (col("q75_x4") - col("q25_x4")).as("iqr_x4"), col("robust_micro"))
  }

  /** Weight-of-evidence categorical encoding + information-value
    * contributions — the credit-scoring-standard supervised encoder and
    * its predictive-power gauge. Per category c with Laplace-(+1)-smoothed
    * event/non-event counts:
    *
    *   WoE_c = ln( (g_c+1)/(G+K) / ((b_c+1)/(B+K)) )
    *   IV    = Σ_c (dist_g − dist_b)·WoE_c
    *
    * Exactness: WoE as FOUR separately-quantized qln terms
    * (`qln(g+1) − qln(G+K) − qln(b+1) + qln(B+K)`, libm parity on integer
    * inputs) — no products inside ln, so no overflow at any count;
    * distributions in 1e-6 fixed point by truncating division;
    * `iv_contrib` = (dist_g_micro − dist_b_micro)·woe_scaled (1e-12 units),
    * summed by the consumer in one aggregate. Smoothing keeps zero-event
    * categories finite — the all-good/all-bad category failure of naive
    * WoE.
    *
    * Scale: one groupBy(category) + one O(1) total cross-joined broadcast —
    * category-domain-sized output regardless of corpus. */
  def woeEncode(df: DataFrame, catCol: String, target: Column): DataFrame = {
    // NULL targets (unknown outcome) are excluded from BOTH cells — the
    // conventional WoE treatment; counting them as non-events would bias
    // every category's WoE downward
    val cells = df.groupBy(col(catCol).as("category"))
      .agg(sum(when(target, 1L).otherwise(0L)).as("g"),
        sum(when(!target, 1L).otherwise(0L)).as("b"))
    val tot = cells.agg(sum(col("g")).as("gt"), sum(col("b")).as("bt"),
      count(lit(1)).as("k"))
    cells.crossJoin(broadcast(tot))
      .withColumn("dist_g_micro", expr("(g + 1) * 1000000 div (gt + k)"))
      .withColumn("dist_b_micro", expr("(b + 1) * 1000000 div (bt + k)"))
      .withColumn("woe_scaled",
        qln(col("g") + 1) - qln(col("gt") + col("k"))
          - qln(col("b") + 1) + qln(col("bt") + col("k")))
      .withColumn("iv_contrib",
        (col("dist_g_micro") - col("dist_b_micro")) * col("woe_scaled"))
      .select(col("category"), col("g"), col("b"), col("dist_g_micro"),
        col("dist_b_micro"), col("woe_scaled"), col("iv_contrib"))
  }

  def kAnonymityViolations(df: DataFrame, quasiIdCols: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") < k)

  /** Batch perceptron training over integer feature vectors — the simplest
    * member of the train-a-quality-classifier family (fastText-style
    * keep/drop filters), and deliberately the one whose training is
    * CROSS-ENGINE EXACT: the update `w ← w + Σ_{misclassified} y·x` is
    * pure integer arithmetic (no learning rate, no transcendental), each
    * round is ONE map-side-combined aggregation over the corpus, and the
    * weight vector is d longs of driver metadata (the kmeans-centroid
    * contract), so K rounds of training hash-match an unrolled oracle.
    * Margin 0 counts as misclassified (round 1 from w = 0 updates on every
    * row — the textbook convention). Labels must be ±1 and every feature
    * vector exactly d-long — both enforced by plan-embedded raise_error
    * (a short vector would silently vanish from the gradient via null
    * element_at). Overflow bound: rounds·Σ|x_i| per weight and d·max|x|·
    * max|w| per margin must fit BIGINT — callers scale features
    * accordingly (per-mille signals at corpus sizes to ~10⁹ rows are
    * safe).
    *
    * Output: one row per (round, dim) with the post-round weight and the
    * round's misclassified count. */
  def perceptron(df: DataFrame, featuresCol: Column, labelCol: Column,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 50, "rounds must be in [1, 50]")
    val spark = df.sparkSession
    import spark.implicits._
    val y0 = labelCol.cast("long")
    val y = when(y0.isNull || (y0 =!= 1L && y0 =!= -1L),
      raise_error(concat(lit("perceptron: label must be +1/-1, got "),
        coalesce(y0.cast("string"), lit("NULL"))))).otherwise(y0)
    val data0 = df.select(featuresCol.as("x"), y.as("y"))
    val headRows = data0.select(size(col("x")).as("d")).limit(1).collect()
    require(headRows.nonEmpty, "perceptron: empty input — nothing to train on")
    require(!headRows(0).isNullAt(0), "perceptron: NULL feature vector")
    val d = headRows(0).getInt(0)
    require(d >= 1, "perceptron: empty feature vector")
    val data = data0
      // NULL vectors must raise like ragged ones — a null would otherwise
      // vanish silently from the gradient via null element_at
      .withColumn("x", when(col("x").isNull || size(col("x")) =!= d,
        raise_error(lit(s"perceptron: NULL or ragged feature vectors (expected $d)")))
        .otherwise(col("x")))
      .transform(Residuals.persist)
    var w = Array.fill(d)(0L)
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val wArr = array(w.map(lit(_)): _*)
      val aggs = (0 until d).map(i =>
        sum(col("y") * element_at(col("x"), i + 1)).as(s"g$i")) :+
        count(lit(1)).as("n_miss")
      val row = data
        .withColumn("m", col("y") * graft.functions.VectorFns.dotQ(col("x"), wArr))
        .filter(col("m") <= 0L)
        .agg(aggs.head, aggs.tail: _*)
        .head()
      val nMiss = row.getLong(d)
      w = w.zipWithIndex.map { case (wi, i) =>
        wi + (if (row.isNullAt(i)) 0L else row.getLong(i)) }
      (0 until d).foreach(i => out += ((r.toLong, i.toLong + 1L, w(i), nMiss)))
    }
    out.result().toDF("round", "dim", "w", "n_miss")
  }

  /** Quantile (rank) normalization of a feature column: value → its exact
    * empirical quantile rank·1e6 div (n+1) — the monotone transform that
    * makes heavy-tailed features (lengths, counts, scores) comparable and
    * uniform on (0, 1) regardless of distribution, the standard ML
    * preprocessing step a fixed min-max scale can't give. Ranks are fully
    * tie-broken by id (tie-broken, not midranks — same output contract as
    * [[spearman]]), computed DISTRIBUTED via [[Ranks.globalRank]] (no
    * global window — value-domain offsets + per-value partitioned
    * row_number), so the transform is one aggregate + one join + one
    * partitioned window at any corpus size. Exact integer micro output:
    * rank ≤ n < 2^43 keeps rank·1e6 far under 2^63. */
  def quantileNorm(df: DataFrame, idCol: String, valCol: String): DataFrame =
    // rank the RAW column (r16 ADVICE: a long cast would silently truncate
    // fractional features into id-broken ties and change the transform);
    // `value` keeps the input's own type — callers normalize widths
    Ranks.globalRank(
        df.select(col(idCol).as("id"), col(valCol).as("v")),
        "v", Seq("id"), "rank", "n")
      .select(col("id"), col("v").as("value"), col("rank"),
        expr("rank * 1000000 div (n + 1)").as("qnorm_micro"))

  /** Spearman rank correlation between two feature columns — the
    * feature-redundancy audit ([[linearFit]]'s slope captures LINEAR
    * dependence; ρ catches any monotone one, which is what decides whether
    * a derived feature adds signal or just re-ranks an existing one).
    *
    * Ranks are row_number over (value asc, id asc) — the id tie-break
    * makes ranks total and cross-engine deterministic even with duplicate
    * values (tie-broken ranks, not midranks; stated in the output
    * contract). ρ = 1 − 6·Σd² / (n·(n²−1)) computed as ONE IEEE division
    * of exactly-representable integer operands (identical left-associated
    * expression both engines — the ab_test precedent). Σd² < n³/3 keeps
    * the numerator exact under 2^53 for n ≤ ~2e5; beyond that, sample the
    * audit (ρ is a rate, it does not need the full corpus) — stated bound,
    * loud in the scaladoc rather than silently wrong.
    *
    * Scale shape: ONE fused distributed ranking for both columns
    * ([[Ranks.pairRanks]]: the columns stack to (id, which, value) and
    * share one aggregate + one join + one partitioned window — bit-
    * identical per column to `row_number() OVER (ORDER BY value, id)`,
    * half the shuffle overhead of two separate rankings — the r16
    * feature_rank_corr adjudication), then one aggregate. Returns ONE
    * row (n, sum_d2, rho). Σd² exactness bound (n ≤ ~2e5 under 2^53)
    * still applies — sample a larger corpus before auditing. */
  def spearman(df: DataFrame, idCol: String, aCol: String, bCol: String): DataFrame = {
    Ranks.pairRanks(df, idCol, aCol, bCol, "ra", "rb")
      .agg(count(lit(1)).as("n"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb"))).as("sum_d2"))
      .withColumn("rho",
        when(col("n") < 2L, lit(0.0d))
          .otherwise(lit(1.0d) - lit(6.0d) * col("sum_d2").cast("double") /
            (col("n") * (col("n") * col("n") - 1L)).cast("double")))
  }
}
