package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * check a continuously-maintained training corpus runs after every
  * ingest/curation change: has the length/score/source mix moved?
  *
  * Population Stability Index over fixed-width buckets:
  *   PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)
  * with Laplace(+1) smoothing so empty buckets stay defined. All inputs are
  * integer counts; each bucket's ln is quantized to 1e-9 and its (p−q)
  * difference to 1e-6 BEFORE the order-free integer sum (the repo's
  * standard exactness pattern) — so the statistic hash-matches a SQL oracle
  * despite being "floating-point" math on paper.
  *
  * Overflow safety at corpus scale: |qpq| ≤ 1e6 by construction and
  * Σ_i |p_i − q_i| ≤ 2, so Σ |qpq·qln| ≤ ~2e6 · max|qln| ≈ 1e17 < 2^63
  * for ANY snapshot size and bucket count (the earlier exact-numerator
  * algebra carried O(Nb·Nc) per-bucket terms that wrapped Long silently
  * once snapshots reached ~1e6 rows — precisely when drift is large).
  * Ratio/probability arguments cast each factor to double BEFORE
  * multiplying, so no integer intermediate can overflow either.
  *
  * The corpus-level and per-group (stratified) forms share ONE
  * implementation — the ungrouped form is the grouped form with zero group
  * columns — so the smoothing/quantization algebra exists exactly once.
  *
  * Scale shape: one map-side-combined count aggregation per snapshot (B
  * bucket rows per group), a frame join, a per-group sum. The corpus is
  * scanned once per side regardless of B; everything after the counts is
  * metadata-sized. Conventional read: PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted.
  */
object Drift {

  /** Fixed-width bucket id with BOTH tails clamped: values below 0 land in
    * bucket 0, above the range in the last bucket — otherwise out-of-range
    * values fall outside the bucket-frame join and silently vanish from
    * counts AND totals. Fixed boundaries (not quantiles) so two snapshots
    * bucket identically. */
  private def bucketOf(valueCol: String, width: Long, buckets: Int): Column =
    greatest(least(floor(col(valueCol) / width), lit(buckets - 1)), lit(0))
      .cast("long").as("bucket")

  /** Per-(group, bucket) smoothed counts over the full bucket frame. The
    * frame spans groups present on EITHER side × all bucket ids, so a group
    * that vanished from one snapshot still reports (its PSI is driven by
    * the smoothing floor — loud, not absent). Ungrouped when `groupCols`
    * is empty. */
  /** Exact two-sample Kolmogorov–Smirnov distance over an INTEGER value
    * column: D = max_x |F1(x) − F2(x)| computed as
    * `max |n2·cum1(x) − n1·cum2(x)| / (n1·n2)` — every term an exact
    * integer, one final IEEE division, so the PSI complement (the
    * binning-free, worst-single-point drift test) hash-matches its SQL
    * re-derivation. Returns one row: (n1, n2, d_num, ks_d).
    *
    * Scale shape: one map-side-combined count aggregation keyed on the
    * value, then the cumulative pass runs over the DISTINCT-VALUE relation
    * — bounded by the value domain (quantize continuous scores first), not
    * the corpus, so the unpartitioned window is a deliberately tiny tail
    * step, the same trade as PSI's bucket frame. Exactness bound:
    * n1·n2 < 2^63 (sample snapshots beyond ~3e9 rows each). */
  def ksOf(base: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = base.select(col(valueCol).cast("long").as("v"),
      lit(1L).as("c1"), lit(0L).as("c2"))
    val b = cur.select(col(valueCol).cast("long").as("v"),
      lit(0L).as("c1"), lit(1L).as("c2"))
    val counts = a.unionAll(b).groupBy(col("v"))
      .agg(sum(col("c1")).as("c1"), sum(col("c2")).as("c2"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("cum1", sum(col("c1")).over(cum))
      .withColumn("cum2", sum(col("c2")).over(cum))
      .withColumn("n1", sum(col("c1")).over(all))
      .withColumn("n2", sum(col("c2")).over(all))
      .agg(
        max(col("n1")).as("n1"),
        max(col("n2")).as("n2"),
        max(abs(col("n2") * col("cum1") - col("n1") * col("cum2"))).as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        (col("d_num").cast("double") / (col("n1") * col("n2")).cast("double")).as("ks_d"))
  }

  /** Exact 1-D Wasserstein-1 (earth mover's) distance between two integer
    * populations — the INTEGRAL drift axis beside [[ksOf]]'s max deviation
    * (KS is blind to HOW FAR the mass moved; W1 is exactly that):
    * W1 = ∫|F1−F2| dv = Σ over consecutive distinct values
    * |n2·cum1 − n1·cum2| · Δv / (n1·n2). The numerator accumulates as an
    * exact integer over the DISTINCT-value relation (bounded by the value
    * domain, not the corpus — the ksOf window shape plus one `lead` gap);
    * the single final division is IEEE-exact on identical operands (the
    * ab_test precedent). Worst-case numerator is n1·n2·range, so the
    * operator refuses loudly when that bound approaches 2^63 (one
    * metadata-sized pre-aggregate) instead of wrapping silently. */
  def wasserstein1d(base: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = base.select(col(valueCol).cast("long").as("v"),
      lit(1L).as("c1"), lit(0L).as("c2"))
    val b = cur.select(col(valueCol).cast("long").as("v"),
      lit(0L).as("c1"), lit(1L).as("c2"))
    val u = a.unionAll(b)
    val meta = u.agg(sum(col("c1")), sum(col("c2")), min(col("v")), max(col("v"))).head()
    val n1 = if (meta.isNullAt(0)) 0L else meta.getLong(0)
    val n2 = if (meta.isNullAt(1)) 0L else meta.getLong(1)
    require(n1 > 0 && n2 > 0, "wasserstein1d: both populations must be non-empty")
    val range = meta.getLong(3) - meta.getLong(2)
    require(BigInt(n1) * BigInt(n2) * BigInt(math.max(range, 1L)) <= BigInt(Long.MaxValue) / 2,
      s"wasserstein1d: n1*n2*range = ${BigInt(n1) * BigInt(n2) * BigInt(range)} risks " +
        "64-bit overflow in the exact numerator — pre-bucket the value column")
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.groupBy(col("v"))
      .agg(sum(col("c1")).as("c1"), sum(col("c2")).as("c2"))
      .withColumn("cum1", sum(col("c1")).over(cum))
      .withColumn("cum2", sum(col("c2")).over(cum))
      .withColumn("gap",
        coalesce(lead(col("v"), 1).over(Window.orderBy(col("v"))) - col("v"), lit(0L)))
      .agg(sum(abs(lit(n2) * col("cum1") - lit(n1) * col("cum2")) * col("gap")).as("w1_num"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"), col("w1_num"),
        (col("w1_num").cast("double") / (n1.toDouble * n2.toDouble)).as("w1"))
  }

  /** Embedding-space drift: L2 shift between the per-dimension TRUNCATING
    * INTEGER MEANS of two snapshots' quantized vectors — the "did the
    * encoder/corpus move the embedding cloud" check after a re-embed or
    * ingest. The centroid update is the kmeansRefine algebra (sum div count
    * per dim — cross-engine-exact), the shift is an integer sum of squared
    * differences, and the only non-integer output is one `sqrt` — which
    * IEEE 754 requires to be correctly rounded, so even it is bit-portable
    * (unlike ln/exp). One posexplode aggregation per snapshot, dims-sized
    * join, single-row output (n_dims, shift_sq_scaled, shift_l2). */
  def embeddingShift(base: DataFrame, cur: DataFrame, vecCol: String): DataFrame = {
    def centroid(df: DataFrame, tag: String): DataFrame =
      df.select(posexplode(graft.functions.VectorFns.quantize(col(vecCol))).as(Seq("d", "x")))
        .groupBy(col("d")).agg(expr("sum(x) div count(1)").as(tag))
    val diffSq = (col("m1") - col("m2")) * (col("m1") - col("m2"))
    centroid(base, "m1").join(centroid(cur, "m2"), "d")
      .agg(
        count(lit(1)).as("n_dims"),
        sum(diffSq).as("shift_sq_scaled"))
      .select(col("n_dims"), col("shift_sq_scaled"),
        (sqrt(col("shift_sq_scaled").cast("double")) / 1000000.0).as("shift_l2"))
  }

  def psiBucketsBy(
      base: DataFrame, current: DataFrame, groupCols: Seq[String], valueCol: String,
      width: Long, buckets: Int): DataFrame = {
    require(width > 0 && buckets > 1)
    val spark = base.sparkSession
    val g = groupCols.map(col)
    def side(df: DataFrame, name: String): DataFrame =
      df.select((g :+ bucketOf(valueCol, width, buckets)): _*)
        .groupBy((g :+ col("bucket")): _*).agg(count(lit(1)).as(name))
    val bucketFrame = spark.range(buckets).select(col("id").as("bucket"))
    val frame =
      if (groupCols.isEmpty) bucketFrame
      else base.select(g: _*).union(current.select(g: _*)).distinct()
        .crossJoin(bucketFrame)
    frame
      .join(side(base, "n_base"), groupCols :+ "bucket", "left")
      .join(side(current, "n_cur"), groupCols :+ "bucket", "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
  }

  /** Collapse [[psiBucketsBy]] output to one PSI row per group:
    * groupCols ++ (n_base, n_cur, psi_scaled, psi). The single home of the
    * smoothed qln / exact-numerator algebra. */
  def psiFrom(bucketCounts: DataFrame, groupCols: Seq[String], buckets: Int): DataFrame = {
    val g = groupCols.map(col)
    val tot = bucketCounts.groupBy(g: _*)
      .agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    val joined =
      if (groupCols.isEmpty) bucketCounts.crossJoin(broadcast(tot))
      else bucketCounts.join(tot, groupCols)
    joined
      .select((g ++ Seq(col("tb"), col("tc"),
        // smoothed ratio p/q = (cb+1)(tc+B) / ((cc+1)(tb+B)); each factor
        // cast to double BEFORE the multiply (no integer intermediate),
        // ln quantized to 1e-9
        floor(log(((col("n_base") + 1).cast("double") * (col("tc") + buckets).cast("double"))
            / ((col("n_cur") + 1).cast("double") * (col("tb") + buckets).cast("double"))) * 1e9
            + lit(0.5))
          .cast("long").as("qln"),
        // p - q quantized to 1e-6: bounded by ±(1e6+1), so the qpq·qln
        // products and their sum stay far below 2^63 at any corpus size
        floor(((col("n_base") + 1).cast("double") / (col("tb") + buckets).cast("double")
            - (col("n_cur") + 1).cast("double") / (col("tc") + buckets).cast("double")) * 1e6
            + lit(0.5))
          .cast("long").as("qpq"))): _*)
      .groupBy((g ++ Seq(col("tb"), col("tc"))): _*)
      .agg(sum(col("qpq") * col("qln")).as("psi_scaled"))
      .select((g ++ Seq(col("tb").as("n_base"), col("tc").as("n_cur"),
        col("psi_scaled"),
        (col("psi_scaled").cast("double") / 1e15).as("psi"))): _*)
  }

  /** Ungrouped bucket counts (kept for callers/tests of the corpus form). */
  def psiBuckets(
      base: DataFrame, current: DataFrame, valueCol: String,
      width: Long, buckets: Int): DataFrame =
    psiBucketsBy(base, current, Nil, valueCol, width, buckets)

  /** The PSI statistic from ungrouped [[psiBuckets]] output: single row
    * (n_base, n_cur, psi_scaled, psi). */
  def psi(bucketCounts: DataFrame, buckets: Int): DataFrame =
    psiFrom(bucketCounts, Nil, buckets)

  /** One-call form: PSI of `valueCol` between two snapshots. */
  def psiOf(base: DataFrame, current: DataFrame, valueCol: String,
      width: Long, buckets: Int): DataFrame =
    psi(psiBuckets(base, current, valueCol, width, buckets), buckets)

  /** Two-sample χ² homogeneity test over the SAME fixed-width buckets as
    * PSI — the classical significance complement (PSI is a practitioner
    * index with rule-of-thumb cutoffs; χ² against a χ²(dof) distribution
    * is the test a statistician asks for). Per-bucket computational form
    * for a 2×k table: (a·tc − c·tb)² / (tb·tc·(a+c)), summed over
    * non-empty buckets. Exactness: every factor cast to double BEFORE
    * multiplying, per-bucket term floor-quantized at 1e-6 and summed as
    * order-free integers (doubles summed across buckets would be
    * order-dependent); the quantized sum stays under 2^63 to ~1e12 rows
    * per side. dof = non-empty buckets − 1. */
  def chi2Of(base: DataFrame, current: DataFrame, valueCol: String,
      width: Long, buckets: Int): DataFrame = {
    val bc = psiBuckets(base, current, valueCol, width, buckets)
    val tot = bc.agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    def d(c: Column): Column = c.cast("double")
    val num = d(col("n_base")) * d(col("tc")) - d(col("n_cur")) * d(col("tb"))
    bc.crossJoin(broadcast(tot))
      .filter(col("n_base") + col("n_cur") > 0 && col("tb") > 0 && col("tc") > 0)
      .select(col("tb"), col("tc"),
        floor(num * num / (d(col("tb")) * d(col("tc")) * d(col("n_base") + col("n_cur")))
          * 1e6 + lit(0.5)).cast("long").as("qterm"))
      .groupBy(col("tb"), col("tc"))
      .agg(count(lit(1)).as("n_occupied"), sum(col("qterm")).as("chi2_scaled"))
      .select(col("tb").as("n_base"), col("tc").as("n_cur"),
        (col("n_occupied") - 1).as("dof"),
        col("chi2_scaled"),
        (col("chi2_scaled").cast("double") / 1e6).as("chi2"))
  }

  /** Cramér's V for the 2×k population/bucket contingency — the SIZE-FREE
    * effect measure beside [[chi2Of]]'s significance-scaled statistic (χ²
    * grows linearly with n at a fixed effect, so a 100 TB corpus "fails"
    * every χ² test on trivia; V ∈ [0, 1] compares across corpus sizes and
    * features). With two populations min(r−1, c−1) = 1, so V = √(χ²/n);
    * sqrt is IEEE-correctly-rounded in both engines so even the float
    * output hash-matches (the drift_embedding_shift precedent), and the
    * integer chi2_scaled rides along for the exact record. */
  def cramersV(base: DataFrame, current: DataFrame, valueCol: String,
      width: Long, buckets: Int): DataFrame =
    chi2Of(base, current, valueCol, width, buckets)
      .select(col("n_base"), col("n_cur"), col("chi2_scaled"),
        sqrt(col("chi2_scaled").cast("double") / 1e6 /
          (col("n_base") + col("n_cur")).cast("double")).as("cramers_v"))

  /** Jensen–Shannon divergence between the base/current bucket
    * distributions — the BOUNDED drift score (≤ ln 2) PSI isn't: PSI
    * explodes on zero-overlap buckets, so one novel bucket floods the
    * monitor; JSD saturates, keeping multi-feature dashboards comparable.
    * Same clamped bucket frame as [[psiOf]].
    *
    * Exactness: per-bucket INTEGER terms `a·(qln(2aB) − qln(aB + bA))`
    * (and the b-side mirror) with `qln(x) = floor(ln(x)·1e6 + 0.5)` —
    * libm parity holds on integer-VALUED inputs, and the products are
    * exactly representable while a·B < 2⁵³ (~count products of 3e7 rows a
    * side; pre-scale both sides by a common power of two beyond that — JSD
    * is scale-invariant). Zero cells contribute exactly 0 (the p·ln p
    * limit). Output `jsd_micro` in micro-nats via three truncating
    * divisions; 693147 = total divergence. */
  def jsDivergence(base: DataFrame, current: DataFrame, valueCol: String,
      width: Long, buckets: Int): DataFrame = {
    val bc = psiBuckets(base, current, valueCol, width, buckets)
    val tot = bc.agg(sum(col("n_base")).as("ta"), sum(col("n_cur")).as("tb"))
    bc.crossJoin(broadcast(tot))
      .select(col("ta"), col("tb"),
        when(col("n_base") > 0,
          col("n_base") * (Features.qln(col("n_base") * col("tb") * 2) -
            Features.qln(col("n_base") * col("tb") + col("n_cur") * col("ta"))))
          .otherwise(lit(0L)).as("term_a"),
        when(col("n_cur") > 0,
          col("n_cur") * (Features.qln(col("n_cur") * col("ta") * 2) -
            Features.qln(col("n_base") * col("tb") + col("n_cur") * col("ta"))))
          .otherwise(lit(0L)).as("term_b"))
      .groupBy(col("ta"), col("tb"))
      .agg(sum(col("term_a")).as("sa"), sum(col("term_b")).as("sb"))
      // nullif guards: an EMPTY snapshot makes its total 0 — JSD is
      // undefined there and must surface as NULL, not an ANSI div error
      .select(col("ta").as("n_base"), col("tb").as("n_cur"),
        expr("(sa div nullif(ta, 0) + sb div nullif(tb, 0)) div 2").as("jsd_micro"))
  }

  /** Per-GROUP PSI — the form a stratified corpus monitor actually runs
    * ("which language/source drifted?"): one row per group. */
  def psiByGroup(
      base: DataFrame, current: DataFrame, groupCol: String, valueCol: String,
      width: Long, buckets: Int): DataFrame =
    psiFrom(psiBucketsBy(base, current, Seq(groupCol), valueCol, width, buckets),
      Seq(groupCol), buckets)

  /** Second-moment embedding drift: per dimension pair (i ≤ j), the
    * unbiased-covariance difference between a reference and a current
    * vector population — the axis [[embeddingShift]] (first moment) cannot
    * see: a distribution can keep its centroid while its correlation
    * structure rotates (a fine-tune regression signature), and this is the
    * pair-level report that localizes WHICH feature pair moved. Built as a
    * pure composition of two [[Embeddings.covarianceNum]] passes: each
    * integer numerator divides by its own n·(n−1) (truncating — exact in
    * both engines), the two matrices join on (i, j), and the shift is the
    * absolute difference. With a degree-2 polynomial kernel this is
    * exactly the entry-wise witness of an MMD-style two-sample statistic,
    * made bit-portable by staying in integers.
    *
    * Shape: each corpus is touched once (the covariance passes); the join
    * runs over two d(d+1)/2-row METADATA relations. Populations need n ≥ 2
    * — enforced loudly, since n < 2 makes the unbiased divisor zero. */
  def covShift(ref: DataFrame, cur: DataFrame, idCol: String, vecCol: String): DataFrame = {
    def half(df: DataFrame, tag: String): DataFrame =
      Embeddings.covarianceNum(df, idCol, vecCol)
        .select(col("i"), col("j"),
          when(col("n") < 2,
            raise_error(lit(s"covShift: $tag population needs at least 2 vectors")))
            .otherwise(expr("cov_num div (n * (n - 1))")).as(s"cov_$tag"))
    // FULL outer + loud mismatch: an inner join would silently drop every
    // dimension pair present in only one population — a truncated export
    // (64-dim ref vs 32-dim cur) would hide exactly the drifted dims
    half(ref, "ref").join(half(cur, "cur"), Seq("i", "j"), "full_outer")
      .withColumn("shift",
        when(col("cov_ref").isNull || col("cov_cur").isNull,
          raise_error(concat(lit("covShift: dimension pair ("),
            col("i").cast("string"), lit(", "), col("j").cast("string"),
            lit(") exists in only one population — "),
            lit("the two embedding sets have different dimensionality"))))
          .otherwise(abs(col("cov_ref") - col("cov_cur"))))
  }

  /** Top-k churn between two weighted key snapshots (vocabulary drift the
    * HEAD can see): rank both snapshots by (weight desc, key asc — total
    * tie-break, the cross-engine determinism contract), keep each side's
    * top k, and emit the union with both ranks (0 = absent from that
    * side's top k). PSI/KS/JS measure distribution-shape drift; this
    * answers the editorial question "which dominant terms entered or left"
    * — the two monitors fire on different regressions (a stopword-list
    * change moves the head without moving the shape much, and vice versa).
    *
    * Inputs are already-aggregated (key, weight) relations — compose with
    * any upstream counter. Exactness: ranks via row_number over the fully
    * tie-broken order; all outputs integer.
    *
    * Scale shape: the rank window is global BUT over the aggregated key
    * domain (vocabulary-sized, not corpus-sized — the frequency-spectrum
    * contract); the top-k join is k-row broadcast-sized. Returns
    * (key, w_old, w_new, rank_old, rank_new) for keys in either top k,
    * ordered columns only — callers add the total ORDER BY. */
  def topkChurn(oldW: DataFrame, newW: DataFrame, keyCol: String,
      weightCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, "k must be positive")
    def top(df: DataFrame, side: String): DataFrame =
      df.select(col(keyCol).as("key"), col(weightCol).cast("long").as(s"w_$side"))
        .withColumn(s"rank_$side", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col(s"w_$side").desc, col("key").asc)).cast("long"))
        .filter(col(s"rank_$side") <= k)
    top(oldW, "old").join(top(newW, "new"), Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("w_old"), lit(0L)).as("w_old"),
        coalesce(col("w_new"), lit(0L)).as("w_new"),
        coalesce(col("rank_old"), lit(0L)).as("rank_old"),
        coalesce(col("rank_new"), lit(0L)).as("rank_new"))
  }
}
