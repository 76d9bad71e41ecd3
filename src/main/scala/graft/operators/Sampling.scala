package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, shuffle-free sampling and dataset-splitting for training
  * corpora: hash-based train/val/test assignment, per-stratum Bernoulli
  * sampling, and weighted source mixing.
  *
  * All three are pure per-row projections/filters over `md5(key)` — no
  * shuffle, no RNG state, no driver coordination — so they run at scan speed
  * on any corpus size, are reproducible across runs/clusters/engines (md5 is
  * md5 everywhere), and remain STABLE under corpus growth: a document's
  * split/keep decision depends only on its own key, so appending new data
  * never reshuffles existing assignments (the property that keeps eval sets
  * uncontaminated across dataset versions).
  *
  * Selection uses the first hex chars of the digest compared against a
  * precomputed hex threshold: lowercase-hex lexicographic order equals
  * numeric order, so the comparison is engine-portable without any
  * hex-to-int conversion.
  */
object Sampling {

  /** Hex threshold for fraction `f` over `digits` leading md5 hex chars:
    * keep/branch when `substr(md5, 1, digits) < threshold`. */
  private[operators] def hexThreshold(f: Double, digits: Int): String = {
    val space = 1L << (4 * digits)
    val t = math.min(space, math.max(0L, math.floor(f * space).toLong))
    // A full-space threshold needs digits+1 chars so every value compares <.
    if (t == space) "g" // '>' every hex char; simpler than widening
    else s"%0${digits}x".format(t)
  }

  private def bucket(key: Column, digits: Int): Column =
    substring(md5(key.cast("string")), 1, digits)

  /** Assign each row a split label ("train"/"val"/"test"/...) from cumulative
    * md5-bucket thresholds. `fractions` must sum to <= 1 (any remainder falls
    * into the last label). Deterministic per id, order-free, no shuffle. */
  def splitAssign(
      df: DataFrame, idCol: String, fractions: Seq[(String, Double)]): DataFrame =
    splitAssignByKey(df, col(idCol), fractions)

  /** [[splitAssign]] generalized to an arbitrary key expression: the split
    * is a pure function of the KEY, so any rows sharing the key land in the
    * same split — the hook the leakage-safe variants below build on. */
  def splitAssignByKey(
      df: DataFrame, key: Column, fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      "fractions must be non-empty and sum to <= 1")
    val digits = 4
    val h = bucket(key, digits)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    // CASE h < t1 -> l1 WHEN h < t2 -> l2 ... ELSE lastLabel
    val cases = fractions.map(_._1).zip(cum.map(hexThreshold(_, digits)))
    val expr = cases.dropRight(1).foldRight(lit(cases.last._1): Column) {
      case ((label, threshold), rest) => when(h < lit(threshold), lit(label)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe train/val/test split, content form: the assignment key is
    * the NORMALIZED document text, so byte-level variants of one document
    * (casing, whitespace, unicode form) can never straddle the train/eval
    * boundary — the split-time counterpart of normalized exact dedup, and
    * the cheap fix for the classic eval-contamination failure where a dup
    * of a test document trains the model. Still a pure per-row projection:
    * group identity IS the content hash, so no join, no shuffle, and
    * appending data never moves existing assignments. */
  def contentSafeSplit(
      docs: DataFrame, textCol: String, fractions: Seq[(String, Double)]): DataFrame =
    splitAssignByKey(docs,
      graft.functions.Kernels.normalizeTextCol(col(textCol)), fractions)

  /** Leakage-safe split, cluster form: assignment key is the NEAR-DUP
    * cluster label (`components` from [[Dedup.connectedComponents]] over any
    * pair generator — MinHash, SimHash, semantic). Every member of a cluster
    * gets the cluster representative's split, so paraphrases and fuzzy
    * copies can't leak across the boundary either. One broadcast join
    * against the cluster table (dup clusters are a small fraction of a
    * corpus; docs without a cluster fall back to their own id). */
  def clusterSafeSplit(
      docs: DataFrame, idCol: String, components: DataFrame,
      fractions: Seq[(String, Double)]): DataFrame = {
    val comp = components.withColumnRenamed("id", "__cc_id")
    val labeled = docs.join(broadcast(comp), docs(idCol) === comp("__cc_id"), "left")
    splitAssignByKey(labeled, coalesce(col("component"), docs(idCol)), fractions)
      .drop("__cc_id", "component")
  }

  /** Per-stratum deterministic Bernoulli sample: keep a row iff
    * md5(stratum:id) falls under the stratum's threshold. One digest compare
    * per row — at 100 TB this is a scan-speed filter that composes with
    * partition pruning (no repartition, no per-stratum pass). */
  def sampleStratified(
      df: DataFrame, idCol: String, strataCol: String, fraction: Double): DataFrame =
    mixWeighted(df, idCol, strataCol, Map.empty, fraction)

  /** Weighted source mixing: per-stratum keep fractions (e.g. upweight
    * curated sources, downsample crawl) with `default` for strata not in
    * `weights`. The standard corpus-mixing step expressed as one
    * deterministic filter. */
  def mixWeighted(
      df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double], default: Double): DataFrame = {
    val digits = 8
    val h = bucket(concat_ws(":", col(strataCol), col(idCol).cast("string")), digits)
    val thr = weights.toSeq.sortBy(_._1).foldRight(lit(hexThreshold(default, digits)): Column) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === lit(stratum), lit(hexThreshold(f, digits))).otherwise(rest)
    }
    df.filter(h < thr)
  }

  /** EXACTLY k rows per stratum (deterministic reservoir): rank rows inside
    * each stratum by md5(stratum:id) — a uniform, reproducible order — and
    * keep rank <= k. Where [[mixWeighted]] keeps a FRACTION (count varies
    * with stratum size), this enforces a hard per-source quota, the cap a
    * mixture spec needs for oversized crawl sources.
    *
    * Plan shape: one shuffle on the stratum key + a rank; Spark's
    * WindowGroupLimit pushes the `<= k` bound INTO the sort (partial top-k
    * per map task before the shuffle), so no stratum ever materializes fully
    * sorted — the 100 TB-safe form of "sample k per group". Fully
    * oracle-expressible (row_number over md5 order). */
  def capPerStratum(
      df: DataFrame, idCol: String, strataCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat_ws(":", col(strataCol), col(idCol).cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Class rebalancing by RATIO-linked downsampling: every class keeps at
    * most `ratio × (smallest class size)` hash-ranked rows — the standard
    * majority-class cut before training on imbalanced labels, where
    * [[capPerStratum]]'s fixed k would need manual retuning as data grows.
    * The minority class is never touched, majority classes shrink toward
    * `ratio:1`; ranking is the same md5(class:id) order as every quota in
    * this module (uniform, reproducible, append-stable). One class-count
    * aggregate + one O(1) min + a class-partitioned window. */
  def classBalance(df: DataFrame, idCol: String, classCol: String,
      ratio: Long): DataFrame = {
    require(ratio >= 1, "ratio must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("n_class"))
    val nMin = counts.agg(min(col("n_class")).as("n_min"))
    val h = md5(concat_ws(":", col(classCol), col(idCol).cast("string")))
    val w = Window.partitionBy(col(classCol)).orderBy(h, col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(classCol))
      .crossJoin(broadcast(nMin))
      .filter(col("sample_rank") <= least(col("n_class"), lit(ratio) * col("n_min")))
      .drop("n_class", "n_min")
  }

  /** TOKEN-budget quota per stratum: where [[capPerStratum]] caps the
    * document COUNT, this caps the summed cost column — the mixture step a
    * training recipe actually specifies ("at most N tokens of source X").
    * Docs are hash-ranked (uniform, reproducible, growth-stable) and kept
    * while the running cost total stays within `budget` (greedy prefix: a
    * doc that would overflow the budget is dropped, later smaller docs are
    * NOT back-filled — the deterministic, engine-portable rule). Returns
    * kept rows with their `cost_cum` running total.
    *
    * Plan: one shuffle on the stratum + a per-stratum ordered cumsum. Unlike
    * the rank-k cap there is no WindowGroupLimit pushdown (the cutoff
    * depends on the sum, not a row count), so each stratum sorts fully —
    * bounded by stratum size; pre-filter with [[mixWeighted]] if a stratum
    * is corpus-scale. */
  def capTokenBudget(
      df: DataFrame, idCol: String, strataCol: String, costCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat_ws(":", col(strataCol), col(idCol).cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cost_cum", sum(col(costCol)).over(w).cast("long"))
      .filter(col("cost_cum") <= budget)
  }

  /** Weighted sampling WITHOUT replacement, k rows, inclusion probability
    * increasing in `weightCol`: sequential Poisson sampling (Ohlsson 1998) —
    * rank every row by priority = hash(id) / weight ascending and keep the k
    * smallest. Heavier rows draw proportionally smaller priorities, giving
    * the classic pps-without-replacement approximation, and the whole draw
    * is ONE expression + a distributed top-k (TakeOrdered — no full sort).
    *
    * The priority is `hash60(id) div weight` — TRUNCATING INTEGER division,
    * so unlike the textbook u^(1/w) / -ln(u)/w keys there is no
    * transcendental and no float: the ranking is bit-identical on every
    * engine (DuckDB `//`), which is what lets a hash-compare oracle gate a
    * "random" sample. Collisions (two rows truncating to the same quotient,
    * ~2^-49 per pair in a 60-bit space) break by id.
    *
    * Weights must be >= 1 (caller rescales); rows with larger weight get
    * smaller priorities ~ w times more often, matching pps intuition.
    * Rows with null / zero / negative weight are EXCLUDED up front — a null
    * weight makes `div` null and Spark orders nulls FIRST ascending, so
    * without the filter invalid-weight rows would be guaranteed selected.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    df.filter(col(weightCol) >= 1)
      .withColumn("__h", graft.operators.Sketches.hash60(col(idCol)))
      .withColumn("priority", expr(s"__h div $weightCol"))
      .drop("__h")
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Temperature-scaled stratum sampling allocation — the multilingual-
    * corpus mixing recipe (mT5/XLM-R) at temperature 2: stratum weight
    * `w ∝ n^(1/2)`, so low-resource languages/sources get upweighted
    * relative to their raw share, and the budget splits as
    * `alloc = budget·w div Σw`.
    *
    * Exactness: α is fixed at 1/2 because `sqrt` is IEEE-correctly-rounded
    * in BOTH engines (the r8 drift precedent) — general `pow` is not — and
    * the weight quantizes to 1e-3 fixed point (`floor(√n·1000 + 0.5)`)
    * before any integer arithmetic. The allocation runs DRIVER-SIDE over
    * the stratum domain (languages/sources — bounded metadata, the
    * kmeans-centroid precedent) in BigInt so `budget × weight` cannot
    * overflow at any scale; the oracle twin mirrors it with HUGEINT.
    * One stratum-keyed aggregation is the only cluster work. */
  def temperatureAlloc(df: DataFrame, strataCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be nonnegative")
    val spark = df.sparkSession
    import spark.implicits._
    val per = df.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(per.nonEmpty, "no strata")
    // refuse loudly instead of NPE-ing in sortBy: a null stratum has no
    // defined mixing weight — callers decide whether to coalesce or drop
    require(per.forall(_._1 != null),
      s"temperatureAlloc: null values in stratum column '$strataCol' — coalesce or filter first")
    val perSorted = per.sortBy(_._1)
    val w = perSorted.map { case (_, n) =>
      math.floor(math.sqrt(n.toDouble) * 1000.0 + 0.5).toLong
    }
    val tot = w.map(BigInt(_)).sum
    val rows = perSorted.zip(w).map { case ((s, n), wm) =>
      (s, n, wm, (BigInt(budget) * wm / tot).toLong)
    }
    rows.toSeq.toDF("stratum", "n_docs", "w_milli", "alloc")
  }

  /** CCNet head/middle/tail bucketing (Wenzek et al. '20): per language,
    * split documents into perplexity tertiles under the corpus's own
    * bigram LM — "head" (most fluent) is what CCNet keeps for pretraining,
    * "tail" what it drops, and sampling PER BUCKET is the standard recipe.
    *
    * Exactness: per-doc average log-prob is the truncating integer
    * `logprob_scaled div n_bigrams` (micro-nats, negative; both engines
    * truncate toward zero), and the tertile thresholds are `percentile`
    * over those BIGINTs with literal fractions 0.333333/0.666667 — the
    * interpolated doubles match DuckDB's `quantile_cont` bit-for-bit on
    * BIGINT inputs (r5/r10 precedent, arbitrary fractions held at p90).
    * Docs with zero bigrams carry no fluency evidence and are excluded
    * (the inner join). Thresholds are a languages-sized broadcast. */
  def ccnetBuckets(docs: DataFrame, idCol: String, langCol: String, textCol: String): DataFrame = {
    val lp = TextAnalysis.bigramLogProb(docs, idCol, textCol)
    val scored = docs
      .select(col(idCol).as("doc_id"), col(langCol).cast("string").as("lang"))
      .join(lp, "doc_id")
      .withColumn("avg_lp_micro", expr("logprob_scaled div n_bigrams"))
      .transform(Residuals.persist)
    val th = scored.groupBy(col("lang")).agg(
      expr("percentile(avg_lp_micro, 0.333333)").as("t1"),
      expr("percentile(avg_lp_micro, 0.666667)").as("t2"))
    scored.join(broadcast(th), "lang")
      .withColumn("bucket",
        when(col("avg_lp_micro") >= col("t2"), lit("head"))
          .when(col("avg_lp_micro") >= col("t1"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"), col("avg_lp_micro"), col("bucket"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. '23):
    * score every raw document by how target-like its HASHED N-GRAM bag is
    * under two bucket-unigram models, then keep the top-k. The standard
    * "select pretraining data that looks like the curated domain" step.
    *
    *   score(x) = Σ_b count_x(b) · (ln p_target(b) − ln p_raw(b))
    *
    * Features are word unigrams + adjacent bigrams hashed into `buckets`
    * md5 buckets (engine-portable: `conv(substr(md5(g),1,15),16,10) % B`);
    * both models are add-one smoothed; every ln is [[Features.qln]]
    * (1e-6-quantized BEFORE the order-free integer sum — the BM25
    * pattern), so scores are exact integers. Selection is
    * `ORDER BY score DESC, id LIMIT k` — TakeOrdered, no global sort.
    * Bucket stats are a `buckets`-row broadcast; nothing driver-side
    * grows with the corpus. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String, targetFilter: Column,
      buckets: Int = 64, topK: Int = 100): DataFrame = {
    require(buckets >= 2 && topK >= 1, "bad dsir params")
    val toks = graft.functions.TextFns.tokens(col(textCol))
    val n1 = greatest(size(toks) - 1, lit(0))
    val grams = concat(toks,
      zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
        (a, b) => concat_ws(" ", a, b)))
    val db = docs
      .select(col(idCol).as("doc"), targetFilter.as("is_target"), explode(grams).as("g"))
      .withColumn("b", expr(s"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % $buckets"))
      .groupBy(col("doc"), col("is_target"), col("b")).agg(count(lit(1)).as("cnt"))
      .transform(Residuals.persist)
    val stats = db.groupBy(col("b")).agg(
      sum(when(col("is_target"), col("cnt")).otherwise(lit(0L))).as("ct"),
      sum(col("cnt")).as("cr"))
    val tot = stats.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val scored = db
      .join(broadcast(stats), "b")
      .crossJoin(broadcast(tot))
      .withColumn("term", col("cnt") *
        (Features.qln(col("ct") + 1) - Features.qln(col("tt") + buckets) -
          Features.qln(col("cr") + 1) + Features.qln(col("tr") + buckets)))
      .groupBy(col("doc").as(idCol))
      .agg(sum(col("term")).as("score_scaled"))
    scored.orderBy(col("score_scaled").desc, col(idCol)).limit(topK)
  }

  /** DoReMi-style domain reweighting (Xie et al. '23): iteratively upweight
    * the domains where the proxy model's loss exceeds the corpus baseline,
    * renormalize, repeat — the feedback step the static mixers
    * ([[temperatureAlloc]], token budgets, interleave) lack.
    *
    * Deterministic integer form: the per-domain "excess loss" is the
    * domain's average bigram log-prob deficit vs the corpus under the
    * corpus's own add-one bigram LM ([[TextAnalysis.bigramLogProb]] —
    * micro-nats, already oracle-exact), and the exp(η·excess)
    * multiplicative-weights factor is linearized to
    * `max(1, 10⁶ + η_micro·excess div 10⁶)` (exp→1+x — the same
    * transcendental-avoidance as the integer-mean Lloyd and hard-EM
    * precedents). Each round: w ← w·factor, then renormalize to Σ≈10⁶ by
    * truncating division. Iteration is driver-side over the BOUNDED domain
    * vector (the markovSteadyState precedent); every product is ≤ ~1.5e18.
    *
    * Domains with zero bigrams carry no loss signal and are excluded (the
    * inner join — n_docs counts docs with ≥1 bigram). Returns per domain:
    * (domain, n_docs, loss_micro, excess_micro, weight_micro, alloc_docs)
    * with `alloc_docs = budget·w div Σw`. */
  /** URL/domain blocklist filtering — the C4/RefinedWeb front-door cut that
    * runs BEFORE any content operator ever sees the bytes: canonicalize the
    * URL ([[graft.functions.Kernels.canonicalUrl]]), extract the host, and
    * drop documents whose host falls under a blocked domain (exact match or
    * any parent-domain suffix — blocking `example.com` blocks
    * `ads.example.com`) or whose URL contains a blocked keyword.
    *
    * Scale shape: real blocklists are millions of domains (UT1-class), far
    * beyond an OR-chain literal — so the host explodes into its parent-
    * suffix chain (`a.b.example.com` → 4 suffix rows, depth-bounded fanout)
    * and LEFT-SEMI joins the blocklist, broadcast by default (a few
    * hundred MB of domains broadcasts fine; flip the flag for a shuffle
    * equi-join beyond that). Keyword matching is one scan-local rlike on a
    * literal alternation. Every input row is kept with a verdict — audits
    * must see what was dropped and why ([[Dedup.lineDedup]]'s retention
    * rule); `keep` is BIGINT for cross-engine hashing.
    *
    * Reason precedence: a domain block outranks a keyword hit (domain
    * lists are curated; keyword hits are heuristic). URLs without a host
    * (no `://`) pass the domain cut and still face the keyword cut. */
  def urlFilter(docs: DataFrame, idCol: String, urlCol: String,
      blockedDomains: DataFrame, domainCol: String,
      blockedKeywords: Seq[String] = Nil,
      broadcastBlocklist: Boolean = true): DataFrame = {
    require(blockedKeywords.forall(k => k.nonEmpty && k.matches("[a-z0-9-]+")),
      "keywords must be lowercase alphanumeric tokens (they embed in a regex)")
    val canon = graft.functions.Kernels.canonicalUrlCol(col(urlCol))
    val base = docs.select(col(idCol), col(urlCol),
      canon.as("curl"),
      regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1).as("host"))
    val withParts = base.withColumn("parts",
      when(col("host") =!= "", split(col("host"), "\\.")).otherwise(array()))
    val suffixes = withParts
      .select(col(idCol).as("sid"), explode(
        transform(sequence(lit(1), greatest(size(col("parts")), lit(1))),
          i => array_join(slice(col("parts"), i, size(col("parts"))), "."))).as("sfx"))
      .filter(col("sfx") =!= "")
    val bl0 = blockedDomains.select(col(domainCol).as("sfx")).distinct()
    val bl = if (broadcastBlocklist) broadcast(bl0) else bl0
    val blockedIds = suffixes.join(bl, Seq("sfx"), "left_semi")
      .select(col("sid")).distinct().withColumn("dom_block", lit(1L))
    val kwHit =
      if (blockedKeywords.isEmpty) lit(false)
      else col("curl").rlike("(" + blockedKeywords.mkString("|") + ")")
    base.join(blockedIds, base(idCol) === blockedIds("sid"), "left")
      .select(base(idCol), col(urlCol), col("curl"), col("host"),
        coalesce(col("dom_block"), lit(0L)).as("dom_block"),
        kwHit.cast("long").as("kw_block"))
      .withColumn("keep",
        (col("dom_block") === 0L && col("kw_block") === 0L).cast("long"))
      .withColumn("reason",
        when(col("dom_block") === 1L, lit("domain_blocked"))
          .when(col("kw_block") === 1L, lit("keyword_blocked"))
          .otherwise(lit("ok")))
  }

  def doremiWeights(docs: DataFrame, idCol: String, domainCol: String, textCol: String,
      etaMicro: Long = 100000L, rounds: Int = 5, budget: Long = 1000000L): DataFrame = {
    require(etaMicro >= 0 && rounds >= 1 && budget >= 0, "bad doremi params")
    val spark = docs.sparkSession
    import spark.implicits._
    val lp = TextAnalysis.bigramLogProb(docs, idCol, textCol)
    val dom = docs.select(col(idCol).as("doc_id"), col(domainCol).cast("string").as("domain"))
      .join(lp, "doc_id")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("nb"), sum(col("logprob_scaled")).as("s"))
      .filter(col("nb") > 0)
      .as[(String, Long, Long, Long)].collect()
    require(dom.nonEmpty, "no domain has any bigram")
    // null check BEFORE the sort: sortBy on a null String throws a bare NPE
    // inside Ordering and the actionable message would be unreachable
    require(dom.forall(_._1 != null), "NULL domain value — coalesce or drop first")
    val domSorted = dom.sortBy(_._1)
    val totNb = domSorted.map(_._3).sum
    val totS = domSorted.map(_._4).sum
    val baseLoss = -totS / totNb
    val loss = domSorted.map { case (_, _, nb, s) => -s / nb }
    val excess = loss.map(_ - baseLoss)
    var w = Array.fill(domSorted.length)(1000000L)
    for (_ <- 1 to rounds) {
      val wp = w.indices.map(i =>
        w(i) * math.max(1L, 1000000L + etaMicro * excess(i) / 1000000L)).toArray
      val tot = wp.sum
      w = wp.map(_ * 1000000L / tot)
    }
    val wTot = w.sum
    val rows = domSorted.indices.map { i =>
      (domSorted(i)._1, domSorted(i)._2, loss(i), excess(i), w(i), budget * w(i) / wTot)
    }
    spark.createDataset(rows.toSeq)
      .toDF("domain", "n_docs", "loss_micro", "excess_micro", "weight_micro", "alloc_docs")
  }

  /** Data-constrained epoch allocation (the Muennighoff '23 recipe's
    * deterministic core): the token budget targets an EQUAL per-source
    * share (the uniform mixture — non-uniform mixtures compose via
    * [[mixWeighted]]/[[temperatureAlloc]] upstream), but each source's
    * draw is CAPPED at `maxEpochs` repeats of its actual tokens — the rule
    * that stops a small high-value source from being scheduled 40 epochs
    * when scaling laws say repeats past ~4 stop helping. Per source:
    * `alloc = min(budget div n_sources, maxEpochs·tokens)` and
    * `epochs_micro = alloc·10⁶ div tokens` via the exact nonneg
    * decomposition `(a div d)·k + ((a mod d)·k) div d` (sizes must be
    * non-negative — the decomposition is invalid across zero, the r11
    * rule; negatives raise loudly). `unallocated` reports ONLY the budget
    * the CAPS stranded (Σ share − alloc over capped sources) so a caller
    * that rescales-or-stops on it never reacts to the ≤ n_sources−1
    * tokens of integer-division remainder, which is rounding, not
    * capping.
    *
    * Shape: one map-side-combined aggregation to the SOURCE domain + one
    * one-row broadcast; the closing window runs over the source-domain
    * relation (metadata-sized by definition). Corpus touched once. */
  def epochAlloc(df: DataFrame, strataCol: String, sizeCol: Column,
      budget: Long, maxEpochs: Int = 4): DataFrame = {
    require(budget >= 0, "budget must be nonnegative")
    require(maxEpochs >= 1, "maxEpochs must be positive")
    val sz = when(sizeCol.cast("long") < 0,
      raise_error(lit("epochAlloc: negative sizes break the truncating-division decomposition")))
      .otherwise(sizeCol.cast("long"))
    val per = df.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(sum(sz).as("tokens"))
    val tot = per.agg(count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(col("stratum"), col("tokens"), col("n_sources"),
        least(
          expr(s"$budget div n_sources"),
          expr(s"${maxEpochs.toLong} * tokens")).as("alloc"))
      .withColumn("epochs_micro",
        expr("CASE WHEN tokens = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "(alloc div tokens) * 1000000 + ((alloc % tokens) * 1000000) div tokens END"))
      .withColumn("total_alloc", sum(col("alloc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("stratum"), col("tokens"), col("alloc"), col("epochs_micro"),
        // cap-stranded only: n·share − Σ alloc (the global remainder
        // budget % n is rounding, not capping — excluded by construction)
        greatest(col("n_sources") * expr(s"$budget div n_sources") - col("total_alloc"),
          lit(0L)).as("unallocated"))
  }

  /** 2-D Pareto front (skyline) over two maximize-me integer signals — the
    * data-selection answer when two quality axes genuinely trade off
    * (length vs diversity, fluency vs rarity): a doc survives iff NO other
    * doc is at least as good on both axes and strictly better on one.
    * Naively O(n²); here it is two window passes over the DISTINCT-X
    * relation: per x, `ymax(x)`; then `M(x) = max ymax over x' > x`
    * (cumulative max over x descending, exclusive frame). A doc is on the
    * front iff `y = ymax(x)` (nothing at the same x beats it) AND
    * `y > M(x)` (nothing at strictly larger x ties-or-beats it) — ties on
    * both axes all survive, the standard skyline reading. NULL in either
    * signal raises (a null coordinate has no dominance order).
    *
    * Shape: one map-side-combined agg to the x-domain + one window over
    * that DOMAIN relation (the [[Eval.aucExact]]/KS scale argument:
    * bounded by the value domain, not the corpus) + one broadcast-ready
    * equi-join back. */
  def paretoFront(df: DataFrame, idCol: String, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def checked(c: Column, n: String): Column =
      when(c.cast("long").isNull,
        raise_error(lit(s"paretoFront: NULL $n signal has no dominance order")))
        .otherwise(c.cast("long"))
    val pts = df.select(col(idCol), checked(xCol, "x").as("x"), checked(yCol, "y").as("y"))
    val dom = pts.groupBy(col("x")).agg(max(col("y")).as("ymax"))
    val w = Window.orderBy(col("x").desc).rowsBetween(Window.unboundedPreceding, -1)
    val front = dom
      .withColumn("m", max(col("ymax")).over(w))
      .filter(col("m").isNull || col("ymax") > col("m"))
      .select(col("x"), col("ymax"))
    pts.join(front, Seq("x"))
      .filter(col("y") === col("ymax"))
      .select(col(idCol), col("x"), col("y"))
  }

  /** Neyman-optimal stratified sample allocation: stratum h of a total
    * budget n gets n·(N_h·σ_h)/Σ(N_k·σ_k) — minimum-variance estimation
    * for a fixed budget, vs proportional allocation's one-size-fits-all
    * (a high-variance stratum needs more samples per row). The whole
    * computation is cross-engine exact: N·σ = √(N·Σx² − (Σx)²) IDENTICALLY
    * (the population-σ algebra cancels the divisions), sqrt is
    * IEEE-correctly-rounded in both engines, and the final rounding is
    * largest-remainder (ties toward the smaller stratum key) so
    * allocations sum to exactly n. A zero-variance stratum weighs 0 (one
    * sample estimates it perfectly — allocate separately if you must read
    * it); if EVERY stratum is constant the allocation falls back to
    * proportional-by-count. Allocations may exceed a stratum's row count
    * on extreme skew — the caller caps and re-runs on the remainder
    * (documented, not silently redistributed). The AGGREGATES (Σx, Σx²)
    * stay exact integers — Σx² < 2^63 is the bound, ANSI raises loudly
    * beyond it (quantize the value column down for huge strata); the
    * weight itself multiplies them as DOUBLES (identical IEEE ops on
    * identical operands in both engines — the chi2Of precedent), with the
    * near-zero-variance difference clamped at 0 before the sqrt.
    *
    * Shape: one map-side-combined stratum aggregate, then windows over the
    * STRATUM DOMAIN (metadata-sized by definition — the shardBySize
    * contract). Output (stratum, n_rows, weight, alloc). */
  def neymanAlloc(df: DataFrame, stratumCol: String, value: Column,
      n: Long): DataFrame = {
    require(n >= 0, "budget must be nonnegative")
    val agg = df.select(col(stratumCol).cast("string").as("stratum"),
        value.cast("long").as("x"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .withColumn("w",
        floor(sqrt(greatest(lit(0.0d),
          col("n_rows").cast("double") * col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double")))).cast("long"))
    val all = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val remRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("stratum").asc)
    agg
      .withColumn("tot_w", sum(col("w")).over(all))
      .withColumn("weight",
        when(col("tot_w") > 0, col("w")).otherwise(col("n_rows")))
      .withColumn("tw",
        when(col("tot_w") > 0, col("tot_w"))
          .otherwise(sum(col("n_rows")).over(all)))
      .withColumn("base", expr(s"weight * $n div tw"))
      .withColumn("rem", expr(s"(weight * $n) % tw"))
      .withColumn("spill", lit(n) - sum(col("base")).over(all))
      .withColumn("rnk", row_number().over(remRank))
      .select(col("stratum"), col("n_rows"), col("weight"),
        (col("base") + when(col("rnk") <= col("spill"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Greedy maximum-coverage selection — the COVERAGE axis of data
    * selection beside [[graft.operators.Similarity.kcenterSelect]]'s
    * diversity and [[dsirSelect]]'s importance: pick `k` documents that
    * together cover the most distinct vocabulary (the classic (1−1/e)
    * greedy for submodular coverage — eval-set construction, probe-corpus
    * picking, "which docs teach the most new words"). Deterministic:
    * argmax ties break toward the smaller id.
    *
    * Each of the k rounds is one anti-join of the (doc, token) stream
    * against the covered-token set + one count aggregate + a TakeOrdered(1)
    * collect — O(k · stream) with driver state of ONE row per round; the
    * covered set is a token-domain-sized DataFrame, checkpoint-truncated
    * per round (its union chain would otherwise nest k plans deep). Output
    * (round, doc_id, gain, covered_total); already-selected docs are
    * excluded so gains are strictly the marginal coverage. */
  def coverageSelect(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1 && k <= 64, "k in [1, 64] — one driver round per pick")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(graft.functions.TextFns.tokens(col(textCol)))).as("tok"))
      .transform(Residuals.persist)
    // covered set DERIVED from the picked-id literals against the cached
    // token relation (r17): it was previously a checkpoint-truncated
    // union chain — one extra materialization job per pick; deriving it
    // keeps the round at ONE job (the argmax collect) with a
    // constant-depth plan, k is <= 64 by contract so the isin literal
    // stays trivially bounded
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    def covered: DataFrame =
      toks.filter(col("id").isin(picked.toSeq: _*)).select(col("tok")).distinct()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var total = 0L
    var r = 1
    while (r <= k) {
      val gains = toks
        .filter(if (picked.isEmpty) lit(true) else !col("id").isin(picked.toSeq: _*))
        .join(covered, Seq("tok"), "left_anti")
        .groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id").asc)
        .limit(1).collect()
      if (gains.isEmpty) r = k + 1 // every remaining doc fully covered: stop
      else {
        val (id, gain) = (gains(0).getLong(0), gains(0).getLong(1))
        total += gain
        out += ((r.toLong, id, gain, total))
        picked += id
        r += 1
      }
    }
    out.toSeq.toDF("round", "doc_id", "gain", "covered_total")
  }
}
