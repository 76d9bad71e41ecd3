package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation: stats, quantiles, sampling/splitting/mixing, batch construction, profiling, quality rules, pipeline compiler.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait CurationQueries extends QueryHelpers {

  protected def curationQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "quality_conflicts" -> ((s, dir) => {
      // conflicting-duplicate audit: identical content carrying different
      // metadata — the label noise exact dedup silently resolves by
      // keeping an arbitrary winner. Conflicts are PLANTED (every 7th doc
      // re-tagged 'xx' — the clean fixture has no exact dups, the
      // code_detect non-vacuous-branch lesson)
      val docs = t(s, dir, "documents")
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
          lit("xx").as("lang"))
      val all = docs.select(col("doc_id"), col("text"), col("lang")).union(planted)
      graft.operators.Quality.conflictingRecords(all, md5(col("text")), col("lang"))
        .orderBy(col("content_key"))
    }),


    "feature_rank_corr" -> ((s, dir) => {
      // Spearman ρ between character count and token count — the
      // feature-redundancy audit (monotone dependence, not just linear);
      // ranks fully tie-broken by id, ρ one IEEE division of exact
      // integer operands
      val d = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars").cast("long").as("a"),
        size(TextFns.tokens(col("text"))).cast("long").as("b"))
      graft.operators.Features.spearman(d, "doc_id", "a", "b")
    }),


    "feature_quantile_bins" -> ((s, dir) => {
      // equi-depth binning WITHOUT ntile's global sort: k-1 exact percentile
      // thresholds (one aggregate; Spark percentile == DuckDB quantile_cont
      // bit-for-bit on BIGINT) + a scan-speed comparison assignment
      graft.operators.Features.binByQuantiles(t(s, dir, "documents"), "n_chars", k = 8)
        .orderBy(col("bin"))
    }),

    "feature_hashing" -> ((s, dir) => {
      // hashing-trick featurization (vocabulary-free, zero driver state):
      // per-doc sparse-vector stats over 64 signed buckets — integer-exact
      graft.operators.Features.hashingTrick(
        spread(t(s, dir, "documents")), "doc_id", "text", numFeatures = 64)
        .orderBy(col("doc_id"))
    }),

    "corpus_source_gini" -> ((s, dir) => {
      // source-contribution inequality: Gini over per-source character
      // totals — the "one crawl dominating the mix" scalar; exact pair
      // formula over the source-domain relation, 1e-6 fixed point
      graft.operators.Features.giniOf(
        t(s, dir, "documents"), "source", col("n_chars"))
    }),

    "feature_quantile_norm" -> ((s, dir) => {
      // rank-based quantile normalization of n_chars: exact empirical
      // quantile in micro fixed point, ranks tie-broken by doc_id,
      // computed through the distributed Ranks decomposition (no global
      // window — the r16 WindowAudit-clean rank path)
      graft.operators.Features.quantileNorm(
        t(s, dir, "documents"), "doc_id", "n_chars")
        .withColumnRenamed("id", "doc_id")
        // operator keeps the input's raw type (it ranks the raw column —
        // r17); the gate normalizes integer widths to BIGINT as usual
        .withColumn("value", col("value").cast("long"))
        .orderBy(col("doc_id"))
    }),

    "quality_fk_orphans" -> ((s, dir) => {
      // star-schema referential integrity: one anti-join flag + one
      // aggregate per relationship; the orders parent is PRUNED (%10 != 0)
      // so the lineitem check reports real planted orphans beside the two
      // clean relationships
      graft.operators.Quality.fkOrphans(Seq(
        ("lineitem->orders_pruned", t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders").filter(col("o_orderkey") % 10 =!= 0), "o_orderkey"),
        ("lineitem->part", t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        ("orders->customer", t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey")))
        .orderBy(col("relationship"))
    }),

    "curation_pipeline_privacy" -> ((s, dir) => {
      // the round-10 steps through the YAML pipeline compiler: normalize →
      // repetition filter (integer per-mille gate) → k-anonymity
      // suppression — the whole chain re-derived by the oracle
      val pipelineYaml =
        """steps:
          |  - { op: normalize }
          |  - { op: filter_repetition, max_dup_permille: 600 }
          |  - { op: k_anonymity, quasi_id: [lang, source], k: 4 }
          |""".stripMargin
      graft.operators.CurationPipeline.runYaml(
        t(s, dir, "documents"), "doc_id", "text", pipelineYaml)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "feature_robust_scale" -> ((s, dir) => {
      // outlier-immune standardization: (x - median)/IQR in 1e-6 fixed
      // point, quartiles carried x4 so .25/.75 interpolation is integer
      graft.operators.Features.robustScale(t(s, dir, "documents"), "doc_id", "n_chars")
        .orderBy(col("doc_id"))
    }),

    "quality_completeness" -> ((s, dir) => {
      // per-source completeness: null counts/per-mille per column over a
      // corpus with PLANTED per-field nulls — the broken-feed monitor a
      // global null rate hides; one aggregation pass, stack-unpivoted
      val docs = t(s, dir, "documents")
        .withColumn("lang", when(col("doc_id") % 13 === 0, lit(null)).otherwise(col("lang")))
        .withColumn("text", when(col("doc_id") % 17 === 0, lit(null)).otherwise(col("text")))
      graft.operators.Quality.completeness(docs, "source", Seq("text", "lang", "n_chars"))
        .orderBy(col("source"), col("column"))
    }),

    "sample_temperature" -> ((s, dir) => {
      // temperature-2 multilingual mixing (mT5 recipe): per-lang allocation
      // of a 1M-doc budget with weights ~ sqrt(n) — driver-side BigInt over
      // the lang domain, sqrt's IEEE parity makes it oracle-exact
      graft.operators.Sampling.temperatureAlloc(
        t(s, dir, "documents"), "lang", budget = 1000000L)
        .orderBy(col("stratum"))
    }),

    "sample_epoch_alloc" -> ((s, dir) => {
      // data-constrained epoch allocation: uniform per-source token target
      // (108000 div 20 = 5400) capped at 4 epochs of actual tokens — the
      // smaller sources cap (4·tokens < 5400), the rest take the share;
      // unallocated reports the budget the caps stranded
      graft.operators.Sampling.epochAlloc(
        spread(t(s, dir, "documents")), "source",
        graft.functions.TextFns.tokenCount(col("text")).cast("long"),
        budget = 108000L, maxEpochs = 4)
        .orderBy(col("stratum"))
    }),


    "curation_url_filter" -> ((s, dir) => {
      // web front-door cut: synthesized per-doc URLs — every 5th doc sits
      // on a subdomain of a (maybe-)blocked parent domain, exercising the
      // suffix-chain match (track0/track1 blocked, track2 passes); every
      // remaining 7th carries a blocked keyword in its path; the rest pass.
      // The blocklist rides as a DataFrame (broadcast left-semi), not a
      // literal OR-chain — the real-blocklist (millions of domains) shape
      import s.implicits._
      val d = spread(t(s, dir, "documents"))
      val urls = d.select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(lit("https://ads.track"), (col("doc_id") % 3).cast("string"),
            lit(".example.com/page/"), col("doc_id").cast("string")))
          .when(col("doc_id") % 7 === 0,
            concat(lit("https://www."), col("source"), lit(".org/casino/"),
              col("doc_id").cast("string")))
          .otherwise(concat(lit("https://www."), col("source"), lit(".org/article/"),
            col("doc_id").cast("string")))
          .as("url"))
      val blocklist = Seq("track0.example.com", "track1.example.com", "gamble.net")
        .toDF("domain")
      graft.operators.Sampling.urlFilter(urls, "doc_id", "url", blocklist, "domain",
        blockedKeywords = Seq("casino", "poker"))
        .orderBy(col("doc_id"))
    }),

    "curation_pipeline_url" -> ((s, dir) => {
      // the URL cut THROUGH the YAML pipeline compiler — same synthesized
      // URLs and blocklist as curation_url_filter, composed as a step so
      // the config path and the direct operator stay in lockstep
      val pipelineYaml =
        """steps:
          |  - op: filter_url
          |    url_col: url
          |    blocked_domains: [track0.example.com, track1.example.com, gamble.net]
          |    blocked_keywords: [casino, poker]
          |""".stripMargin
      val d = spread(t(s, dir, "documents"))
      val docs = d.select(col("doc_id"), col("lang"), col("source"), col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit("https://ads.track"), (col("doc_id") % 3).cast("string"),
            lit(".example.com/page/"), col("doc_id").cast("string")))
          .when(col("doc_id") % 7 === 0,
            concat(lit("https://www."), col("source"), lit(".org/casino/"),
              col("doc_id").cast("string")))
          .otherwise(concat(lit("https://www."), col("source"), lit(".org/article/"),
            col("doc_id").cast("string")))
          .as("url"))
      graft.operators.CurationPipeline.runYaml(docs, "doc_id", "text", pipelineYaml)
        .select(col("doc_id"), col("url"))
        .orderBy(col("doc_id"))
    }),

    "sample_ccnet_buckets" -> ((s, dir) => {
      // CCNet head/middle/tail: per-lang perplexity tertiles under the
      // corpus bigram LM — integer avg log-prob, BIGINT-percentile
      // thresholds (bit-stable cross-engine), languages-sized broadcast
      graft.operators.Sampling.ccnetBuckets(
        t(s, dir, "documents"), "doc_id", "lang", "text")
        .orderBy(col("doc_id"))
    }),

    "sample_dsir" -> ((s, dir) => {
      // DSIR importance selection: hashed unigram+bigram bag (64 md5
      // buckets), add-one bucket-unigram target (lang='en') vs raw models,
      // qln-exact integer scores, top-100 by (score desc, id) — the
      // "select raw data that looks like the curated domain" step
      graft.operators.Sampling.dsirSelect(
        t(s, dir, "documents"), "doc_id", "text", col("lang") === "en")
        .orderBy(col("doc_id"))
    }),

    "sample_doremi" -> ((s, dir) => {
      // DoReMi domain reweighting: 5 multiplicative-weights rounds over the
      // per-lang excess bigram-LM loss (micro-nats), exp linearized to
      // max(1, 1e6 + eta*excess div 1e6) — driver iteration over the
      // bounded domain vector, every round re-derived as an unrolled CTE
      graft.operators.Sampling.doremiWeights(
        t(s, dir, "documents"), "doc_id", "lang", "text")
        .orderBy(col("domain"))
    }),

    "sample_class_balance" -> ((s, dir) => {
      // ratio-linked majority-class downsampling: every lang keeps at most
      // 2 x the smallest lang's count, hash-ranked — en (218) drops to 128
      // (2 x fr's 64), the rest pass untouched
      graft.operators.Sampling.classBalance(
        t(s, dir, "documents"), "doc_id", "lang", ratio = 2L)
        .select(col("doc_id"), col("lang"), col("sample_rank"))
        .orderBy(col("doc_id"))
    }),

    "sample_neyman" -> ((s, dir) => {
      // minimum-variance stratified budget split: 1000 samples over order
      // priorities by N_h*sigma_h of the order total — exact integer
      // weights via sqrt(N*Sx2 - Sx^2), largest-remainder rounding
      graft.operators.Sampling.neymanAlloc(
        t(s, dir, "orders"), "o_orderpriority",
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 100"), n = 1000L)
        .orderBy(col("stratum"))
    }),


    "sample_coverage" -> ((s, dir) => {
      // greedy maximum-coverage pick of 5 docs — the coverage axis of data
      // selection beside k-center's diversity and DSIR's importance. The
      // covered "vocabulary" is word BIGRAMS (the corpus's 31-unigram
      // vocabulary saturates in one pick — a vacuous gate); oracle unrolls
      // all 5 argmax rounds (the kcenter precedent)
      val bi = docsAsBigrams(s, dir).filter(length(col("btext")) > 0)
      graft.operators.Sampling.coverageSelect(spread(bi), "doc_id", "btext", k = 5)
        .orderBy(col("round"))
    }),


    "curation_pipeline_gopher" -> ((s, dir) => {
      // the full Gopher rule battery as a YAML gate (word band tightened
      // so both keep and drop branches fire on this corpus), chained with
      // a length floor — the standard pre-filter front half
      val pipelineYaml =
        """steps:
          |  - { op: filter_gopher, min_words: 25, max_words: 70 }
          |  - { op: filter_length, min_chars: 120 }
          |""".stripMargin
      graft.operators.CurationPipeline.runYaml(
        t(s, dir, "documents"), "doc_id", "text", pipelineYaml)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "curation_pipeline_lm" -> ((s, dir) => {
      // the CCNet-style LM gate through the YAML pipeline compiler: docs
      // below -3.39 nats/bigram under the frame's own bigram LM are
      // dropped — integer threshold comparison, whole chain re-derived
      val pipelineYaml =
        """steps:
          |  - { op: filter_lm, min_avg_micro: -3390000 }
          |""".stripMargin
      graft.operators.CurationPipeline.runYaml(
        t(s, dir, "documents"), "doc_id", "text", pipelineYaml)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "feature_target_enc" -> ((s, dir) => {
      // smoothed mean target encoding of order priority against the order
      // total (micro-cents fixed point), with the leakage-safe leave-one-out
      // variant per row — category stats broadcast, no window
      graft.operators.Features.targetEncode(
        t(s, dir, "orders"), "o_orderkey", "o_orderpriority",
        cents(col("o_totalprice")), smoothing = 10L)
        .orderBy(col("id"))
    }),

    "feature_perceptron" -> ((s, dir) => {
      // quality-classifier training, cross-engine exact: 3 batch-perceptron
      // rounds predicting en-ness from [bias, token count, type-diversity
      // permille] — every update is an integer aggregate, the weight
      // vector is driver metadata, and the whole trajectory hash-matches
      import graft.functions.TextFns
      val docs = spread(t(s, dir, "documents"))
      val feats = docs.select(col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("nt"),
        size(array_distinct(TextFns.tokens(col("text")))).cast("long").as("ty"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
        .filter(col("nt") > 0)
        .select(array(lit(1L), col("nt"), expr("ty * 1000 div nt")).as("x"), col("y"))
      graft.operators.Features.perceptron(feats, col("x"), col("y"), rounds = 3)
        .orderBy(col("round"), col("dim"))
    }),


    "events_bot_score" -> ((s, dir) => {
      // traffic front-door cut: metronomic timing (50) + low behavioral
      // entropy (25) + burst peak (25) fused per user — a pure composition
      // of three gated signals, thresholds picked to split this fixture
      graft.operators.Behavior.botScore(events(s, dir), "user_id", "ts", "event_type")
        .orderBy(col("user_id"))
    }),


    "feature_woe" -> ((s, dir) => {
      // weight-of-evidence encoding of order priority against fulfilled
      // status + information-value contributions — four separately
      // quantized qln terms (no products inside ln), Laplace smoothing
      graft.operators.Features.woeEncode(
        t(s, dir, "orders"), "o_orderpriority", col("o_orderstatus") === "F")
        .orderBy(col("category"))
    }),

    "emb_sq_quantize" -> ((s, dir) => {
      // per-dimension min/max scalar quantization to 8-bit codes + exact
      // integer reconstruction error — the faiss-SQ calibration twin of
      // emb_int8's global absmax scaling
      graft.operators.Embeddings.quantizeScalar(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))
    }),

    "corpus_moments" -> ((s, dir) => {
      // mergeable higher moments: per-lang integer power sums Σx..Σx⁴ +
      // fixed-point mean + variance numerator — the one-pass sketch that
      // carries skew/kurtosis through incremental ingests (merge == direct,
      // spec-pinned)
      graft.operators.Features.powerSums(t(s, dir, "documents"), "lang", "n_chars")
        .orderBy(col("lang"))
    }),

    "curation_k_anonymity" -> ((s, dir) => {
      // privacy audit: (lang, source) combinations held by fewer than k=5
      // docs — the suppression list before a release
      graft.operators.Features.kAnonymityViolations(
        t(s, dir, "documents"), Seq("lang", "source"), k = 5L)
        .orderBy(col("lang"), col("source"))
    }),


    "profile_documents" -> ((s, dir) => {
      // one-pass table profiler (ANALYZE TABLE for the corpus): per-column
      // row/null/exact-distinct counts and min/max, one scan via Expand
      graft.operators.Features.profile(
        t(s, dir, "documents"), Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("column"))
    }),


    "quality_benford" -> ((s, dir) => {
      // Benford first-digit audit over order totals in cents — the
      // fabricated-amounts detector; literal expectation table, exact
      // decomposed shares, nonpositives excluded not binned
      graft.operators.Quality.benford(
        t(s, dir, "orders"), cents(col("o_totalprice")))
        .orderBy(col("digit"))
    }),


    "quality_check" -> ((s, dir) => {
      // declarative data-quality expectations, ALL evaluated in one
      // aggregation pass: nullability, uniqueness, range, accepted values.
      // The in_range(n_chars, 1, 500) rule intentionally FAILS on this
      // corpus (max 553) so the gate covers both verdicts.
      graft.operators.Quality.check(t(s, dir, "documents"), Seq(
        graft.operators.Quality.notNull("doc_id"),
        graft.operators.Quality.unique("doc_id"),
        graft.operators.Quality.inRange("n_chars", 1L, 500L),
        graft.operators.Quality.acceptedValues("lang",
          Seq("de", "en", "es", "fr", "zh"))))
        .orderBy(col("rule"))
    }),


    "quality_conditional" -> ((s, dir) => {
      // cross-field expectations: implies (Deequ satisfies-where) and
      // composite-key uniqueness, still ONE aggregation pass; the
      // over-50 purchase rule intentionally fails so both verdicts gate
      val q = graft.operators.Quality
      q.check(events(s, dir), Seq(
        q.implies("purchase_value_positive",
          col("event_type") === "purchase", col("value") > 0.0),
        q.implies("purchase_value_over_50",
          col("event_type") === "purchase", col("value") > 50.0),
        q.uniqueTogether(Seq("user_id", "ts")),
        q.uniqueTogether(Seq("event_type", "event_id"))))
        .orderBy(col("rule"))
    }),


    "sample_pareto_front" -> ((s, dir) => {
      // 2-D skyline data selection over (token count, type diversity
      // permille): survivors are the docs no other doc ties-or-beats on
      // both axes — window over the distinct-length DOMAIN, never n²
      import graft.functions.TextFns
      val sig = spread(t(s, dir, "documents")).select(col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("n_toks"),
        size(array_distinct(TextFns.tokens(col("text")))).cast("long").as("n_types"))
        .filter(col("n_toks") > 0)
        .select(col("doc_id"), col("n_toks"),
          expr("n_types * 1000 div n_toks").as("div_permille"))
      graft.operators.Sampling.paretoFront(sig, "doc_id",
        col("n_toks"), col("div_permille"))
        .orderBy(col("doc_id"))
    }),


    "corpus_snapshot_diff" -> ((s, dir) => {
      // ingest audit: row-level added/removed/changed/unchanged between two
      // snapshots — one full-outer equi-join on the key, null-safe column
      // compare. The "current" snapshot is derived deterministically:
      // every 11th doc dropped, every 7th n_chars bumped, 20 new keys.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), col("lang"))
      val cur = docs.filter(col("doc_id") % 11 =!= 0)
        .withColumn("n_chars",
          when(col("doc_id") % 7 === 0, col("n_chars") + 1).otherwise(col("n_chars")))
        .unionByName(docs.filter(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + 1000000))
      graft.operators.Quality.snapshotDiff(docs, cur, "doc_id", Seq("n_chars", "lang"))
        .orderBy(col("doc_id"))
    }),


    "sample_weighted" -> ((s, dir) => {
      // sequential Poisson weighted sampling without replacement: 100 docs,
      // inclusion odds ~ n_chars, integer-exact priorities (no ln/pow)
      graft.operators.Sampling.weightedSample(
        t(s, dir, "documents"), "doc_id", "n_chars", 100)
        .select(col("doc_id"), col("n_chars"), col("priority"))
        .orderBy(col("priority"), col("doc_id"))
    }),


    "curation_quality_band" -> ((s, dir) => {
      // per-lang quantile-band filter: drop the junk tail and the
      // suspiciously-perfect top relative to each group's own distribution
      TextAnalysis.qualityBand(spread(t(s, dir, "documents")), "doc_id", "text",
        "lang", lo = 0.1, hi = 0.9)
        .orderBy(col("doc_id"))
    }),


    "curation_keep" -> ((s, dir) => {
      // thresholds chosen to split this corpus (~p25 quality, ~p66 dup):
      // the decision column must actually discriminate for the oracle to
      // prove anything
      TextAnalysis.curationKeep(
        spread(t(s, dir, "documents")), "doc_id", "text",
        minQuality = 0.85, allowedLangs = Seq("en", "es", "de", "fr"), maxDupFrac = 0.04)
        .withColumn("keep", col("keep").cast("long"))
        .orderBy(col("doc_id"))
    }),


    "curation_pipeline" -> ((s, dir) => {
      // config-driven curation: a YAML step list compiled onto the gated
      // operators (normalize → length filter → exact dedup → per-source
      // cap → split); the oracle re-derives the whole chain, so the
      // pipeline COMPILER itself is correctness-gated
      val yaml =
        """steps:
          |  - { op: normalize }
          |  - { op: filter_length, min_chars: 50 }
          |  - { op: dedup_exact }
          |  - { op: cap_per_source, source_col: source, k: 200 }
          |  - { op: split, train: 0.8, val: 0.1, test: 0.1 }
          |""".stripMargin
      graft.operators.CurationPipeline.runYaml(
        spread(t(s, dir, "documents")), "doc_id", "text", yaml)
        .orderBy(col("doc_id"))
    }),


    "corpus_stats_incremental" -> ((s, dir) => {
      // incremental stats maintenance: per-source stats of four ingest
      // slices MERGED (metadata-sized aggregation) must equal the direct
      // recompute the oracle runs over the whole corpus
      val docs = spread(t(s, dir, "documents"))
      val parts = (0 to 3).map(r =>
        TextAnalysis.mergeableStats(
          docs.filter(col("doc_id") % 4 === r), "source", "n_chars"))
      TextAnalysis.mergeStats(parts, "source").orderBy(col("source"))
    }),


    "corpus_quantiles" -> ((s, dir) => {
      TextAnalysis.groupedQuantiles(
        t(s, dir, "documents"), "lang", "n_chars", Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy(col("lang"))
    }),


    "corpus_stats" -> ((s, dir) => {
      TextAnalysis.corpusStats(t(s, dir, "documents"), "lang", "source", "n_chars", "doc_id")
        .orderBy(col("lang"), col("source"))
    }),


    // --- corpus curation: deterministic sampling / splitting / mixing ---
    "sample_split_assign" -> ((s, dir) => {
      graft.operators.Sampling.splitAssign(
        t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),


    "sample_split_safe" -> ((s, dir) => {
      // leakage-safe split: the key is the NORMALIZED text, so byte-level
      // variants of one document always share a split (no eval contamination)
      graft.operators.Sampling.contentSafeSplit(
        t(s, dir, "documents"), "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),


    "sample_token_budget" -> ((s, dir) => {
      // per-source token budget: hash-ranked greedy prefix, at most 20k
      // chars of each source (the "N tokens of source X" mixture rule)
      graft.operators.Sampling.capTokenBudget(
        t(s, dir, "documents"), "doc_id", "source", "n_chars", budget = 20000L)
        .select(col("doc_id"), col("source"), col("cost_cum"))
        .orderBy(col("doc_id"))
    }),


    "sample_stratified" -> ((s, dir) => {
      graft.operators.Sampling
        .sampleStratified(t(s, dir, "documents"), "doc_id", "source", 0.25)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),


    "sample_cap_per_source" -> ((s, dir) => {
      graft.operators.Sampling
        .capPerStratum(t(s, dir, "documents"), "doc_id", "source", k = 15)
        .select(col("doc_id"), col("source"), col("sample_rank"))
        .orderBy(col("doc_id"))
    }),


    "sample_mix_weighted" -> ((s, dir) => {
      graft.operators.Sampling.mixWeighted(
        t(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25), 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),


    // --- corpus curation: training-batch construction ---
    "batch_epoch_order" -> ((s, dir) => {
      graft.operators.Batching.epochOrderKey(t(s, dir, "documents"), "doc_id", seed = 7)
        .select(col("doc_id"), col("order_key"))
        .orderBy(col("order_key"), col("doc_id"))
    }),


    "batch_interleave" -> ((s, dir) => {
      graft.operators.Batching.interleaveKey(t(s, dir, "documents"), "doc_id", "source", seed = 7)
        .select(col("doc_id"), col("source"), col("rr_rank"))
        .orderBy(col("rr_rank"), col("source"), col("doc_id"))
    }),


    "batch_pack_tokens" -> ((s, dir) => {
      graft.operators.Batching
        .packByTokenBudget(spread(t(s, dir, "documents")), "doc_id", "text", budget = 512)
        .orderBy(col("doc_id"))
    }),


    "batch_curriculum" -> ((s, dir) => {
      // easy-to-hard phasing by token count into 4 equal-population phases
      // (percentile boundaries, BIGINT-exact), seed-shuffled within phase;
      // consumption order is the emitted (phase, order_key, id) sort keys
      graft.operators.Batching.curriculumOrder(
        spread(t(s, dir, "documents")), "doc_id",
        graft.functions.TextFns.tokenCount(col("text")),
        phases = 4, seed = 7L)
        .orderBy(col("phase"), col("order_key"), col("doc_id"))
    }),

    "batch_shard_assign" -> ((s, dir) => {
      // size-balanced training-shard assignment: 8 equal-population size
      // bands (n_chars percentiles), seed-shuffled round-robin within each
      // band onto 4 shards — every shard draws evenly from every band, so
      // counts AND bytes balance with no global window
      graft.operators.Batching.shardBySize(
        spread(t(s, dir, "documents")), "doc_id", col("n_chars"),
        nShards = 4, bands = 8, seed = 11L)
        .orderBy(col("doc_id"))
    }),


    "batch_length_bucketed" -> ((s, dir) => {
      // dynamic batching: token-length buckets (width 16), seed-shuffled
      // within-bucket order, batches of 8 — per-batch padding-waste audit;
      // waste is bounded by the bucket width by construction
      graft.operators.Batching.lengthBucketedBatches(
        spread(t(s, dir, "documents")), "doc_id", "text",
        bucketWidth = 16L, batchSize = 8L, seed = 7L)
        .orderBy(col("bucket"), col("batch_idx"))
    }),


    "events_interarrival" -> ((s, dir) => {
      // bot detection: per-user inter-arrival gap stats (doubled-median +
      // MAD on BIGINT µs gaps) and the metronomic flag — MAD under 5% of
      // the median means a timer, not a human
      graft.operators.Behavior.interArrival(events(s, dir), "user_id", "ts")
        .orderBy(col("user_id"))
    }))

  /** Generated unrolled batch-perceptron rounds (w as one-row CTEs, margin
    * re-derived per round — the sccPivot generated-oracle pattern). */
  private val perceptronOracle: String = {
    def miss(prev: String): String =
      s"y*((SELECT w1 FROM $prev)*x1 + (SELECT w2 FROM $prev)*x2 + (SELECT w3 FROM $prev)*x3) <= 0"
    def round(prev: String, name: String): String =
      s""", $name AS (
         |  SELECT
         |    (SELECT w1 FROM $prev) + COALESCE(CAST(sum(CASE WHEN ${miss(prev)} THEN y*x1 END) AS BIGINT), 0) AS w1,
         |    (SELECT w2 FROM $prev) + COALESCE(CAST(sum(CASE WHEN ${miss(prev)} THEN y*x2 END) AS BIGINT), 0) AS w2,
         |    (SELECT w3 FROM $prev) + COALESCE(CAST(sum(CASE WHEN ${miss(prev)} THEN y*x3 END) AS BIGINT), 0) AS w3,
         |    CAST(sum(CASE WHEN ${miss(prev)} THEN 1 ELSE 0 END) AS BIGINT) AS nm
         |  FROM f
         |)""".stripMargin
    """WITH f AS (
      |  SELECT 1 AS x1,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS x2,
      |    CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 1000
      |      // len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS x3,
      |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
      |  FROM documents
      |  WHERE len(regexp_split_to_array(trim(text), '\s+')) > 0
      |), r0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
      |          CAST(0 AS BIGINT) AS w3)""".stripMargin +
      round("r0", "r1") + round("r1", "r2") + round("r2", "r3") +
      (1 to 3).flatMap(r => (1 to 3).map(dim =>
        s"SELECT CAST($r AS BIGINT) AS round, CAST($dim AS BIGINT) AS dim, " +
          s"w$dim AS w, nm AS n_miss FROM r$r"))
        .mkString("\n", "\nUNION ALL ", "\nORDER BY round, dim")
  }

  /** Documents re-tokenized as underscore-joined word BIGRAMS (one space-
    * separated pseudo-text), so coverage selection runs over a vocabulary
    * large enough to need several picks. */
  private def docsAsBigrams(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val n1 = greatest(size(toks) - 1, lit(0))
    t(s, dir, "documents").select(col("doc_id"),
      concat_ws(" ", zip_with(
        slice(toks, lit(1), n1), slice(toks, lit(2), n1),
        (x, y) => concat(x, lit("_"), y))).as("btext"))
  }

  /** Generated greedy max-coverage oracle: k unrolled argmax rounds, each
    * counting tokens outside the prior covered set (kcenter precedent). */
  private def coverageOracleSql: String = {
    val k = 5
    val ctes = scala.collection.mutable.ArrayBuffer[String](
      """w0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(list_distinct(
        |    [w[i] || '_' || w[i+1] FOR i IN range(1, len(w))])) AS tok
        |  FROM w0 WHERE len(w) >= 2)""".stripMargin)
    for (r <- 1 to k) {
      val conds = scala.collection.mutable.ArrayBuffer.empty[String]
      if (r > 1) {
        conds += s"t.doc_id NOT IN (${(1 until r).map(i => s"SELECT doc_id FROM s$i")
          .mkString(" UNION ALL ")})"
        conds += s"NOT EXISTS (SELECT 1 FROM cov${r - 1} c WHERE c.tok = t.tok)"
      }
      val where = if (conds.isEmpty) "" else " WHERE " + conds.mkString(" AND ")
      ctes += s"g$r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM toks t$where GROUP BY 1)"
      ctes += s"s$r AS MATERIALIZED (SELECT doc_id, gain FROM g$r ORDER BY gain DESC, doc_id ASC LIMIT 1)"
      ctes += s"cov$r AS MATERIALIZED (SELECT DISTINCT tok FROM (" +
        (if (r == 1) "" else s"SELECT tok FROM cov${r - 1} UNION ALL ") +
        s"SELECT tok FROM toks WHERE doc_id = (SELECT doc_id FROM s$r)))"
    }
    "WITH " + ctes.mkString(",\n") + "\n" +
      s"""SELECT CAST(r AS BIGINT) AS round, doc_id, gain,
         |  CAST(sum(gain) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW) AS BIGINT) AS covered_total
         |FROM (${(1 to k).map(i => s"SELECT $i AS r, doc_id, gain FROM s$i").mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin
  }

  protected def curationOracles: Map[String, String] = Map(

    // NULL attrs sentinel to ' null' (space sorts before alphanumerics in
    // both engines' binary collation); values sorted then joined —
    // partition-order-independent on both sides
    "quality_conflicts" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, 'xx' FROM documents WHERE doc_id % 7 = 0
        |), g AS (
        |  SELECT md5(text) AS content_key,
        |    CAST(count(*) AS BIGINT) AS n_records,
        |    CAST(count(DISTINCT COALESCE(lang, ' null')) AS BIGINT) AS n_values,
        |    string_agg(DISTINCT COALESCE(lang, ' null'), ','
        |      ORDER BY COALESCE(lang, ' null')) AS "values"
        |  FROM all_docs GROUP BY 1
        |)
        |SELECT content_key, n_records, n_values, "values" FROM g
        |WHERE n_values >= 2 ORDER BY content_key""".stripMargin,

    // ranks tie-broken by (value, id); ρ = 1 − 6Σd²/(n(n²−1)) with the
    // identical left-associated double expression on both engines
    "feature_rank_corr" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS b
        |  FROM documents
        |), ra AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY a ASC, doc_id ASC) AS BIGINT) AS ra
        |  FROM d
        |), rb AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY b ASC, doc_id ASC) AS BIGINT) AS rb
        |  FROM d
        |), j AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
        |  FROM ra JOIN rb USING (doc_id)
        |)
        |SELECT n, sum_d2,
        |  CASE WHEN n < 2 THEN 0.0
        |    ELSE 1.0 - 6.0 * CAST(sum_d2 AS DOUBLE) / CAST(n * (n * n - 1) AS DOUBLE)
        |  END AS rho
        |FROM j""".stripMargin,

    "feature_perceptron" -> perceptronOracle,

    // the three signal oracles (interarrival metronomic, qln entropy,
    // hop-window peak) assembled verbatim, fused with the same left joins
    "events_bot_score" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts)
        |    - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
        |  FROM events
        |), gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
        |a AS (
        |  SELECT user_id, CAST(quantile_cont(gap * 2, 0.5) AS BIGINT) AS median_gap_x2
        |  FROM gg GROUP BY 1 HAVING count(*) >= 3
        |), m AS (
        |  SELECT gg.user_id,
        |    quantile_cont(abs(gg.gap * 2 - a.median_gap_x2), 0.5) AS mad_x2,
        |    a.median_gap_x2
        |  FROM gg JOIN a USING (user_id) GROUP BY 1, 3
        |), ia AS (
        |  SELECT user_id, CASE WHEN mad_x2 * 20 < CAST(median_gap_x2 AS DOUBLE)
        |    THEN 1 ELSE 0 END AS metro
        |  FROM m
        |), c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_c
        |  FROM events GROUP BY 1, 2
        |), ue AS (
        |  SELECT user_id, CAST(sum(n_c) AS BIGINT) AS n_events,
        |    CAST((CAST(sum(n_c) AS BIGINT)
        |        * CAST(floor(ln(CAST(sum(n_c) AS BIGINT)) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(sum(n_c * CAST(floor(ln(n_c) * 1e6 + 0.5) AS BIGINT)) AS BIGINT))
        |      // CAST(sum(n_c) AS BIGINT) AS BIGINT) AS entropy_micro
        |  FROM c GROUP BY 1
        |), e AS (
        |  SELECT user_id, epoch_us(ts) // 60000000 AS em FROM events
        |), hops AS (
        |  SELECT user_id, (em // 15 - j.range) * 15 AS wstart
        |  FROM e CROSS JOIN range(0, 4) j
        |  WHERE em < (em // 15 - j.range) * 15 + 60
        |    AND em >= (em // 15 - j.range) * 15
        |), w AS (
        |  SELECT user_id, wstart, CAST(count(*) AS BIGINT) AS n FROM hops GROUP BY 1, 2
        |), pk AS (SELECT user_id, CAST(max(n) AS BIGINT) AS peak_n FROM w GROUP BY 1),
        |sel AS (
        |  SELECT ue.user_id, ue.n_events,
        |    CAST(COALESCE(ia.metro, 0) AS BIGINT) AS metronomic,
        |    CAST(CASE WHEN ue.entropy_micro < 1560000 THEN 1 ELSE 0 END AS BIGINT) AS low_entropy,
        |    CAST(CASE WHEN COALESCE(pk.peak_n, 0) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS bursty
        |  FROM ue LEFT JOIN ia USING (user_id) LEFT JOIN pk USING (user_id)
        |)
        |SELECT user_id, n_events, metronomic, low_entropy, bursty,
        |  CAST(metronomic * 50 + low_entropy * 25 + bursty * 25 AS BIGINT) AS bot_score
        |FROM sel ORDER BY user_id""".stripMargin,

    // the synthesized URLs are already in canonical form, so curl == url;
    // the suffix-chain domain match re-derives via list comprehension
    "curation_url_filter" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      'https://ads.track' || CAST(doc_id % 3 AS VARCHAR) || '.example.com/page/' || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 7 = 0 THEN
        |      'https://www.' || source || '.org/casino/' || CAST(doc_id AS VARCHAR)
        |    ELSE 'https://www.' || source || '.org/article/' || CAST(doc_id AS VARCHAR) END AS url
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, url, url AS curl,
        |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#:]+)', 1) AS host
        |  FROM u
        |), v AS (
        |  SELECT doc_id, url, curl, host,
        |    CASE WHEN len([x FOR x IN [array_to_string(p[i:], '.') FOR i IN range(1, len(p) + 1)]
        |      IF list_contains(['track0.example.com', 'track1.example.com', 'gamble.net'], x)]) > 0
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS dom_block,
        |    CASE WHEN regexp_matches(curl, '(casino|poker)')
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS kw_block
        |  FROM (SELECT *, string_split(host, '.') AS p FROM h)
        |)
        |SELECT doc_id, url, curl, host, dom_block, kw_block,
        |  CASE WHEN dom_block = 0 AND kw_block = 0 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS keep,
        |  CASE WHEN dom_block = 1 THEN 'domain_blocked'
        |       WHEN kw_block = 1 THEN 'keyword_blocked'
        |       ELSE 'ok' END AS reason
        |FROM v ORDER BY doc_id""".stripMargin,

    "curation_pipeline_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      'https://ads.track' || CAST(doc_id % 3 AS VARCHAR) || '.example.com/page/' || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 7 = 0 THEN
        |      'https://www.' || source || '.org/casino/' || CAST(doc_id AS VARCHAR)
        |    ELSE 'https://www.' || source || '.org/article/' || CAST(doc_id AS VARCHAR) END AS url
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#:]+)', 1) AS host
        |  FROM u
        |)
        |SELECT doc_id, url FROM (
        |  SELECT doc_id, url,
        |    len([x FOR x IN [array_to_string(p[i:], '.') FOR i IN range(1, len(p) + 1)]
        |      IF list_contains(['track0.example.com', 'track1.example.com', 'gamble.net'], x)]) > 0 AS dom_block,
        |    regexp_matches(url, '(casino|poker)') AS kw_block
        |  FROM (SELECT *, string_split(host, '.') AS p FROM h)
        |) WHERE NOT dom_block AND NOT kw_block
        |ORDER BY doc_id""".stripMargin,

    "curation_keep" ->
      """WITH base AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    CAST(length(text) AS BIGINT) AS len_chars,
        |    length(text) AS total,
        |    length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS no_cyr,
        |    length(regexp_replace(text, '[一-鿿]', '', 'g')) AS no_cjk
        |  FROM documents
        |), feats AS (
        |  SELECT doc_id, len_chars,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with'], t))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |      CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS token_diversity,
        |    CAST(GREATEST(len(toks) - 1, 0) AS BIGINT) AS n_bigrams,
        |    CAST(len(list_distinct([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))])) AS BIGINT) AS n_distinct_bigrams
        |  FROM base
        |), lang AS (
        |  SELECT doc_id,
        |    CASE WHEN total - no_cyr > 0 THEN 'ru'
        |         WHEN total - no_cjk > 0 THEN 'zh'
        |         WHEN es > en AND es >= de AND es >= fr THEN 'es'
        |         WHEN de > en AND de >= fr THEN 'de'
        |         WHEN fr > en THEN 'fr'
        |         ELSE 'en' END AS predicted_lang
        |  FROM (
        |    SELECT doc_id, total, no_cyr, no_cjk,
        |      len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS en,
        |      len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los'], t))) AS es,
        |      len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS de,
        |      len(list_filter(toks, t -> list_contains(['le','la','les','et','est','une'], t))) AS fr
        |    FROM base)
        |), scored AS (
        |  SELECT f.doc_id,
        |    (CASE WHEN len_chars < 20 THEN 0.0 ELSE 0.25 END)
        |      + (CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0.0 END)
        |      + token_diversity * 0.25 AS quality_score,
        |    predicted_lang,
        |    CASE WHEN n_bigrams = 0 THEN 0.0
        |         ELSE CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) END AS dup_bigram_frac
        |  FROM feats f JOIN lang l ON f.doc_id = l.doc_id
        |)
        |SELECT doc_id, quality_score, predicted_lang, dup_bigram_frac,
        |  CAST(quality_score >= 0.85 AND predicted_lang IN ('en','es','de','fr') AND dup_bigram_frac <= 0.04 AS BIGINT) AS keep
        |FROM scored ORDER BY doc_id""".stripMargin,


    "curation_pipeline" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
        |      '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text,
        |    lang, source, n_chars
        |  FROM documents
        |), flt AS (
        |  SELECT * FROM norm WHERE length(text) >= 50
        |), keep AS (
        |  SELECT min(doc_id) AS doc_id FROM flt GROUP BY md5(text)
        |), dd AS (
        |  SELECT flt.* FROM flt JOIN keep USING (doc_id)
        |), capped AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM (
        |    SELECT dd.*, row_number() OVER (PARTITION BY source
        |      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |    FROM dd) q WHERE rk <= 200
        |)
        |SELECT doc_id, text, lang, source, n_chars,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM capped ORDER BY doc_id""".stripMargin,


    "corpus_stats_incremental" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,


    "corpus_quantiles" ->
      """SELECT lang,
        |  quantile_cont(n_chars, 0.25) AS q25, quantile_cont(n_chars, 0.5) AS q50,
        |  quantile_cont(n_chars, 0.75) AS q75, quantile_cont(n_chars, 0.95) AS q95
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,


    "corpus_stats" ->
      """WITH r AS (
        |  SELECT lang, source, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang, source) AS m
        |  FROM documents
        |)
        |SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  max(CASE WHEN rn = (m + 1) // 2 THEN n_chars END) AS median_chars
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "sample_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,


    "sample_token_budget" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cost_cum
        |  FROM documents
        |)
        |SELECT doc_id, source, CAST(cost_cum AS BIGINT) AS cost_cum
        |FROM ranked WHERE cost_cum <= 20000 ORDER BY doc_id""".stripMargin,


    "sample_split_safe" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    substr(md5(trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
        |      '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g'))), 1, 4) AS h
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN h < 'cccc' THEN 'train'
        |       WHEN h < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM k ORDER BY doc_id""".stripMargin,


    "sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
        |ORDER BY doc_id""".stripMargin,


    "sample_mix_weighted" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) <
        |  CASE source WHEN 'src0' THEN 'g' WHEN 'src1' THEN 'c0000000'
        |       WHEN 'src2' THEN '80000000' WHEN 'src3' THEN '40000000'
        |       ELSE '19999999' END
        |ORDER BY doc_id""".stripMargin,


    "sample_cap_per_source" ->
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 15 ORDER BY doc_id""".stripMargin,


    "batch_epoch_order" ->
      """SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS order_key
        |FROM documents ORDER BY order_key, doc_id""".stripMargin,


    "batch_interleave" ->
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rr_rank
        |FROM documents ORDER BY rr_rank, source, doc_id""".stripMargin,


    "batch_pack_tokens" ->
      """WITH t AS (
        |  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(floor(CAST(sum(n_tokens) OVER (
        |      PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
        |    AS DOUBLE) / 512.0) AS BIGINT) AS bin
        |FROM t ORDER BY doc_id""".stripMargin,


    // bucket/batch assignment re-derived from the same md5 shuffle key;
    // per-batch padding audit is pure integer aggregation
    // quartile thresholds re-derived via quantile_cont (BIGINT-exact, the
    // ccnet precedent); ties at a boundary stay in the easier phase
    "batch_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS difficulty
        |  FROM documents
        |), th AS (
        |  SELECT quantile_cont(difficulty, 0.250000000) AS t0,
        |         quantile_cont(difficulty, 0.500000000) AS t1,
        |         quantile_cont(difficulty, 0.750000000) AS t2
        |  FROM d
        |)
        |SELECT d.doc_id, d.difficulty,
        |  CAST((CASE WHEN d.difficulty > th.t0 THEN 1 ELSE 0 END)
        |     + (CASE WHEN d.difficulty > th.t1 THEN 1 ELSE 0 END)
        |     + (CASE WHEN d.difficulty > th.t2 THEN 1 ELSE 0 END) AS BIGINT) AS phase,
        |  md5('7:' || CAST(d.doc_id AS VARCHAR)) AS order_key
        |FROM d, th
        |ORDER BY phase, order_key, d.doc_id""".stripMargin,

    // octile thresholds via quantile_cont (BIGINT-exact), band = count of
    // strictly-exceeded thresholds, round-robin within band over the md5
    // shuffle order — (rn - 1) % 4 mirrors pmod on non-negative ranks
    "batch_shard_assign" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS size FROM documents
        |), th AS (
        |  SELECT quantile_cont(size, 0.125000000) AS t0,
        |         quantile_cont(size, 0.250000000) AS t1,
        |         quantile_cont(size, 0.375000000) AS t2,
        |         quantile_cont(size, 0.500000000) AS t3,
        |         quantile_cont(size, 0.625000000) AS t4,
        |         quantile_cont(size, 0.750000000) AS t5,
        |         quantile_cont(size, 0.875000000) AS t6
        |  FROM d
        |), b AS (
        |  SELECT d.doc_id, d.size,
        |    CAST((CASE WHEN d.size > th.t0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN d.size > th.t1 THEN 1 ELSE 0 END)
        |       + (CASE WHEN d.size > th.t2 THEN 1 ELSE 0 END)
        |       + (CASE WHEN d.size > th.t3 THEN 1 ELSE 0 END)
        |       + (CASE WHEN d.size > th.t4 THEN 1 ELSE 0 END)
        |       + (CASE WHEN d.size > th.t5 THEN 1 ELSE 0 END)
        |       + (CASE WHEN d.size > th.t6 THEN 1 ELSE 0 END) AS BIGINT) AS band,
        |    md5('11:' || CAST(d.doc_id AS VARCHAR)) AS ok
        |  FROM d, th
        |), r AS (
        |  SELECT doc_id, size, band,
        |    row_number() OVER (PARTITION BY band ORDER BY ok, doc_id) AS rn
        |  FROM b
        |)
        |SELECT doc_id, size, band, CAST((rn - 1) % 4 AS BIGINT) AS shard
        |FROM r ORDER BY doc_id""".stripMargin,


    "batch_length_bucketed" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n_tokens, n_tokens // 16 AS bucket,
        |    row_number() OVER (PARTITION BY n_tokens // 16
        |      ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rn
        |  FROM tk
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(rn // 8 AS BIGINT) AS batch_idx,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS padding_waste
        |FROM b GROUP BY 1, 2 ORDER BY bucket, batch_idx""".stripMargin,

    // gap multiset is tie-order-free; doubled-median and MAD on BIGINT
    // gaps (quantile_cont == percentile bit-for-bit, the r5 precedent)
    "events_interarrival" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts)
        |    - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
        |  FROM events
        |), gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
        |a AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(quantile_cont(gap * 2, 0.5) AS BIGINT) AS median_gap_x2,
        |    CAST(min(gap) AS BIGINT) AS min_gap_us,
        |    CAST(max(gap) AS BIGINT) AS max_gap_us
        |  FROM gg GROUP BY 1 HAVING count(*) >= 3
        |), m AS (
        |  SELECT gg.user_id, a.n_gaps, a.median_gap_x2, a.min_gap_us, a.max_gap_us,
        |    quantile_cont(abs(gg.gap * 2 - a.median_gap_x2), 0.5) AS mad_x2
        |  FROM gg JOIN a USING (user_id)
        |  GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT user_id, n_gaps, median_gap_x2, mad_x2, min_gap_us, max_gap_us,
        |  CAST(CASE WHEN mad_x2 * 20 < CAST(median_gap_x2 AS DOUBLE)
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_metronomic
        |FROM m ORDER BY user_id""".stripMargin,

    "curation_quality_band" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    CAST(length(text) AS BIGINT) AS len_chars
        |  FROM documents
        |), feats AS (
        |  SELECT doc_id, lang, len_chars,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with'], t))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |      CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS token_diversity
        |  FROM base
        |), scored AS (
        |  SELECT doc_id, lang,
        |    CAST(floor((
        |      (CASE WHEN len_chars < 20 THEN 0.0 ELSE 0.25 END)
        |      + (CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0.0 END)
        |      + token_diversity * 0.25) * 1000000000.0 + 0.5) AS BIGINT) AS score_q9,
        |    (CASE WHEN len_chars < 20 THEN 0.0 ELSE 0.25 END)
        |      + (CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0.0 END)
        |      + token_diversity * 0.25 AS quality_score
        |  FROM feats
        |), th AS (
        |  SELECT lang,
        |    CAST(floor(quantile_cont(quality_score, 0.1) * 1000000000.0 + 0.5) AS BIGINT) AS lo_q9,
        |    CAST(floor(quantile_cont(quality_score, 0.9) * 1000000000.0 + 0.5) AS BIGINT) AS hi_q9
        |  FROM scored GROUP BY lang
        |)
        |SELECT s.doc_id, s.lang, s.score_q9
        |FROM scored s JOIN th USING (lang)
        |WHERE s.score_q9 >= th.lo_q9 AND s.score_q9 <= th.hi_q9
        |ORDER BY s.doc_id""".stripMargin,


    "feature_hashing" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('0:' || token), 1, 15))::BIGINT % 64 AS bucket,
        |    CASE WHEN ('0x' || substr(md5('0:' || token), 16, 15))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM tok
        |), v AS (
        |  SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v
        |  FROM h GROUP BY 1, 2 HAVING sum(sgn) <> 0
        |)
        |SELECT doc_id, count(*) AS n_nonzero, CAST(sum(abs(v)) AS BIGINT) AS l1,
        |  CAST(sum(v * v) AS BIGINT) AS dot_self
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // exact ordered-pair Gini over the per-source totals, truncating div
    "corpus_source_gini" ->
      """WITH per AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS x
        |  FROM documents GROUP BY 1
        |), sad AS (
        |  SELECT CAST(sum(abs(a.x - b.x)) AS BIGINT) AS sad
        |  FROM per a CROSS JOIN per b
        |), agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(x) AS BIGINT) AS total
        |  FROM per
        |)
        |SELECT agg.n_groups, agg.total,
        |  CAST((sad.sad // (2 * agg.n_groups * agg.total)) * 1000000
        |    + (sad.sad % (2 * agg.n_groups * agg.total)) * 1000000 // (2 * agg.n_groups * agg.total) AS BIGINT) AS gini_micro
        |FROM sad CROSS JOIN agg""".stripMargin,

    // per relationship: left join against the distinct parent key set,
    // orphan = non-null child key with no parent; min/max NULL when clean
    "quality_fk_orphans" ->
      """WITH r1 AS (
        |  SELECT 'lineitem->orders_pruned' AS relationship,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN l.l_orderkey IS NOT NULL AND o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |    CAST(min(CASE WHEN l.l_orderkey IS NOT NULL AND o.k IS NULL THEN l.l_orderkey END) AS BIGINT) AS min_orphan_key,
        |    CAST(max(CASE WHEN l.l_orderkey IS NOT NULL AND o.k IS NULL THEN l.l_orderkey END) AS BIGINT) AS max_orphan_key
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey % 10 != 0) o
        |    ON o.k = l.l_orderkey
        |), r2 AS (
        |  SELECT 'lineitem->part' AS relationship,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |    CAST(min(CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL THEN l.l_partkey END) AS BIGINT) AS min_orphan_key,
        |    CAST(max(CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL THEN l.l_partkey END) AS BIGINT) AS max_orphan_key
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p ON p.k = l.l_partkey
        |), r3 AS (
        |  SELECT 'orders->customer' AS relationship,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND c.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |    CAST(min(CASE WHEN o.o_custkey IS NOT NULL AND c.k IS NULL THEN o.o_custkey END) AS BIGINT) AS min_orphan_key,
        |    CAST(max(CASE WHEN o.o_custkey IS NOT NULL AND c.k IS NULL THEN o.o_custkey END) AS BIGINT) AS max_orphan_key
        |  FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) c ON c.k = o.o_custkey
        |)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |ORDER BY relationship""".stripMargin,

    // pipeline chain re-derived: normalize (the curation_pipeline SQL),
    // duplicate-bigram per-mille gate, then QI groups with count >= k
    "curation_pipeline_privacy" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
        |      '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text,
        |    lang, source, n_chars
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM norm
        |), rep AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    greatest(len(w) - 1, 0) AS nb,
        |    CASE WHEN len(w) < 2 THEN 0
        |         ELSE len(list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]))
        |    END AS nd
        |  FROM toks
        |), keep1 AS (
        |  SELECT * FROM rep WHERE (nb - nd) * 1000 <= 600 * nb
        |), ok AS (
        |  SELECT lang, source FROM keep1 GROUP BY 1, 2 HAVING count(*) >= 4
        |)
        |SELECT k.doc_id, k.lang, k.source, k.n_chars
        |FROM keep1 k JOIN ok USING (lang, source)
        |ORDER BY doc_id""".stripMargin,

    // quartiles re-derived x4 (quantile_cont == percentile on BIGINT),
    // truncating fixed-point projection
    "feature_robust_scale" ->
      """WITH q AS (
        |  SELECT CAST(quantile_cont(n_chars * 4, 0.25) AS BIGINT) AS q25_x4,
        |    CAST(quantile_cont(n_chars * 4, 0.5) AS BIGINT) AS med_x4,
        |    CAST(quantile_cont(n_chars * 4, 0.75) AS BIGINT) AS q75_x4
        |  FROM documents
        |)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS value,
        |  (SELECT med_x4 FROM q) AS med_x4,
        |  (SELECT q75_x4 - q25_x4 FROM q) AS iqr_x4,
        |  CAST((n_chars * 4 - (SELECT med_x4 FROM q)) * 1000000
        |    // nullif((SELECT q75_x4 - q25_x4 FROM q), 0) AS BIGINT) AS robust_micro
        |FROM documents ORDER BY doc_id""".stripMargin,

    // planted nulls re-derived, one stack-shaped aggregation per source
    "quality_completeness" ->
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 17 = 0 THEN NULL ELSE text END AS text,
        |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
        |    n_chars
        |  FROM documents
        |), a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_text,
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_lang,
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_n_chars
        |  FROM d GROUP BY 1
        |), u AS (
        |  SELECT source, n_rows, 'text' AS "column", nn_text AS n_nulls FROM a
        |  UNION ALL SELECT source, n_rows, 'lang', nn_lang FROM a
        |  UNION ALL SELECT source, n_rows, 'n_chars', nn_n_chars FROM a
        |)
        |SELECT source, n_rows, "column", n_nulls,
        |  CAST(n_nulls * 1000 // n_rows AS BIGINT) AS null_permille
        |FROM u ORDER BY source, "column"""".stripMargin,

    // uniform share 108000 // 20 capped at 4 epochs; epochs_micro via the
    // nonneg decomposition; unallocated = budget the caps stranded
    "sample_epoch_alloc" ->
      """WITH per AS (
        |  SELECT CAST(source AS VARCHAR) AS stratum,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM per),
        |a AS (
        |  SELECT stratum, tokens,
        |    least(108000 // (SELECT n_sources FROM t), 4 * tokens) AS alloc
        |  FROM per
        |), s AS (SELECT CAST(sum(alloc) AS BIGINT) AS total_alloc FROM a)
        |SELECT stratum, tokens, CAST(alloc AS BIGINT) AS alloc,
        |  CAST(CASE WHEN tokens = 0 THEN 0
        |       ELSE (alloc // tokens) * 1000000 + ((alloc % tokens) * 1000000) // tokens
        |  END AS BIGINT) AS epochs_micro,
        |  CAST(greatest((SELECT n_sources FROM t) * (108000 // (SELECT n_sources FROM t))
        |    - (SELECT total_alloc FROM s), 0) AS BIGINT) AS unallocated
        |FROM a ORDER BY stratum""".stripMargin,


    // same md5(class:id) rank as every quota; cap = least(n_class, 2*n_min)
    "sample_temperature" ->
      """WITH per AS (
        |  SELECT CAST(lang AS VARCHAR) AS stratum, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT stratum, n_docs,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w_milli
        |  FROM per
        |), t AS (SELECT CAST(sum(w_milli) AS HUGEINT) AS tot FROM w)
        |SELECT stratum, n_docs, w_milli,
        |  CAST(CAST(1000000 AS HUGEINT) * w_milli // (SELECT tot FROM t) AS BIGINT) AS alloc
        |FROM w ORDER BY stratum""".stripMargin,

    "sample_class_balance" ->
      """WITH counts AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_class FROM documents GROUP BY 1
        |), nm AS (SELECT CAST(min(n_class) AS BIGINT) AS n_min FROM counts),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS sample_rank
        |  FROM documents
        |)
        |SELECT r.doc_id, r.lang, r.sample_rank
        |FROM ranked r JOIN counts USING (lang)
        |WHERE r.sample_rank <= least(counts.n_class, 2 * (SELECT n_min FROM nm))
        |ORDER BY r.doc_id""".stripMargin,

    // the bigram-LM CTEs + per-lang quantile_cont tertiles; bucket
    // comparisons on bit-identical interpolated doubles
    "sample_ccnet_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM toks
        |), pp AS (
        |  SELECT doc_id, string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM g
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pp GROUP BY 1, 2
        |), c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12),
        |lp AS (
        |  SELECT pp.doc_id, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(CAST(floor(ln(c12.c12 + 1) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(c1.c1 + (SELECT v FROM v)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM pp JOIN c12 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1
        |), scored AS (
        |  SELECT d.doc_id, d.lang, lp.s // lp.nb AS avg_lp_micro
        |  FROM documents d JOIN lp ON lp.doc_id = d.doc_id
        |), th AS (
        |  SELECT lang, quantile_cont(avg_lp_micro, 0.333333) AS t1,
        |    quantile_cont(avg_lp_micro, 0.666667) AS t2
        |  FROM scored GROUP BY 1
        |)
        |SELECT s.doc_id, s.lang, s.avg_lp_micro,
        |  CASE WHEN s.avg_lp_micro >= th.t2 THEN 'head'
        |       WHEN s.avg_lp_micro >= th.t1 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM scored s JOIN th USING (lang) ORDER BY s.doc_id""".stripMargin,

    // hashed-bag bucket models re-derived end to end; top-k via the same
    // (score desc, id) total order on both engines
    "sample_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS is_target,
        |    regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id, is_target,
        |    unnest(list_concat(w, [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))])) AS g
        |  FROM toks
        |), db AS (
        |  SELECT doc_id, is_target, ('0x' || substr(md5(g), 1, 15))::BIGINT % 64 AS b,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM gr GROUP BY 1, 2, 3
        |), stats AS (
        |  SELECT b, CAST(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(cnt) AS BIGINT) AS cr
        |  FROM db GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr FROM stats
        |), sc AS (
        |  SELECT db.doc_id, CAST(sum(db.cnt * (
        |      CAST(floor(ln(s.ct + 1) * 1e6 + 0.5) AS BIGINT)
        |    - CAST(floor(ln((SELECT tt FROM tot) + 64) * 1e6 + 0.5) AS BIGINT)
        |    - CAST(floor(ln(s.cr + 1) * 1e6 + 0.5) AS BIGINT)
        |    + CAST(floor(ln((SELECT tr FROM tot) + 64) * 1e6 + 0.5) AS BIGINT))) AS BIGINT)
        |    AS score_scaled
        |  FROM db JOIN stats s USING (b) GROUP BY 1
        |)
        |SELECT doc_id, score_scaled FROM (
        |  SELECT * FROM sc ORDER BY score_scaled DESC, doc_id LIMIT 100
        |) q ORDER BY doc_id""".stripMargin,

    // the bigram-LM loss CTEs (curation_pipeline_lm's), then per-domain
    // aggregation and 5 UNROLLED multiplicative-weights rounds — the
    // driver loop's exact integer twin (all divisions truncate toward
    // zero in both engines, verified on negative operands)
    "sample_doremi" -> {
      val roundCtes = (1 to 5).map { t =>
        val prev = if (t == 1) "d0" else s"r${t - 1}"
        s"""u$t AS (SELECT *, w * greatest(1, 1000000 + (100000 * excess) // 1000000) AS wp FROM $prev),
           |r$t AS (SELECT domain, n_docs, loss, excess,
           |  wp * 1000000 // (SELECT CAST(sum(wp) AS BIGINT) FROM u$t) AS w FROM u$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
         |), g AS (
         |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
         |  FROM toks
         |), pp AS (
         |  SELECT doc_id, string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM g
         |), c12 AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pp GROUP BY 1, 2
         |), c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
         |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12),
         |lp AS (
         |  SELECT pp.doc_id, CAST(count(*) AS BIGINT) AS nb,
         |    CAST(sum(CAST(floor(ln(c12.c12 + 1) * 1e6 + 0.5) AS BIGINT)
         |      - CAST(floor(ln(c1.c1 + (SELECT v FROM v)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
         |  FROM pp JOIN c12 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1
         |), dom AS (
         |  SELECT d.lang AS domain, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(lp.nb) AS BIGINT) AS nb, CAST(sum(lp.s) AS BIGINT) AS s
         |  FROM documents d JOIN lp ON lp.doc_id = d.doc_id GROUP BY 1
         |  HAVING CAST(sum(lp.nb) AS BIGINT) > 0
         |), base AS (
         |  SELECT (-CAST(sum(s) AS BIGINT)) // CAST(sum(nb) AS BIGINT) AS bl FROM dom
         |), d0 AS (
         |  SELECT domain, n_docs, (-s) // nb AS loss,
         |    (-s) // nb - (SELECT bl FROM base) AS excess,
         |    CAST(1000000 AS BIGINT) AS w
         |  FROM dom
         |),
         |$roundCtes
         |SELECT domain, n_docs, loss AS loss_micro, excess AS excess_micro,
         |  CAST(w AS BIGINT) AS weight_micro,
         |  1000000 * w // (SELECT CAST(sum(w) AS BIGINT) FROM r5) AS alloc_docs
         |FROM r5 ORDER BY domain""".stripMargin
    },

    // LM scores re-derived (the text_bigram_perplexity CTEs), integer
    // threshold; zero-bigram docs kept via the left join's NULL
    "sample_coverage" -> coverageOracleSql,

    "sample_neyman" ->
      """WITH a AS (
        |  SELECT o_orderpriority AS stratum, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100) AS BIGINT) AS s1,
        |    CAST(sum((CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100)
        |      * (CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100)) AS BIGINT) AS s2
        |  FROM orders GROUP BY 1
        |), w AS (
        |  SELECT stratum, n_rows,
        |    CAST(floor(sqrt(greatest(0.0, CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))) AS BIGINT) AS w
        |  FROM a
        |), t AS (
        |  SELECT CAST(sum(w) AS BIGINT) AS tot_w, CAST(sum(n_rows) AS BIGINT) AS tot_n FROM w
        |), b AS (
        |  SELECT stratum, n_rows,
        |    CASE WHEN tot_w > 0 THEN w ELSE n_rows END AS weight,
        |    CASE WHEN tot_w > 0 THEN tot_w ELSE tot_n END AS tw
        |  FROM w, t
        |), base AS (
        |  SELECT stratum, n_rows, weight,
        |    weight * 1000 // tw AS base, (weight * 1000) % tw AS rem
        |  FROM b
        |), sp AS (
        |  SELECT stratum, n_rows, weight, base, rem,
        |    1000 - CAST(sum(base) OVER () AS BIGINT) AS spill,
        |    row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rnk
        |  FROM base
        |)
        |SELECT stratum, n_rows, weight,
        |  CAST(base + CASE WHEN rnk <= spill THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM sp ORDER BY stratum""".stripMargin,

    "curation_pipeline_gopher" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, source, n_chars, text,
        |    regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), sig AS (
        |  SELECT doc_id, lang, source, n_chars, text,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum([length(x) FOR x IN w]) AS BIGINT) AS sum_wlen,
        |    CAST(len([x FOR x IN w IF regexp_matches(x, '[a-zA-Z]')]) AS BIGINT) AS alpha_words,
        |    CAST(len([x FOR x IN w IF x IN ('the','a','an','and','of','to','in','is')]) AS BIGINT) AS stop_hits
        |  FROM toks
        |), m AS (
        |  SELECT doc_id, lang, source, n_chars, text, n_words, stop_hits,
        |    sum_wlen * 1000 // nullif(n_words, 0) AS mean_wlen_milli,
        |    alpha_words * 1000 // nullif(n_words, 0) AS alpha_permille
        |  FROM sig
        |)
        |SELECT doc_id, lang, source, n_chars FROM m
        |WHERE COALESCE(n_words BETWEEN 25 AND 70
        |    AND mean_wlen_milli BETWEEN 3000 AND 10000
        |    AND alpha_permille >= 800 AND stop_hits >= 2, FALSE)
        |  AND length(text) >= 120
        |ORDER BY doc_id""".stripMargin,

    "curation_pipeline_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM toks
        |), pp AS (
        |  SELECT doc_id, string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM g
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pp GROUP BY 1, 2
        |), c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12),
        |lp AS (
        |  SELECT pp.doc_id, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(CAST(floor(ln(c12.c12 + 1) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(c1.c1 + (SELECT v FROM v)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM pp JOIN c12 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1
        |)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d LEFT JOIN lp ON lp.doc_id = d.doc_id
        |WHERE lp.s IS NULL OR lp.s >= -3390000 * lp.nb
        |ORDER BY d.doc_id""".stripMargin,

    // WoE as four separately-quantized qln terms; IV contributions in
    // 1e-12 units via micro-distribution differences
    "feature_woe" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS category,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS g,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS b
        |  FROM orders GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM cells
        |), j AS (
        |  SELECT category, g, b,
        |    CAST((g + 1) * 1000000 // ((SELECT gt FROM tot) + (SELECT k FROM tot)) AS BIGINT) AS dist_g_micro,
        |    CAST((b + 1) * 1000000 // ((SELECT bt FROM tot) + (SELECT k FROM tot)) AS BIGINT) AS dist_b_micro,
        |    CAST(floor(ln(g + 1) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(floor(ln((SELECT gt FROM tot) + (SELECT k FROM tot)) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(b + 1) * 1e6 + 0.5) AS BIGINT)
        |      + CAST(floor(ln((SELECT bt FROM tot) + (SELECT k FROM tot)) * 1e6 + 0.5) AS BIGINT)
        |      AS woe_scaled
        |  FROM cells
        |)
        |SELECT category, g, b, dist_g_micro, dist_b_micro,
        |  CAST(woe_scaled AS BIGINT) AS woe_scaled,
        |  CAST((dist_g_micro - dist_b_micro) * woe_scaled AS BIGINT) AS iv_contrib
        |FROM j ORDER BY category""".stripMargin,

    // per-dim min/max calibration + truncating code/reconstruction math
    // over the 1e-6-quantized vectors
    "emb_sq_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), el AS (
        |  SELECT vec_id, i.range AS pos, qv[i.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) i
        |), st AS (
        |  SELECT pos, min(x) AS mn, max(x) AS mx FROM el GROUP BY 1
        |), c AS (
        |  SELECT el.vec_id, el.pos, el.x, st.mn, st.mx,
        |    CASE WHEN st.mx = st.mn THEN 0
        |         ELSE (el.x - st.mn) * 255 // (st.mx - st.mn) END AS code
        |  FROM el JOIN st USING (pos)
        |)
        |SELECT vec_id, CAST(pos + 1 AS BIGINT) AS dim, CAST(code AS BIGINT) AS code,
        |  CAST(mn + code * (mx - mn) // 255 AS BIGINT) AS recon,
        |  CAST(x - (mn + code * (mx - mn) // 255) AS BIGINT) AS err
        |FROM c ORDER BY vec_id, dim""".stripMargin,

    // target encoding: all micro-cent fixed point, truncating // on both
    // engines; the LOO denominator n_c-1+m never hits zero (m=10)
    "feature_target_enc" ->
      """WITH b AS (
        |  SELECT o_orderkey AS id, o_orderpriority AS category,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y_cents
        |  FROM orders
        |), g AS (
        |  SELECT (CAST(sum(y_cents) AS BIGINT) // count(*)) * 1000000
        |    + (CAST(sum(y_cents) AS BIGINT) % count(*)) * 1000000 // count(*) AS gmean FROM b
        |), c AS (
        |  SELECT category, CAST(sum(y_cents) AS BIGINT) AS s_c,
        |    CAST(count(*) AS BIGINT) AS n_c
        |  FROM b GROUP BY 1
        |)
        |SELECT b.id, b.category, b.y_cents,
        |  CAST((c.s_c // (c.n_c + 10)) * 1000000
        |    + ((c.s_c % (c.n_c + 10)) * 1000000 + 10 * (SELECT gmean FROM g)) // (c.n_c + 10) AS BIGINT) AS enc_micro,
        |  CAST(((c.s_c - b.y_cents) // (c.n_c + 9)) * 1000000
        |    + (((c.s_c - b.y_cents) % (c.n_c + 9)) * 1000000 + 10 * (SELECT gmean FROM g)) // (c.n_c + 9) AS BIGINT) AS enc_loo_micro
        |FROM b JOIN c USING (category) ORDER BY id""".stripMargin,

    // power sums: order-free BIGINT aggregation, truncating integer mean,
    // integer variance numerator — bit-identical in any engine
    "corpus_moments" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS s1,
        |  CAST(sum(n_chars * n_chars) AS BIGINT) AS s2,
        |  CAST(sum(n_chars * n_chars * n_chars) AS BIGINT) AS s3,
        |  CAST(sum(n_chars * n_chars * n_chars * n_chars) AS BIGINT) AS s4,
        |  CAST((sum(n_chars) // count(*)) * 1000000
        |    + (sum(n_chars) % count(*)) * 1000000 // count(*) AS BIGINT) AS mean_micro,
        |  CAST(count(*) * sum(n_chars * n_chars) - sum(n_chars) * sum(n_chars) AS BIGINT) AS var_num
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "curation_k_anonymity" ->
      """SELECT lang, source, count(*) AS n_rows
        |FROM documents GROUP BY 1, 2 HAVING count(*) < 5
        |ORDER BY lang, source""".stripMargin,

    // the oracle keeps the plain global-window formulation; the Spark side
    // runs the distributed Ranks decomposition — bit-identical by the
    // total (value, id) order
    "feature_quantile_norm" ->
      """WITH r AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS value,
        |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM documents
        |)
        |SELECT doc_id, value, rank,
        |  CAST(rank * 1000000 // (n + 1) AS BIGINT) AS qnorm_micro
        |FROM r ORDER BY doc_id""".stripMargin,

    "feature_quantile_bins" ->
      """WITH t AS (
        |  SELECT quantile_cont(n_chars, 0.125) AS t1, quantile_cont(n_chars, 0.25) AS t2,
        |    quantile_cont(n_chars, 0.375) AS t3, quantile_cont(n_chars, 0.5) AS t4,
        |    quantile_cont(n_chars, 0.625) AS t5, quantile_cont(n_chars, 0.75) AS t6,
        |    quantile_cont(n_chars, 0.875) AS t7
        |  FROM documents
        |)
        |SELECT CAST(1 + CASE WHEN n_chars > t1 THEN 1 ELSE 0 END
        |  + CASE WHEN n_chars > t2 THEN 1 ELSE 0 END
        |  + CASE WHEN n_chars > t3 THEN 1 ELSE 0 END
        |  + CASE WHEN n_chars > t4 THEN 1 ELSE 0 END
        |  + CASE WHEN n_chars > t5 THEN 1 ELSE 0 END
        |  + CASE WHEN n_chars > t6 THEN 1 ELSE 0 END
        |  + CASE WHEN n_chars > t7 THEN 1 ELSE 0 END AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n, min(n_chars) AS min_v, max(n_chars) AS max_v
        |FROM documents, t GROUP BY 1 ORDER BY 1""".stripMargin,


    "profile_documents" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_s, CAST(max(doc_id) AS VARCHAR) AS max_s
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT lang) AS BIGINT),
        |    CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'source', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT source) AS BIGINT),
        |    CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT n_chars) AS BIGINT),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |  FROM documents
        |) q ORDER BY "column"""".stripMargin,


    // implies = count(cond AND NOT coalesce(expect, false)); composite
    // uniqueness via row-value DISTINCT (NULL fields compare equal in both
    // engines' distinct semantics)
    "quality_conditional" ->
      """SELECT * FROM (
        |  SELECT 'implies(purchase_value_positive)' AS rule,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND NOT COALESCE(value > 0.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |    CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |      AND NOT COALESCE(value > 0.0, FALSE) THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS BIGINT) AS passed
        |  FROM events
        |  UNION ALL
        |  SELECT 'implies(purchase_value_over_50)',
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND NOT COALESCE(value > 50.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |      AND NOT COALESCE(value > 50.0, FALSE) THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'unique_together(user_id,ts)',
        |    CAST(count(*) - count(DISTINCT (user_id, ts)) AS BIGINT),
        |    CAST(CASE WHEN count(*) = count(DISTINCT (user_id, ts))
        |      THEN 1 ELSE 0 END AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'unique_together(event_type,event_id)',
        |    CAST(count(*) - count(DISTINCT (event_type, event_id)) AS BIGINT),
        |    CAST(CASE WHEN count(*) = count(DISTINCT (event_type, event_id))
        |      THEN 1 ELSE 0 END AS BIGINT)
        |  FROM events
        |) q ORDER BY rule""".stripMargin,


    // skyline re-derived: ymax per x, exclusive descending cummax, front =
    // strict improvement; signals re-derived from the shared token split
    "sample_pareto_front" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS x,
        |    CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 1000
        |      // len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
        |  FROM documents
        |  WHERE len(regexp_split_to_array(trim(text), '\s+')) > 0
        |), dom AS (SELECT x, max(y) AS ymax FROM s GROUP BY 1),
        |m AS (
        |  SELECT x, ymax, max(ymax) OVER (ORDER BY x DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
        |  FROM dom
        |), front AS (SELECT x, ymax FROM m WHERE m IS NULL OR ymax > m)
        |SELECT s.doc_id, s.x, s.y
        |FROM s JOIN front ON front.x = s.x AND s.y = front.ymax
        |ORDER BY s.doc_id""".stripMargin,


    "quality_benford" ->
      """WITH pos AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders WHERE floor(o_totalprice * 100 + 0.5) > 0
        |), d AS (
        |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pos GROUP BY 1
        |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_pos FROM d),
        |e(digit, expected_micro) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        |SELECT d.digit, d.n, t.n_pos,
        |  (d.n // t.n_pos) * 1000000 + ((d.n % t.n_pos) * 1000000) // t.n_pos AS share_micro,
        |  CAST(e.expected_micro AS BIGINT) AS expected_micro,
        |  (d.n // t.n_pos) * 1000000 + ((d.n % t.n_pos) * 1000000) // t.n_pos
        |    - e.expected_micro AS dev_micro
        |FROM d JOIN e ON e.digit = d.digit CROSS JOIN tot t
        |ORDER BY d.digit""".stripMargin,

    "quality_check" ->
      """SELECT * FROM (
        |  SELECT 'not_null(doc_id)' AS rule,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |    CAST(CASE WHEN sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS BIGINT) AS passed
        |  FROM documents
        |  UNION ALL
        |  SELECT 'unique(doc_id)',
        |    CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT),
        |    CAST(CASE WHEN count(doc_id) = count(DISTINCT doc_id) THEN 1 ELSE 0 END AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'in_range(n_chars,1,500)',
        |    CAST(sum(CASE WHEN n_chars IS NOT NULL AND (n_chars < 1 OR n_chars > 500)
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN n_chars IS NOT NULL AND (n_chars < 1 OR n_chars > 500)
        |      THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'accepted_values(lang)',
        |    CAST(sum(CASE WHEN lang IS NOT NULL
        |      AND lang NOT IN ('de', 'en', 'es', 'fr', 'zh') THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN lang IS NOT NULL
        |      AND lang NOT IN ('de', 'en', 'es', 'fr', 'zh') THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS BIGINT)
        |  FROM documents
        |) q ORDER BY rule""".stripMargin,


    "corpus_snapshot_diff" ->
      """WITH b AS (SELECT doc_id, n_chars, lang FROM documents),
        |cur AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars, lang
        |  FROM documents WHERE doc_id % 11 != 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, n_chars, lang FROM documents WHERE doc_id < 20
        |)
        |SELECT coalesce(b.doc_id, cur.doc_id) AS doc_id,
        |  CASE WHEN b.doc_id IS NULL THEN 'added'
        |       WHEN cur.doc_id IS NULL THEN 'removed'
        |       WHEN (b.n_chars IS DISTINCT FROM cur.n_chars)
        |         OR (b.lang IS DISTINCT FROM cur.lang) THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM b FULL OUTER JOIN cur ON b.doc_id = cur.doc_id
        |ORDER BY doc_id""".stripMargin,


    // sequential Poisson sampling: integer priorities (hash div weight) make
    // the weighted draw itself hash-comparable
    "sample_weighted" ->
      """SELECT doc_id, n_chars,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT // n_chars
        |    AS priority
        |FROM documents WHERE n_chars >= 1
        |ORDER BY priority, doc_id LIMIT 100""".stripMargin)
}
