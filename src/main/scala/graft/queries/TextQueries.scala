package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over documents: tokens, quality, lang-id, BPE train/encode, PII, entropy, BM25, contamination.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait TextQueries extends QueryHelpers {

  protected def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_bpe_merges" -> ((s, dir) => {
      // BPE tokenizer training, oracle-exact: 3 greedy merges of the most
      // frequent adjacent symbol pair over the frequency-weighted word
      // vocabulary; the doubled-space canonical form makes the replace
      // symbol-aligned (true array BPE) and each round reproducible as an
      // unrolled SQL CTE — the batched merge loop must match sequential SQL
      graft.operators.TextAnalysis.bpeMerges(t(s, dir, "documents"), "text", rounds = 3)
        .orderBy(col("round"))
    }),


    "text_bpe_encode" -> ((s, dir) => {
      // the APPLY side of tokenizer training: train 3 merges, then encode
      // the whole corpus — per-word kernel over the distinct vocabulary,
      // vocabulary-sized broadcast join back to (doc, word) counts; the
      // oracle re-derives the merges AND re-applies them per word
      val docs = t(s, dir, "documents")
      val merges = graft.operators.TextAnalysis.bpeMerges(docs, "text", rounds = 3)
        .orderBy(col("round")).collect().map(_.getString(1)).toSeq
      graft.operators.TextAnalysis.bpeEncode(spread(docs), "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    }),


    "text_heavy_hitters" -> ((s, dir) => {
      // EXACT heavy hitters by sketch-then-verify: broadcast Count-Min
      // literals prefilter candidate occurrences at scan speed (CMS never
      // underestimates -> no false negatives), the exact count runs over
      // candidates only — output provably equals the plain GROUP BY/HAVING
      graft.operators.TextAnalysis.heavyHitters(
        t(s, dir, "documents"), "text", threshold = 900L)
        .orderBy(col("w"))
    }),


    // --- text analysis over documents ---
    "text_token_stats" -> ((s, dir) => {
      TextAnalysis.withTokenStats(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("len_chars").cast("long").as("len_chars"),
          col("n_distinct_tokens").cast("long").as("n_distinct_tokens"))
        .orderBy(col("doc_id"))
    }),


    "text_tokens_bpe" -> ((s, dir) => {
      // subword-style (BPE pre-tokenizer) token counts next to whitespace
      // word counts — the budget unit packing/cost estimates actually use
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextFns.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        graft.functions.TextFns.tokenCount(col("text")).cast("long").as("n_ws_tokens"))
        .orderBy(col("doc_id"))
    }),


    "text_quality" -> ((s, dir) => {
      TextAnalysis.withQuality(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("len_chars").cast("long").as("len_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("stopword_ratio"), col("alpha_ratio"), col("token_diversity"),
          col("quality_score"))
        .orderBy(col("doc_id"))
    }),


    "text_langid" -> ((s, dir) => {
      TextAnalysis.withLangId(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "eval_langid_prf" -> ((s, dir) => {
      // confusion-matrix audit of the lang-id heuristic against the
      // fixture's ground-truth lang: per-class precision/recall/F1 in
      // integer per-mille (F1 via the division-free 2tp/(2tp+fp+fn))
      val docs = t(s, dir, "documents")
      val pairs = docs.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.withLangId(spread(docs), "doc_id", "text"), "doc_id")
      graft.operators.Eval.classMetrics(pairs, col("lang"), col("predicted_lang"))
        .orderBy(col("cls"))
    }),


    "eval_kappa" -> ((s, dir) => {
      // Cohen's kappa of the lang-id heuristic vs ground truth — the
      // chance-corrected agreement scalar eval_langid_prf's per-class
      // PRF doesn't give; kappa as one IEEE division of exact integer
      // operands (the ab_test precedent)
      val docs = t(s, dir, "documents")
      val pairs = docs.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.withLangId(spread(docs), "doc_id", "text"), "doc_id")
      graft.operators.Eval.cohenKappa(pairs, col("lang"), col("predicted_lang"))
    }),


    "eval_f1_sweep" -> ((s, dir) => {
      // precision/recall/F1 at EVERY distinct threshold of an en-evidence
      // score (stopword share in micro-units) against the en label — the
      // operating-point curve behind "pick the curation cutoff"; the
      // cumulative window runs over the bounded distinct-score domain
      val scored = t(s, dir, "documents").select(
          (col("lang") === "en").cast("long").as("y"),
          TextFns.tokens(col("text")).as("w"))
        .withColumn("en_hits", expr(
          "CAST(size(filter(w, x -> x IN ('the','a','an','and','of','to','in','is'))) AS BIGINT)"))
        .withColumn("score_micro", expr(
          "coalesce(en_hits * 1000000 div nullif(CAST(size(w) AS BIGINT), 0), 0L)"))
      graft.operators.Eval.f1Sweep(scored, col("score_micro"), col("y"))
        .orderBy(col("threshold"))
    }),


    "text_nb_langid" -> ((s, dir) => {
      // multinomial naive Bayes trained on even doc_ids, confusion matrix
      // on odd doc_ids — the generative classifier beside the heuristic,
      // perceptron and kNN probes; every factor a separately-quantized qln
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.nbLangConfusion(
          spread(docs.filter(col("doc_id") % 2 === 0)),
          spread(docs.filter(col("doc_id") % 2 === 1)),
          "doc_id", "lang", "text")
        .orderBy(col("lang"), col("predicted_lang"))
    }),


    "text_stem_conflation" -> ((s, dir) => {
      // S-stemmer (Harman 1991) conflation classes over the corpus
      // vocabulary: which surface forms each 3-rule plural stem merges —
      // pure CASE string surgery, identical in both engines. The synthetic
      // corpus has no plural pairs, so every 7th doc PLANTS all three rule
      // families plus both exceptions (the garbage_detect lesson: a gate
      // that can pass on an empty result gates nothing)
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" stories story stores store cats cat bus class classes")))
          .otherwise(col("text")).as("text"))
      graft.operators.TextAnalysis.sStemConflation(spread(docs), "text")
        .orderBy(col("stem"))
    }),


    "text_mi_terms" -> ((s, dir) => {
      // mutual-information feature selection: top-3 most language-
      // informative tokens per lang — chi2's information-theoretic sibling
      // (MI discounts rare strong associations by mass); four qln terms
      // per cell, order-free integer sums end to end
      TextAnalysis.miTerms(spread(t(s, dir, "documents")), "doc_id", "lang", "text")
        .orderBy(col("lang"), col("mi_scaled").desc, col("token"))
    }),


    "text_garbage_detect" -> ((s, dir) => {
      // gibberish/extraction-garbage gate with all three failure modes
      // PLANTED (the code_detect lesson — the clean fixture alone would
      // pass vacuously): every 11th doc grows a 49-char hash run (long-
      // token branch), consonant-word docs at +2e7 (no-vowel branch),
      // symbol-storm docs at +3e7 (alnum branch)
      val docs = t(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          concat(col("text"),
            lit(" xq3f9b7c1d4e5f60718293a4b5c6d7e8f90a1b2c3d4e5f6a end")))
          .otherwise(col("text")).as("text"))
      val consonant = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          lit("zxcv qwrt plmk bnmv hjkl dfgh strn wlrd").as("text"))
      val symbols = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          expr("repeat('#?*! ', 8)").as("text"))
      TextAnalysis.garbageSignals(
          spread(base.union(consonant).union(symbols)), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_freq_spectrum" -> ((s, dir) => {
      // corpus-health frequency spectrum (frequency-of-frequencies): how
      // many vocabulary types occur exactly k times, k <= 10, plus the tail
      // bucket — hapax share and Zipf shape in one tiny aggregate
      val toks = t(s, dir, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .select(least(expr("n div 100"), lit(10L)).as("occ_hundreds"))
        .groupBy(col("occ_hundreds"))
        .agg(count(lit(1)).as("n_types"))
        .orderBy(col("occ_hundreds"))
    }),


    "text_token_pmi" -> ((s, dir) => {
      // token-pair association via REUSE of the market-basket operator:
      // documents are baskets, tokens are items. The df band
      // [minDf=50, n*900 div 1000] is applied BEFORE the self-join
      // (broadcast semi-join against the banded vocabulary) — the fanout
      // bound that makes this survive stopwords at corpus scale.
      // PMI = ln(lift) quantized 1e-6.
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      graft.operators.Basket.coOccurrenceBanded(toks, "doc_id", "w",
          minSupport = 50L, minDf = 50L, maxDfPerMille = 900L)
        .withColumn("pmi", floor(log(col("lift")) * 1e6 + lit(0.5)) / 1e6)
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(50)
    }),


    "text_lm_score" -> ((s, dir) => {
      // unigram LM corpus-fit (perplexity-style quality signal): per-term
      // bits quantized to 1e-6 before the order-free per-doc integer sum
      TextAnalysis.lmFitScore(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("dl"), col("nll_scaled"), col("avg_nll"))
        .orderBy(col("doc_id"))
    }),


    "text_fingerprint" -> ((s, dir) => {
      TextAnalysis.withFingerprint(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_topk_ngrams" -> ((s, dir) => {
      TextAnalysis.topkNgrams(spread(t(s, dir, "documents")), "text", n = 3, k = 20)
    }),

    "text_zipf_slope" -> ((s, dir) => {
      // Zipf power-law health check: rank-frequency table, ln-ln INTEGER
      // least squares (1e-3-quantized lns keep the OLS numerators in
      // BIGINT) — slope ≈ -1 for natural text, drifting slopes flag
      // synthetic/boilerplate corpora. The global window runs over the
      // VOCABULARY relation, never the corpus.
      import org.apache.spark.sql.expressions.Window
      val freq = spread(t(s, dir, "documents"))
        .select(explode(TextFns.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      val ranked = freq.select(col("freq"),
        row_number().over(Window.orderBy(col("freq").desc, col("token"))).as("rank"))
      val pts = ranked.select(
        floor(log(col("rank").cast("double")) * 1000 + lit(0.5)).cast("long").as("qx"),
        floor(log(col("freq").cast("double")) * 1000 + lit(0.5)).cast("long").as("qy"))
      graft.operators.Features.linearFit(pts, "qx", "qy")
    }),

    "text_textrank_terms" -> ((s, dir) => {
      // TextRank keyword extraction: PageRank over the undirected word
      // co-occurrence graph (adjacent tokens, distinct, symmetrized) —
      // the graph upgrade over TF-IDF salience; words ride md5-derived
      // node ids so the whole composition stays oracle-exact
      TextAnalysis.textrankTerms(spread(t(s, dir, "documents")), "text",
        iters = 3, k = 20)
    }),

    "text_bigram_lm" -> ((s, dir) => {
      // bigram next-word table: P(w2|w1) in 1e-6 fixed point over adjacent
      // token pairs, top-3 successors per head via WindowGroupLimit — the
      // Markov upgrade of the unigram corpus-fit model
      TextAnalysis.bigramLm(spread(t(s, dir, "documents")), "text", topK = 3)
        .orderBy(col("w1"), col("rnk"))
    }),

    "text_bigram_perplexity" -> ((s, dir) => {
      // CCNet-style LM predictability: per-doc add-one-smoothed bigram
      // log-prob (qln integer sums) — low scores flag garbled or
      // out-of-domain text before training
      TextAnalysis.bigramLogProb(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "text_license_detect" -> ((s, dir) => {
      // compliance cut: restrictive / CC / permissive license markers with
      // the conservative precedence (stricter claim wins); markers planted
      // deterministically so every class fires on this fixture
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" All Rights Reserved.")))
          .when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" Licensed under Creative Commons CC-BY 4.0")))
          .when(col("doc_id") % 5 === 0,
            concat(lit("SPDX-License-Identifier: MIT\n"), col("text")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.withLicenseSignals(spread(docs), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_code_detect" -> ((s, dir) => {
      // code-vs-prose router (The-Stack-style corpus cut): structural
      // symbol / digit densities + indentation runs, counted by
      // strip-and-subtract in the shared regex subset; every 9th doc gets
      // a planted indented snippet so the indent branch gates
      // non-vacuously (the prose fixture itself has no newlines)
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 9 === 0,
          concat(col("text"), lit("\n  f(x);\n  g(y);")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.withCodeSignals(spread(docs), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "eval_heldout_perplexity" -> ((s, dir) => {
      // the real LM eval: every 5th doc scored under a bigram LM trained
      // on the OTHER 80% — unseen bigrams take the add-one floor via left
      // joins; avg_nll_micro is per-bigram cross-entropy in micro-nats
      val docs = spread(t(s, dir, "documents"))
      TextAnalysis.bigramLogProbHeldout(
        docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_rake_terms" -> ((s, dir) => {
      // RAKE keywords: stopword-delimited candidate phrases, degree/freq
      // word scores, integer phrase-score sums — rewards multi-word terms,
      // the axis TF-IDF (frequency) and TextRank (centrality) don't have
      TextAnalysis.rakeTerms(spread(t(s, dir, "documents")), "doc_id", "text", k = 20)
    }),

    "text_wordpiece" -> ((s, dir) => {
      // WordPiece greedy longest-match segmentation against a
      // corpus-derived position-dependent vocabulary (initial vs
      // ##-continuation pieces) — BERT's tokenizer family beside BPE; the
      // oracle replays vocabulary AND the greedy walk in 16 unrolled steps
      TextAnalysis.wordpiece(spread(t(s, dir, "documents")), "text")
        .orderBy(col("word"))
    }),

    "text_collocations_llr" -> ((s, dir) => {
      // Dunning G² collocations: per adjacent pair, the 2×2 log-likelihood
      // ratio against independence as an order-free integer sum of
      // k·qln terms — the statistically-sound MWE detector beside PMI
      TextAnalysis.collocationsLlr(spread(t(s, dir, "documents")), "text", minCount = 2L)
        .orderBy(col("w1"), col("w2"))
    }),

    "text_readability" -> ((s, dir) => {
      // Flesch reading ease in 1e-3 fixed point: deterministic sentence/
      // word/vowel-group-syllable proxies, truncating divisions — the
      // curation-filter readability gauge, scan-speed row-local
      TextAnalysis.readability(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "text_inverted_postings" -> ((s, dir) => {
      // IR posting lists: per-token df + the 10 smallest doc ids, the head
      // cap pushed into the sort via WindowGroupLimit (never a full
      // collect_list of an unbounded posting list)
      TextAnalysis.invertedPostings(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("token"))
    }),

    "text_chi2_terms" -> ((s, dir) => {
      // χ² feature selection: top-3 most language-associated tokens per
      // lang over document frequencies; double χ² is IEEE-deterministic
      // (identical left-associated factor-cast expression on both engines)
      TextAnalysis.chi2Terms(spread(t(s, dir, "documents")), "doc_id", "lang", "text")
        .orderBy(col("lang"), col("chi2").desc, col("token"))
    }),


    "text_pii_redact" -> ((s, dir) => {
      TextAnalysis.withPiiRedaction(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
          col("n_numbers").cast("long").as("n_numbers"), col("redacted"))
        .orderBy(col("doc_id"))
    }),


    "text_chunks" -> ((s, dir) => {
      TextAnalysis.chunkByTokens(
        spread(t(s, dir, "documents")), "doc_id", "text", chunkSize = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),


    "text_chunk_dedup" -> ((s, dir) => {
      // passage-level dedup: chunk every document, hash chunks, keep the
      // repeated ones — the cross-document boilerplate/citation detector
      // document-level dedup cannot see. Chunking is a projection; the one
      // shuffle is the hash groupBy with map-side combine.
      TextAnalysis.chunkByTokens(
        spread(t(s, dir, "documents")), "doc_id", "text", chunkSize = 32, overlap = 8)
        .groupBy(md5(col("chunk")).as("chunk_hash"))
        .agg(count(lit(1)).as("n_occurrences"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_occurrences") > 1)
        .orderBy(col("chunk_hash"))
    }),


    "text_normalize" -> ((s, dir) => {
      TextAnalysis.withNormalized(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    // --- corpus curation: repetition/salience/contamination/stats ---
    "text_repetition" -> ((s, dir) => {
      TextAnalysis.withRepetition(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_ngram_novelty" -> ((s, dir) => {
      // fraction of each doc's distinct 3-grams appearing in NO other doc
      // (df=1 ⇒ unique to its one containing doc — no self-join needed)
      TextAnalysis.ngramNovelty(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_mixed_lang" -> ((s, dir) => {
      // code-switching detection: per-chunk language vote rolled up per doc
      // (chunking and langid are the already-gated operators; this gates
      // their composition)
      TextAnalysis.mixedLanguage(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_pii_ipv4" -> ((s, dir) => {
      // octet-validated IPv4 detection/redaction; the corpus has no IPs, so
      // each doc carries a synthesized candidate token (first octet ranges
      // to 299 — ~15% of candidates are octet-INVALID and must not match)
      val docs = spread(t(s, dir, "documents"))
        .withColumn("text2", concat(col("text"), lit(" "),
          (col("doc_id") % 300).cast("string"), lit("."),
          ((col("doc_id") * 7) % 256).cast("string"), lit(".0."),
          (col("doc_id") % 256).cast("string")))
      TextAnalysis.withIpv4Pii(docs, "doc_id", "text2")
        .orderBy(col("doc_id"))
    }),


    "text_pii_luhn" -> ((s, dir) => {
      // checksum-validated card-number detection: the corpus carries no
      // digits, so each doc gets a deterministic 16-digit candidate
      // ('4' + zero-padded doc_id) — ~10% Luhn-valid, split pinned by the
      // oracle's own mod-10 re-derivation
      val docs = spread(t(s, dir, "documents"))
        .withColumn("text2",
          concat(col("text"), lit(" 4"), lpad(col("doc_id").cast("string"), 15, "0")))
      TextAnalysis.withCardPii(docs, "doc_id", "text2")
        .orderBy(col("doc_id"))
    }),


    "text_char_entropy" -> ((s, dir) => {
      // Shannon char entropy in nats — gibberish/encoding detector; exact
      // via per-count qln quantization before order-free integer sums
      TextAnalysis.charEntropy(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_gopher_repetition" -> ((s, dir) => {
      // Gopher/MassiveText top-word / top-bigram occupancy — row-local
      // kernel passes, no shuffle; oracle re-derives via explode+groupBy
      TextAnalysis.gopherSignals(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "text_tfidf_top_terms" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(spread(t(s, dir, "documents")), "doc_id", "text", k = 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), col("tf"), col("df"))
        .orderBy(col("doc_id"), col("rank"))
    }),


    "text_bm25" -> ((s, dir) => {
      // BM25 ranked retrieval: top-20 docs for a 3-term query mixing the
      // corpus's one rare term (positive idf) with two common ones
      // (negative idf); scores quantized per-term to 1e-6 (see scaladoc)
      TextAnalysis.bm25TopK(spread(t(s, dir, "documents")), "doc_id", "text",
        Seq("dup", "scan", "window"), k = 20)
        .orderBy(col("rank"))
    }),


    "text_html_extract" -> ((s, dir) => {
      // the web-corpus ingestion front door: synthesize HTML around the
      // corpus text (comment/script/style noise, encoded entities, an
      // all-links nav + footer, a mixed-content div, a pure link list),
      // then boilerplate-strip it back — tag strip + entity decode +
      // per-block link-density cut. The oracle re-derives the ENTIRE
      // pipeline in the shared Java/RE2 regex subset (contract pinned on
      // TextAnalysis.htmlCleanup).
      val docs = t(s, dir, "documents")
      // compared as md5(clean_text): the extracted text embeds literal \n
      // block joins, which broke the driver's line-framed row hashing even
      // though the values are exact (r12 verdict #1). md5 on both sides
      // keeps the gate value-exact without newline-bearing cells.
      graft.operators.TextAnalysis.htmlExtract(
        spread(docs.select(col("doc_id"), htmlFixtureCol.as("html"))), "doc_id", "html")
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          col("n_kept"), col("n_dropped"), col("link_permille"))
        .orderBy(col("doc_id"))
    }),


    "eval_bleu" -> ((s, dir) => {
      // corpus BLEU of a deterministically-degraded candidate (every 5th
      // token dropped) against the original text — exact clipped-match
      // components per n, integer brevity penalty, qln log-BLEU
      val docs = t(s, dir, "documents")
      val toks = TextFns.tokens(col("text"))
      val pairs = docs.select(col("doc_id"),
        concat_ws(" ", filter(toks, (_, i) => (i + 1) % 5 =!= 0)).as("cand"),
        col("text").as("ref"))
      graft.operators.Eval.bleuComponents(spread(pairs), "doc_id", "cand", "ref")
        .orderBy(col("n"))
    }),


    "eval_wer" -> ((s, dir) => {
      // per-doc WER/CER of a deterministically-degraded candidate: every
      // 7th token REVERSED (a substitution) and every 5th DROPPED (a
      // deletion) — mixed edit classes so the DP actually chooses, not the
      // pure-deletion degenerate where distance == drop count
      val docs = t(s, dir, "documents")
      val toks = TextFns.tokens(col("text"))
      val cand = filter(
        transform(toks, (tk, i) => when((i + 1) % 7 === 0, reverse(tk)).otherwise(tk)),
        (_, i) => (i + 1) % 5 =!= 0)
      val pairs = docs.select(col("doc_id"),
        concat_ws(" ", cand).as("cand"), col("text").as("ref"))
      graft.operators.Eval.werAudit(spread(pairs), "doc_id", "cand", "ref")
        .orderBy(col("doc_id"))
    }),


    "eval_chrf" -> ((s, dir) => {
      // chrF over the same degraded-candidate fixture: per-n character
      // n-gram clipped matches + the single-division F-score identity
      val docs = t(s, dir, "documents")
      val toks = TextFns.tokens(col("text"))
      val pairs = docs.select(col("doc_id"),
        concat_ws(" ", filter(toks, (_, i) => (i + 1) % 5 =!= 0)).as("cand"),
        col("text").as("ref"))
      graft.operators.Eval.chrfComponents(spread(pairs), "doc_id", "cand", "ref")
        .orderBy(col("n"))
    }),


    "text_bigram_kn" -> ((s, dir) => {
      // interpolated Kneser-Ney bigram LM over the corpus — the canonical
      // smoothing trained in-engine, every probability an exact integer
      // in quarters (D = 3/4); full seen-bigram table, totally ordered
      TextAnalysis.bigramKneserNey(t(s, dir, "documents"), "text")
        .orderBy(col("w1"), col("w2"))
    }),


    "eval_rouge_l" -> ((s, dir) => {
      // ROUGE-L on the doc_id % 17 subset (the DP oracle is quadratic per
      // pair): candidate drops every 5th token AND corrupts every 7th, so
      // the LCS is strictly nontrivial (a pure-subsequence candidate would
      // make lcs == cand_tokens vacuously)
      val docs = t(s, dir, "documents").filter(col("doc_id") % 17 === 0)
      val toks = TextFns.tokens(col("text"))
      val pairs = docs.select(col("doc_id"),
        concat_ws(" ", filter(transform(toks, (tk, i) =>
          when((i + 1) % 7 === 0, lit("zqz")).otherwise(tk)),
          (_, i) => (i + 1) % 5 =!= 0)).as("cand"),
        col("text").as("ref"))
      graft.operators.Eval.rougeL(spread(pairs), "doc_id", "cand", "ref")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),


    "text_dup_ngram_chars" -> ((s, dir) => {
      // Gopher dup-trigram character occupancy: union-of-positions
      // coverage, overlapping duplicates never double-count a token
      TextAnalysis.dupNgramChars(spread(t(s, dir, "documents")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),


    "text_html_extract_i64" -> ((s, dir) => {
      // all-BIGINT twin (r13 verdict #1 falsifiable shape experiment): the
      // clean_md5 VARCHAR replaced by its first-15-hex-chars value as
      // BIGINT. Twin green + original red => the driver's hash
      // normalization chokes on the VARCHAR column SHAPE, not the values.
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.htmlExtract(
        spread(docs.select(col("doc_id"), htmlFixtureCol.as("html"))), "doc_id", "html")
        .select(col("doc_id"),
          conv(substring(md5(col("clean_text")), 1, 15), 16, 10).cast("long").as("clean_h"),
          col("n_kept"), col("n_dropped"), col("link_permille"))
        .orderBy(col("doc_id"))
    }),


    "curation_pipeline_html" -> ((s, dir) => {
      // the front door THROUGH the YAML pipeline compiler: raw HTML in,
      // boilerplate-stripped text out (empty extractions dropped), then a
      // min-length gate over the EXTRACTED text — the C4-style entry chain
      val pipelineYaml =
        """steps:
          |  - { op: extract_html, max_link_density_permille: 500 }
          |  - { op: filter_length, min_chars: 100 }
          |""".stripMargin
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), htmlFixtureCol.as("text"))
      graft.operators.CurationPipeline.runYaml(spread(docs), "doc_id", "text", pipelineYaml)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .orderBy(col("doc_id"))
    }),


    "text_unigram_lm" -> ((s, dir) => {
      // the THIRD major tokenizer family beside BPE and WordPiece:
      // SentencePiece-style unigram-LM training as deterministic HARD EM —
      // substring-mass seed vocabulary, Viterbi re-segmentation, integer
      // count re-estimation with add-one rescoring, zero-count pruning.
      // The oracle unrolls both EM rounds (DP + backtrack per round) in
      // generated SQL and hash-matches vocabulary AND scores.
      graft.operators.TextAnalysis.unigramLm(t(s, dir, "documents"), "text")
        .orderBy(col("piece"))
    }),


    "text_unigram_encode" -> ((s, dir) => {
      // the APPLY side: Viterbi segmentation of every distinct word under
      // the trained unigram vocabulary (smallest-start tie-break, the rule
      // the oracle re-derives as min(i) over the argmax set)
      graft.operators.TextAnalysis.unigramEncode(t(s, dir, "documents"), "text")
        .orderBy(col("word"))
    }),


    "text_gopher_quality" -> ((s, dir) => {
      // the Gopher pre-filter battery in one narrow pass: word-count
      // bounds, mean-word-length band, alphabetic share, stopword
      // evidence — per-rule signals + composite keep, integer arithmetic
      graft.operators.TextAnalysis.gopherQuality(
        spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "eval_tokenizer_fertility" -> ((s, dir) => {
      // the standard tokenizer-quality numbers: per-language fertility
      // (pieces per word) and compression (chars per piece) under the
      // trained unigram-LM vocabulary — the eval that says which languages
      // a tokenizer under-serves. Pure composition: unigramEncode's
      // distinct-word segmentation broadcast back onto the (lang, word)
      // stream; integer micro ratios
      val docs = t(s, dir, "documents")
      val enc = graft.operators.TextAnalysis.unigramEncode(docs, "text")
        .select(col("word"), col("n_pieces"))
      docs.select(col("lang"), explode(graft.functions.TextFns.tokens(col("text"))).as("word"))
        .join(broadcast(enc), "word")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"),
          sum(length(col("word")).cast("long")).as("n_chars"))
        .withColumn("fertility_micro", expr("n_pieces * 1000000 div n_words"))
        .withColumn("cpt_micro", expr("n_chars * 1000000 div n_pieces"))
        .orderBy(col("lang"))
    }),


    "text_contamination" -> ((s, dir) => {
      // decontamination pass: benchmark = every 37th doc, corpus = the rest
      val docs = spread(t(s, dir, "documents"))
      TextAnalysis.ngramOverlap(
        docs.filter(col("doc_id") % 37 =!= 0), docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
    }))

  /** The synthetic-HTML fixture (Spark side): the corpus text wrapped in
    * realistic web noise — comment, script (with a bare `<` inside), style,
    * an all-links nav, a heading, the body paragraph with encoded entities,
    * a mixed-content div (~1/3 of docs), a pure link list (~1/5), an
    * all-links footer. Mirrored literally by [[htmlFixtureSqlExpr]]. */
  private def htmlFixtureCol: Column = concat(
    lit("<html><!-- fixture --><head><script type=\"text/javascript\">var x = 1 < 2;</script>"),
    lit("<style>.nav { color: red }</style></head><body>"),
    lit("<nav><a href=\"/\">Home</a> <a href=\"/docs\">Docs</a> <a href=\"/about\">About</a></nav>"),
    lit("<h1>Doc "), col("doc_id").cast("string"), lit("</h1>"),
    lit("<p>"), col("text"),
    lit(" &amp; more &lt;escaped&gt; &quot;text&quot;&nbsp;here</p>"),
    when(col("doc_id") % 3 === 0,
      lit("<div>Read the full story <a href=\"/x\">right here</a></div>")).otherwise(lit("")),
    when(col("doc_id") % 5 === 0,
      lit("<ul><li><a href=\"/l1\">link one</a></li><li><a href=\"/l2\">link two</a></li></ul>"))
      .otherwise(lit("")),
    lit("<footer><a href=\"/tos\">Terms</a> <a href=\"/priv\">Privacy</a></footer></body></html>"))

  private val htmlFixtureSqlExpr: String =
    """'<html><!-- fixture --><head><script type="text/javascript">var x = 1 < 2;</script>'
      |    || '<style>.nav { color: red }</style></head><body>'
      |    || '<nav><a href="/">Home</a> <a href="/docs">Docs</a> <a href="/about">About</a></nav>'
      |    || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
      |    || '<p>' || text || ' &amp; more &lt;escaped&gt; &quot;text&quot;&nbsp;here</p>'
      |    || CASE WHEN doc_id % 3 = 0 THEN '<div>Read the full story <a href="/x">right here</a></div>' ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN '<ul><li><a href="/l1">link one</a></li><li><a href="/l2">link two</a></li></ul>' ELSE '' END
      |    || '<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer></body></html>'""".stripMargin

  /** DuckDB twin of [[graft.operators.TextAnalysis.htmlCleanup]] over a SQL
    * expression — generated so the step order (strip tags → named entities
    * → `&amp;` last → whitespace collapse → trim) has exactly one
    * definition per engine. Single quotes in replacements are SQL-doubled. */
  private def htmlCleanupSql(e: String): String = {
    val noTags = s"regexp_replace($e, '(?s)<[^>]*>', ' ', 'g')"
    val ents = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&apos;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (k, v)) => s"replace($acc, '$k', '$v')" }
    s"trim(regexp_replace($ents, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
  }

  /** Shared CTE chain (fixture → prep → blocks → per → flags) for both
    * HTML-extraction oracles. */
  private def htmlExtractOracleCtes: String = {
    val blockTags = "p|div|li|ul|ol|h[1-6]|br|tr|td|th|table|thead|tbody" +
      "|section|article|header|footer|nav|blockquote|pre"
    s"""WITH d AS (
       |  SELECT doc_id,
       |    '<html><!-- fixture --><head><script type="text/javascript">var x = 1 < 2;</script>'
       |    || '<style>.nav { color: red }</style></head><body>'
       |    || '<nav><a href="/">Home</a> <a href="/docs">Docs</a> <a href="/about">About</a></nav>'
       |    || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
       |    || '<p>' || text || ' &amp; more &lt;escaped&gt; &quot;text&quot;&nbsp;here</p>'
       |    || CASE WHEN doc_id % 3 = 0 THEN '<div>Read the full story <a href="/x">right here</a></div>' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0 THEN '<ul><li><a href="/l1">link one</a></li><li><a href="/l2">link two</a></li></ul>' ELSE '' END
       |    || '<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer></body></html>' AS html
       |  FROM documents
       |), prep AS (
       |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
       |    '(?s)<!--.*?-->', '', 'g'),
       |    '(?is)<script(\\s[^>]*)?>.*?</script>', '', 'g'),
       |    '(?is)<style(\\s[^>]*)?>.*?</style>', '', 'g'),
       |    '(?i)</?($blockTags)(\\s[^>]*)?/?>', chr(1), 'g') AS s
       |  FROM d
       |), blocks AS (
       |  SELECT doc_id, unnest(string_split(s, chr(1))) AS block,
       |         unnest(range(1, len(string_split(s, chr(1))) + 1)) AS idx
       |  FROM prep
       |), per AS (
       |  SELECT doc_id, idx, ${htmlCleanupSql("block")} AS btxt,
       |    COALESCE(list_sum([CAST(length(${htmlCleanupSql("x")}) AS BIGINT)
       |        FOR x IN regexp_extract_all(block, '(?is)<a(\\s[^>]*)?>(.*?)</a>', 2)]), 0) AS achars
       |  FROM blocks
       |), flags AS (
       |  SELECT doc_id, idx, btxt, achars, btxt != '' AS nonempty,
       |    (btxt != '' AND achars * 1000 // nullif(length(btxt), 0) <= 500) AS keep
       |  FROM per
       |), extracted AS (
       |  SELECT doc_id,
       |    COALESCE(string_agg(CASE WHEN keep THEN btxt END, chr(10) ORDER BY idx), '') AS clean_text,
       |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(sum(CASE WHEN nonempty AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |    COALESCE(sum(CASE WHEN nonempty THEN achars ELSE 0 END) * 1000
       |      // nullif(sum(CASE WHEN nonempty THEN length(btxt) ELSE 0 END), 0), 0) AS link_permille
       |  FROM flags GROUP BY doc_id
       |)""".stripMargin
  }

  // NOTE: concatenation, not interpolation-then-stripMargin — the CTE text
  // contains `||` at line starts, and a second stripMargin would eat one
  // pipe of each (Binder Error: `|(STRING, STRING)`)
  private def htmlExtractOracleSql: String =
    htmlExtractOracleCtes + "\n" +
      """SELECT doc_id, md5(clean_text) AS clean_md5, n_kept, n_dropped, link_permille
        |FROM extracted ORDER BY doc_id""".stripMargin

  private def curationPipelineHtmlOracleSql: String =
    htmlExtractOracleCtes + "\n" +
      """SELECT e.doc_id, docs.lang, docs.source, e.clean_text AS text
        |FROM extracted e JOIN documents docs USING (doc_id)
        |WHERE e.clean_text != '' AND length(e.clean_text) >= 100
        |ORDER BY e.doc_id""".stripMargin

  // ----- unigram-LM generated oracle (the layout_hilbert/wordpiece
  // programmatic-oracle precedent, scaled up: 2 unrolled hard-EM rounds,
  // each a 16-step Viterbi DP + argmin backpointers + a 16-step backtrack
  // walk, then a final encode pass under the trained scores). Params must
  // mirror TextAnalysis.unigramLm's defaults. MATERIALIZED hints keep
  // DuckDB from inlining the hot relations once per reference (the plain
  // view re-opens the parquet per mention — fd exhaustion at 100+ CTEs).
  private val UniMaxP = 4
  private val UniSeedMin = 30
  private val UniMaxW = 16

  /** DP + backtrack CTEs for round tag `r` against score relation
    * `sc(piece, s)`; produces seg{r}(word, n_occ, piece). */
  private def unigramViterbiCtes(r: String, sc: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"b${r}_0 AS (SELECT word, n_occ, 0 AS pos, CAST(0 AS BIGINT) AS sc FROM words)"
    parts += s"acc${r}_0 AS (SELECT * FROM b${r}_0)"
    for (j <- 1 to UniMaxW) {
      parts += s"cand${r}_$j AS (SELECT b.word, b.n_occ, b.pos AS i, b.sc + v.s AS cand " +
        s"FROM acc${r}_${j - 1} b JOIN $sc v ON v.piece = substr(b.word, CAST(b.pos AS INT) + 1, $j - CAST(b.pos AS INT)) " +
        s"WHERE b.pos >= $j - $UniMaxP AND length(b.word) >= $j)"
      parts += s"b${r}_$j AS (SELECT word, n_occ, $j AS pos, max(cand) AS sc FROM cand${r}_$j GROUP BY 1, 2)"
      parts += s"bp${r}_$j AS (SELECT c.word, $j AS pos, min(c.i) AS bi " +
        s"FROM cand${r}_$j c JOIN b${r}_$j b ON b.word = c.word AND c.cand = b.sc GROUP BY 1)"
      parts += s"acc${r}_$j AS MATERIALIZED (SELECT * FROM acc${r}_${j - 1} UNION ALL SELECT * FROM b${r}_$j)"
    }
    parts += s"bpall$r AS MATERIALIZED (" +
      (1 to UniMaxW).map(j => s"SELECT * FROM bp${r}_$j").mkString(" UNION ALL ") + ")"
    parts += s"wk${r}_0 AS (SELECT word, n_occ, CAST(length(word) AS BIGINT) AS pos FROM words)"
    for (k <- 1 to UniMaxW)
      parts += s"wk${r}_$k AS (SELECT w.word, w.n_occ, CAST(bp.bi AS BIGINT) AS pos, " +
        s"substr(w.word, CAST(bp.bi AS INT) + 1, CAST(w.pos - bp.bi AS INT)) AS piece " +
        s"FROM wk${r}_${k - 1} w JOIN bpall$r bp ON bp.word = w.word AND bp.pos = w.pos " +
        s"WHERE w.pos > 0)"
    parts += s"seg$r AS (" +
      (1 to UniMaxW).map(k => s"SELECT word, n_occ, piece FROM wk${r}_$k").mkString(" UNION ALL ") + ")"
    parts.toSeq
  }

  /** counts from seg{r}, zero-count pruning (chars immortal), add-one
    * rescore → sc{r}(piece, cnt, s). */
  private def unigramRescoreCtes(r: Int): Seq[String] = {
    val prev = if (r == 1) "sc0" else s"sc${r - 1}"
    Seq(
      s"cnt$r AS (SELECT piece, CAST(sum(n_occ) AS BIGINT) AS cnt FROM seg$r GROUP BY 1)",
      s"kept$r AS (SELECT v.piece, COALESCE(c.cnt, 0) AS cnt " +
        s"FROM $prev v LEFT JOIN cnt$r c USING (piece) " +
        s"WHERE length(v.piece) = 1 OR COALESCE(c.cnt, 0) > 0)",
      s"tot$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS v FROM kept$r)",
      s"sc$r AS MATERIALIZED (SELECT piece, cnt, " +
        s"CAST(floor(ln(cnt + 1) * 1e6 + 0.5) AS BIGINT) " +
        s"- CAST(floor(ln((SELECT total FROM tot$r) + (SELECT v FROM tot$r)) * 1e6 + 0.5) AS BIGINT) AS s " +
        s"FROM kept$r)")
  }

  private def unigramOracle(finalSelect: String, rounds: Int = 2): String = {
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    ctes += s"""words AS MATERIALIZED (
               |  SELECT word, CAST(count(*) AS BIGINT) AS n_occ FROM (
               |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word FROM documents)
               |  WHERE length(word) BETWEEN 1 AND $UniMaxW GROUP BY 1)""".stripMargin
    ctes += s"""seedsub AS (
               |  SELECT substr(word, CAST(p.range AS INT), CAST(l.range AS INT)) AS piece, n_occ
               |  FROM words CROSS JOIN range(1, ${UniMaxW + 1}) p CROSS JOIN range(1, ${UniMaxP + 1}) l
               |  WHERE length(word) >= p.range + l.range - 1)""".stripMargin
    ctes += s"""seedcnt AS (
               |  SELECT piece, CAST(sum(n_occ) AS BIGINT) AS cnt FROM seedsub GROUP BY 1
               |  HAVING length(piece) = 1 OR sum(n_occ) >= $UniSeedMin)""".stripMargin
    ctes += "seedtot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM seedcnt)"
    ctes += """sc0 AS MATERIALIZED (SELECT piece, cnt,
              |  CAST(floor(ln(cnt) * 1e6 + 0.5) AS BIGINT)
              |  - CAST(floor(ln((SELECT total FROM seedtot)) * 1e6 + 0.5) AS BIGINT) AS s
              |  FROM seedcnt)""".stripMargin
    for (r <- 1 to rounds) {
      ctes ++= unigramViterbiCtes(r.toString, s"sc${r - 1}")
      ctes ++= unigramRescoreCtes(r)
    }
    ctes ++= unigramViterbiCtes("f", s"sc$rounds")
    "WITH " + ctes.mkString(",\n") + "\n" + finalSelect
  }

  private def unigramLmOracleSql: String =
    unigramOracle("SELECT piece, cnt, s AS score_scaled FROM sc2 ORDER BY piece")

  private def unigramEncodeOracleSql: String =
    unigramOracle(
      s"""SELECT w.word, w.n_occ, CAST(count(*) AS BIGINT) AS n_pieces,
         |  string_agg(s.piece, ' ' ORDER BY s.pos) AS pieces
         |FROM words w JOIN (
         |  ${(1 to UniMaxW).map(k => s"SELECT word, piece, pos FROM wkf_$k").mkString(" UNION ALL ")}
         |) s ON s.word = w.word
         |GROUP BY w.word, w.n_occ ORDER BY w.word""".stripMargin)

  /** The WordPiece oracle: vocabulary CTEs + 16 GENERATED greedy steps
    * (the layout_hilbert programmatic-oracle precedent — each step advances
    * `pos` by the longest matching piece via a correlated `max(l)` subquery
    * and appends the piece text; words are ≤ 16 chars, so 16 single-char
    * worst-case steps always finish). */
  private def wordpieceOracleSql: String = {
    val steps = (1 to 16).map { i =>
      val prev = if (i == 1) "s0" else s"s${i - 1}"
      s"""s$i AS (
         |  SELECT word, n_occ, wlen,
         |    CASE WHEN bl IS NULL THEN pos ELSE pos + bl END AS pos,
         |    CASE WHEN bl IS NULL THEN acc
         |         WHEN np = 0 THEN substr(word, pos + 1, bl)
         |         ELSE acc || ' ##' || substr(word, pos + 1, bl) END AS acc,
         |    CASE WHEN bl IS NULL THEN np ELSE np + 1 END AS np
         |  FROM (
         |    SELECT s.*, CASE WHEN s.pos >= s.wlen THEN NULL
         |      ELSE (SELECT max(v.l) FROM vocab v
         |            WHERE v.cont = (CASE WHEN s.pos > 0 THEN 1 ELSE 0 END)
         |              AND v.piece = substr(s.word, s.pos + 1, v.l)) END AS bl
         |    FROM $prev s) q
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word FROM documents
       |), words AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS n_occ FROM w0
       |  WHERE len(word) BETWEEN 1 AND 16 GROUP BY 1
       |), ip AS (
       |  SELECT substr(word, 1, l.range) AS piece
       |  FROM words CROSS JOIN range(1, 5) l WHERE len(word) >= l.range
       |  GROUP BY 1 HAVING len(piece) = 1 OR sum(n_occ) >= 20
       |), cp AS (
       |  SELECT substr(word, p.range, l.range) AS piece
       |  FROM words CROSS JOIN range(2, 17) p CROSS JOIN range(1, 5) l
       |  WHERE len(word) >= p.range + l.range - 1
       |  GROUP BY 1 HAVING len(piece) = 1 OR sum(n_occ) >= 50
       |), vocab AS (
       |  SELECT piece, len(piece) AS l, 0 AS cont FROM ip
       |  UNION SELECT piece, len(piece) AS l, 1 AS cont FROM cp
       |), s0 AS (
       |  SELECT word, n_occ, len(word) AS wlen, 0 AS pos, '' AS acc, 0 AS np FROM words
       |),
       |$steps
       |SELECT word, n_occ, CAST(np AS BIGINT) AS n_pieces, acc AS pieces
       |FROM s16 ORDER BY word""".stripMargin
  }

  /** Shared tokenized cand/ref CTEs for the BLEU/chrF oracles: candidate =
    * every 5th token (1-based) dropped — the Spark fixture verbatim. */
  private val bleuPairCtes = Seq(
    """d0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS rw FROM documents)""",
    """d AS MATERIALIZED (SELECT doc_id, rw,
      |  [rw[i] FOR i IN range(1, len(rw) + 1) IF i % 5 != 0] AS cw FROM d0)""".stripMargin)

  private def bleuOracleSql: String = {
    val maxN = 4
    val ctes = scala.collection.mutable.ArrayBuffer[String](bleuPairCtes: _*)
    for (n <- 1 to maxN) {
      ctes += s"cc$n AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cc FROM " +
        s"(SELECT doc_id, unnest([array_to_string(cw[i:i+${n - 1}], ' ') " +
        s"FOR i IN range(1, len(cw) - $n + 2)]) AS g FROM d) GROUP BY 1, 2)"
      ctes += s"rc$n AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS rc FROM " +
        s"(SELECT doc_id, unnest([array_to_string(rw[i:i+${n - 1}], ' ') " +
        s"FOR i IN range(1, len(rw) - $n + 2)]) AS g FROM d) GROUP BY 1, 2)"
      ctes += s"m$n AS (SELECT CAST(COALESCE(sum(least(cc, rc)), 0) AS BIGINT) AS matches " +
        s"FROM cc$n JOIN rc$n USING (doc_id, g))"
      ctes += s"t$n AS (SELECT CAST(sum(greatest(len(cw) - ${n - 1}, 0)) AS BIGINT) AS total FROM d)"
    }
    ctes += "comp AS (" + (1 to maxN)
      .map(n => s"SELECT $n AS n, matches, total FROM m$n, t$n").mkString(" UNION ALL ") + ")"
    ctes += "lens AS (SELECT CAST(sum(len(cw)) AS BIGINT) AS cand_tokens, " +
      "CAST(sum(len(rw)) AS BIGINT) AS ref_tokens FROM d)"
    "WITH " + ctes.mkString(",\n") + "\n" +
      s"""SELECT CAST(n AS BIGINT) AS n, matches, total,
         |  matches * 1000000 // nullif(total, 0) AS p_micro,
         |  cand_tokens, ref_tokens,
         |  CAST(least(0, 1000000 - ref_tokens * 1000000 // nullif(cand_tokens, 0)) AS BIGINT) AS bp_micro,
         |  CAST(least(0, 1000000 - ref_tokens * 1000000 // nullif(cand_tokens, 0))
         |    - (CASE WHEN min(matches) OVER () > 0 THEN CAST(sum(
         |        CAST(floor(ln(total) * 1e6 + 0.5) AS BIGINT)
         |        - CAST(floor(ln(nullif(matches, 0)) * 1e6 + 0.5) AS BIGINT)) OVER () AS BIGINT)
         |      END) // $maxN AS BIGINT) AS bleu_log_micro
         |FROM comp, lens ORDER BY n""".stripMargin
  }

  private def chrfOracleSql: String = {
    val maxN = 6
    val b2 = 4
    val ctes = scala.collection.mutable.ArrayBuffer[String](bleuPairCtes.head,
      """d AS MATERIALIZED (SELECT doc_id, array_to_string(rw, '') AS rs,
        |  array_to_string([rw[i] FOR i IN range(1, len(rw) + 1) IF i % 5 != 0], '') AS cs
        |  FROM d0)""".stripMargin)
    for (n <- 1 to maxN) {
      ctes += s"cc$n AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cc FROM " +
        s"(SELECT doc_id, unnest([cs[i:i+${n - 1}] " +
        s"FOR i IN range(1, length(cs) - $n + 2)]) AS g FROM d) GROUP BY 1, 2)"
      ctes += s"rc$n AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS rc FROM " +
        s"(SELECT doc_id, unnest([rs[i:i+${n - 1}] " +
        s"FOR i IN range(1, length(rs) - $n + 2)]) AS g FROM d) GROUP BY 1, 2)"
      ctes += s"m$n AS (SELECT CAST(COALESCE(sum(least(cc, rc)), 0) AS BIGINT) AS matches " +
        s"FROM cc$n JOIN rc$n USING (doc_id, g))"
      ctes += s"t$n AS (SELECT CAST(sum(greatest(length(cs) - ${n - 1}, 0)) AS BIGINT) AS cand_total, " +
        s"CAST(sum(greatest(length(rs) - ${n - 1}, 0)) AS BIGINT) AS ref_total FROM d)"
    }
    ctes += "comp AS (" + (1 to maxN)
      .map(n => s"SELECT $n AS n, matches, cand_total, ref_total FROM m$n, t$n")
      .mkString(" UNION ALL ") + ")"
    "WITH " + ctes.mkString(",\n") + "\n" +
      s"""SELECT CAST(n AS BIGINT) AS n, matches, cand_total, ref_total,
         |  matches * ${1 + b2} * 1000000 // nullif($b2 * ref_total + cand_total, 0) AS chrf_micro
         |FROM comp ORDER BY n""".stripMargin
  }

  protected def textOracles: Map[String, String] = Map(

    "eval_bleu" -> bleuOracleSql,

    // word distance re-derived through DuckDB's built-in levenshtein after
    // an injective token -> SINGLE-BYTE encoding (DuckDB's levenshtein
    // counts BYTES — a multi-byte codepoint encoding overcounts, found the
    // hard way): global vocab ranks into chr(33 + rank), printable ASCII
    // for the fixture's <= 94-token vocabulary; a vocab ever outgrowing
    // the byte fails LOUDLY as an overcount, never silently-equal.
    // list_transform + string_agg preserves order, so byte edits on the
    // encoded strings == token edits on the arrays
    "eval_wer" ->
      """WITH d AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS rt
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, text, rt,
        |    [CASE WHEN i % 7 = 0 THEN reverse(rt[i]) ELSE rt[i] END
        |     FOR i IN range(1, len(rt) + 1) IF i % 5 <> 0] AS ct
        |  FROM d
        |), v AS (
        |  SELECT list(tok ORDER BY tok) AS voc
        |  FROM (SELECT DISTINCT unnest(ct || rt) AS tok FROM p)
        |), e AS (
        |  SELECT doc_id, text, len(rt) AS ref_len,
        |    COALESCE(list_aggregate(list_transform(ct,
        |      tk -> chr(33 + list_position(voc, tk))), 'string_agg', ''), '') AS cw,
        |    COALESCE(list_aggregate(list_transform(rt,
        |      tk -> chr(33 + list_position(voc, tk))), 'string_agg', ''), '') AS rw,
        |    COALESCE(array_to_string(ct, ' '), '') AS cand_str
        |  FROM p, v
        |)
        |SELECT doc_id,
        |  CAST(levenshtein(cw, rw) AS BIGINT) AS dist,
        |  CAST(ref_len AS BIGINT) AS ref_len,
        |  CAST(levenshtein(cand_str, text) AS BIGINT) AS cer_dist,
        |  CAST(length(text) AS BIGINT) AS ref_chars,
        |  CAST(levenshtein(cw, rw) * 1000000 // ref_len AS BIGINT) AS wer_micro,
        |  CAST(levenshtein(cand_str, text) * 1000000 // greatest(length(text), 1) AS BIGINT) AS cer_micro
        |FROM e ORDER BY doc_id""".stripMargin,

    "text_bigram_kn" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), prs AS (
        |  SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        |  FROM toks WHERE len(w) >= 2
        |), c12 AS MATERIALIZED (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM prs GROUP BY 1, 2
        |), ncc AS (SELECT CAST(count(*) AS BIGINT) AS ncc FROM c12),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |n1h AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1h FROM c12 GROUP BY 1),
        |n1c AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1c FROM c12 GROUP BY 1)
        |SELECT b.w1, b.w2, b.c12, c1.c1, n1h.n1h, n1c.n1c,
        |  (greatest(4 * b.c12 - 3, 0) * (SELECT ncc FROM ncc)
        |    + 3 * n1h.n1h * n1c.n1c) * 1000000
        |    // (4 * c1.c1 * (SELECT ncc FROM ncc)) AS p_micro
        |FROM c12 b JOIN c1 USING (w1) JOIN n1h USING (w1) JOIN n1c USING (w2)
        |ORDER BY w1, w2""".stripMargin,

    // LCS replayed as the running-max row recurrence: dp_i = 0-prepended
    // prefix-max over j of max(dp_{i-1}[j], dp_{i-1}[j-1] + eq(i, j)) —
    // dp_i[j-1] carries through the prefix max, so no intra-row dependency
    "eval_rouge_l" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS rw
        |  FROM documents WHERE doc_id % 17 = 0
        |), d AS MATERIALIZED (
        |  SELECT doc_id, rw,
        |    [CASE WHEN i % 7 = 0 THEN 'zqz' ELSE rw[i] END
        |     FOR i IN range(1, len(rw) + 1) IF i % 5 != 0] AS cw
        |  FROM d0
        |), st(doc_id, i, dp) AS (
        |  SELECT doc_id, 0, [CAST(0 AS BIGINT) FOR j IN range(0, len(rw) + 1)] FROM d
        |  UNION ALL
        |  SELECT s.doc_id, s.i + 1,
        |    list_prepend(CAST(0 AS BIGINT),
        |      [list_max([greatest(s.dp[x + 1],
        |          s.dp[x] + CASE WHEN d.rw[x] = d.cw[s.i + 1] THEN 1 ELSE 0 END)
        |        FOR x IN range(1, j + 1)])
        |       FOR j IN range(1, len(d.rw) + 1)])
        |  FROM st s JOIN d ON d.doc_id = s.doc_id
        |  WHERE s.i < len(d.cw)
        |), fin AS (
        |  SELECT s.doc_id, s.dp[len(d.rw) + 1] AS lcs,
        |    CAST(len(d.cw) AS BIGINT) AS cand_tokens,
        |    CAST(len(d.rw) AS BIGINT) AS ref_tokens
        |  FROM st s JOIN d ON d.doc_id = s.doc_id
        |  WHERE s.i = len(d.cw)
        |)
        |SELECT doc_id, CAST(lcs AS BIGINT) AS lcs, cand_tokens, ref_tokens,
        |  CAST(lcs * 2 * 1000000 // nullif(cand_tokens + ref_tokens, 0) AS BIGINT) AS rouge_l_micro
        |FROM fin ORDER BY doc_id""".stripMargin,

    "eval_chrf" -> chrfOracleSql,

    "text_dup_ngram_chars" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), toks AS (
        |  SELECT doc_id, unnest(w) AS t, unnest(range(1, len(w) + 1)) AS p FROM d
        |), totals AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(length(t)) AS BIGINT) AS total_chars
        |  FROM toks GROUP BY 1
        |), grams AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS g,
        |    unnest(range(1, len(w) - 1)) AS p
        |  FROM d
        |), dup AS (
        |  SELECT doc_id, g FROM grams GROUP BY 1, 2 HAVING count(*) >= 2
        |), cov AS (
        |  SELECT DISTINCT doc_id, pos FROM (
        |    SELECT gr.doc_id, unnest(range(gr.p, gr.p + 3)) AS pos
        |    FROM grams gr JOIN dup USING (doc_id, g))
        |), dchars AS (
        |  SELECT t.doc_id, CAST(sum(length(t.t)) AS BIGINT) AS dup_chars
        |  FROM cov c JOIN toks t ON t.doc_id = c.doc_id AND t.p = c.pos GROUP BY 1
        |)
        |SELECT doc_id, n_tokens, total_chars,
        |  COALESCE(dup_chars, 0) AS dup_chars,
        |  COALESCE(dup_chars, 0) * 1000 // nullif(total_chars, 0) AS dup_permille
        |FROM totals LEFT JOIN dchars USING (doc_id) ORDER BY doc_id""".stripMargin,

    // kappa over the langid confusion cells: all counts integer, the final
    // κ one IEEE division of exact integer operands (identical
    // left-associated expression both engines); degenerate p_e = 1 → 0
    "eval_kappa" ->
      """WITH base AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    length(text) AS total,
        |    length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS no_cyr,
        |    length(regexp_replace(text, '[一-鿿]', '', 'g')) AS no_cjk
        |  FROM documents
        |), hits AS (
        |  SELECT doc_id, lang, total, no_cyr, no_cjk,
        |    len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los'], t))) AS es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','la','les','et','est','une'], t))) AS fr
        |  FROM base
        |), pairs AS (
        |  SELECT lang AS a,
        |    CASE WHEN total - no_cyr > 0 THEN 'ru'
        |         WHEN total - no_cjk > 0 THEN 'zh'
        |         WHEN es > en AND es >= de AND es >= fr THEN 'es'
        |         WHEN de > en AND de >= fr THEN 'de'
        |         WHEN fr > en THEN 'fr'
        |         ELSE 'en' END AS pr
        |  FROM hits
        |), cells AS (
        |  SELECT a AS ca, pr AS cb, CAST(count(*) AS BIGINT) AS m FROM pairs GROUP BY 1, 2
        |), rt AS (SELECT ca AS k, CAST(sum(m) AS BIGINT) AS rk FROM cells GROUP BY 1),
        |ct AS (SELECT cb AS k, CAST(sum(m) AS BIGINT) AS ck FROM cells GROUP BY 1),
        |pe AS (SELECT CAST(sum(rk * ck) AS BIGINT) AS pe_n2 FROM rt JOIN ct USING (k)),
        |tot AS (
        |  SELECT CAST(sum(m) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ca = cb THEN m ELSE 0 END) AS BIGINT) AS agree_n
        |  FROM cells
        |)
        |SELECT n, agree_n, pe_n2,
        |  CASE WHEN n * n = pe_n2 THEN 0.0
        |    ELSE CAST(n * agree_n - pe_n2 AS DOUBLE) / CAST(n * n - pe_n2 AS DOUBLE)
        |  END AS kappa
        |FROM tot CROSS JOIN pe""".stripMargin,

    // per-distinct-score cumulative confusion counts; explicit ROWS frame
    // on both sides (frame defaults differ across engines — AUC lesson)
    "eval_f1_sweep" ->
      """WITH d AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents
        |), sc AS (
        |  SELECT y, COALESCE(
        |    len(list_filter(toks, t -> list_contains(['the','a','an','and','of','to','in','is'], t)))
        |      * 1000000 // nullif(len(toks), 0), 0) AS s
        |  FROM d
        |), per AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
        |  FROM sc GROUP BY 1
        |), cum AS (
        |  SELECT s,
        |    CAST(sum(np) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |    CAST(sum(n) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp
        |  FROM per
        |), tot AS (SELECT CAST(sum(np) AS BIGINT) AS pos FROM per)
        |SELECT CAST(s AS BIGINT) AS threshold, tp,
        |  pp - tp AS fp, pos - tp AS fn,
        |  tp * 1000000 // pp AS prec_micro,
        |  tp * 1000000 // nullif(pos, 0) AS rec_micro,
        |  2 * tp * 1000000 // (pp + pos) AS f1_micro
        |FROM cum CROSS JOIN tot
        |ORDER BY threshold""".stripMargin,

    // four separately-quantized qln terms per presence/absence cell (the
    // WoE no-products-inside-ln pattern); zero cells contribute exact 0
    // NB re-derived: train counts on evens, qln-factored scores on odds,
    // argmax via (score desc, lang asc) row_number — unseen pairs
    // contribute qln(0+1) = 0 on both sides by construction
    "text_nb_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents
        |), counts AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks WHERE doc_id % 2 = 0 GROUP BY 1, 2
        |), vocab AS (
        |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        |  FROM toks WHERE doc_id % 2 = 0
        |), meta AS (
        |  SELECT c.lang, sum(c.cnt) AS tok_total, max(d.n_docs_train) AS n_docs_train
        |  FROM counts c JOIN (
        |    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_train
        |    FROM documents WHERE doc_id % 2 = 0 GROUP BY 1) d ON d.lang = c.lang
        |  GROUP BY 1
        |), testtoks AS (
        |  SELECT doc_id AS did, lang AS lang_true, tok, CAST(count(*) AS BIGINT) AS m
        |  FROM toks WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3
        |), scored AS (
        |  SELECT tt.did, tt.lang_true, mt.lang,
        |    CAST(floor(ln(mt.n_docs_train) * 1000000 + 0.5) AS BIGINT)
        |      + sum(tt.m * CAST(floor(ln(COALESCE(c.cnt, 0) + 1) * 1000000 + 0.5) AS BIGINT))
        |      - sum(tt.m) * CAST(floor(ln(mt.tok_total + (SELECT v FROM vocab)) * 1000000 + 0.5) AS BIGINT)
        |      AS score
        |  FROM testtoks tt CROSS JOIN meta mt
        |  LEFT JOIN counts c ON c.lang = mt.lang AND c.tok = tt.tok
        |  GROUP BY tt.did, tt.lang_true, mt.lang, mt.n_docs_train, mt.tok_total
        |), pred AS (
        |  SELECT did, lang_true, lang AS predicted_lang,
        |    row_number() OVER (PARTITION BY did ORDER BY score DESC, lang ASC) AS rk
        |  FROM scored
        |)
        |SELECT lang_true AS lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM pred WHERE rk = 1 GROUP BY 1, 2
        |ORDER BY lang, predicted_lang""".stripMargin,

    // the three S-stemmer rules as the same CASE chain; variants via
    // sorted distinct list joined with spaces
    "text_stem_conflation" ->
      """WITH planted AS (
        |  SELECT CASE WHEN doc_id % 7 = 0
        |    THEN text || ' stories story stores store cats cat bus class classes'
        |    ELSE text END AS text
        |  FROM documents
        |), toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM planted
        |), lat AS (SELECT t FROM toks WHERE regexp_full_match(t, '[a-z]+')),
        |stemmed AS (
        |  SELECT t, CASE
        |    WHEN length(t) > 4 AND right(t, 3) = 'ies'
        |         AND right(t, 4) NOT IN ('eies', 'aies')
        |      THEN substr(t, 1, length(t) - 3) || 'y'
        |    WHEN length(t) > 3 AND right(t, 2) = 'es'
        |         AND right(t, 3) NOT IN ('aes', 'ees', 'oes')
        |      THEN substr(t, 1, length(t) - 1)
        |    WHEN length(t) > 3 AND right(t, 1) = 's'
        |         AND right(t, 2) NOT IN ('us', 'ss')
        |      THEN substr(t, 1, length(t) - 1)
        |    ELSE t END AS stem
        |  FROM lat
        |)
        |SELECT stem, CAST(count(DISTINCT t) AS BIGINT) AS n_types,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  array_to_string(list_sort(list(DISTINCT t)), ' ') AS variants
        |FROM stemmed GROUP BY 1 HAVING count(DISTINCT t) >= 2
        |ORDER BY stem""".stripMargin,

    "text_mi_terms" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, lang, token FROM (
        |    SELECT doc_id, lang,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |    FROM documents)
        |), lt AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM documents GROUP BY 1
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |), a AS (
        |  SELECT lang, token, CAST(count(*) AS BIGINT) AS a FROM dt GROUP BY 1, 2
        |), td AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS tok_df FROM dt GROUP BY 1
        |), s AS (
        |  SELECT a.lang, a.token, a.a, lt.n_lang, tot.n, td.tok_df,
        |    lt.n_lang - a.a AS b, td.tok_df - a.a AS c,
        |    tot.n - lt.n_lang - (td.tok_df - a.a) AS d
        |  FROM a JOIN lt USING (lang) JOIN td USING (token) CROSS JOIN tot
        |), m AS (
        |  SELECT lang, token, a AS df_lang,
        |    (CASE WHEN a = 0 THEN 0 ELSE a * (
        |       CAST(floor(ln(CAST(a AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       + CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(n_lang AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(tok_df AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) END)
        |    + (CASE WHEN b = 0 THEN 0 ELSE b * (
        |       CAST(floor(ln(CAST(b AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       + CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(n_lang AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(n - tok_df AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) END)
        |    + (CASE WHEN c = 0 THEN 0 ELSE c * (
        |       CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       + CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(n - n_lang AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(tok_df AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) END)
        |    + (CASE WHEN d = 0 THEN 0 ELSE d * (
        |       CAST(floor(ln(CAST(d AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       + CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(n - n_lang AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |       - CAST(floor(ln(CAST(n - tok_df AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) END)
        |    AS mi_scaled
        |  FROM s
        |), r AS (
        |  SELECT lang, token, df_lang, CAST(mi_scaled AS BIGINT) AS mi_scaled,
        |    row_number() OVER (PARTITION BY lang ORDER BY mi_scaled DESC, token) AS rk
        |  FROM m
        |)
        |SELECT lang, token, df_lang, mi_scaled FROM r WHERE rk <= 3
        |ORDER BY lang, mi_scaled DESC, token""".stripMargin,

    // the three planted failure modes re-derived; vowel evidence judged on
    // latin-script words only, substance chars via \p{L}\p{N} (RE2/Java
    // agree on the Unicode classes)
    "text_garbage_detect" ->
      """WITH all_docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN text || ' xq3f9b7c1d4e5f60718293a4b5c6d7e8f90a1b2c3d4e5f6a end'
        |      ELSE text END AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000000, 'zxcv qwrt plmk bnmv hjkl dfgh strn wlrd'
        |  FROM documents WHERE doc_id % 13 = 0
        |  UNION ALL
        |  SELECT doc_id + 30000000, repeat('#?*! ', 8)
        |  FROM documents WHERE doc_id % 17 = 0
        |), sig AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS w,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(regexp_replace(text, '[\p{L}\p{N}]', '', 'g')) AS BIGINT) AS non_alnum
        |  FROM all_docs
        |), agg AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_max([length(x) FOR x IN w]), 0) AS BIGINT) AS max_word_len,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS latin_words,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')
        |      AND NOT regexp_matches(x, '[aeiouAEIOU]'))) AS BIGINT) AS novowel_words,
        |    n_chars - non_alnum AS alnum_chars
        |  FROM sig
        |)
        |SELECT doc_id, n_words, n_chars, max_word_len,
        |  COALESCE(novowel_words * 1000 // nullif(latin_words, 0), 0) AS novowel_permille,
        |  COALESCE(alnum_chars * 1000 // nullif(n_chars, 0), 0) AS alnum_permille,
        |  CAST(CASE WHEN max_word_len > 40
        |    OR (latin_words > 0 AND COALESCE(novowel_words * 1000 // nullif(latin_words, 0), 0) >= 500)
        |    OR (n_chars > 0 AND COALESCE(alnum_chars * 1000 // nullif(n_chars, 0), 0) < 400)
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_garbage
        |FROM agg ORDER BY doc_id""".stripMargin,

    "text_html_extract" -> htmlExtractOracleSql,

    "text_html_extract_i64" -> (htmlExtractOracleCtes + "\n" +
      """SELECT doc_id,
        |  ('0x' || substr(md5(clean_text), 1, 15))::BIGINT AS clean_h,
        |  n_kept, n_dropped, link_permille
        |FROM extracted ORDER BY doc_id""".stripMargin),

    "curation_pipeline_html" -> curationPipelineHtmlOracleSql,

    "text_gopher_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), sig AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum([length(x) FOR x IN w]) AS BIGINT) AS sum_wlen,
        |    CAST(len([x FOR x IN w IF regexp_matches(x, '[a-zA-Z]')]) AS BIGINT) AS alpha_words,
        |    CAST(len([x FOR x IN w IF x IN ('the','a','an','and','of','to','in','is')]) AS BIGINT) AS stop_hits
        |  FROM toks
        |), m AS (
        |  SELECT doc_id, n_words,
        |    sum_wlen * 1000 // nullif(n_words, 0) AS mean_wlen_milli,
        |    alpha_words * 1000 // nullif(n_words, 0) AS alpha_permille,
        |    stop_hits
        |  FROM sig
        |)
        |SELECT doc_id, n_words, mean_wlen_milli, alpha_permille, stop_hits,
        |  CAST(CASE WHEN COALESCE(n_words BETWEEN 20 AND 100000
        |    AND mean_wlen_milli BETWEEN 3000 AND 10000
        |    AND alpha_permille >= 800 AND stop_hits >= 2, FALSE)
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "text_unigram_lm" -> unigramLmOracleSql,

    "text_unigram_encode" -> unigramEncodeOracleSql,

    "eval_tokenizer_fertility" -> unigramOracle(
      s"""SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ppw.np) AS BIGINT) AS n_pieces,
         |  CAST(sum(length(lw.word)) AS BIGINT) AS n_chars,
         |  CAST(sum(ppw.np) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS fertility_micro,
         |  CAST(sum(length(lw.word)) AS BIGINT) * 1000000 // CAST(sum(ppw.np) AS BIGINT) AS cpt_micro
         |FROM (
         |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word FROM documents
         |) lw
         |JOIN (
         |  SELECT word, CAST(count(*) AS BIGINT) AS np FROM (
         |    ${(1 to UniMaxW).map(k => s"SELECT word, piece FROM wkf_$k").mkString(" UNION ALL ")}
         |  ) s GROUP BY word
         |) ppw ON ppw.word = lw.word
         |GROUP BY lang ORDER BY lang""".stripMargin),

    "text_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), chunks AS (
        |  SELECT doc_id,
        |    unnest([{'chunk_idx': i, 'chunk': array_to_string(w[i*24+1:i*24+32], ' ')}
        |            FOR i IN range(0, greatest(CAST(ceil((len(w) - 8) / 24.0) AS BIGINT), 1))],
        |           recursive := true)
        |  FROM toks
        |)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk
        |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,


    "text_chunk_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), chunks AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(w[i*24+1:i*24+32], ' ')
        |            FOR i IN range(0, greatest(CAST(ceil((len(w) - 8) / 24.0) AS BIGINT), 1))]) AS chunk
        |  FROM toks
        |)
        |SELECT md5(chunk) AS chunk_hash, count(*) AS n_occurrences, min(doc_id) AS first_doc
        |FROM chunks GROUP BY 1 HAVING count(*) > 1 ORDER BY chunk_hash""".stripMargin,


    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
        |    '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS normalized
        |FROM documents ORDER BY doc_id""".stripMargin,


    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), r AS (
        |  SELECT doc_id,
        |    CAST(GREATEST(len(w) - 1, 0) AS BIGINT) AS n_bigrams,
        |    CAST(len(list_distinct([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))])) AS BIGINT) AS n_distinct_bigrams
        |  FROM toks
        |)
        |SELECT doc_id, n_bigrams, n_distinct_bigrams,
        |  CASE WHEN n_bigrams = 0 THEN 0.0
        |       ELSE CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) END AS dup_bigram_frac
        |FROM r ORDER BY doc_id""".stripMargin,


    "text_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)])) AS gram
        |  FROM toks
        |), df AS (
        |  SELECT gram, count(*) AS df FROM g GROUP BY 1
        |)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS novelty
        |FROM g JOIN df USING (gram) GROUP BY 1 ORDER BY g.doc_id""".stripMargin,


    "text_mixed_lang" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), chunks AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(w[i*24+1:i*24+32], ' ')
        |            FOR i IN range(0, greatest(CAST(ceil((len(w) - 8) / 24.0) AS BIGINT), 1))]) AS chunk
        |  FROM toks
        |), base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(chunk), '\s+') AS ct,
        |    length(chunk) AS total,
        |    length(regexp_replace(chunk, '[Ѐ-ӿ]', '', 'g')) AS no_cyr,
        |    length(regexp_replace(chunk, '[一-鿿]', '', 'g')) AS no_cjk
        |  FROM chunks
        |), hits AS (
        |  SELECT doc_id, total, no_cyr, no_cjk,
        |    len(list_filter(ct, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS en,
        |    len(list_filter(ct, t -> list_contains(['el','la','de','que','y','los'], t))) AS es,
        |    len(list_filter(ct, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS de,
        |    len(list_filter(ct, t -> list_contains(['le','la','les','et','est','une'], t))) AS fr
        |  FROM base
        |), pred AS (
        |  SELECT doc_id,
        |    CASE WHEN total - no_cyr > 0 THEN 'ru'
        |         WHEN total - no_cjk > 0 THEN 'zh'
        |         WHEN es > en AND es >= de AND es >= fr THEN 'es'
        |         WHEN de > en AND de >= fr THEN 'de'
        |         WHEN fr > en THEN 'fr'
        |         ELSE 'en' END AS lang
        |  FROM hits
        |), lc AS (
        |  SELECT doc_id, lang, count(*) AS n FROM pred GROUP BY 1, 2
        |), rk AS (
        |  SELECT doc_id, lang, n,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) AS rk
        |  FROM lc
        |)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chunks,
        |  CAST(count(*) AS BIGINT) AS n_langs,
        |  max(CASE WHEN rk = 1 THEN lang END) AS majority_lang,
        |  CAST(CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS BIGINT) AS mixed
        |FROM rk GROUP BY 1 ORDER BY doc_id""".stripMargin,


    "text_pii_ipv4" ->
      """WITH d AS (
        |  SELECT doc_id, text || ' ' ||
        |    CAST(doc_id % 300 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        |    || '.0.' || CAST(doc_id % 256 AS VARCHAR) AS t
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(t), '\s+') AS w FROM d
        |)
        |SELECT doc_id,
        |  CAST(len(list_filter(w, x -> regexp_matches(x,
        |    '^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$'))) AS BIGINT) AS n_ipv4,
        |  array_to_string([CASE WHEN regexp_matches(x,
        |    '^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')
        |    THEN '<IP>' ELSE x END FOR x IN w], ' ') AS redacted
        |FROM toks ORDER BY doc_id""".stripMargin,


    "text_pii_luhn" ->
      """WITH d AS (
        |  SELECT doc_id, text || ' 4' || lpad(CAST(doc_id AS VARCHAR), 15, '0') AS t
        |  FROM documents
        |), runs AS (
        |  SELECT doc_id, unnest(regexp_extract_all(t, '[0-9]+')) AS run FROM d
        |), cards AS (
        |  SELECT doc_id, string_split(reverse(run), '') AS l FROM runs
        |  WHERE len(run) BETWEEN 13 AND 19
        |), luhn AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN i % 2 = 1 THEN CAST(l[i] AS INT)
        |                   ELSE CASE WHEN 2*CAST(l[i] AS INT) > 9
        |                             THEN 2*CAST(l[i] AS INT) - 9
        |                             ELSE 2*CAST(l[i] AS INT) END END
        |              FOR i IN range(1, len(l) + 1)]) % 10 AS rem
        |  FROM cards
        |)
        |SELECT d.doc_id,
        |  CAST(count(luhn.rem) AS BIGINT) AS n_card_like,
        |  CAST(COALESCE(sum(CASE WHEN luhn.rem = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_luhn_valid
        |FROM d LEFT JOIN luhn ON luhn.doc_id = d.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "text_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
        |), cc AS (
        |  SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
        |    CAST(sum(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_nlnn
        |  FROM cc GROUP BY 1
        |)
        |SELECT doc_id, n_chars, sum_nlnn,
        |  CASE WHEN n_chars = 0 THEN 0.0
        |       ELSE CAST(CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) * n_chars - sum_nlnn AS DOUBLE)
        |            / CAST(n_chars * 1000000 AS DOUBLE) END AS entropy_nats
        |FROM agg ORDER BY doc_id""".stripMargin,


    "text_gopher_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), base AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks
        |), wc AS (
        |  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_word_n FROM (
        |    SELECT doc_id, tok, count(*) AS cnt
        |    FROM (SELECT doc_id, unnest(w) AS tok FROM toks) GROUP BY 1, 2)
        |  GROUP BY 1
        |), gc AS (
        |  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_bigram_n FROM (
        |    SELECT doc_id, gram, count(*) AS cnt
        |    FROM (SELECT doc_id,
        |            unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS gram
        |          FROM toks) GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT base.doc_id, base.n_tokens,
        |  COALESCE(wc.top_word_n, 0) AS top_word_n,
        |  COALESCE(gc.top_bigram_n, 0) AS top_bigram_n,
        |  CASE WHEN base.n_tokens = 0 THEN 0.0
        |       ELSE CAST(COALESCE(wc.top_word_n, 0) AS DOUBLE) / CAST(base.n_tokens AS DOUBLE) END AS top_word_frac,
        |  CASE WHEN base.n_tokens <= 1 THEN 0.0
        |       ELSE CAST(COALESCE(gc.top_bigram_n, 0) AS DOUBLE) / CAST(base.n_tokens - 1 AS DOUBLE) END AS top_bigram_frac
        |FROM base
        |LEFT JOIN wc ON wc.doc_id = base.doc_id
        |LEFT JOIN gc ON gc.doc_id = base.doc_id
        |ORDER BY base.doc_id""".stripMargin,


    "text_tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), ranked AS (
        |  SELECT doc_id, term, tf, df,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) AS rank
        |  FROM tf JOIN dfq USING (term)
        |)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,


    "text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks
        |), stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl
        |), tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(w) AS term FROM toks)
        |  WHERE term IN ('dup', 'scan', 'window') GROUP BY doc_id, term
        |), dfq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
        |), per_term AS (
        |  SELECT tf.doc_id,
        |    CAST(floor(
        |      ln((CAST(s.n_docs - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
        |      * ((2.2 * CAST(tf.tf AS DOUBLE))
        |         / (CAST(tf.tf AS DOUBLE) + 0.3
        |            + 0.9 * (CAST(dl.dl * s.n_docs AS DOUBLE) / CAST(s.total_tokens AS DOUBLE))))
        |      * 1000000.0 + 0.5) AS BIGINT) AS si_q
        |  FROM tf JOIN dfq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |), byd AS (
        |  SELECT doc_id, CAST(sum(si_q) AS BIGINT) AS score_q,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM per_term GROUP BY doc_id
        |), ranked AS (
        |  SELECT doc_id, score_q, n_terms,
        |    row_number() OVER (ORDER BY score_q DESC, doc_id) AS rank
        |  FROM byd)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, score_q, n_terms
        |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin,


    "text_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+3], ' ') FOR i IN range(1, len(w) - 2)]) AS grams
        |  FROM toks
        |), bg AS (
        |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 37 = 0
        |), cg AS (
        |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 37 <> 0
        |), m AS (
        |  SELECT cg.doc_id AS doc_id, count(*) AS n_matched FROM cg JOIN bg USING (gram) GROUP BY 1
        |)
        |SELECT g.doc_id AS doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_matched, 0) AS BIGINT) AS n_matched,
        |  CASE WHEN len(grams) = 0 THEN 0.0
        |       ELSE CAST(coalesce(n_matched, 0) AS DOUBLE) / CAST(len(grams) AS DOUBLE) END AS overlap_frac
        |FROM g LEFT JOIN m ON g.doc_id = m.doc_id
        |WHERE g.doc_id % 37 <> 0 ORDER BY doc_id""".stripMargin,


    "text_topk_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)])) AS gram
        |  FROM toks
        |)
        |SELECT gram, count(*) AS doc_freq FROM g
        |GROUP BY gram ORDER BY doc_freq DESC, gram LIMIT 20""".stripMargin,

    // integer OLS re-derived inline: same five power sums, same truncating
    // fixed-point slope/intercept; lns quantized 1e-3 before any sum
    "text_zipf_slope" ->
      """WITH f AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |    FROM documents) z
        |  GROUP BY 1
        |), r AS (
        |  SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank FROM f
        |), p AS (
        |  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS qx,
        |         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS qy
        |  FROM r
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(qx) AS BIGINT) AS sx,
        |    CAST(sum(qy) AS BIGINT) AS sy, CAST(sum(qx * qx) AS BIGINT) AS sxx,
        |    CAST(sum(qx * qy) AS BIGINT) AS sxy
        |  FROM p
        |)
        |SELECT n, sx, sy, sxx, sxy,
        |  CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT) AS slope_micro,
        |  CAST((sy * 1000000
        |      - ((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)) * sx) // n AS BIGINT)
        |    AS intercept_micro
        |FROM s""".stripMargin,

    // the bigram pair stream composed with the graph_pagerank unrolled
    // fixed point, words as md5-derived 60-bit node ids
    "text_textrank_terms" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM toks
        |), pp AS (
        |  SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM g
        |), und AS (
        |  SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
        |  FROM pp WHERE w1 != w2
        |), e AS (
        |  SELECT ('0x' || substr(md5('0:' || a), 1, 15))::BIGINT AS src,
        |         ('0x' || substr(md5('0:' || b), 1, 15))::BIGINT AS dst FROM und
        |  UNION ALL
        |  SELECT ('0x' || substr(md5('0:' || b), 1, 15))::BIGINT,
        |         ('0x' || substr(md5('0:' || a), 1, 15))::BIGINT FROM und
        |), deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |n AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT src AS node, 1000000000 // (SELECT n FROM n) AS rank FROM deg),
        |r1 AS (
        |  SELECT nodes.src AS node, 150000000 // (SELECT n FROM n)
        |    + 85 * coalesce(sum(r0.rank // d2.deg), 0) // 100 AS rank
        |  FROM deg nodes
        |  LEFT JOIN e ON e.dst = nodes.src
        |  LEFT JOIN deg d2 ON d2.src = e.src
        |  LEFT JOIN r0 ON r0.node = e.src
        |  GROUP BY nodes.src
        |), r2 AS (
        |  SELECT nodes.src AS node, 150000000 // (SELECT n FROM n)
        |    + 85 * coalesce(sum(r1.rank // d2.deg), 0) // 100 AS rank
        |  FROM deg nodes
        |  LEFT JOIN e ON e.dst = nodes.src
        |  LEFT JOIN deg d2 ON d2.src = e.src
        |  LEFT JOIN r1 ON r1.node = e.src
        |  GROUP BY nodes.src
        |), r3 AS (
        |  SELECT nodes.src AS node, 150000000 // (SELECT n FROM n)
        |    + 85 * coalesce(sum(r2.rank // d2.deg), 0) // 100 AS rank
        |  FROM deg nodes
        |  LEFT JOIN e ON e.dst = nodes.src
        |  LEFT JOIN deg d2 ON d2.src = e.src
        |  LEFT JOIN r2 ON r2.node = e.src
        |  GROUP BY nodes.src
        |), vocab AS (
        |  SELECT DISTINCT term, ('0x' || substr(md5('0:' || term), 1, 15))::BIGINT AS node
        |  FROM (SELECT a AS term FROM und UNION SELECT b FROM und) q
        |)
        |SELECT v.term, CAST(r3.rank AS BIGINT) AS rank_scaled
        |FROM r3 JOIN vocab v USING (node)
        |ORDER BY rank_scaled DESC, term LIMIT 20""".stripMargin,

    // adjacent pairs via the r7 list-comprehension pairing; c1 derived from
    // the pair counts (heads = words WITH a successor); p in 1e-6 fixed point
    "text_bigram_lm" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM toks
        |), pp AS (
        |  SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM g
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pp GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
        |), r AS (
        |  SELECT c12.w1, c12.w2, c12.c12, c1.c1,
        |    CAST(c12.c12 * 1000000 // c1.c1 AS BIGINT) AS p_micro,
        |    row_number() OVER (PARTITION BY c12.w1 ORDER BY c12.c12 DESC, c12.w2) AS rnk
        |  FROM c12 JOIN c1 USING (w1)
        |)
        |SELECT w1, rnk, w2, c12, c1, p_micro
        |FROM r WHERE rnk <= 3 ORDER BY w1, rnk""".stripMargin,

    // corpus counts + add-one smoothing re-derived; per-doc qln sums
    "text_bigram_perplexity" ->
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
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12)
        |SELECT pp.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(CAST(floor(ln(c12.c12 + 1) * 1e6 + 0.5) AS BIGINT)
        |    - CAST(floor(ln(c1.c1 + (SELECT v FROM v)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS logprob_scaled
        |FROM pp JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY 1 ORDER BY pp.doc_id""".stripMargin,

    // same planted markers; regexp_matches with the 'i' flag mirrors the
    // Java (?i) literal alternations; precedence restrictive > cc > perm
    "text_license_detect" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' All Rights Reserved.'
        |         WHEN doc_id % 7 = 0 THEN text || ' Licensed under Creative Commons CC-BY 4.0'
        |         WHEN doc_id % 5 = 0 THEN 'SPDX-License-Identifier: MIT' || chr(10) || text
        |         ELSE text END AS text
        |  FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN regexp_matches(text, 'all rights reserved', 'i') THEN 1 ELSE 0 END AS BIGINT) AS has_restrictive,
        |    CAST(CASE WHEN regexp_matches(text, 'creative commons|cc-by', 'i') THEN 1 ELSE 0 END AS BIGINT) AS has_cc,
        |    CAST(CASE WHEN regexp_matches(text, 'mit license|apache license|spdx-license-identifier|gnu general public license', 'i') THEN 1 ELSE 0 END AS BIGINT) AS has_permissive
        |  FROM d
        |)
        |SELECT doc_id, has_restrictive, has_cc, has_permissive,
        |  CASE WHEN has_restrictive = 1 THEN 'restrictive'
        |       WHEN has_cc = 1 THEN 'open-cc'
        |       WHEN has_permissive = 1 THEN 'open-permissive'
        |       ELSE 'none' END AS license_class
        |FROM s ORDER BY doc_id""".stripMargin,


    // strip-and-subtract counting; DuckDB needs the 'g' flag where Java
    // replaces all by default; \n in the class matches the literal newline
    "text_code_detect" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0
        |      THEN text || chr(10) || '  f(x);' || chr(10) || '  g(y);'
        |      ELSE text END AS text
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(regexp_replace(text, '[{}();=<>\[\]#|&]', '', 'g')) AS BIGINT) AS n_symbols,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |    -- replacement must be chr(10), an actual 1-char string: a '\n'
        |    -- REPLACEMENT literal is an invalid RE2 escape DuckDB treats as
        |    -- empty (3 chars removed per match vs Spark's 2)
        |    CAST((length(text) - length(regexp_replace(text, '\n  ', chr(10), 'g'))) // 2 AS BIGINT) AS n_indents
        |  FROM d
        |)
        |SELECT doc_id, n_chars, n_symbols, n_digits, n_indents,
        |  CAST(CASE WHEN n_chars = 0 THEN 0 ELSE n_symbols * 1000 // n_chars END AS BIGINT) AS symbol_permille,
        |  CAST(CASE WHEN n_chars = 0 THEN 0 ELSE n_digits * 1000 // n_chars END AS BIGINT) AS digit_permille,
        |  CAST(CASE WHEN (CASE WHEN n_chars = 0 THEN 0 ELSE n_symbols * 1000 // n_chars END) >= 30
        |         OR n_indents > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_code
        |FROM s ORDER BY doc_id""".stripMargin,


    // train counts from the 80% split, scoring via LEFT joins with zero
    // fallbacks (unseen bigram -> add-one floor); zero-bigram docs retained
    "eval_heldout_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), gtr AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM toks WHERE doc_id % 5 != 0
        |), ptr AS (
        |  SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM gtr
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM ptr GROUP BY 1, 2
        |), c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM c12),
        |gsc AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM toks WHERE doc_id % 5 = 0
        |), psc AS (
        |  SELECT doc_id, string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM gsc
        |), terms AS (
        |  SELECT psc.doc_id,
        |    CAST(floor(ln(COALESCE(c12.c12, 0) + 1) * 1e6 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(COALESCE(c1.c1, 0) + (SELECT v FROM v)) * 1e6 + 0.5) AS BIGINT) AS term
        |  FROM psc LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(term) AS BIGINT) AS logprob_scaled
        |  FROM terms GROUP BY 1
        |), ids AS (SELECT doc_id FROM toks WHERE doc_id % 5 = 0)
        |SELECT ids.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(a.logprob_scaled, 0) AS logprob_scaled,
        |  CASE WHEN COALESCE(a.n_bigrams, 0) = 0 THEN NULL
        |       ELSE CAST((-a.logprob_scaled) // a.n_bigrams AS BIGINT) END AS avg_nll_micro
        |FROM ids LEFT JOIN agg a USING (doc_id) ORDER BY ids.doc_id""".stripMargin,


    // islands via the cumulative stopword count (tie-free default frame),
    // word degree/frequency over phrase membership, integer phrase sums
    "text_rake_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), tk AS (
        |  -- 1024 bounds the position cross join, well above any fixture's
        |  -- token count (max ~100); Fingerprints would catch a regenerated
        |  -- corpus long before this truncates silently
        |  SELECT doc_id, i.range AS pos, w[i.range + 1] AS tok
        |  FROM toks CROSS JOIN range(0, 1024) i WHERE i.range < len(w)
        |), mk AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN tok IN ('the','a','an','and','or','of','to','in','is','it','for','on','with')
        |      THEN 1 ELSE 0 END AS is_stop
        |  FROM tk
        |), isl AS (
        |  SELECT doc_id, pos, tok, is_stop,
        |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM mk
        |), nz AS (SELECT doc_id, pos, tok, island FROM isl WHERE is_stop = 0),
        |ph AS (
        |  SELECT doc_id, island, string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    CAST(count(*) AS BIGINT) AS plen
        |  FROM nz GROUP BY 1, 2
        |), wstat AS (
        |  SELECT nz.tok, CAST(count(*) AS BIGINT) AS freq, CAST(sum(ph.plen) AS BIGINT) AS deg
        |  FROM nz JOIN ph ON ph.doc_id = nz.doc_id AND ph.island = nz.island
        |  GROUP BY 1
        |), wsc AS (SELECT tok, deg * 1000000 // freq AS wscore FROM wstat),
        |pt AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences FROM ph GROUP BY 1),
        |ps0 AS (
        |  SELECT phrase, n_occurrences, unnest(string_split(phrase, ' ')) AS tok FROM pt
        |), ps AS (
        |  SELECT ps0.phrase, ps0.n_occurrences, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(w.wscore) AS BIGINT) AS score_micro
        |  FROM ps0 JOIN wsc w USING (tok) GROUP BY 1, 2
        |)
        |SELECT phrase, n_words, n_occurrences, score_micro FROM ps
        |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin,

    // vocabulary re-derived (prefix/substring mass thresholds, all single
    // chars kept per position class), greedy walk unrolled — one step per
    // CTE, best piece via a correlated max-length subquery
    "text_wordpiece" -> wordpieceOracleSql,

    // the four k·(qln(k)+qln(N)−qln(row)−qln(col)) integer terms re-derived;
    // zero cells contribute exactly 0
    "text_collocations_llr" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM toks
        |), pp AS (
        |  SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM g
        |), c12 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pp GROUP BY 1, 2
        |), c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM c12 GROUP BY 1),
        |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM c12),
        |j AS (
        |  SELECT c12.w1, c12.w2, c12.c12, c1.c1, c2.c2, (SELECT n FROM n) AS n
        |  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2)
        |  WHERE c12.c12 >= 2
        |)
        |SELECT w1, w2, c12,
        |  CAST(
        |    (CASE WHEN c12 > 0 THEN c12 * (CAST(floor(ln(c12)*1e6+0.5) AS BIGINT)
        |       + CAST(floor(ln(n)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(c1)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(c2)*1e6+0.5) AS BIGINT)) ELSE 0 END)
        |  + (CASE WHEN c1 - c12 > 0 THEN (c1 - c12) * (CAST(floor(ln(c1 - c12)*1e6+0.5) AS BIGINT)
        |       + CAST(floor(ln(n)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(c1)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(n - c2)*1e6+0.5) AS BIGINT)) ELSE 0 END)
        |  + (CASE WHEN c2 - c12 > 0 THEN (c2 - c12) * (CAST(floor(ln(c2 - c12)*1e6+0.5) AS BIGINT)
        |       + CAST(floor(ln(n)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(n - c1)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(c2)*1e6+0.5) AS BIGINT)) ELSE 0 END)
        |  + (CASE WHEN n - c1 - c2 + c12 > 0 THEN (n - c1 - c2 + c12) * (CAST(floor(ln(n - c1 - c2 + c12)*1e6+0.5) AS BIGINT)
        |       + CAST(floor(ln(n)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(n - c1)*1e6+0.5) AS BIGINT)
        |       - CAST(floor(ln(n - c2)*1e6+0.5) AS BIGINT)) ELSE 0 END)
        |  AS BIGINT) AS llr_scaled
        |FROM j ORDER BY w1, w2""".stripMargin,

    // sentence/word/syllable proxies re-derived with the same regexes and
    // truncating integer divisions
    "text_readability" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum([greatest(len(regexp_extract_all(lower(tok), '[aeiouy]+')), 1)
        |      FOR tok IN w]) AS BIGINT) AS n_syllables
        |  FROM t
        |)
        |SELECT doc_id, n_sentences, n_words, n_syllables,
        |  CAST(206835 - 1015 * n_words // nullif(n_sentences, 0)
        |    - 84600 * n_syllables // nullif(n_words, 0) AS BIGINT) AS flesch_milli
        |FROM s ORDER BY doc_id""".stripMargin,

    "text_inverted_postings" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |    FROM documents)
        |), dfc AS (
        |  SELECT token, count(*) AS df FROM dt GROUP BY 1
        |), tops AS (
        |  SELECT token,
        |    array_to_string(list(doc_id ORDER BY doc_id)[1:10], ',') AS postings_head
        |  FROM dt GROUP BY 1
        |)
        |SELECT dfc.token, dfc.df, tops.postings_head
        |FROM dfc JOIN tops USING (token) ORDER BY token""".stripMargin,

    "text_chi2_terms" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, lang, token FROM (
        |    SELECT doc_id, lang,
        |      unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |    FROM documents)
        |), lt AS (
        |  SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS n FROM documents
        |), a AS (
        |  SELECT lang, token, count(*) AS a FROM dt GROUP BY 1, 2
        |), td AS (
        |  SELECT token, count(*) AS tok_df FROM dt GROUP BY 1
        |), s AS (
        |  SELECT a.lang, a.token, a.a, lt.n_lang, tot.n,
        |    lt.n_lang - a.a AS b, td.tok_df - a.a AS c,
        |    tot.n - lt.n_lang - (td.tok_df - a.a) AS d
        |  FROM a JOIN lt USING (lang) JOIN td USING (token) CROSS JOIN tot
        |), c2 AS (
        |  SELECT lang, token, CAST(a AS BIGINT) AS df_lang,
        |    CAST(n AS DOUBLE)
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
        |      / (CAST(n_lang AS DOUBLE) * CAST(c + d AS DOUBLE)
        |         * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) AS chi2
        |  FROM s WHERE c + d > 0 AND b + d > 0
        |), r AS (
        |  SELECT lang, token, df_lang, chi2,
        |    row_number() OVER (PARTITION BY lang ORDER BY chi2 DESC, token) AS rk
        |  FROM c2
        |)
        |SELECT lang, token, df_lang, chi2 FROM r WHERE rk <= 3
        |ORDER BY lang, chi2 DESC, token""".stripMargin,


    "text_pii_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_numbers,
        |  regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,


    "text_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS len_chars,
        |  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,


    "text_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '''(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,


    "text_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    CAST(length(text) AS BIGINT) AS len_chars
        |  FROM documents
        |), feats AS (
        |  SELECT doc_id, len_chars,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with'], t))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |      CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS token_diversity
        |  FROM base)
        |SELECT doc_id, len_chars, n_tokens, stopword_ratio, alpha_ratio, token_diversity,
        |  (CASE WHEN len_chars < 20 THEN 0.0 ELSE 0.25 END)
        |    + (CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END)
        |    + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0.0 END)
        |    + token_diversity * 0.25 AS quality_score
        |FROM feats ORDER BY doc_id""".stripMargin,


    "text_langid" ->
      """WITH base AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    length(text) AS total,
        |    length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS no_cyr,
        |    length(regexp_replace(text, '[一-鿿]', '', 'g')) AS no_cjk
        |  FROM documents
        |), hits AS (
        |  SELECT doc_id, total, no_cyr, no_cjk,
        |    len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los'], t))) AS es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','la','les','et','est','une'], t))) AS fr
        |  FROM base)
        |SELECT doc_id,
        |  CASE WHEN total - no_cyr > 0 THEN 'ru'
        |       WHEN total - no_cjk > 0 THEN 'zh'
        |       WHEN es > en AND es >= de AND es >= fr THEN 'es'
        |       WHEN de > en AND de >= fr THEN 'de'
        |       WHEN fr > en THEN 'fr'
        |       ELSE 'en' END AS predicted_lang
        |FROM hits ORDER BY doc_id""".stripMargin,


    // text_langid's prediction CTE joined onto ground truth, then the two
    // class marginals full-outer-joined; all metrics integer per-mille
    "eval_langid_prf" ->
      """WITH base AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    length(text) AS total,
        |    length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS no_cyr,
        |    length(regexp_replace(text, '[一-鿿]', '', 'g')) AS no_cjk
        |  FROM documents
        |), hits AS (
        |  SELECT doc_id, lang, total, no_cyr, no_cjk,
        |    len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los'], t))) AS es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS de,
        |    len(list_filter(toks, t -> list_contains(['le','la','les','et','est','une'], t))) AS fr
        |  FROM base
        |), pairs AS (
        |  SELECT lang AS a,
        |    CASE WHEN total - no_cyr > 0 THEN 'ru'
        |         WHEN total - no_cjk > 0 THEN 'zh'
        |         WHEN es > en AND es >= de AND es >= fr THEN 'es'
        |         WHEN de > en AND de >= fr THEN 'de'
        |         WHEN fr > en THEN 'fr'
        |         ELSE 'en' END AS pr
        |  FROM hits
        |), bya AS (
        |  SELECT a AS cls, CAST(count(*) AS BIGINT) AS n_actual,
        |    CAST(sum(CASE WHEN a = pr THEN 1 ELSE 0 END) AS BIGINT) AS tp_a
        |  FROM pairs GROUP BY 1
        |), byp AS (
        |  SELECT pr AS cls, CAST(count(*) AS BIGINT) AS n_pred,
        |    CAST(sum(CASE WHEN a = pr THEN 1 ELSE 0 END) AS BIGINT) AS tp_p
        |  FROM pairs GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(bya.cls, byp.cls) AS cls,
        |    COALESCE(n_actual, 0) AS n_actual, COALESCE(n_pred, 0) AS n_pred,
        |    COALESCE(tp_a, tp_p, 0) AS tp
        |  FROM bya FULL OUTER JOIN byp ON byp.cls = bya.cls
        |)
        |SELECT cls, n_actual, n_pred, tp,
        |  n_pred - tp AS fp, n_actual - tp AS fn,
        |  CASE WHEN n_pred = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(tp * 1000 // n_pred AS BIGINT) END AS precision_milli,
        |  CASE WHEN n_actual = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(tp * 1000 // n_actual AS BIGINT) END AS recall_milli,
        |  CASE WHEN 2 * tp + (n_pred - tp) + (n_actual - tp) = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(2 * tp * 1000 // (2 * tp + (n_pred - tp) + (n_actual - tp)) AS BIGINT)
        |  END AS f1_milli
        |FROM j ORDER BY cls""".stripMargin,


    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0, [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(text, '')]),
        |    (acc, code) -> (acc * 31 + code) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,


    "text_bpe_merges" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents
        |), w AS (SELECT word, count(*) AS n FROM toks GROUP BY 1),
        |s0 AS (SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS segs, n FROM w),
        |p1 AS (
        |  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS pair
        |    FROM (SELECT string_split(segs, ' ') AS l, n FROM s0) q WHERE len(l) >= 2
        |  ) GROUP BY 1
        |), m1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
        |s1 AS (SELECT trim(replace(replace(
        |    ' ' || replace(segs, ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m1), ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m1), ' ', '') || ' '),
        |  '  ', ' ')) AS segs, n FROM s0),
        |p2 AS (
        |  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS pair
        |    FROM (SELECT string_split(segs, ' ') AS l, n FROM s1) q WHERE len(l) >= 2
        |  ) GROUP BY 1
        |), m2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
        |s2 AS (SELECT trim(replace(replace(
        |    ' ' || replace(segs, ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m2), ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m2), ' ', '') || ' '),
        |  '  ', ' ')) AS segs, n FROM s1),
        |p3 AS (
        |  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS pair
        |    FROM (SELECT string_split(segs, ' ') AS l, n FROM s2) q WHERE len(l) >= 2
        |  ) GROUP BY 1
        |), m3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS round, pair, replace(pair, ' ', '') AS merged, cnt AS n FROM m1
        |  UNION ALL SELECT 2, pair, replace(pair, ' ', ''), cnt FROM m2
        |  UNION ALL SELECT 3, pair, replace(pair, ' ', ''), cnt FROM m3
        |) q ORDER BY round""".stripMargin,


    "text_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
        |)
        |SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks
        |GROUP BY 1 HAVING count(*) >= 900 ORDER BY w""".stripMargin,


    "text_bpe_encode" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents
        |), w AS (SELECT word, count(*) AS n FROM toks GROUP BY 1),
        |s0 AS (SELECT word, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS segs, n FROM w),
        |p1 AS (
        |  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS pair
        |    FROM (SELECT string_split(segs, ' ') AS l, n FROM s0) q WHERE len(l) >= 2
        |  ) GROUP BY 1
        |), m1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
        |s1 AS (SELECT word, trim(replace(replace(
        |    ' ' || replace(segs, ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m1), ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m1), ' ', '') || ' '),
        |  '  ', ' ')) AS segs, n FROM s0),
        |p2 AS (
        |  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS pair
        |    FROM (SELECT string_split(segs, ' ') AS l, n FROM s1) q WHERE len(l) >= 2
        |  ) GROUP BY 1
        |), m2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
        |s2 AS (SELECT word, trim(replace(replace(
        |    ' ' || replace(segs, ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m2), ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m2), ' ', '') || ' '),
        |  '  ', ' ')) AS segs, n FROM s1),
        |p3 AS (
        |  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        |    SELECT n, unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS pair
        |    FROM (SELECT string_split(segs, ' ') AS l, n FROM s2) q WHERE len(l) >= 2
        |  ) GROUP BY 1
        |), m3 AS (SELECT pair FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
        |s3 AS (SELECT word, trim(replace(replace(
        |    ' ' || replace(segs, ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m3), ' ', '  ') || ' ',
        |    ' ' || replace((SELECT pair FROM m3), ' ', '') || ' '),
        |  '  ', ' ')) AS segs FROM s2),
        |encn AS (SELECT word, CAST(len(string_split(segs, ' ')) AS BIGINT) AS n_bpe FROM s3),
        |dw AS (SELECT doc_id, word, count(*) AS k FROM toks GROUP BY 1, 2)
        |SELECT dw.doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
        |  CAST(sum(k * n_bpe) AS BIGINT) AS n_bpe_segments
        |FROM dw JOIN encn USING (word) GROUP BY 1 ORDER BY dw.doc_id""".stripMargin,


    "text_freq_spectrum" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
        |), vc AS (
        |  SELECT w, count(*) AS n FROM toks GROUP BY 1
        |)
        |SELECT least(n // 100, 10) AS occ_hundreds, count(*) AS n_types
        |FROM vc GROUP BY 1 ORDER BY 1""".stripMargin,


    "text_token_pmi" ->
      """WITH bi0 AS (
        |  SELECT DISTINCT doc_id AS b, unnest(regexp_split_to_array(trim(text), '\s+')) AS i
        |  FROM documents
        |), n AS (SELECT count(DISTINCT b) AS n FROM bi0),
        |vocab AS (
        |  SELECT i, count(*) AS n_i FROM bi0 GROUP BY 1
        |  HAVING count(*) >= 50 AND count(*) <= (SELECT n FROM n) * 900 // 1000
        |), bi AS (
        |  SELECT bi0.b, bi0.i FROM bi0 JOIN vocab ON vocab.i = bi0.i
        |), p AS (
        |  SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab
        |  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 50
        |)
        |SELECT p.item_a, p.item_b, p.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
        |  CAST((SELECT n FROM n) AS DOUBLE) * p.n_ab / ia.n_i / ib.n_i AS lift,
        |  floor(ln(CAST((SELECT n FROM n) AS DOUBLE) * p.n_ab / ia.n_i / ib.n_i) * 1e6 + 0.5) / 1e6 AS pmi
        |FROM p JOIN vocab ia ON ia.i = p.item_a JOIN vocab ib ON ib.i = p.item_b
        |ORDER BY lift DESC, item_a, item_b LIMIT 50""".stripMargin,


    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), vocab AS (
        |  SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS t FROM vocab
        |), q AS (
        |  SELECT term,
        |    CAST(floor(ln(CAST((SELECT t FROM tot) AS DOUBLE) / cnt) * 1e6 + 0.5) AS BIGINT) AS qv
        |  FROM vocab
        |), d AS (
        |  SELECT tf.doc_id, CAST(sum(tf.tf * q.qv) AS BIGINT) AS nll_scaled,
        |    CAST(sum(tf.tf) AS BIGINT) AS dl
        |  FROM tf JOIN q USING (term) GROUP BY 1
        |)
        |SELECT doc_id, dl, nll_scaled, CAST(nll_scaled AS DOUBLE) / 1e6 / dl AS avg_nll
        |FROM d ORDER BY doc_id""".stripMargin)
}
