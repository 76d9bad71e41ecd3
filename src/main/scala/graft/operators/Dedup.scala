package graft.operators

import graft.functions.{Kernels, TextFns, VectorFns}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus pipelines: exact,
  * MinHash+LSH, SimHash, blocked n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Scale design (100 TB): every variant is built either as a single
  * hash-keyed aggregation (exact, minhash signatures, simhash — one shuffle,
  * map-side combinable) or as a BLOCKED pairwise comparison where candidate
  * pairs come from an equi-join on a bucket key (LSH band, lang block) —
  * never an unblocked O(n^2) cross join. The only cross join lives in
  * `embeddingNearDupBrute`, the small-side correctness baseline for the
  * LSH/banded paths.
  */
object Dedup {

  /** Content-defined chunk dedup signals: documents split at LOCAL-content
    * boundaries (`Kernels.cdcChunks` — the rsync/LBFS rolling-hash rule),
    * then each doc reports how many of its chunks also appear in OTHER
    * documents. Because boundaries are content-local, an edited/prefixed
    * near-copy still shares most chunks — where fixed-window chunking
    * ([[graft.operators.TextAnalysis.chunkByTokens]]) loses alignment after
    * the first edit (spec-pinned). Shape: one kernel explode, one chunk-
    * keyed distinct-doc count (map-side combined), one join back — the
    * novelty/df pattern. */
  def cdcSharedChunks(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 16, div: Int = 64): DataFrame = {
    def ch = docs.select(col(idCol),
      explode(graft.functions.Kernels.cdcChunksCol(col(textCol), window, div)).as("chunk"))
    val df = ch.groupBy(col("chunk"))
      .agg(countDistinct(col(idCol)).as("ndocs"))
    ch.join(df, "chunk")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        col("n_shared").cast("double") / col("n_chunks").cast("double"))
  }

  /** Winnowing fingerprints per document ([[Kernels.winnowFingerprints]] —
    * Schleimer/Wilkerson/Aiken's MOSS scheme): the distinct sliding-window
    * minima of k-gram hashes, guaranteeing a shared fingerprint for ANY
    * common substring of length >= k + w - 1 with density >= 1/w. Pure
    * row-local projection — fingerprinting a 100 TB corpus is shuffle-free;
    * docs shorter than one window (k + w - 1 chars) carry no guarantee and
    * are excluded on BOTH engine and oracle sides. */
  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    docs
      .filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol),
        Kernels.winnowFingerprintsCol(col(textCol), k, w).as("fps"))

  /** Fingerprint-overlap near-dup pairs: doc pairs sharing >= `minShared`
    * winnowing fingerprints, counted over a df-BANDED posting list —
    * fingerprints held by fewer than 2 docs pair nothing and are dropped;
    * fingerprints held by more than `maxDf` docs are boilerplate (the same
    * cut plagiarism checkers apply) and would otherwise explode the
    * self-join quadratically. Shape: row-local fingerprint kernel ->
    * posting explode -> one df aggregation (map-side combined) -> self
    * equi-join on the fingerprint key with per-key fanout bounded by
    * maxDf^2 -> pair count. The LSH-banding scale argument verbatim: no
    * unblocked pair enumeration anywhere. */
  def winnowPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, maxDf: Long = 20L, minShared: Long = 8L): DataFrame = {
    // posting list persisted PARTITIONED ON fp (r17): without it the
    // winnowing kernel re-evaluated once per plan branch (df aggregation +
    // BOTH self-join legs = 3 full corpus fingerprint passes), and each
    // branch re-shuffled the postings by fp. The cache is (id, fp) rows —
    // the guide §8 lightweight proxy, never the text — and the fp
    // partitioning feeds the df aggregation and both join legs exchange-free.
    val p = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol), explode(col("fps")).as("fp"))
      .repartition(col("fp"))
      .transform(graft.operators.Residuals.persist)
    val banded = p.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    val pp = p.join(banded, "fp")
    val a = pp.select(col("fp"), col(idCol).as("doc_a"))
    val b = pp.select(col("fp"), col(idCol).as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The two-stage fingerprint-block → exact-verify pipeline: candidates
    * from [[winnowPairs]] (cheap, maxDf²-bounded), then the EXACT edit
    * distance computed only on the surviving pairs — verification cost is
    * bounded by the candidate count, never the corpus, which is the only
    * shape under which full Levenshtein (O(len²) per pair) is admissible
    * at scale. Both engines implement classic Levenshtein over exact
    * integers, so the verified distances hash-match. */
  def winnowVerifiedPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, maxDf: Long = 20L, minShared: Long = 8L): DataFrame = {
    val pairs = winnowPairs(docs, idCol, textCol, k, w, maxDf, minShared)
    val ta = docs.select(col(idCol).as("doc_a"), col(textCol).as("text_a"))
    val tb = docs.select(col(idCol).as("doc_b"), col(textCol).as("text_b"))
    pairs.join(ta, "doc_a").join(tb, "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"))
  }

  /** Asymmetric containment over the df-banded winnowing fingerprints:
    * C(A→B) = |A∩B| / |A| — the quote-inclusion detector Jaccard misses
    * (a short doc fully embedded in a long one has high containment but
    * low Jaccard). Both numerator AND denominator run over the banded
    * fingerprint universe (df in [2, maxDf]): boilerplate fingerprints are
    * excluded from the measure itself, not just the join — a principled
    * "informative fingerprints" definition that also keeps the self-join
    * fanout maxDf²-bounded. Emits BOTH directions of every candidate pair
    * with C >= minContainment; the division is one exact long/long IEEE
    * op. */
  def winnowContainment(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, maxDf: Long = 20L,
      minContainment: Double = 0.5): DataFrame = {
    // persisted fp-partitioned posting list — see [[winnowPairs]] (r17)
    val p = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol), explode(col("fps")).as("fp"))
      .repartition(col("fp"))
      .transform(graft.operators.Residuals.persist)
    val banded = p.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    val pp = p.join(banded, "fp")
    val sizes = pp.groupBy(col(idCol)).agg(count(lit(1)).as("n_banded"))
    val a = pp.select(col("fp"), col(idCol).as("doc_a"))
    val b = pp.select(col("fp"), col(idCol).as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.withColumnRenamed(idCol, "doc_a"), "doc_a")
      .withColumn("containment", col("n_shared").cast("double") / col("n_banded").cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_banded"), col("containment"))
  }

  /** Exact dedup by content hash: one row per distinct text, keeping the
    * smallest doc id as canonical. Single shuffle on md5(text). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Cross-source duplication MATRIX: for every unordered source pair, how
    * many exact-duplicate document pairs they share — the dedup
    * OBSERVABILITY view ("which feeds mirror which") that decides crawl
    * priorities and source quotas before any row is dropped. One hash
    * self-join (fanout bounded by duplicate-group sizes — the k² every
    * exact-dup report pays, tiny by construction on a deduplicated-ish
    * corpus) + one aggregation over the source-pair domain. */
  def sourceDupMatrix(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), col(srcCol).as("src"),
      md5(col(textCol)).as("h"))
    val a = keyed.select(col("h"), col("id").as("ida"), col("src").as("sa"))
    val b = keyed.select(col("h"), col("id").as("idb"), col("src").as("sb"))
    a.join(b, Seq("h")).filter(col("ida") < col("idb"))
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
  }

  /** MinHash signatures over word 3-gram shingles: `numHashes` md5-family
    * min-hashes per document. Pure projection — no shuffle, no explode; the
    * shingle set never materializes outside the row. */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, numHashes: Int): DataFrame = {
    val sigCols = (0 until numHashes).map(j => col("sig").getItem(j).as(s"mh$j"))
    docs
      .select(col(idCol), Kernels.wordNgramsSortedCol(col(textCol), 3).as("grams"))
      .select(col(idCol), Kernels.minhashSigCol(col("grams"), numHashes).as("sig"))
      .select((col(idCol) +: sigCols): _*)
  }

  /** MinHash LSH candidate pairs: signatures are banded (`numHashes /
    * bandSize` bands); documents sharing any band land in the same bucket and
    * become a candidate pair. Cost: one explode to (doc, band) + one
    * equi-join shuffle on the band key — the standard shape that scales to
    * billions of documents because bucket sizes, not corpus size, bound the
    * pair count. */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2, broadcastRight: Boolean = false): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numHashes)
    val numBands = numHashes / bandSize
    val bands = (0 until numBands).map { b =>
      val cols = (0 until bandSize).map(i => col(s"mh${b * bandSize + i}"))
      struct(lit(b).as("band"), concat_ws(":", cols: _*).as("key"))
    }
    // persisted: the signature kernel (numHashes md5s per gram set) feeds
    // both join legs — one evaluation instead of two (r17)
    val exploded = sigs
      .select(col(idCol), explode(array(bands: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
      .transform(graft.operators.Residuals.persist)
    val a = exploded.as("a")
    val b = (if (broadcastRight) broadcast(exploded) else exploded).as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Incremental (continuous-ingestion) near-dup check: which INCOMING
    * documents LSH-collide with an already-indexed corpus?
    *
    * The corpus side arrives as a persisted signature table (the
    * [[minhashSignatures]] layout, computed once at index build and extended
    * per increment) — so a daily ingest pays signature hashing only for the
    * increment and NEVER re-reads corpus text. Same banded equi-join as
    * [[minhashPairs]] across the two tables; the small increment side
    * broadcasts by default (one map-side pass over corpus signatures — at
    * 100 TB this is a broadcast-join over a few-GB signature table, not a
    * corpus scan). Set `broadcastIncoming = false` for bulk backfills.
    * Returns distinct (incoming_id, corpus_id) collision pairs. */
  def minhashPairsAgainst(
      incoming: DataFrame, corpusSigs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2, broadcastIncoming: Boolean = true): DataFrame = {
    val numBands = numHashes / bandSize
    def explodeBands(sigs: DataFrame): DataFrame = {
      val bands = (0 until numBands).map { b =>
        val cols = (0 until bandSize).map(i => col(s"mh${b * bandSize + i}"))
        struct(lit(b).as("band"), concat_ws(":", cols: _*).as("key"))
      }
      sigs.select(col(idCol), explode(array(bands: _*)).as("bk"))
        .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    }
    val inc0 = explodeBands(minhashSignatures(incoming, idCol, textCol, numHashes))
    val inc = (if (broadcastIncoming) broadcast(inc0) else inc0).as("n")
    val corpus = explodeBands(corpusSigs).as("c")
    inc.join(corpus, col("n.band") === col("c.band") && col("n.key") === col("c.key"))
      .select(col(s"n.$idCol").as("incoming_id"), col(s"c.$idCol").as("corpus_id"))
      .distinct()
  }

  /** SimHash fingerprints (default 32-bit). Near-dup = small Hamming
    * distance; pairs are found by banding the fingerprint bytes (same
    * equi-join shape as MinHash LSH). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    require(bits == 32, "kernel is fixed at 32 bits; TextFns.simhash handles other widths")
    docs.select(col(idCol), Kernels.simhashCol(TextFns.tokens(col(textCol))).as("simhash"))
  }

  /** SimHash near-dup pairs via byte-banding + exact Hamming verification. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 32, maxHamming: Int = 3, broadcastRight: Boolean = false): DataFrame = {
    val fp = simhash(docs, idCol, textCol, bits)
    val numBands = 4
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    val bands = (0 until numBands).map(b =>
      struct(lit(b).as("band"), (shiftright(col("simhash"), b * bandBits) % lit(mask + 1)).as("key")))
    // persisted: the simhash kernel feeds both join legs (r17)
    val exploded = fp.select(col(idCol), col("simhash"), explode(array(bands: _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
      .transform(graft.operators.Residuals.persist)
    val a = exploded.as("a")
    val b = (if (broadcastRight) broadcast(exploded) else exploded).as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Blocked n-gram Jaccard: exact Jaccard over distinct word n-grams, with
    * candidate pairs restricted to the same (lang, length-bucket) block —
    * an equi-join, not a cross join. Bucket width trades recall for cost.
    *
    * Two physical shapes behind identical semantics:
    *
    *  - `broadcastRight = true`: ONE fused broadcast join — the b-side
    *    (with gram arrays) broadcasts, the size prune and merge kernel run
    *    inside the probe. Zero shuffles; the right plan while one side fits
    *    in an executor.
    *  - `broadcastRight = false` (the 100 TB shape): SLIM candidate
    *    generation, then verify. The block join carries only (id, block
    *    keys, |grams|) — gram arrays never enter it — producing candidate
    *    id pairs; the pairs then join the gram table back (equi-join on id)
    *    for the exact merge kernel. Gram arrays cross the network exactly
    *    twice (once per join side), independent of `saltBuckets` — the
    *    earlier fused-shuffle variant replicated them `saltBuckets` times
    *    through the salted join, which at corpus scale is the dominant
    *    byte volume. The two extra map-side kernel evaluations this costs
    *    (slim sides re-tokenize) are scan-local CPU, the cheap currency.
    *
    * Skew: blocks follow corpus language distribution, so one block usually
    * dominates (english). Under a shuffle join a sort-merge join serializes
    * each block's O(block²) pair enumeration into the ONE task owning that
    * join-key group — measured 20-30x slower than the broadcast plan at
    * sf0.1, and AQE cannot split a single key group. Set `saltBuckets > 1`
    * for the salted replicated join: the left side is salted by
    * `hash(id) % R`, the right side replicated R times, the salt joins as an
    * extra equi-key — the hot block's pair work then spreads across R tasks,
    * and with slim rows the R-fold replication is a few dozen bytes per doc.
    * Every (a, b) pair still appears exactly once (a lands in exactly one
    * salt bucket; b is present in all). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      n: Int = 3, threshold: Double = 0.5, lenBucket: Int = 100,
      broadcastRight: Boolean = false, saltBuckets: Int = 1): DataFrame = {
    // persisted: the n-gram kernel feeds both join legs (and the shuffle
    // variant's verify join-back) — one evaluation instead of 2-4 (r17)
    val prepared = docs.select(
      col(idCol), col(langCol).as("lang"),
      floor(length(col(textCol)) / lenBucket).as("len_bucket"),
      Kernels.wordNgramsSortedCol(col(textCol), n).as("grams"))
      .withColumn("n_grams", size(col("grams")))
      .transform(graft.operators.Residuals.persist)
    // Lossless size prune in every variant, BEFORE the merge kernel:
    // Jaccard >= t forces min(|A|,|B|) >= t * max(|A|,|B|) — cheap long
    // arithmetic that skips the O(|A|+|B|) string merge for most in-block
    // pairs. The fused |A∩B|/(|A|+|B|-|A∩B|) kernel stays ONE call
    // (Catalyst pushes the threshold into the join condition and would
    // re-evaluate a composite expression per reference).
    def prune(aSize: Column, bSize: Column): Column =
      least(aSize, bSize).cast("double") >= lit(threshold) * greatest(aSize, bSize).cast("double")
    if (broadcastRight) {
      val a = prepared.as("a")
      val b = broadcast(prepared).as("b")
      val joinCond = (col("a.lang") === col("b.lang"))
        .and(col("a.len_bucket") === col("b.len_bucket"))
        .and(col(s"a.$idCol") < col(s"b.$idCol"))
        .and(prune(col("a.n_grams"), col("b.n_grams")))
      a.join(b, joinCond)
        .select(
          col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
          Kernels.jaccardSortedCol(col("a.grams"), col("b.grams")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } else {
      val slim = prepared.select(col(idCol), col("lang"), col("len_bucket"), col("n_grams"))
      val salted = saltBuckets > 1
      val aSide = if (salted)
        slim.withColumn("salt", pmod(hash(col(idCol)), lit(saltBuckets)))
      else slim
      val bSide = if (salted)
        slim.withColumn("salt", explode(array((0 until saltBuckets).map(lit(_)): _*)))
      else slim
      val a = aSide.as("a")
      val b = bSide.as("b")
      val blockCond = (col("a.lang") === col("b.lang"))
        .and(col("a.len_bucket") === col("b.len_bucket"))
      val joinCond = (if (salted) blockCond && col("a.salt") === col("b.salt") else blockCond)
        .and(col(s"a.$idCol") < col(s"b.$idCol"))
        .and(prune(col("a.n_grams"), col("b.n_grams")))
      // Each pair appears exactly once (one salt bucket per a-row), so no
      // dedup shuffle is needed before the verify join-back.
      val cand = a.join(b, joinCond)
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      val g = prepared.select(col(idCol), col("grams"))
      cand
        .join(g.as("ga"), col("id_a") === col(s"ga.$idCol"))
        .join(g.as("gb"), col("id_b") === col(s"gb.$idCol"))
        .select(col("id_a"), col("id_b"),
          Kernels.jaccardSortedCol(col("ga.grams"), col("gb.grams")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** Exact prefix-filtered Jaccard pairs — the 100 TB shape for the same
    * semantics as [[ngramJaccardPairs]] (identical output, same blocks, same
    * threshold; a ScalaTest spec and a shared DuckDB oracle pin the
    * equivalence).
    *
    * The blocked path compares all O(block²) in-block pairs — fine while
    * blocks are small, quadratic when a language dominates a corpus (en-block
    * pairs grew 91x for 10x docs on the test tables). This variant generates
    * candidates by the classic prefix-filter inverted index (SSJoin /
    * all-pairs, see [[Kernels.jaccardPrefix]]): each doc emits only the
    * `|G| - ceil(t|G|) + 1` globally-first grams; docs sharing a prefix gram
    * in the same block become candidates (equi-join on the gram — candidate
    * count scales with gram-posting-list sizes, not block²), are deduped, and
    * only then pay the exact merge-verify. Three shuffles, all equi-keyed:
    * explode-join, pair distinct, verify join-back. */
  def ngramJaccardPairsPrefix(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      n: Int = 3, threshold: Double = 0.5, lenBucket: Int = 100): DataFrame = {
    // persisted: the n-gram kernel otherwise re-evaluates once per plan
    // branch — both prefix-posting legs AND both verify-side gram lookups
    // (4 full corpus kernel passes, measured r17); the cache carries gram
    // arrays, not text — the winnowPairs posting-list contract
    val prepared = docs.select(
      col(idCol), col(langCol).as("lang"),
      floor(length(col(textCol)) / lenBucket).as("len_bucket"),
      Kernels.wordNgramsSortedCol(col(textCol), n).as("grams"))
      .withColumn("n_grams", size(col("grams")))
      .transform(graft.operators.Residuals.persist)
    val pref = prepared.select(
      col(idCol), col("lang"), col("len_bucket"), col("n_grams"),
      explode(Kernels.jaccardPrefixCol(col("grams"), threshold)).as("pg"))
    val pa = pref.as("a")
    val pb = pref.as("b")
    val cand = pa.join(pb, col("a.pg") === col("b.pg")
        && col("a.lang") === col("b.lang")
        && col("a.len_bucket") === col("b.len_bucket")
        && col(s"a.$idCol") < col(s"b.$idCol")
        && least(col("a.n_grams"), col("b.n_grams")).cast("double")
          >= lit(threshold) * greatest(col("a.n_grams"), col("b.n_grams")).cast("double"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val g = prepared.select(col(idCol), col("grams"))
    cand
      .join(g.as("ga"), col("id_a") === col(s"ga.$idCol"))
      .join(g.as("gb"), col("id_b") === col(s"gb.$idCol"))
      .select(col("id_a"), col("id_b"),
        Kernels.jaccardSortedCol(col("ga.grams"), col("gb.grams")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over a near-dup pair list: assigns every doc id
    * appearing in `pairs` the MINIMUM id reachable through the dup graph —
    * the canonical "cluster id" step that turns pairwise dup evidence into
    * keep/drop decisions.
    *
    * Algorithm: min-label propagation fused with pointer jumping. Each round
    * (a) pulls the min label across every edge and (b) compresses one level
    * of indirection (label(v) := label(label(v))), so the known-min doubles
    * its reach per round — O(log diameter) rounds instead of the O(diameter)
    * of plain propagation, which matters for long near-dup chains in
    * templated corpora. Each round is two equi-joins + one
    * map-side-combinable min aggregation, materialized by ONE job (the eager
    * `localCheckpoint`, which also truncates lineage so round k does not
    * replay rounds 0..k-1; on a real cluster set
    * [[Checkpoints.ReliableConf]] to route the truncation through a
    * reliable `checkpoint()` instead — executor loss then cannot destroy a
    * generation mid-fixpoint). Convergence is read off a `changed` flag computed
    * inside that same job — checking it is a cheap scan of the checkpointed
    * blocks, not a second join. Superseded per-round checkpoints are
    * unpersisted immediately: a long-lived session runs this repeatedly and
    * must not accumulate storage memory. */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 30): DataFrame =
    componentsCore(pairs, aCol, bCol, maxIter).select(col("id"), col("component"))

  /** Scoped variant: computes components, applies `f`, then RELEASES the
    * backing cache (blocking) — zero net cached RDDs after return. Use this
    * from long-lived pipelines that cluster shard after shard; the plain
    * [[connectedComponents]] necessarily leaves its result cached (the
    * caller holds a lazy DataFrame over it) with no release handle.
    * `f` must MATERIALIZE whatever it needs (collect/write/count) — the
    * DataFrame it receives dies with the scope. */
  def withConnectedComponents[T](
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 30)(
      f: DataFrame => T): T = {
    val labels = componentsCore(pairs, aCol, bCol, maxIter)
    try f(labels.select(col("id"), col("component")))
    finally releaseCheckpoint(labels)
  }

  /** Release the block-manager storage behind a `localCheckpoint`-backed
    * DataFrame NOW (blocking). `Dataset.unpersist` only consults the SQL
    * cache manager, which knows nothing about checkpoint RDDs — relying on
    * it leaves the blocks to the GC-driven ContextCleaner, i.e. unbounded
    * storage creep until some later GC happens to run. The checkpointed RDD
    * sits in the plan's `LogicalRDD` leaf (public API); unpersisting it
    * directly is deterministic. */
  private[operators] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** The min-label + pointer-jumping loop; returns the final CACHED round
    * (columns id, component, changed). All unpersists are BLOCKING: a lazy
    * release would let per-round blocks overlap across rounds (or calls),
    * exactly the storage-memory creep this loop exists to avoid. */
  private def componentsCore(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .union(pairs.select(col(bCol).cast("long").as("u"), col(aCol).cast("long").as("v")))
      .distinct()
      .transform(Checkpoints.truncate(_))
    var labels = edges.groupBy(col("u").as("id"))
      .agg(min(col("v")).as("mv"))
      .select(col("id"), least(col("id"), col("mv")).as("component"))
      .transform(Checkpoints.truncate(_))
    var it = 0
    var converged = false
    try {
      while (!converged && it < maxIter) {
        // (a) edge propagation: min label over each node's neighborhood.
        val prop = edges.join(labels, edges("v") === labels("id"))
          .groupBy(col("u")).agg(min(col("component")).as("ncomp"))
        val propagated = labels.join(prop, labels("id") === prop("u"), "left")
          .select(labels("id").as("id"), labels("component").as("old_component"),
            least(labels("component"), coalesce(col("ncomp"), labels("component"))).as("propc"))
        // (b) pointer jumping: follow the label one hop (labels are node ids,
        // so every label resolves via `labels` itself; left join keeps roots).
        // Round 0 skips the hop: its labels ARE the direct neighborhood mins,
        // so the hop join would re-derive the propagation it just did — one
        // join and one shuffle saved on the round every call pays for.
        val next = (if (it == 0) {
          propagated.select(col("id"), col("propc").as("component"),
            (col("propc") =!= col("old_component")).as("changed"))
        } else {
          val hop = labels.select(col("id").as("h_id"), col("component").as("h_component"))
          propagated.join(hop, col("propc") === col("h_id"), "left")
            .select(col("id"),
              least(col("propc"), coalesce(col("h_component"), col("propc"))).as("component"),
              (least(col("propc"), coalesce(col("h_component"), col("propc")))
                =!= col("old_component")).as("changed"))
        }).transform(Checkpoints.truncate(_)) // ONE job per round; convergence flag rides along
        converged = next.filter(col("changed")).isEmpty // cheap scan of cached blocks
        releaseCheckpoint(labels)
        labels = next
        it += 1
      }
    } finally {
      releaseCheckpoint(edges)
    }
    if (!converged) {
      releaseCheckpoint(labels)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter pointer-jumping rounds " +
          "(component min-reach doubles per round); raise maxIter")
    }
    // the returned labels are localCheckpoint-backed: register their release
    // for the caller's consume-boundary (Residuals contract — after
    // release() the result cannot be replayed)
    val finLabels = labels
    Residuals.register(() => releaseCheckpoint(finLabels))
    labels
  }

  /** End-of-pipeline keep list: drop every doc whose cluster id differs from
    * its own id (the cluster minimum is the canonical survivor). `components`
    * is [[connectedComponents]] output; docs never seen in a dup pair pass
    * through untouched. One left-anti equi-join — broadcastable when the dup
    * set is small relative to the corpus (the common case). */
  def keepCanonical(docs: DataFrame, idCol: String, components: DataFrame): DataFrame = {
    val drop = components.filter(col("id") =!= col("component")).select(col("id"))
    docs.join(drop, docs(idCol) === drop("id"), "left_anti")
  }

  /** Canonical selection by QUALITY: inside every duplicate cluster keep the
    * highest-`scoreCol` document (ties -> lowest id). [[keepCanonical]]'s
    * min-id policy is cheap but arbitrary; a real pipeline keeps the best
    * representative of each near-dup family. Docs in no cluster are their
    * own singleton and always survive.
    *
    * Cost over keepCanonical: one broadcast-join of the (tiny) label table
    * plus one window per CLUSTER key — WindowGroupLimit turns the rank-1
    * filter into a running-max per partition, so no cluster ever fully
    * sorts. Input `docs` must carry `scoreCol`. */
  def keepBest(
      docs: DataFrame, idCol: String, components: DataFrame,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = components.withColumnRenamed("id", "__cc_id")
    val labeled = docs.join(
        broadcast(comp), docs(idCol) === comp("__cc_id"), "left")
      .withColumn("__comp", coalesce(col("component"), docs(idCol)))
    val w = Window.partitionBy(col("__comp"))
      .orderBy(col(scoreCol).desc, docs(idCol).asc)
    labeled
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__cc_id", "component", "__comp", "__rk")
  }

  /** Embedding-cosine near-dup, brute-force: all pairs above `threshold`.
    * Correctness baseline — O(n^2); the scale path is `Similarity.lshJoin`. */
  def embeddingNearDupBrute(
      embs: DataFrame, idCol: String, vecCol: String, threshold: Double,
      broadcastRight: Boolean = false): DataFrame = {
    // persisted: quantize+norm feed both join legs (r17)
    val q = embs.select(
      col(idCol),
      VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", VectorFns.norm2Q(col("qv")))
      .transform(graft.operators.Residuals.persist)
    val a = q.as("a")
    val b = (if (broadcastRight) broadcast(q) else q).as("b")
    a.join(b, col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        VectorFns.cosinePre(col("a.qv"), col("a.n2"), col("b.qv"), col("b.n2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Duplicated-span detection — exact SUBSTRING dedup in the style of Lee
    * et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"): find every maximal token span that some OTHER document also
    * contains, so pipelines can excise repeated boilerplate from otherwise
    * unique documents (whole-doc and chunk dedup both miss these; the
    * suffix-array of the paper is replaced by the shuffle-native rolling
    * window form).
    *
    * Mechanics: stride-1 windows of `window` tokens are hashed; a window
    * hash seen in ≥ 2 distinct documents marks all its positions; per
    * document, marked positions within `window` of each other merge into
    * maximal spans (gaps-and-islands). Returns (idCol, span_start, span_end,
    * n_windows) with 1-based token positions, `span_end` exclusive.
    *
    * Scale shape: the only corpus-wide shuffles key on the 64-bit window
    * hash (rows are (hash, doc) pairs — slim, map-side pre-distincted); the
    * duplicated-hash set is a small fraction of the corpus (broadcast while
    * it fits, `broadcastRight = false` for the equi-shuffle plan); span
    * merging is one per-document window pass whose partition is bounded by
    * document length, never corpus size. */
  def dupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, broadcastRight: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("__w"))
      .withColumn("pos", explode(
        when(size(col("__w")) >= window,
          sequence(lit(1), size(col("__w")) - lit(window - 1)))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        substring(md5(concat_ws(" ", slice(col("__w"), col("pos"), lit(window)))), 1, 16)
          .as("h"))
    val dupH = wins.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val marked = wins.join(if (broadcastRight) broadcast(dupH) else dupH, "h")
      .select(col(idCol), col("pos"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val brk = when(col("pos") > lag(col("pos"), 1).over(w) + lit(window), lit(1L))
      .otherwise(lit(0L))
    marked
      .withColumn("brk", brk)
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(window.toLong)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * prune documents whose EMBEDDINGS are near-identical — catches
    * paraphrases and templated rewrites that exact/MinHash dedup (which see
    * only surface text) cannot. The scalable trick is the paper's: cluster
    * first, compare only within a cluster.
    *
    * Clusters are the deterministic Voronoi cells shared with
    * [[Similarity.ivfKnn]] (pseudo-random integer centroids — no training
    * pass, reproducible on any cluster, exactly expressible in the SQL
    * oracle). Pair generation is an equi-join on the cell id, so the work is
    * O(Σ cell²) instead of O(n²) and the ONLY shuffle keys on the cell.
    * Policy: a document is dropped when a smaller-id document in the same
    * cell sits within `tau` cosine (fixed-point dot, single final IEEE
    * division — cross-engine exact).
    *
    * Returns one row per input: (idCol, cell, keep∈{0,1}).
    *
    * 100 TB: cell assignment is a pure projection (scan-speed); centroid
    * count scales with corpus size so cell populations stay bounded; the
    * persisted form of the clustering is exactly the hive `cell=` layout of
    * [[Similarity.writeIvfIndex]], making re-dedup of a grown corpus a
    * partition-local job over only the cells that received new documents.
    * Cross-cell near-dups are missed by design — the paper's recall trade;
    * raise `cells`' probe count via [[embeddingNearDupBrute]] spot audits. */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String, tau: Double,
      cells: Int = 16, seed: Long = 42L, dims: Int = 64): DataFrame = {
    val prep = corpus
      .select(col(idCol), VectorFns.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", VectorFns.norm2Q(col("qv")))
      .withColumn("cell", Similarity.cellOf(col("qv"), cells, seed, dims))
      .transform(graft.operators.Residuals.persist)
    val a = prep.as("a")
    val b = prep.as("b")
    val dropped = a.join(b, col("a.cell") === col("b.cell")
        && col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(VectorFns.cosinePre(col("a.qv"), col("a.n2"), col("b.qv"), col("b.n2"))
        >= tau)
      .select(col(s"b.$idCol").as(idCol))
      .distinct()
      .withColumn("__drop", lit(1L))
    prep.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        when(col("__drop").isNull, lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** CCNet-style corpus-level LINE dedup: a line whose document frequency
    * exceeds `maxDf` is boilerplate (cookie banners, "subscribe" footers,
    * navigation crumbs — the lines that repeat across thousands of pages)
    * and is stripped from EVERY document; content lines survive. The
    * line-hash groupBy is the whole plan: df counting aggregates hot lines
    * instead of joining them pairwise, so a line shared by a million pages
    * costs one combine tree, not a million² pairs. One shuffle on the line,
    * one on the doc id.
    *
    * Returns per document: `clean_text` (kept lines rejoined with \n in
    * original order), `n_lines` (nonempty), `n_dropped`. Empty lines are
    * neither counted nor kept; a document with NO nonempty lines still
    * emits a row (`clean_text = ""`, zero counts) — cleaning must never
    * silently drop a document from the corpus. */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String, maxDf: Long = 50L): DataFrame = {
    require(maxDf >= 1, "maxDf must be positive")
    val lines = docs
      .select(col(idCol).as("doc"), posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .filter(col("line") =!= "")
      .transform(Residuals.persist) // consumed twice: df count + rejoin
    val lineDf = lines.groupBy(col("line")).agg(countDistinct(col("doc")).as("line_df"))
    val agg = lines.join(lineDf, "line")
      .withColumn("keep", col("line_df") <= maxDf)
      .groupBy(col("doc").as(idCol))
      .agg(
        coalesce(array_join(transform(
          array_sort(collect_list(when(col("keep"), struct(col("idx"), col("line"))))),
          _.getField("line")), "\n"), lit("")).as("clean_text"),
        count(lit(1)).cast("long").as("n_lines"),
        sum((!col("keep")).cast("long")).as("n_dropped"))
    // left-join back onto the full id set: empty/whitespace-only docs have
    // no surviving line rows, and the groupBy alone would erase them
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }
}
