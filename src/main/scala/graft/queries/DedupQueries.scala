package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over documents (exact, MinHash/LSH, SimHash, n-gram Jaccard, semantic, spans, CDC) incl. shuffle-path variants.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait DedupQueries extends QueryHelpers {

  protected def dedupQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- dedup suite over documents ---
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_hash"))
    }),


    "dedup_source_matrix" -> ((s, dir) => {
      // dedup OBSERVABILITY: which sources mirror which — every doc_id % 25
      // == 0 is planted as a 'mirror'-source copy, and the matrix reports
      // duplicate PAIRS per unordered source pair before anything is dropped
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"), col("source"))
      val planted = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"),
          lit("mirror").as("source"))
      Dedup.sourceDupMatrix(docs.union(planted), "doc_id", "text", "source")
        .orderBy(col("source_a"), col("source_b"))
    }),


    "dedup_exact_normalized" -> ((s, dir) => {
      // the composition real pipelines run: normalize FIRST (NFC, casefold,
      // ws collapse), then hash — byte-level variants of one document dedup
      // together where raw md5(text) treats them as distinct
      val docs = t(s, dir, "documents")
      Dedup.exact(
        docs.select(col("doc_id"),
          graft.functions.Kernels.normalizeTextCol(col("text")).as("text")),
        "doc_id", "text")
        .orderBy(col("content_hash"))
    }),


    "dedup_minhash_signatures" -> ((s, dir) => {
      Dedup.minhashSignatures(spread(t(s, dir, "documents")), "doc_id", "text", 4)
        .orderBy(col("doc_id"))
    }),


    "dedup_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashPairs(spread(t(s, dir, "documents")), "doc_id", "text",
        numHashes = 4, bandSize = 2, broadcastRight = true)
        .orderBy(col("id_a"), col("id_b"))
    }),


    "dedup_keep_best" -> ((s, dir) => {
      // canonical selection policy: keep the HIGHEST-QUALITY doc per
      // near-dup cluster (min-id keep is dedup_pipeline_keep)
      val docs = spread(t(s, dir, "documents"))
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 4, bandSize = 2, broadcastRight = true)
      val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val scored = TextAnalysis.withQuality(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality_score"))
      Dedup.keepBest(scored, "doc_id", comps, "quality_score")
        .orderBy(col("doc_id"))
    }),


    "dedup_incremental" -> ((s, dir) => {
      // continuous ingestion: every 7th doc is "today's increment", the rest
      // are the indexed corpus whose signatures were persisted at index time
      val docs = spread(t(s, dir, "documents"))
      val corpusSigs = Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", numHashes = 4)
      Dedup.minhashPairsAgainst(
        docs.filter(col("doc_id") % 7 === 0), corpusSigs, "doc_id", "text",
        numHashes = 4, bandSize = 2)
        .orderBy(col("incoming_id"), col("corpus_id"))
    }),


    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhash(spread(t(s, dir, "documents")), "doc_id", "text", 32)
        .orderBy(col("doc_id"))
    }),


    "dedup_simhash_sql" -> ((s, dir) => {
      // the same simhash fingerprints through the SQL function surface
      // (GraftExtensions/FunctionRegistry) — pure SQL text, same kernels,
      // same oracle as dedup_simhash
      graft.plans.GraftFunctions.register(s)
      spread(t(s, dir, "documents")).createOrReplaceTempView("graft_documents_sql")
      s.sql("""SELECT doc_id, graft_simhash(graft_tokens(text)) AS simhash
               FROM graft_documents_sql ORDER BY doc_id""")
    }),


    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(
        spread(t(s, dir, "documents")), "doc_id", "text", "lang",
        n = 3, threshold = 0.5, broadcastRight = true)
        .orderBy(col("id_a"), col("id_b"))
    }),


    "dedup_ngram_jaccard_prefix" -> ((s, dir) => {
      // the 100 TB path: identical semantics to dedup_ngram_jaccard (shares
      // its oracle SQL verbatim) but candidates come from the prefix-filter
      // inverted index instead of all in-block pairs
      Dedup.ngramJaccardPairsPrefix(
        spread(t(s, dir, "documents")), "doc_id", "text", "lang",
        n = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),


    "dedup_clusters" -> ((s, dir) => {
      // pairwise dup evidence -> canonical cluster ids (min reachable id)
      Dedup.connectedComponents(
        Dedup.minhashPairs(spread(t(s, dir, "documents")), "doc_id", "text",
          numHashes = 4, bandSize = 2, broadcastRight = true),
        "id_a", "id_b")
        .orderBy(col("id"))
    }),


    "dedup_embedding_cosine" -> ((s, dir) => {
      Dedup.embeddingNearDupBrute(spread(t(s, dir, "embeddings")), "vec_id", "embedding", 0.4,
        broadcastRight = true)
        .orderBy(col("id_a"), col("id_b"))
    }),


    "dedup_spans" -> ((s, dir) => {
      // exact substring dedup: maximal token spans shared across documents
      // (stride-1 rolling window hashes -> cross-doc marks -> island merge)
      Dedup.dupSpans(spread(t(s, dir, "documents")), "doc_id", "text", window = 8)
        .orderBy(col("doc_id"), col("span_start"))
    }),


    "dedup_semantic" -> ((s, dir) => {
      // SemDeDup: cluster-then-compare semantic prune — pairwise cosine runs
      // ONLY within deterministic IVF Voronoi cells (equi-join on the cell
      // id), never corpus²; drops any doc with a smaller-id tau-close
      // neighbor in its cell
      Dedup.semanticDedup(spread(t(s, dir, "embeddings")), "vec_id", "embedding", 0.4)
        .orderBy(col("vec_id"))
    }),


    "dedup_pipeline_keep" -> ((s, dir) => {
      // the full dedup pipeline end-to-end: shingle -> minhash -> banded LSH
      // pairs -> connected components -> drop non-canonical cluster members
      val docs = spread(t(s, dir, "documents"))
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 4, bandSize = 2, broadcastRight = true)
      Dedup.keepCanonical(docs, "doc_id", Dedup.connectedComponents(pairs, "id_a", "id_b"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),


    // --- dedup shuffle-path variants: broadcastRight = false ---
    // Identical semantics and oracles to their broadcast twins. At sf0.1 the
    // broadcast plan wins; at 100 TB no side fits in an executor and the
    // sort-merge/shuffle-hash plan IS the real plan — these rows make the
    // gate measure it instead of assuming it.
    "dedup_minhash_pairs_shuffle" -> ((s, dir) => {
      Dedup.minhashPairs(spread(t(s, dir, "documents")), "doc_id", "text",
        numHashes = 4, bandSize = 2, broadcastRight = false)
        .orderBy(col("id_a"), col("id_b"))
    }),


    "dedup_ngram_jaccard_shuffle" -> ((s, dir) => {
      // salted replicated join: without it the sort-merge join serializes
      // the dominant language block into one task (measured 20-30x slower
      // at sf0.1 — a single key group is beyond AQE's skew splitting)
      Dedup.ngramJaccardPairs(
        spread(t(s, dir, "documents")), "doc_id", "text", "lang",
        n = 3, threshold = 0.5, broadcastRight = false, saltBuckets = 16)
        .orderBy(col("id_a"), col("id_b"))
    }),


    "dedup_clusters_shuffle" -> ((s, dir) => {
      Dedup.connectedComponents(
        Dedup.minhashPairs(spread(t(s, dir, "documents")), "doc_id", "text",
          numHashes = 4, bandSize = 2, broadcastRight = false),
        "id_a", "id_b")
        .orderBy(col("id"))
    }),


    "dedup_url_canonical" -> ((s, dir) => {
      // URL canonicalization as the exact-dedup key (the C4/CCNet web
      // pipeline step): six URL shapes per doc — tracking params, uppercase
      // scheme/host + default port, trailing slash, fragment, swapped param
      // order — collapse through the kernel to two canonical groups (4 and
      // 2 variants); the oracle emits the closed canonical forms directly
      import graft.functions.Kernels
      val d = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("source"), col("doc_id").cast("string").as("n"))
      val urls = d.select(col("doc_id"), explode(array(
        concat(lit("https://"), col("source"), lit(".example.com/a/"), col("n"),
          lit("?utm_source=feed&id="), col("n")),
        concat(lit("HTTPS://"), upper(col("source")), lit(".EXAMPLE.com:443/a/"), col("n"),
          lit("?id="), col("n")),
        concat(lit("https://"), col("source"), lit(".example.com/a/"), col("n"),
          lit("/?id="), col("n")),
        concat(lit("https://"), col("source"), lit(".example.com/a/"), col("n"),
          lit("?id="), col("n"), lit("&utm_campaign=x#frag")),
        concat(lit("https://"), col("source"), lit(".example.com/a/"), col("n"),
          lit("?z=1&id="), col("n")),
        concat(lit("https://"), col("source"), lit(".example.com/a/"), col("n"),
          lit("?id="), col("n"), lit("&z=1")))).as("url"))
      urls.select(col("doc_id"), Kernels.canonicalUrlCol(col("url")).as("curl"))
        .groupBy(col("curl"))
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("curl"), col("n_variants"))
        .orderBy(col("curl"))
    }),

    "dedup_lines" -> ((s, dir) => {
      // CCNet line-level boilerplate strip: docs get a 40-char title line,
      // a body line, and PLANTED boilerplate (a cookie banner on every 3rd
      // doc, a subscribe footer on every 4th — df ~ n/3, n/4 >> maxDf=50);
      // the operator strips exactly the planted lines at any SF
      val docs = t(s, dir, "documents")
      val lined = concat_ws("\n",
        when(col("doc_id") % 3 === 0, lit("cookie notice please accept")).otherwise(lit(null)),
        substring(col("text"), 1, 40),
        expr("substring(text, 41)"),
        when(col("doc_id") % 4 === 0, lit("subscribe to our newsletter")).otherwise(lit(null)))
      graft.operators.Dedup.lineDedup(
        spread(docs.select(col("doc_id"), lined.as("text"))), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),


    "dedup_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking: boundaries from a 16-char rolling window
      // hash (mod 64), so edited near-copies still share chunks; per doc,
      // how many chunks appear in other documents
      graft.operators.Dedup.cdcSharedChunks(
        spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "dedup_winnow_fps" -> ((s, dir) => {
      // winnowing (MOSS) fingerprints: distinct sliding-window minima of
      // 8-gram hashes, window 4 — per-doc count/min/max/checksum gates the
      // exact fingerprint SET (identical sets <=> identical stats here,
      // and the checksum sum runs over fp mod 1e9+7 so 60-bit values
      // cannot overflow the BIGINT sum)
      Dedup.winnowFingerprints(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), explode(col("fps")).as("fp"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_fp"),
          min(col("fp")).as("fp_min"),
          max(col("fp")).as("fp_max"),
          sum(col("fp") % 1000000007L).as("fp_checksum"))
        .orderBy(col("doc_id"))
    }),

    "dedup_winnow_pairs" -> ((s, dir) => {
      // fingerprint-overlap near-dup pairs over the df-banded posting list
      // (df in [2, 20] — boilerplate fingerprints are exactly the quadratic
      // blowup, and they pair everything with everything anyway)
      Dedup.winnowPairs(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "dedup_winnow_containment" -> ((s, dir) => {
      // asymmetric quote-inclusion: |A∩B| / |A| over banded fingerprints —
      // high when A is embedded in B even where Jaccard is low
      Dedup.winnowContainment(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "dedup_winnow_verified" -> ((s, dir) => {
      // the block→verify pipeline: winnow candidates, then EXACT edit
      // distance on the survivors only (O(len²) admissible because the
      // candidate set, not the corpus, bounds it)
      Dedup.winnowVerifiedPairs(spread(t(s, dir, "documents")), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b"))
    }))

  /** Scalable oracle for the ngram-jaccard family (shared by the plain,
    * prefix-filter and shuffle variants — all three must produce the
    * identical pair set). r12 rewrite: the original per-pair
    * `list_intersect` over the blocked self-join exceeded 15 min in
    * single-threaded DuckDB at sf1 (100× pair growth under the replica
    * fixture); this version explodes grams to rows and counts pair
    * intersections through a vectorized gram equi-join. Result-identical:
    * the 0.5 threshold means zero-intersection pairs (the only ones a
    * gram join cannot emit) never survive, and
    * shared/(na+nb−shared) = |∩|/|∪| on distinct-gram sets. Verified
    * row-identical to the old oracle at sf0.01; 19 s at sf1 (was >900). */
  private val ngramJaccardOracle: String =
    """WITH prepared AS (
      |  SELECT doc_id, lang, CAST(floor(length(text) / 100) AS BIGINT) AS len_bucket,
      |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
      |  FROM (SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
      |), g AS (
      |  SELECT doc_id, lang, len_bucket, len(grams) AS n, unnest(grams) AS gram FROM prepared
      |), pr AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    count(*) AS shared, any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM g a JOIN g b
      |    ON a.gram = b.gram AND a.lang = b.lang AND a.len_bucket = b.len_bucket
      |   AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b,
      |  CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) AS jaccard
      |FROM pr
      |WHERE CAST(shared AS DOUBLE) / CAST(na + nb - shared AS DOUBLE) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  protected def dedupOracles: Map[String, String] = Map(

    "dedup_winnow_fps" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS L FROM documents WHERE length(text) >= 11
        |), g AS (
        |  SELECT doc_id,
        |    [('0x' || substr(md5('0:' || substr(text, i, 8)), 1, 15))::BIGINT
        |     FOR i IN range(1, greatest(L - 8 + 2, 1))] AS hs
        |  FROM d
        |), f AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    [list_min(hs[s:least(s + 3, len(hs))])
        |     FOR s IN range(1, greatest(len(hs) - 4 + 2, 2))])) AS fps
        |  FROM g
        |), p AS (
        |  SELECT doc_id, unnest(fps) AS fp FROM f
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, min(fp) AS fp_min,
        |  max(fp) AS fp_max, CAST(sum(fp % 1000000007) AS BIGINT) AS fp_checksum
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_winnow_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS L FROM documents WHERE length(text) >= 11
        |), g AS (
        |  SELECT doc_id,
        |    [('0x' || substr(md5('0:' || substr(text, i, 8)), 1, 15))::BIGINT
        |     FOR i IN range(1, greatest(L - 8 + 2, 1))] AS hs
        |  FROM d
        |), f AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    [list_min(hs[s:least(s + 3, len(hs))])
        |     FOR s IN range(1, greatest(len(hs) - 4 + 2, 2))])) AS fps
        |  FROM g
        |), p AS (
        |  SELECT doc_id, unnest(fps) AS fp FROM f
        |), banded AS (
        |  SELECT fp FROM p GROUP BY fp HAVING count(*) BETWEEN 2 AND 20
        |), pp AS (
        |  SELECT doc_id, fp FROM p WHERE fp IN (SELECT fp FROM banded)
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM pp a JOIN pp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 8
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_winnow_verified" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS L FROM documents WHERE length(text) >= 11
        |), g AS (
        |  SELECT doc_id,
        |    [('0x' || substr(md5('0:' || substr(text, i, 8)), 1, 15))::BIGINT
        |     FOR i IN range(1, greatest(L - 8 + 2, 1))] AS hs
        |  FROM d
        |), f AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    [list_min(hs[s:least(s + 3, len(hs))])
        |     FOR s IN range(1, greatest(len(hs) - 4 + 2, 2))])) AS fps
        |  FROM g
        |), p AS (
        |  SELECT doc_id, unnest(fps) AS fp FROM f
        |), banded AS (
        |  SELECT fp FROM p GROUP BY fp HAVING count(*) BETWEEN 2 AND 20
        |), pp AS (
        |  SELECT doc_id, fp FROM p WHERE fp IN (SELECT fp FROM banded)
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM pp a JOIN pp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 8
        |)
        |SELECT pairs.doc_a, pairs.doc_b, pairs.n_shared,
        |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
        |FROM pairs
        |JOIN d da ON da.doc_id = pairs.doc_a
        |JOIN d db ON db.doc_id = pairs.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_winnow_containment" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS L FROM documents WHERE length(text) >= 11
        |), g AS (
        |  SELECT doc_id,
        |    [('0x' || substr(md5('0:' || substr(text, i, 8)), 1, 15))::BIGINT
        |     FOR i IN range(1, greatest(L - 8 + 2, 1))] AS hs
        |  FROM d
        |), f AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    [list_min(hs[s:least(s + 3, len(hs))])
        |     FOR s IN range(1, greatest(len(hs) - 4 + 2, 2))])) AS fps
        |  FROM g
        |), p AS (
        |  SELECT doc_id, unnest(fps) AS fp FROM f
        |), banded AS (
        |  SELECT fp FROM p GROUP BY fp HAVING count(*) BETWEEN 2 AND 20
        |), pp AS (
        |  SELECT doc_id, fp FROM p WHERE fp IN (SELECT fp FROM banded)
        |), sz AS (
        |  SELECT doc_id, count(*) AS n_banded FROM pp GROUP BY 1
        |), pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM pp a JOIN pp b ON a.fp = b.fp AND a.doc_id <> b.doc_id GROUP BY 1, 2
        |)
        |SELECT pr.doc_a, pr.doc_b, pr.n_shared, CAST(sz.n_banded AS BIGINT) AS n_banded,
        |  CAST(pr.n_shared AS DOUBLE) / CAST(sz.n_banded AS DOUBLE) AS containment
        |FROM pr JOIN sz ON sz.doc_id = pr.doc_a
        |WHERE CAST(pr.n_shared AS DOUBLE) / CAST(sz.n_banded AS DOUBLE) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.com/a/' || CAST(doc_id AS VARCHAR)
        |      || '?id=' || CAST(doc_id AS VARCHAR) AS base
        |  FROM documents
        |)
        |SELECT doc_id, curl, n_variants FROM (
        |  SELECT doc_id, base AS curl, CAST(4 AS BIGINT) AS n_variants FROM u
        |  UNION ALL
        |  SELECT doc_id, base || '&z=1' AS curl, CAST(2 AS BIGINT) AS n_variants FROM u
        |) q ORDER BY curl""".stripMargin,

    // r12 scalable rewrite: the original re-derived each window hash with a
    // per-position 16-term list comprehension — O(n·16) substr calls per
    // document, >15 min single-threaded at sf1. This version is set-based:
    // per-char rows (zipped unnests), a power table 31^i / 31^(−i) mod p
    // built once by recursive CTE (31⁻¹ ≡ 129032259 mod 1000000007), a
    // windowed prefix sum T(p) = Σ a_i·31^(−i), and
    // H(p) = 31^p·(T(p)−T(p−16)) ≡ Σ_{i=p−15..p} a_i·31^(p−i) — the exact
    // same rolling hash (weights verified == the old literal table).
    // Bounds: per-term mod keeps the prefix sum < len·10⁹; the final
    // product < 10¹⁸ < 2⁶³. Verified row-identical at sf0.01; 52 s at sf1.
    "dedup_cdc_chunks" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, text AS t, length(text) AS n FROM documents
        |), maxn AS (
        |  SELECT max(n) AS m FROM d
        |), pw(i, p31, pinv) AS (
        |  SELECT 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT i + 1, (p31 * 31) % 1000000007, (pinv * 129032259) % 1000000007
        |  FROM pw, maxn WHERE i < m
        |), chars AS (
        |  SELECT doc_id, unnest(string_split(t, '')) AS c, unnest(range(1, n + 1)) AS i FROM d
        |), pc AS (
        |  SELECT ch.doc_id, ch.i,
        |    sum((CAST(ascii(ch.c) AS BIGINT) * pw.pinv) % 1000000007)
        |      OVER (PARTITION BY ch.doc_id ORDER BY ch.i) AS cum
        |  FROM chars ch JOIN pw ON pw.i = ch.i
        |), cutpos AS (
        |  SELECT c.doc_id, c.i AS p
        |  FROM pc c
        |  LEFT JOIN pc prev ON prev.doc_id = c.doc_id AND prev.i = c.i - 16
        |  JOIN pw ON pw.i = c.i
        |  WHERE c.i >= 16
        |    AND (((c.cum - COALESCE(prev.cum, 0)) % 1000000007) * pw.p31)
        |        % 1000000007 % 64 = 0
        |), bnds AS (
        |  SELECT doc_id, CAST(p AS BIGINT) AS p FROM cutpos
        |  UNION ALL SELECT doc_id, CAST(0 AS BIGINT) FROM d
        |  UNION ALL SELECT doc_id, CAST(n AS BIGINT) FROM d
        |), ch AS (
        |  SELECT b.doc_id, substr(d.t, CAST(b.s AS INT) + 1, CAST(b.e - b.s AS INT)) AS chunk
        |  FROM (
        |    SELECT doc_id, p AS s, lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS e
        |    FROM bnds) b
        |  JOIN d ON d.doc_id = b.doc_id
        |  WHERE b.e IS NOT NULL AND substr(d.t, CAST(b.s AS INT) + 1, CAST(b.e - b.s AS INT)) != ''
        |), df AS (
        |  SELECT chunk, count(DISTINCT doc_id) AS ndocs FROM ch GROUP BY 1
        |)
        |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS shared_frac
        |FROM ch JOIN df USING (chunk) GROUP BY 1 ORDER BY ch.doc_id""".stripMargin,


    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,


    "dedup_source_matrix" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, 'mirror' FROM documents WHERE doc_id % 25 = 0
        |), p AS (
        |  SELECT least(a.source, b.source) AS source_a,
        |    greatest(a.source, b.source) AS source_b
        |  FROM all_docs a JOIN all_docs b
        |    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
        |)
        |SELECT source_a, source_b, count(*) AS n_dup_pairs
        |FROM p GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,


    "dedup_exact_normalized" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
        |    '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS content_hash,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,


    "dedup_minhash_signatures" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM toks
        |)
        |SELECT doc_id,
        |  list_min([('0x' || substr(md5('0:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh0,
        |  list_min([('0x' || substr(md5('0:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh1,
        |  list_min([('0x' || substr(md5('1:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh2,
        |  list_min([('0x' || substr(md5('1:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh3
        |FROM sh ORDER BY doc_id""".stripMargin,


    "dedup_minhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM toks
        |), sig AS (
        |  SELECT doc_id,
        |    list_min([('0x' || substr(md5('0:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh0,
        |    list_min([('0x' || substr(md5('0:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh1,
        |    list_min([('0x' || substr(md5('1:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh2,
        |    list_min([('0x' || substr(md5('1:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh3
        |  FROM sh
        |)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
        |  (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR (a.mh2 = b.mh2 AND a.mh3 = b.mh3))
        |ORDER BY id_a, id_b""".stripMargin,


    "dedup_keep_best" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM toks
        |), sig AS (
        |  SELECT doc_id,
        |    list_min([('0x' || substr(md5('0:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh0,
        |    list_min([('0x' || substr(md5('0:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh1,
        |    list_min([('0x' || substr(md5('1:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh2,
        |    list_min([('0x' || substr(md5('1:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh3
        |  FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
        |    (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR (a.mh2 = b.mh2 AND a.mh3 = b.mh3))
        |), edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(u, r) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT e.u, r.r FROM edges e JOIN reach r ON r.u = e.v
        |), comp AS (
        |  SELECT d.doc_id, least(d.doc_id, coalesce(m.mr, d.doc_id)) AS c
        |  FROM documents d LEFT JOIN (SELECT u, min(r) AS mr FROM reach GROUP BY u) m
        |    ON d.doc_id = m.u
        |), q AS (
        |  SELECT doc_id,
        |    (CASE WHEN length(text) < 20 THEN 0.0 ELSE 0.25 END)
        |      + (CASE WHEN (CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0 ELSE
        |          CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> list_contains(['the','a','an','and','or','of','to','in','is','it','for','on','with'], t))) AS DOUBLE)
        |          / len(regexp_split_to_array(trim(text), '\s+')) END) BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |          CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) END) >= 0.6 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0 ELSE
        |          CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
        |          / len(regexp_split_to_array(trim(text), '\s+')) END) * 0.25 AS quality_score
        |  FROM documents
        |), ranked AS (
        |  SELECT c2.doc_id, q.quality_score,
        |    row_number() OVER (PARTITION BY c2.c ORDER BY q.quality_score DESC, c2.doc_id) AS rk
        |  FROM comp c2 JOIN q ON c2.doc_id = q.doc_id
        |)
        |SELECT doc_id, quality_score FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin,


    "dedup_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM toks
        |), sig AS (
        |  SELECT doc_id,
        |    list_min([('0x' || substr(md5('0:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh0,
        |    list_min([('0x' || substr(md5('0:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh1,
        |    list_min([('0x' || substr(md5('1:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh2,
        |    list_min([('0x' || substr(md5('1:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh3
        |  FROM sh
        |)
        |SELECT DISTINCT n.doc_id AS incoming_id, c.doc_id AS corpus_id
        |FROM sig n JOIN sig c ON n.doc_id % 7 = 0 AND c.doc_id % 7 <> 0 AND (
        |  (n.mh0 = c.mh0 AND n.mh1 = c.mh1) OR (n.mh2 = c.mh2 AND n.mh3 = c.mh3))
        |ORDER BY incoming_id, corpus_id""".stripMargin,


    "dedup_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents
         |), h AS (
         |  SELECT doc_id, ('0x' || substr(md5('7919:' || tok), 1, 15))::BIGINT AS hv FROM toks
         |)
         |SELECT doc_id, ${(0 until 32).map(k =>
               s"(CASE WHEN sum(CASE WHEN (hv >> $k) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << k} ELSE 0 END)")
               .mkString(" + ")} AS simhash
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "dedup_lines" ->
      """WITH lined AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    CASE WHEN doc_id % 3 = 0 THEN 'cookie notice please accept' END,
        |    substr(text, 1, 40),
        |    substr(text, 41),
        |    CASE WHEN doc_id % 4 = 0 THEN 'subscribe to our newsletter' END) AS text
        |  FROM documents
        |), l AS (
        |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx
        |  FROM lined
        |), nz AS (
        |  SELECT * FROM l WHERE line != ''
        |), df AS (
        |  SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS line_df FROM nz GROUP BY 1
        |)
        |, agg AS (
        |  SELECT nz.doc_id,
        |    COALESCE(string_agg(CASE WHEN df.line_df <= 50 THEN nz.line END, chr(10) ORDER BY nz.idx), '') AS clean_text,
        |    CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CASE WHEN df.line_df <= 50 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        |  FROM nz JOIN df USING (line) GROUP BY 1
        |)
        |SELECT lined.doc_id,
        |  COALESCE(agg.clean_text, '') AS clean_text,
        |  COALESCE(agg.n_lines, CAST(0 AS BIGINT)) AS n_lines,
        |  COALESCE(agg.n_dropped, CAST(0 AS BIGINT)) AS n_dropped
        |FROM lined LEFT JOIN agg USING (doc_id) ORDER BY lined.doc_id""".stripMargin,

    "dedup_ngram_jaccard" -> ngramJaccardOracle,

    // same semantics as dedup_ngram_jaccard — the prefix-filter path must
    // produce the identical pair set, so it shares the oracle verbatim
    "dedup_ngram_jaccard_prefix" -> ngramJaccardOracle,


    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM toks
        |), sig AS (
        |  SELECT doc_id,
        |    list_min([('0x' || substr(md5('0:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh0,
        |    list_min([('0x' || substr(md5('0:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh1,
        |    list_min([('0x' || substr(md5('1:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh2,
        |    list_min([('0x' || substr(md5('1:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh3
        |  FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
        |    (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR (a.mh2 = b.mh2 AND a.mh3 = b.mh3))
        |), edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(u, r) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT e.u, r.r FROM edges e JOIN reach r ON r.u = e.v
        |)
        |SELECT u AS id, least(u, min(r)) AS component FROM reach GROUP BY u ORDER BY id""".stripMargin,


    "dedup_pipeline_keep" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM toks
        |), sig AS (
        |  SELECT doc_id,
        |    list_min([('0x' || substr(md5('0:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh0,
        |    list_min([('0x' || substr(md5('0:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh1,
        |    list_min([('0x' || substr(md5('1:' || g), 1, 15))::BIGINT FOR g IN grams]) AS mh2,
        |    list_min([('0x' || substr(md5('1:' || g), 16, 15))::BIGINT FOR g IN grams]) AS mh3
        |  FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
        |    (a.mh0 = b.mh0 AND a.mh1 = b.mh1) OR (a.mh2 = b.mh2 AND a.mh3 = b.mh3))
        |), edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(u, r) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT e.u, r.r FROM edges e JOIN reach r ON r.u = e.v
        |)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT u FROM reach GROUP BY u HAVING min(r) < u)
        |ORDER BY doc_id""".stripMargin,


    "dedup_embedding_cosine" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4 ORDER BY id_a, id_b""".stripMargin,


    "dedup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS p FROM toks
        |), wins AS (
        |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
        |    substr(md5(array_to_string(w[p:p+7], ' ')), 1, 16) AS h
        |  FROM pos
        |), duph AS (
        |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM wins)
        |  GROUP BY h HAVING count(*) >= 2
        |), marked AS (
        |  SELECT wins.doc_id, wins.pos FROM wins JOIN duph USING (h)
        |), isl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |         THEN 1 ELSE 0 END AS brk
        |  FROM marked
        |), grp AS (
        |  SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl
        |)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_windows
        |FROM grp GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,


    "dedup_semantic" ->
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
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, c AS cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |    FROM dots)
        |  WHERE cr = 1
        |), dropped AS (
        |  SELECT DISTINCT pb.vec_id
        |  FROM assign pa JOIN assign pb ON pa.cell = pb.cell AND pa.vec_id < pb.vec_id
        |  JOIN n a ON a.vec_id = pa.vec_id
        |  JOIN n b ON b.vec_id = pb.vec_id
        |  WHERE CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) >= 0.4
        |)
        |SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
        |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id
        |ORDER BY s.vec_id""".stripMargin)
}
