package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state sketches: KMV, CMS, HLL with rollups/overlap.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait SketchQueries extends QueryHelpers {

  protected def sketchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sketch_kmv_distinct" -> ((s, dir) => {
      // deterministic KMV distinct sketch (custom bounded-state Aggregator):
      // same md5-derived hashes on both engines -> the ESTIMATE itself
      // hash-matches the DuckDB oracle, not just a tolerance band
      graft.operators.Sketches.kmvDistinct(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey", 64)
        .orderBy(col("l_returnflag"))
    }),


    "sketch_cms_freq" -> ((s, dir) => {
      // Count-Min frequency sketch over all corpus tokens (4x64 counters),
      // probed for 5 words next to their exact counts — est >= true always
      val toks = t(s, dir, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      val words = Seq("dup", "scan", "window", "join", "hash")
      // exact counts aggregated ONCE (vocabulary-sized, persisted) and the
      // sketch built from the weighted vocabulary — bit-identical counters
      // (integer sums reorder freely) with one tokenization pass instead of
      // two and md5 hashing per distinct word instead of per token (r17)
      val tru = toks.groupBy(col("w").as("word")).agg(count(lit(1)).as("true_cnt"))
        .transform(graft.operators.Residuals.persist)
      val cms = graft.operators.Sketches.cmsBuildWeighted(tru, "word", "true_cnt", 4, 64)
      graft.operators.Sketches.cmsEstimate(cms, words, 4, 64)
        .join(tru, Seq("word"), "left")
        .select(col("word"), col("est"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
        .orderBy(col("word"))
    }),


    "sketch_kmv_overlap" -> ((s, dir) => {
      // theta-style set operations from sketches alone: en/de vocabulary
      // union, intersection and Jaccard estimated WITHOUT joining the
      // corpora — each side scanned once, independently
      val docs = t(s, dir, "documents")
      def toks(lang: String) = docs.filter(col("lang") === lang)
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      graft.operators.Sketches.kmvOverlap(toks("en"), toks("de"), "w", 64)
    }),


    "sketch_kmv_rollup" -> ((s, dir) => {
      // mergeable-sketch rollup: per-(lang, source) sketches merged into
      // per-lang estimates WITHOUT re-scanning raw data; the merge is
      // lossless, so this shares the direct per-lang oracle verbatim
      graft.operators.Sketches.kmvRollup(
        t(s, dir, "documents"), Seq("lang", "source"), Seq("lang"), "doc_id", 64)
        .orderBy(col("lang"))
    }),


    "sketch_hll_distinct" -> ((s, dir) => {
      // deterministic HyperLogLog (m=32 over a 40-bit md5 hash): integer
      // registers and an integer-scaled harmonic mean make the ESTIMATE
      // bit-portable — the oracle hash-matches the sketch internals AND the
      // estimate, not a tolerance band
      graft.operators.Sketches.hllDistinct(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey")
        .orderBy(col("l_returnflag"))
    }),


    // register max is associative -> merging per-(flag, status) register
    // files into per-flag estimates is lossless; shares the direct oracle
    "sketch_hll_rollup" -> ((s, dir) => {
      graft.operators.Sketches.hllRollup(
        t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"),
        Seq("l_returnflag"), "l_partkey")
        .orderBy(col("l_returnflag"))
    }))

  protected def sketchOracles: Map[String, String] = Map(

    "sketch_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM lineitem
        |), ranked AS (
        |  SELECT l_returnflag, hv,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS m
        |  FROM h
        |)
        |SELECT l_returnflag,
        |  CASE WHEN max(m) < 64 THEN CAST(max(m) AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0
        |            / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END AS est_distinct
        |FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,


    "sketch_cms_freq" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents
        |), fam AS (
        |  SELECT range AS family FROM range(0, 4)
        |), cms AS (
        |  SELECT f.family,
        |    ('0x' || substr(md5(CAST(f.family // 2 AS VARCHAR) || ':' || t.w),
        |      1 + 15 * (f.family % 2), 15))::BIGINT % 64 AS bucket,
        |    count(*) AS cnt
        |  FROM toks t CROSS JOIN fam f GROUP BY 1, 2
        |), q AS (
        |  SELECT unnest(['dup', 'scan', 'window', 'join', 'hash']) AS word
        |), probe AS (
        |  SELECT q.word, f.family,
        |    ('0x' || substr(md5(CAST(f.family // 2 AS VARCHAR) || ':' || q.word),
        |      1 + 15 * (f.family % 2), 15))::BIGINT % 64 AS bucket
        |  FROM q CROSS JOIN fam f
        |), est AS (
        |  SELECT word, min(coalesce(cnt, 0)) AS est
        |  FROM probe LEFT JOIN cms USING (family, bucket) GROUP BY word
        |), tru AS (
        |  SELECT w AS word, count(*) AS true_cnt FROM toks GROUP BY w
        |)
        |SELECT e.word, CAST(e.est AS BIGINT) AS est,
        |  CAST(coalesce(t.true_cnt, 0) AS BIGINT) AS true_cnt
        |FROM est e LEFT JOIN tru t USING (word) ORDER BY word""".stripMargin,


    "sketch_kmv_overlap" ->
      """WITH ta AS (
        |  SELECT DISTINCT ('0x' || substr(md5(w), 1, 15))::BIGINT AS hv FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |    FROM documents WHERE lang = 'en')
        |), ka AS (SELECT hv FROM ta ORDER BY hv LIMIT 64),
        |tb AS (
        |  SELECT DISTINCT ('0x' || substr(md5(w), 1, 15))::BIGINT AS hv FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |    FROM documents WHERE lang = 'de')
        |), kb AS (SELECT hv FROM tb ORDER BY hv LIMIT 64),
        |ud AS (SELECT DISTINCT hv FROM (SELECT hv FROM ka UNION ALL SELECT hv FROM kb)),
        |ku AS (SELECT hv FROM ud ORDER BY hv LIMIT 64),
        |sz AS (SELECT (SELECT count(*) FROM ka) AS sa, (SELECT count(*) FROM kb) AS sb,
        |              (SELECT count(*) FROM ud) AS su),
        |cb AS (SELECT CASE WHEN (SELECT sa FROM sz) < 64 AND (SELECT sb FROM sz) < 64
        |  THEN (SELECT count(*) FROM ud
        |        WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb))
        |  ELSE (SELECT count(*) FROM ku
        |        WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb)) END AS c)
        |SELECT CAST(sz.su AS BIGINT) AS u_size, CAST(cb.c AS BIGINT) AS c_both,
        |  CASE WHEN sz.sa < 64 AND sz.sb < 64 THEN CAST(sz.su AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0
        |            / CAST((SELECT max(hv) FROM ku) AS DOUBLE) END AS est_union,
        |  CASE WHEN sz.sa < 64 AND sz.sb < 64 THEN CAST(cb.c AS DOUBLE)
        |       ELSE CAST(cb.c AS DOUBLE) * (63.0 * 1152921504606846976.0
        |            / CAST((SELECT max(hv) FROM ku) AS DOUBLE)) / 64.0 END AS est_inter,
        |  CASE WHEN sz.sa < 64 AND sz.sb < 64
        |       THEN CAST(cb.c AS DOUBLE) / CAST(sz.su AS DOUBLE)
        |       ELSE CAST(cb.c AS DOUBLE) / 64.0 END AS est_jaccard
        |FROM sz, cb""".stripMargin,


    // the rolled-up (merged) sketch is lossless, so its oracle is the
    // DIRECT per-lang sketch — merging must not change a single bit
    "sketch_kmv_rollup" ->
      """WITH h AS (
        |  SELECT DISTINCT lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM documents
        |), ranked AS (
        |  SELECT lang, hv,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS m
        |  FROM h
        |)
        |SELECT lang,
        |  CASE WHEN max(m) < 64 THEN CAST(max(m) AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0
        |            / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END AS est_distinct
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,


    // deterministic HLL: registers from the 40-bit md5 hash (5 index bits /
    // 35 rank bits), integer-scaled harmonic mean, alpha_32 = 0.697; the
    // m = 32 power of two keeps the alpha*m^2*2^36 numerator bit-identical
    "sketch_hll_distinct" -> hllDistinctSql,

    // register max is associative: the rolled-up sketch must be bit-identical
    // to sketching the coarse group directly — shares the direct oracle
    "sketch_hll_rollup" -> hllDistinctSql)
}
