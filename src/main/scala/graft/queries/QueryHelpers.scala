package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared plumbing for the per-family query registries: table readers,
  * fixed-point helpers, build-once side artifacts (bucketed tables, IVF
  * indexes, versioned lake tables) and shared oracle fragments. All
  * `private[graft]` so specs can drive the build-once artifacts directly.
  */
private[graft] trait QueryHelpers {


  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Compute-heavy per-row operators need real parallelism: the small test
    * tables arrive as one parquet file = one partition, which would serialize
    * the kernels onto a single core. Harmless at scale (already many files). */
  private[graft] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP_MICROS
    * parquet across fixture generations; [[graft.streaming.EventStream.rawEvents]]
    * probes the footer and branches (nanos -> declared long schema + µs
    * truncation, the same truncation DuckDB applies natively; micros/millis
    * -> native TimestampType read), so both engines always see identical
    * microsecond values regardless of fixture drift. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.rawEvents(s, s"$dir/events.parquet")

  /** Fixed-point cents: exact, portable money math. */
  private[graft] def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** Ensure co-bucketed lineitem/orders tables exist for `dir` (written once
    * per session per SF; bucket count matches so the orderkey join is
    * Exchange-free). Returns (lineitemTable, ordersTable). The write is the
    * one-time cost that bucketing trades for the per-query fact-fact shuffle
    * at 100 TB — see [[graft.operators.Bucketing]]. */
  private[graft] def bucketedOrderTables(s: SparkSession, dir: String): (String, String) = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val (liT, oT) = (s"graft_bkt_lineitem_$suffix", s"graft_bkt_orders_$suffix")
    if (!s.catalog.tableExists(liT)) {
      dropStale(s, liT)
      graft.operators.Bucketing.writeBucketed(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        liT, "l_orderkey", 8)
    }
    if (!s.catalog.tableExists(oT)) {
      dropStale(s, oT)
      graft.operators.Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")), oT, "o_orderkey", 8)
    }
    (liT, oT)
  }

  private[graft] val ivfIndexWritten = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write the IVF index for `dir`'s embeddings once per JVM (fresh each
    * session — quantization/centroid changes must not read a stale layout).
    * Returns the index path. */
  private[graft] def ivfIndexPath(s: SparkSession, dir: String): String = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index_$suffix"
    if (ivfIndexWritten.add(path)) {
      graft.operators.Similarity.writeIvfIndex(
        t(s, dir, "embeddings"), "vec_id", "embedding", path)
    }
    path
  }

  /** Build-once path for the APPENDED IVF index: base index from the first
    * 250 vectors, then an incremental append of the rest — the grown index
    * must probe bit-identically to the full rebuild (`knn_ivf` oracle). */
  private[graft] def ivfAppendedIndexPath(s: SparkSession, dir: String): String = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index_app_$suffix"
    if (ivfIndexWritten.add(path)) {
      val embs = t(s, dir, "embeddings")
      graft.operators.Similarity.writeIvfIndex(
        embs.filter(col("vec_id") < 250), "vec_id", "embedding", path)
      graft.operators.Similarity.appendIvfIndex(
        embs.filter(col("vec_id") >= 250), "vec_id", "embedding", path)
    }
    path
  }

  /** Build-once versioned documents table for the lake_* gates: init the
    * corpus as v1, commit corpus_upsert's exact change set as a copy-on-write
    * v2 through the manifest protocol ([[graft.operators.VersionedTable]]).
    * Rebuilt fresh per JVM so stale layouts never leak across sessions. */
  private[graft] def lakeTable(s: SparkSession, dir: String, tag: String): String = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_${tag}_$suffix"
    if (ivfIndexWritten.add(path)) {
      val vt = graft.operators.VersionedTable
      vt.destroy(s, path)
      val docs = t(s, dir, "documents")
      vt.init(s, path, docs, "doc_id", targetRowsPerFile = 500L)
      val mods = docs
        .filter(col("doc_id") % 17 === 0 || col("doc_id") % 10 === 0)
        .withColumn("op", when(col("doc_id") % 17 === 0, lit("delete")).otherwise(lit("upsert")))
        .withColumn("text",
          when(col("op") === "upsert", concat(col("text"), lit(" v2"))).otherwise(col("text")))
      val ins = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("new "), col("text")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .withColumn("op", lit("upsert"))
      vt.upsert(s, path, mods.unionByName(ins), targetRowsPerFile = 500L)
    }
    path
  }

  /** Build-once versioned table for the BRANCH gates: v1 = corpus; branch
    * "exp" forked from v1; a branch upsert appends " exp" to every
    * doc_id % 9 == 4 text; fast-forward merge publishes it as main v2.
    * Main stays at the untouched v1 until the merge — the
    * experiment-isolation contract LakeSpec pins. */
  private[graft] def lakeBranchTable(s: SparkSession, dir: String): String = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_branch_$suffix"
    if (ivfIndexWritten.add(path)) {
      val vt = graft.operators.VersionedTable
      vt.destroy(s, path)
      val docs = t(s, dir, "documents")
      vt.init(s, path, docs, "doc_id", targetRowsPerFile = 500L)
      vt.createBranch(s, path, "exp")
      val mods = docs.filter(col("doc_id") % 9 === 4)
        .withColumn("text", concat(col("text"), lit(" exp")))
        .withColumn("op", lit("upsert"))
      vt.upsertBranch(s, path, "exp", mods, targetRowsPerFile = 500L)
      vt.mergeBranch(s, path, "exp")
    }
    path
  }

  /** Build-once versioned table for the OPTIMIZE gate: v1 = the corpus in
    * uniform 100-row files, v2 = selective optimize at 150 target rows.
    * Against 100-row files, `cum_before div 150` alternates multi-file
    * rewrite groups with single-file KEPT groups, so both the rewrite and
    * the untouched-path branch are exercised at any SF. */
  private[graft] def lakeOptTable(s: SparkSession, dir: String): String = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_opt_$suffix"
    if (ivfIndexWritten.add(path)) {
      val vt = graft.operators.VersionedTable
      vt.destroy(s, path)
      vt.init(s, path, t(s, dir, "documents"), "doc_id", targetRowsPerFile = 100L)
      vt.optimize(s, path, targetRows = 150L)
    }
    path
  }

  /** Build-once versioned documents table for the deletion-vector gate:
    * v1 = the corpus, v2 = a merge-on-read DELETE of every doc_id % 7 == 3
    * committed as a deletion vector — v2's DATA file list is v1's verbatim
    * (zero rewrite; LakeSpec pins it). */
  private[graft] def lakeDvTable(s: SparkSession, dir: String): String = {
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lake_dv_$suffix"
    if (ivfIndexWritten.add(path)) {
      val vt = graft.operators.VersionedTable
      vt.destroy(s, path)
      vt.init(s, path, t(s, dir, "documents"), "doc_id", targetRowsPerFile = 500L)
      vt.deleteKeys(s, path,
        t(s, dir, "documents").filter(col("doc_id") % 7 === 3).select(col("doc_id")))
    }
    path
  }

  /** A managed table's warehouse dir can survive the (in-memory) catalog that
    * created it — a fresh session then refuses `saveAsTable` over the stale
    * location. Clear both the catalog entry and the leftover dir. */
  private[graft] def dropStale(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
  }



  /** Shared HLL oracle (direct sketch == lossless register-max rollup). */
  private[graft] val hllDistinctSql =
    """WITH h AS (
      |  SELECT l_returnflag,
      |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 10))::BIGINT AS hv
      |  FROM lineitem
      |), reg AS (
      |  SELECT l_returnflag, hv >> 35 AS bucket,
      |    max(CASE WHEN (hv & 34359738367) = 0 THEN 36
      |             ELSE 36 - length(bin(hv & 34359738367)) END) AS register
      |  FROM h GROUP BY 1, 2
      |), agg AS (
      |  SELECT l_returnflag, count(*) AS v_filled,
      |    CAST(sum(CAST(1 AS BIGINT) << CAST(36 - register AS INT)) AS BIGINT)
      |      + (32 - count(*)) * 68719476736 AS s_scaled
      |  FROM reg GROUP BY 1
      |)
      |SELECT l_returnflag, CAST(v_filled AS BIGINT) AS v_filled,
      |  CAST(s_scaled AS BIGINT) AS s_scaled,
      |  floor((CASE WHEN 0.697 * 1024 * 68719476736 / s_scaled <= 80.0 AND v_filled < 32
      |              THEN 32.0 * ln(32.0 / CAST(32 - v_filled AS DOUBLE))
      |              ELSE 0.697 * 1024 * 68719476736 / s_scaled END) * 1e6 + 0.5) / 1e6
      |    AS est_distinct
      |FROM agg ORDER BY l_returnflag""".stripMargin
}
