package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: the operator inventory as runnable queries, each with a
  * DuckDB oracle where ANSI-SQL-expressible (see `oracleSql`).
  *
  * Cross-engine exactness rules used throughout (so result hashes match
  * bit-for-bit):
  *  - money/measure sums go through fixed-point cents (`floor(x*100+0.5)` as
  *    BIGINT) — integer sums are order-independent and exact; final division
  *    is a single IEEE op on identical operands
  *  - float vector math is fixed-point at 1e-6 (see [[VectorFns]])
  *  - hashes are md5-based (identical in both engines)
  *  - every result carries a deterministic total ORDER BY
  *  - integer widths normalized to BIGINT on both sides
  */
object SparkEntry extends QueryHelpers
    with RelationalQueries with DedupQueries with SketchQueries
    with SimilarityQueries with LakeQueries with GraphQueries
    with EventsQueries with TextQueries with CurationQueries
    with MultimodalQueries with EngineQueries {


  /** Flagship query (driver smoke: rows>0 on sf0.001): a full engine
    * generation — two models with FK, uuid/name/enum/datetime columns —
    * joined and aggregated. Exercises the whole generator stack. */
  private val entryYaml =
    """
      |random_seed: 1738591926070236604
      |models:
      |  user:
      |    rows_count: 2000
      |    columns:
      |      - { name: id, type: integer, type_params: { from: 0, to: 1999 }, distinct_percentage: 1 }
      |      - { name: name, type: string, type_params: { logical_type: first_name } }
      |      - { name: segment, type: string, values: [gold, silver, bronze] }
      |      - { name: signup, type: datetime, ordered: true }
      |  order:
      |    rows_count: 10000
      |    columns:
      |      - { name: order_id, type: uuid }
      |      - { name: user_id, foreign_key: user.id }
      |      - { name: amount, type: float, type_params: { from: 1.0, to: 500.0 } }
      |""".stripMargin

  /** The entry() users model frame, exposed so `gen_users_deterministic`
    * can gate the same model's deterministic facets (r12 verdict #5). */
  private[graft] def entryUsers(spark: SparkSession): DataFrame = {
    val cfg = ConfigParser.parseYaml(entryYaml)
    Engine.modelFrame(spark, cfg, cfg.model("user"))
  }

  def entry(spark: SparkSession): DataFrame = {
    val cfg = ConfigParser.parseYaml(entryYaml)
    val users = Engine.modelFrame(spark, cfg, cfg.model("user"))
    val orders = Engine.modelFrame(spark, cfg, cfg.model("order"))
    orders
      .join(broadcast(users), orders("user_id") === users("id"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("amount")), 2).as("revenue"))
      .orderBy(col("segment"))
  }

  // ------------------------------------------------------------ queries

  // ------------------------------------------------------------ queries
  // (bodies live in graft/queries/*Queries.scala, one trait per family)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relationalQueries ++
    dedupQueries ++
    sketchQueries ++
    similarityQueries ++
    lakeQueries ++
    graphQueries ++
    eventsQueries ++
    textQueries ++
    curationQueries ++
    multimodalQueries ++
    engineQueries

  // ------------------------------------------------------------- oracle

  def oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    // shuffle-path gate variants produce IDENTICAL output to their broadcast
    // twins — they share the oracle verbatim
    "dedup_minhash_pairs_shuffle" -> oracleSqlBase("dedup_minhash_pairs"),

    "dedup_ngram_jaccard_shuffle" -> oracleSqlBase("dedup_ngram_jaccard"),

    "dedup_clusters_shuffle" -> oracleSqlBase("dedup_clusters"),

    // the bucketed layout must not change a single output byte
    "q2_revenue_by_nation_bucketed" -> oracleSqlBase("q2_revenue_by_nation"),

    // the persisted partition-pruned index must reproduce the in-memory IVF
    "knn_ivf_indexed" -> oracleSqlBase("knn_ivf"),

    // ...and so must the incrementally-appended index (base + delta)
    "knn_ivf_appended" -> oracleSqlBase("knn_ivf"),

    // stream-stream inner join drains to exactly the batch join's rows
    "q19_purchase_attribution_stream" -> oracleSqlBase("q18_purchase_attribution"),

    // the built-in session_window must reproduce the custom-state
    // sessionizer (window end minus gap = last event ts)
    "q28_sessions_builtin" -> oracleSqlBase("q13_user_sessions"),

    // the SQL function surface must reproduce the DataFrame kernels exactly
    "dedup_simhash_sql" -> oracleSqlBase("dedup_simhash"))

  private lazy val oracleSqlBase: Map[String, String] =
    relationalOracles ++
    dedupOracles ++
    sketchOracles ++
    similarityOracles ++
    lakeOracles ++
    graphOracles ++
    eventsOracles ++
    textOracles ++
    curationOracles ++
    multimodalOracles ++
    engineOracles
}
