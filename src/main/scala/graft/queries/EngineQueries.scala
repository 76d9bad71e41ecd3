package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generation-engine surface: deterministic generator gates + full-stack smoke.
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait EngineQueries extends QueryHelpers {

  protected def engineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- generation engine surface ---
    "gen_integer_seq" -> ((s, dir) => {
      // ordered integer sequence through the full planner stack: domain size
      // equals distinct count, so value(n) = n exactly (oracle: range())
      val cfg = ConfigParser.parseYaml(
        """
          |random_seed: 42
          |models:
          |  m:
          |    rows_count: 10000
          |    columns:
          |      - { name: v, type: integer, type_params: { bit_width: 64, from: 0, to: 9999 }, ordered: true, distinct_percentage: 1 }
          |""".stripMargin)
      Engine.modelFrame(s, cfg, cfg.model("m")).orderBy(col("v"))
    }),


    "gen_enum_ordered" -> ((s, dir) => {
      // ordered enum cycling through sorted literals (oracle: arithmetic over
      // range()) — exercises sequencer + enum generator end-to-end
      val cfg = ConfigParser.parseYaml(
        """
          |random_seed: 42
          |models:
          |  m:
          |    rows_count: 9999
          |    columns:
          |      - { name: id, type: integer, type_params: { bit_width: 64, from: 0, to: 9998 }, ordered: true, distinct_percentage: 1 }
          |      - { name: tier, type: string, values: [bronze, gold, silver], ordered: true }
          |""".stripMargin)
      Engine.modelFrame(s, cfg, cfg.model("m")).orderBy(col("id"))
    }),


    "gen_users_smoke" -> ((s, dir) => {
      // full-featured generation (uuid, names, FK, nulls, ranges) — value
      // functions are engine-specific, so this entry is rows-only checked;
      // deep invariants live in the ScalaTest suite
      SparkEntry.entry(s)
    }),


    "gen_users_deterministic" -> ((s, dir) => {
      // the deterministic facets of entry()'s user model, oracle-gated
      // (r12 verdict #5): a 100%-distinct id over domain {0..1999} is a
      // BIJECTION (random-unique sequencer), so the sorted ids are exactly
      // range(0,2000); segment draws only from the declared enum; names are
      // non-empty; ordered signup stays inside the default datetime domain
      // [1900-01-01, 2025-01-01]. Value ORDER stays engine-specific by
      // design — gen_users_smoke remains the rows-only twin for that.
      SparkEntry.entryUsers(s).select(
        col("id").cast("long").as("id"),
        col("segment").isin("gold", "silver", "bronze").cast("long").as("seg_ok"),
        (length(col("name")) > 0).cast("long").as("name_ok"),
        (col("signup") >= lit("1900-01-01 00:00:00").cast("timestamp") &&
          col("signup") <= lit("2025-01-01 00:00:00").cast("timestamp"))
          .cast("long").as("sig_ok"))
        .orderBy(col("id"))
    }))

  protected def engineOracles: Map[String, String] = Map(

    "gen_integer_seq" ->
      "SELECT CAST(range AS BIGINT) AS v FROM range(0, 10000) ORDER BY v",


    "gen_enum_ordered" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |  ['bronze','gold','silver'][CAST(floor(CAST(range AS DOUBLE) * 3 / 9999) AS INT) + 1] AS tier
        |FROM range(0, 9999) ORDER BY id""".stripMargin,

    "gen_users_deterministic" ->
      """SELECT CAST(range AS BIGINT) AS id, CAST(1 AS BIGINT) AS seg_ok,
        |  CAST(1 AS BIGINT) AS name_ok, CAST(1 AS BIGINT) AS sig_ok
        |FROM range(0, 2000) ORDER BY id""".stripMargin)
}
