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
object SparkEntry {

  // ----------------------------------------------------------- helpers

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Compute-heavy per-row operators need real parallelism: the small test
    * tables arrive as one parquet file = one partition, which would serialize
    * the kernels onto a single core. Harmless at scale (already many files). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP_MICROS
    * parquet across fixture generations; [[graft.streaming.EventStream.rawEvents]]
    * probes the footer and branches (nanos -> declared long schema + µs
    * truncation, the same truncation DuckDB applies natively; micros/millis
    * -> native TimestampType read), so both engines always see identical
    * microsecond values regardless of fixture drift. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.rawEvents(s, s"$dir/events.parquet")

  /** Fixed-point cents: exact, portable money math. */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

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

  private val ivfIndexWritten = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

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

  /** A managed table's warehouse dir can survive the (in-memory) catalog that
    * created it — a fresh session then refuses `saveAsTable` over the stale
    * location. Clear both the catalog entry and the leftover dir. */
  private def dropStale(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
  }

  /** Flagship query (driver smoke: rows>0 on sf0.001): a full engine
    * generation — two models with FK, uuid/name/enum/datetime columns —
    * joined and aggregated. Exercises the whole generator stack. */
  def entry(spark: SparkSession): DataFrame = {
    val yaml =
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
    val cfg = ConfigParser.parseYaml(yaml)
    val users = Engine.modelFrame(spark, cfg, cfg.model("user"))
    val orders = Engine.modelFrame(spark, cfg, cfg.model("order"))
    orders
      .join(broadcast(users), orders("user_id") === users("id"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("amount")), 2).as("revenue"))
      .orderBy(col("segment"))
  }

  // ------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational surface over the TPC-H-ish tables ---
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_returnflag"), col("l_linestatus"),
          cents(col("l_quantity")).as("qc"),
          cents(col("l_extendedprice")).as("ec"),
          cents(col("l_discount")).as("dc"),
          cents(col("l_tax")).as("tc"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          (sum(col("qc")).cast("double") / 100.0).as("sum_qty"),
          (sum(col("ec")).cast("double") / 100.0).as("sum_base_price"),
          (sum(col("ec") * (lit(100L) - col("dc"))).cast("double") / 10000.0).as("sum_disc_price"),
          (sum(col("ec") * (lit(100L) - col("dc")) * (lit(100L) + col("tc"))).cast("double") / 1000000.0)
            .as("sum_charge"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q2_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("rev4"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("rev4")).cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q2_revenue_by_nation_bucketed" -> ((s, dir) => {
      // same query, same oracle — but the lineitem x orders fact-fact join
      // runs over co-bucketed tables: the orderkey shuffle was paid ONCE at
      // write time, so the join itself needs no Exchange (PlanSpec pins it).
      // This is the layout a 100 TB deployment would use for every
      // orders-grain query; the dims stay broadcast.
      val (liT, oT) = bucketedOrderTables(s, dir)
      val li = s.table(liT)
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("rev4"))
      val o = s.table(oT)
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("rev4")).cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q3_top_orders_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rank"))
    }),

    "q4_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q5_top10_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    "q6_customers_without_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q7_distinct_parts_per_flag" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    "q8_events_hourly" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          (sum(cents(col("value"))).cast("double") / 100.0).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    "q9_events_json_props" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
        .orderBy(col("event_type"))
    }),

    "q11_events_hourly_stream" -> ((s, dir) => {
      // the SAME hourly aggregation as q8, but executed through Structured
      // Streaming (readStream -> watermark -> windowed agg -> memory sink)
      // directly over the raw nanos parquet — no temp rewrite of the source;
      // hash-checked against the same DuckDB oracle — streaming == batch
      graft.streaming.EventStream
        .runHourlyOverRawEvents(s, s"$dir/events.parquet", s"evs_${System.nanoTime()}")
        .select(
          col("window_start").as("hour"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    "q22_session_stats" -> ((s, dir) => {
      // per-user engagement rollup COMPOSED over the sessionization
      // operator: durations stay integer micros through the sums, one final
      // division chain — the downstream-feature proof that custom-state
      // output is a first-class relational input
      import s.implicits._
      val ev = events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[graft.streaming.EventStream.MicroEvent]
      graft.streaming.EventStream.sessionizeByGap(ev, 30L * 60 * 1000000)
        .toDF()
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          sum(col("ended_us") - col("started_us")).as("total_dur_us"),
          max(col("n_events")).as("max_session_events"))
        .withColumn("avg_session_secs",
          col("total_dur_us").cast("double") / col("n_sessions") / 1e6)
        .orderBy(col("user_id"))
    }),

    "q21_hourly_distinct_stream" -> ((s, dir) => {
      // windowed COUNT DISTINCT as a STREAMING HLL sketch: per-hour distinct
      // users estimated from a 32-long register file per window — bounded
      // state under the watermark no matter the cardinality; the register
      // Aggregator + shared finalize make stream == batch == DuckDB oracle
      graft.streaming.EventStream
        .runHourlyDistinctOverRawEvents(s, s"$dir/events.parquet", s"hll_${System.nanoTime()}")
        .withColumn("hour", col("window_start"))
        .drop("window_start")
        .select(col("hour"), col("v_filled"), col("s_scaled"), col("est_distinct"))
        .orderBy(col("hour"))
    }),

    "q25_hourly_cms_stream" -> ((s, dir) => {
      // STREAMING Count-Min: per-hour frequency counters over event types —
      // depth×width state per window regardless of cardinality, the
      // frequency complement to q21's streaming HLL; plain order-free
      // counters mean stream == batch == DuckDB oracle
      graft.streaming.EventStream
        .runHourlyCmsOverRawEvents(s, s"$dir/events.parquet", s"cms_${System.nanoTime()}")
        .withColumn("hour", col("window_start"))
        .drop("window_start")
        .select(col("hour"), col("family"), col("bucket"), col("cnt"))
        .orderBy(col("hour"), col("family"), col("bucket"))
    }),

    "q27_enriched_nation_stream" -> ((s, dir) => {
      // STREAM-STATIC enrichment join: the event stream joins a broadcast
      // customer dimension (stateless, no watermark on the dim side), then
      // one watermarked hourly aggregation per nation — the third join
      // shape next to q18/q19/q20's stream-stream attribution
      graft.streaming.EventStream
        .runEnrichedHourlyOverRawEvents(s, s"$dir/events.parquet",
          s"$dir/customer.parquet", s"enrich_${System.nanoTime()}")
        .orderBy(col("window_start"), col("nation"))
    }),

    "q23_pivot_status_by_priority" -> ((s, dir) => {
      // pivot: order counts + exact cents revenue per status x priority —
      // fixed pivot values so the plan is a single aggregate, no
      // distinct-value discovery pass
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          cents(col("o_totalprice")).as("tc"))
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)).as("n"), (sum(col("tc")).cast("double") / 100.0).as("rev"))
        .na.fill(0L)
        .orderBy(col("o_orderstatus"))
    }),

    "q24_cube_order_stats" -> ((s, dir) => {
      // cube: all four grouping-set combinations of (status, priority) with
      // exact sums; grouping_id disambiguates the null super-aggregate rows
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"),
          grouping_id().as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n_orders"), col("revenue"), col("gid"))
        .orderBy(col("gid"), col("status"), col("priority"))
    }),

    "q12_rollup_order_stats" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n_orders"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),

    "q13_user_sessions" -> ((s, dir) => {
      // gap-based sessionization (30 min) through flatMapGroupsWithState —
      // the custom-state extension point, hash-checked against the classic
      // gaps-and-islands SQL formulation in DuckDB
      import s.implicits._
      val ev = events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[graft.streaming.EventStream.MicroEvent]
      graft.streaming.EventStream.sessionizeByGap(ev, 30L * 60 * 1000000)
        .toDF()
        .select(col("user_id"), col("n_events"),
          timestamp_micros(col("started_us")).as("started"),
          timestamp_micros(col("ended_us")).as("ended"))
        .orderBy(col("user_id"), col("started"))
    }),

    "q28_sessions_builtin" -> ((s, dir) => {
      // the BUILT-IN session_window over the same 30-min gap — one
      // aggregation, no custom state; window end is last_ts + gap by
      // definition, so subtracting the gap reconstructs the last event ts
      // and the output matches q13's custom-state sessionizer row for row
      // (StreamingSpec pins empirically that the merge rule is inclusive
      // at exactly-gap spacing on BOTH sides — no boundary divergence)
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          col("w.start").as("started"),
          (col("w.end") - expr("INTERVAL 30 MINUTES")).as("ended"))
        .orderBy(col("user_id"), col("started"))
    }),

    "q14_user_sessions_stream" -> ((s, dir) => {
      // STREAMING sessionization end-to-end (GroupState + event-time
      // timeout), oracle-gated: emitted sessions are exactly those whose
      // timeout fired before the final watermark — the oracle applies the
      // same closing rule to the gaps-and-islands formulation
      graft.streaming.EventStream.runSessionsOverRawEvents(
        s, s"$dir/events.parquet", 30L * 60 * 1000000, "0 seconds", "q14_sessions")
        .select(col("user_id"), col("n_events"),
          timestamp_micros(col("started_us")).as("started"),
          timestamp_micros(col("ended_us")).as("ended"))
        .orderBy(col("user_id"), col("started"))
    }),

    "q15_events_asof_orders" -> ((s, dir) => {
      // point-in-time join: each event annotated with the user's most recent
      // order AT THAT MOMENT — the feature-pipeline primitive Spark lacks
      // natively, composed as union + one window pass (no join explosion);
      // oracle is DuckDB's native ASOF LEFT JOIN
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val ord = graft.operators.AsOf.latestPerKeyTime(
        t(s, dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey")
      graft.operators.AsOf.asofJoin(ev, ord,
        "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
        .orderBy(col("event_id"))
    }),

    "q26_events_asof_forward" -> ((s, dir) => {
      // forward as-of: each event annotated with the user's NEXT order at
      // or after that moment ("what happened next") — mirror window pass of
      // q15, no join explosion; oracle via min-over-qualifying + re-join
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val ord = graft.operators.AsOf.latestPerKeyTime(
        t(s, dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey")
      graft.operators.AsOf.asofJoinForward(ev, ord,
        "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
        .orderBy(col("event_id"))
    }),

    "q16_price_band_rangejoin" -> ((s, dir) => {
      // interval join with NO equi key (the case where naive Spark falls
      // into BroadcastNestedLoopJoin): overlapping irregular price bands,
      // derived arithmetically from nation so both engines build the exact
      // same intervals; the operator buckets them into an equi-join.
      // PlanSpec pins the no-BNLJ/no-cartesian shape.
      val bands = t(s, dir, "nation").select(
        col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 3777.0).as("lo"),
        (col("n_nationkey") * 3777.0 + 2000.0 + (col("n_nationkey") % 7) * 1500.0).as("hi"))
      graft.operators.RangeJoin.bucketed(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", bands, "lo", "hi", bucketWidth = 4000.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("sum_price"))
        .orderBy(col("band_id"))
    }),

    "q17_urgent_revenue_bloom" -> ((s, dir) => {
      // semi-join reduction: the URGENT filter keeps ~20% of orders, so ~80%
      // of lineitem rows are dead on arrival at the join. BloomJoin builds a
      // bloom filter over the surviving orderkeys (one small agg) and prunes
      // the fact scan BEFORE its shuffle — the plan a 100 TB fact join needs
      // (Catalyst's InjectRuntimeFilter does this only above its 10 GB probe
      // threshold; this operator is the same shape, explicit). Join stays
      // non-broadcast on purpose: the pruned shuffle IS the point.
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_returnflag"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("rev4"))
      graft.operators.BloomJoin
        .bloomPrunedJoin(li, o, "l_orderkey", "o_orderkey", expectedKeys = o.count())
        .groupBy(col("l_returnflag"))
        .agg((sum(col("rev4")).cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("l_returnflag"))
    }),

    "q18_purchase_attribution" -> ((s, dir) => {
      // interval join, batch form: clicks within 30 min before each purchase
      val ev = events(s, dir)
      graft.streaming.EventStream.attributionJoin(
        graft.streaming.EventStream.purchaseSide(ev),
        graft.streaming.EventStream.clickSide(ev), lookbackMin = 30)
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    "q19_purchase_attribution_stream" -> ((s, dir) => {
      // the SAME plan as a stream-stream inner join: two watermarked file
      // streams, time-range-bounded state, append sink — shares q18's oracle
      // because inner-join matches emit as both rows arrive (none withheld)
      graft.streaming.EventStream.runAttributionOverRawEvents(
        s, s"$dir/events.parquet", lookbackMin = 30, "0 seconds", "q19_attr")
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    "q20_purchase_attribution_outer_stream" -> ((s, dir) => {
      // stream-stream LEFT OUTER join: unmatched purchases surface with
      // null click columns only after the watermark proves no future click
      // can match; the oracle applies the same closing rule to the batch
      // left join (trailing purchases not yet cleared stay buffered)
      graft.streaming.EventStream.runAttributionOverRawEvents(
        s, s"$dir/events.parquet", lookbackMin = 30, "0 seconds", "q20_attr",
        leftOuter = true)
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    "q10_active_buyers_intersect" -> ((s, dir) => {
      val ev = events(s, dir)
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
        .orderBy(col("user_id"))
    }),

    // --- dedup suite over documents ---
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_hash"))
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
      val cms = graft.operators.Sketches.cmsBuild(toks, "w", 4, 64)
      val tru = toks.groupBy(col("w").as("word")).agg(count(lit(1)).as("true_cnt"))
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

    // --- similarity search over embeddings ---
    "knn_bruteforce" -> ((s, dir) => {
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.bruteForceKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "knn_lsh" -> ((s, dir) => {
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.lshKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "knn_ivf" -> ((s, dir) => {
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.ivfKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "knn_ivf_indexed" -> ((s, dir) => {
      // the persisted-index serving path: same parameters and output as
      // knn_ivf (shares its oracle) but probing the hive-partitioned
      // on-disk inverted file with static partition pruning
      val embs = spread(t(s, dir, "embeddings"))
      val path = ivfIndexPath(s, dir)
      Similarity.ivfIndexKnn(
        s.read.parquet(path), embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "eval_ivf_recall" -> ((s, dir) => {
      // recall@10 of IVF (nprobe=4) against brute force, per query — the
      // CurationSpec floor as a first-class oracle-gated relation
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val queries = embs.filter(col("vec_id") < 20)
      val truth = Similarity.bruteForceKnn(embs, queries, "vec_id", "embedding", 10)
      val cand = Similarity.ivfKnn(embs, queries, "vec_id", "embedding", 10)
      Eval.recallAtK(truth, cand, "query_id", "neighbor_id")
        .orderBy(col("query_id"))
    }),

    "eval_rp_rank_tau" -> ((s, dir) => {
      // rank-fidelity eval: per query, Kendall tau between full-dim cosine
      // and JL-projected (16-dim ±1) cosine over the brute-force top-10 —
      // the number that says whether the cheap projection preserves ORDER,
      // not just distance bands
      import graft.functions.VectorFns
      import graft.operators.{Eval, Similarity}
      val embs = spread(t(s, dir, "embeddings"))
      val brute = Similarity.bruteForceKnn(
        embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 10)
      val rp = embs
        .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("qv"))
        .withColumn("rq", array((0 until 16).map(j =>
          VectorFns.dotQ(col("qv"), array((0 until 64).map(i =>
            lit(Similarity.hyperplaneWeight(42L, j, i))): _*))): _*))
        .withColumn("rn2", VectorFns.norm2Q(col("rq")))
        .select(col("vec_id"), col("rq"), col("rn2"))
      val scored = brute
        .join(rp.select(col("vec_id").as("query_id"),
          col("rq").as("qr"), col("rn2").as("qn")), "query_id")
        .join(rp.select(col("vec_id").as("neighbor_id"),
          col("rq").as("cr"), col("rn2").as("cn")), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("cos_full"),
          VectorFns.cosinePre(col("qr"), col("qn"), col("cr"), col("cn")).as("cos_rp"))
      Eval.kendallTau(scored, "query_id", "neighbor_id", "cos_full", "cos_rp")
        .orderBy(col("query_id"))
    }),

    "knn_pq" -> ((s, dir) => {
      // product quantization + ADC + exact re-rank: the compressed-domain
      // linear scan (32x smaller corpus bytes); shortlist fetches full
      // vectors for re-ranking
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.pqKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "knn_ivfpq" -> ((s, dir) => {
      // the faiss-style IVF+PQ serving architecture: Voronoi-cell prune,
      // ADC shortlist over codes, exact re-rank of the shortlist only
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.ivfPqKnn(embs, embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "emb_negatives" -> ((s, dir) => {
      // contrastive-training negative mining: per anchor, 3 deterministic
      // hash-ranked negatives from OUTSIDE the anchor's semantic cell
      val embs = spread(t(s, dir, "embeddings"))
      Similarity.negativeSample(embs, embs.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 3)
        .orderBy(col("anchor_id"), col("rank"))
    }),

    "layout_compacted" -> ((s, dir) => {
      // small-file compaction round-trip: fragment the table into 64 tiny
      // files, compact back to ~2000-row range-clustered files — content
      // must be byte-identical to the source table (plain-scan oracle)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_compact_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val docs = t(s, dir, "documents")
      docs.repartition(64).write.mode("overwrite").parquet(s"$tmp/frag")
      graft.operators.Layout.compact(
        s.read.parquet(s"$tmp/frag"), s"$tmp/compacted", "doc_id", 2000L)
      s.read.parquet(s"$tmp/compacted")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "layout_skipping" -> ((s, dir) => {
      // lakehouse-style zone-map data skipping: range-cluster documents into
      // ~50-row files, build a per-file min/max manifest, then answer a
      // doc_id range query opening ONLY the intersecting files (the pruning
      // ratio is pinned in PlanSpec); content must equal the plain filter
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_zonemap_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.Layout.compact(t(s, dir, "documents"), tmp, "doc_id", 50L)
      val zm = graft.operators.Layout.buildZoneMap(s, tmp, "doc_id")
      val (pruned, _, _) = graft.operators.Layout.skippingRead(
        s, tmp, zm, "doc_id", 100L, 300L)
      pruned.select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "layout_skipping_dist" -> ((s, dir) => {
      // manifest-as-DataFrame pruning: identical semantics to layout_skipping
      // but the prune decision runs as a distributed filter over the zone
      // map (only surviving file names are collected) — the path for
      // manifests beyond driver scale
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_zonemap_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_dist"
      graft.operators.Layout.compact(t(s, dir, "documents"), tmp, "doc_id", 50L)
      val zm = graft.operators.Layout.buildZoneMap(s, tmp, "doc_id")
      val (pruned, _, _) = graft.operators.Layout.skippingReadDistributed(
        s, tmp, zm, "doc_id", 100L, 300L)
      pruned.select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "layout_bloom_skipping" -> ((s, dir) => {
      // per-file Bloom index: the EQUALITY complement to the zone map —
      // cluster by source, then an equality probe opens only the files whose
      // bloom contains the probe bits (false positives re-filtered exactly)
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_bloom_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      graft.operators.Layout.compact(t(s, dir, "documents"), tmp, "source", 50L)
      val idx = graft.operators.Layout.buildBloomIndex(s, tmp, "source")
      val (pruned, _, _) = graft.operators.Layout.bloomSkippingRead(
        s, tmp, idx, "source", "src7")
      pruned.select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
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
    }),

    "graph_pagerank" -> ((s, dir) => {
      // damped PageRank (3 iterations, fixed-point 1e9) over the symmetrized
      // customer—supplier trade graph; integer arithmetic end to end makes
      // an iterative "ML-ish" graph computation exactly oracle-checkable
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("cust_node"),
          (col("l_suppkey") * 2 + 1).as("supp_node"))
      val edges = pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
        .union(pairs.select(col("supp_node").as("src"), col("cust_node").as("dst")))
      graft.operators.Graph.pagerank(edges, "src", "dst", iters = 3)
        .orderBy(col("node"))
    }),

    "graph_ppr" -> ((s, dir) => {
      // personalized PageRank: teleport restarts only onto a seed set (every
      // 10th customer) — the graph-expansion ranking behind seed-corpus
      // curation; same integer fixed point as graph_pagerank
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("cust_node"),
          (col("l_suppkey") * 2 + 1).as("supp_node"))
      val edges = pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
        .union(pairs.select(col("supp_node").as("src"), col("cust_node").as("dst")))
      val seeds = pairs.select(col("cust_node").as("node"))
        .filter(col("node") % 20 === 0).distinct()
      graft.operators.Graph.pagerankPersonalized(
        edges, "src", "dst", seeds, "node", iters = 3)
        .orderBy(col("node"))
    }),

    "graph_triangles" -> ((s, dir) => {
      // exact triangle counts with degeneracy orientation (wedge fanout
      // bounded O(sqrt(m)) per node). The gate graph is a sparse chord
      // graph over supplier keys (k -> k+1, k -> k+2, a kNN-similarity-graph
      // shape): the natural co-supply graph at this SF is the COMPLETE
      // graph on 1000 suppliers — every triple a triangle, 166M output
      // rows — which gates nothing and benchmarks only row explosion
      val sk = t(s, dir, "supplier").select(col("s_suppkey").cast("long").as("k"))
      val edges = sk.select(col("k").as("src"), (col("k") + 1).as("dst"))
        .union(sk.select(col("k").as("src"), (col("k") + 2).as("dst")))
        .join(sk.withColumnRenamed("k", "dst"), Seq("dst"), "left_semi")
      graft.operators.Graph.triangles(edges, "src", "dst")
        .orderBy(col("node"))
    }),

    "graph_kcore" -> ((s, dir) => {
      // 3 rounds of k=3 core peeling over the same sparse chord graph as
      // graph_triangles: the chain unravels from its ends, so every round
      // removes a fresh boundary layer — the cascade is what the gate pins
      val sk = t(s, dir, "supplier").select(col("s_suppkey").cast("long").as("k"))
      val edges = sk.select(col("k").as("src"), (col("k") + 1).as("dst"))
        .union(sk.select(col("k").as("src"), (col("k") + 2).as("dst")))
        .join(sk.withColumnRenamed("k", "dst"), Seq("dst"), "left_semi")
      graft.operators.Graph.kCoreRounds(edges, "src", "dst", k = 3, rounds = 3)
        .orderBy(col("node"))
    }),

    "feature_quantile_bins" -> ((s, dir) => {
      // equi-depth binning WITHOUT ntile's global sort: k-1 exact percentile
      // thresholds (one aggregate; Spark percentile == DuckDB quantile_cont
      // bit-for-bit on BIGINT) + a scan-speed comparison assignment
      graft.operators.Features.binByQuantiles(t(s, dir, "documents"), "n_chars", k = 8)
        .orderBy(col("bin"))
    }),

    "profile_documents" -> ((s, dir) => {
      // one-pass table profiler (ANALYZE TABLE for the corpus): per-column
      // row/null/exact-distinct counts and min/max, one scan via Expand
      graft.operators.Features.profile(
        t(s, dir, "documents"), Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("column"))
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

    "emb_meanpool" -> ((s, dir) => {
      // chunk -> document pooling: element-wise truncating integer mean of
      // the quantized member vectors per group (vec_id div 10 stands in for
      // the chunk->doc mapping) — the pooling step between chunk encoding
      // and document retrieval, oracle-exact like kmeans centroids
      graft.operators.Embeddings.meanPool(
        spread(t(s, dir, "embeddings")), expr("vec_id div 10"), "embedding")
        .orderBy(col("grp"), col("dim"))
    }),

    "emb_rp_project" -> ((s, dir) => {
      // Johnson-Lindenstrauss random projection 64 -> 16 dims: deterministic
      // md5-derived ±1 sign matrix as literals, integer dot products over
      // the quantized vectors — the cheap dim reduction in front of ANN
      graft.operators.Embeddings.randomProject(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding", outDims = 16)
        .orderBy(col("vec_id"), col("dim"))
    }),

    "events_value_outliers" -> ((s, dir) => {
      // per-type value anomalies via the sqrt-free z-test ((x-mean)^2 vs
      // z^2 * variance, all integer cents / dollar^2 units)
      graft.operators.Behavior.valueOutliers(
        events(s, dir), "event_id", "event_type", cents(col("value")))
        .select(col("id").as("event_id"), col("g").as("event_type"),
          col("xc").as("value_c"), col("dev_c"), col("is_outlier"))
        .orderBy(col("event_id"))
    }),

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

    "funnel_stages" -> ((s, dir) => {
      // strict-sequence conversion funnel view -> click -> purchase: per
      // user, each stage's earliest qualifying timestamp and how far they got
      graft.operators.Behavior.funnel(
        events(s, dir), "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .select(col("user").as("user_id"), col("ts_0").as("ts_view"),
          col("ts_1").as("ts_click"), col("ts_2").as("ts_purchase"),
          col("stage_reached"))
        .orderBy(col("user_id"))
    }),

    "funnel_stages_windowed" -> ((s, dir) => {
      // conversion-window funnel: each stage must land within 24 hours of
      // the previous one — the form a marketing/product funnel actually uses
      graft.operators.Behavior.funnel(
        events(s, dir), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), maxGap = Some("24 HOURS"))
        .select(col("user").as("user_id"), col("ts_0").as("ts_view"),
          col("ts_1").as("ts_click"), col("ts_2").as("ts_purchase"),
          col("stage_reached"))
        .orderBy(col("user_id"))
    }),

    "funnel_summary" -> ((s, dir) => {
      graft.operators.Behavior.funnelSummary(
        events(s, dir), "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .orderBy(col("stage"))
    }),

    "events_decayed_value" -> ((s, dir) => {
      // recency-weighted user value: exponential half-life decay as a
      // LITERAL quantized weight table (same longs embedded in the oracle
      // SQL), so no runtime pow enters the compared result
      graft.operators.Behavior.decayedValue(
        events(s, dir), "user_id", "ts", cents(col("value")), halfLifeDays = 7.0)
        .select(col("user").as("user_id"), col("score_scaled"), col("score"))
        .orderBy(col("user_id"))
    }),

    "events_top_paths" -> ((s, dir) => {
      // journey path mining: most common 3-step event sequences; one window
      // serves both lead offsets, top-k is TakeOrdered
      graft.operators.Behavior.topPaths(
        events(s, dir), "user_id", "event_type", "ts", "event_id", k = 20)
    }),

    "events_transitions" -> ((s, dir) => {
      // first-order journey transitions: P(next event type | current), lag
      // windows per user with (ts, event_id) tie-broken ordering
      graft.operators.Behavior.transitionMatrix(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
        .orderBy(col("from_type"), col("to_type"))
    }),

    "cohort_retention" -> ((s, dir) => {
      // classic retention triangle: cohort = first-activity day, retained at
      // offset d iff any event on cohort_day + d
      graft.operators.Behavior.retention(events(s, dir), "user_id", "ts")
        // DATE surfaces as python-object in the compare; timestamp is typed
        .withColumn("cohort_day", col("cohort_day").cast("timestamp"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    "events_rolling_7d" -> ((s, dir) => {
      // trailing-7-day activity features per user-day: daily aggregate
      // first, RANGE-frame window over the collapsed rows second
      graft.operators.Behavior.rollingDaily(
        events(s, dir), "user_id", "ts", cents(col("value")), windowDays = 7)
        .select(col("user").as("user_id"), col("day"), col("n_events"),
          col("value_cents"), col("n_events_window"), col("value_cents_window"))
        .orderBy(col("user_id"), col("day"))
    }),

    "basket_part_pairs" -> ((s, dir) => {
      // market-basket association: parts co-ordered more than chance — one
      // self equi-join on the order key (never cartesian), integer counts,
      // lift as a single division chain
      graft.operators.Basket.coOccurrence(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(100)
    }),

    "events_hourly_spikes" -> ((s, dir) => {
      // volume-spike monitor: each (type, hour) count z-tested against its
      // trailing 24 present hours, sqrt-free integer algebra throughout
      graft.operators.Behavior.hourlySpikes(events(s, dir), "ts", "event_type")
        .orderBy(col("hour"), col("event_type"))
    }),

    "drift_embedding_shift" -> ((s, dir) => {
      // embedding-cloud drift after a (deterministic) re-curation: L2 shift
      // between per-dim truncating-integer-mean centroids; sqrt is the one
      // non-integer op and IEEE requires it correctly rounded
      val embs = t(s, dir, "embeddings")
      graft.operators.Drift.embeddingShift(
        embs, embs.filter(col("vec_id") % 3 =!= 0), "embedding")
    }),

    "drift_ks" -> ((s, dir) => {
      // binning-free drift twin of drift_psi: exact two-sample KS distance
      // over the same deterministic re-curation — integer cumulative
      // differences, one final division
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.ksOf(docs, cur, "n_chars")
    }),

    "drift_psi" -> ((s, dir) => {
      // distribution-drift check between the corpus and a (deterministic)
      // length-biased re-curation: Population Stability Index over
      // fixed-width n_chars buckets, Laplace-smoothed, integer-exact
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.psiOf(docs, cur, "n_chars", width = 50L, buckets = 12)
    }),

    "drift_psi_by_lang" -> ((s, dir) => {
      // stratified drift: the same re-curation scored per language — the
      // monitor that answers WHICH slice moved, not just whether the mix did
      val docs = t(s, dir, "documents")
      val cur = docs.filter(col("n_chars") >= 150 || col("doc_id") % 3 === 0)
      graft.operators.Drift.psiByGroup(docs, cur, "lang", "n_chars",
        width = 50L, buckets = 12)
        .orderBy(col("lang"))
    }),

    "corpus_upsert" -> ((s, dir) => {
      // MERGE-style incremental maintenance: every 10th doc re-scored (text
      // revised), every 17th taken down, 20 new docs appended — one
      // anti-join + union, the lakehouse copy-on-write write path
      val docs = t(s, dir, "documents")
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
      graft.operators.Upsert.mergeUpsert(docs, mods.unionByName(ins), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "lake_versioned_merge" -> ((s, dir) => {
      // the corpus_upsert MERGE as a TRANSACTION: init documents as table v1,
      // commit the change set as a copy-on-write v2 (only key-intersecting
      // files rewritten, manifest renamed atomically), read v2 back — content
      // must equal the relational merge, through the manifest protocol
      val tmp = lakeTable(s, dir, "merge")
      graft.operators.VersionedTable.read(s, tmp, 2L).orderBy(col("doc_id"))
    }),

    "lake_time_travel" -> ((s, dir) => {
      // same table AFTER the v2 merge commit: reading at version 1 must
      // return the original corpus bit-exactly — old manifests reference
      // only immutable files, so history survives every later commit
      val tmp = lakeTable(s, dir, "travel")
      graft.operators.VersionedTable.read(s, tmp, 1L).orderBy(col("doc_id"))
    }),

    "emb_kmeans_refine" -> ((s, dir) => {
      // one Lloyd step over the deterministic IVF seeding: integer-mean
      // centroids keep even the TRAINED assignment oracle-exact
      graft.operators.Similarity.kmeansRefine(
        spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    }),

    "sample_weighted" -> ((s, dir) => {
      // sequential Poisson weighted sampling without replacement: 100 docs,
      // inclusion odds ~ n_chars, integer-exact priorities (no ln/pow)
      graft.operators.Sampling.weightedSample(
        t(s, dir, "documents"), "doc_id", "n_chars", 100)
        .select(col("doc_id"), col("n_chars"), col("priority"))
        .orderBy(col("priority"), col("doc_id"))
    }),

    "knn_ivf_appended" -> ((s, dir) => {
      // incremental index maintenance: base index + partition-local append
      // must probe bit-identically to the full rebuild (shares knn_ivf's
      // oracle); the untouched-cells property is pinned in OperatorsSpec
      val embs = spread(t(s, dir, "embeddings"))
      val path = ivfAppendedIndexPath(s, dir)
      Similarity.ivfIndexKnn(
        s.read.parquet(path), embs.filter(col("vec_id") < 20), "vec_id", "embedding", 5)
        .orderBy(col("query_id"), col("rank"))
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

    "curation_quality_band" -> ((s, dir) => {
      // per-lang quantile-band filter: drop the junk tail and the
      // suspiciously-perfect top relative to each group's own distribution
      TextAnalysis.qualityBand(spread(t(s, dir, "documents")), "doc_id", "text",
        "lang", lo = 0.1, hi = 0.9)
        .orderBy(col("doc_id"))
    }),

    "text_langid" -> ((s, dir) => {
      TextAnalysis.withLangId(spread(t(s, dir, "documents")), "doc_id", "text")
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

    "text_pii_redact" -> ((s, dir) => {
      TextAnalysis.withPiiRedaction(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
          col("n_numbers").cast("long").as("n_numbers"), col("redacted"))
        .orderBy(col("doc_id"))
    }),

    "layout_zorder" -> ((s, dir) => {
      // Morton z-values over (partkey, suppkey) rank buckets — the clustering
      // key writeZOrdered lays files out by. Exact ntile buckets here for the
      // oracle; the write path uses approx boundaries (no global window).
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
      val ties = Seq(col("l_orderkey"), col("l_linenumber"))
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        Layout.zValue(Seq(
          Layout.rankBucket(col("l_partkey"), ties, 256),
          Layout.rankBucket(col("l_suppkey"), ties, 256)), bits = 8).as("zval"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
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

    // --- corpus curation: repetition/salience/contamination/stats ---
    "text_repetition" -> ((s, dir) => {
      TextAnalysis.withRepetition(spread(t(s, dir, "documents")), "doc_id", "text")
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

    "dedup_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking: boundaries from a 16-char rolling window
      // hash (mod 64), so edited near-copies still share chunks; per doc,
      // how many chunks appear in other documents
      graft.operators.Dedup.cdcSharedChunks(
        spread(t(s, dir, "documents")), "doc_id", "text")
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

    "text_contamination" -> ((s, dir) => {
      // decontamination pass: benchmark = every 37th doc, corpus = the rest
      val docs = spread(t(s, dir, "documents"))
      TextAnalysis.ngramOverlap(
        docs.filter(col("doc_id") % 37 =!= 0), docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
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

    // --- embedding maintenance ---
    "emb_normalized" -> ((s, dir) => {
      graft.operators.Embeddings
        .normalizedQ(spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))
    }),

    "emb_int8" -> ((s, dir) => {
      graft.operators.Embeddings
        .quantizeInt8(spread(t(s, dir, "embeddings")), "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))
    }),

    // --- multimodal plumbing ---
    "mm_binary_meta" -> ((s, dir) => {
      Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("magic"), col("sha256"))
        .orderBy(col("doc_id"))
    }),

    "mm_decode_stub" -> ((s, dir) => {
      Multimodal.decodeStub(
        Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("channels"))
        .orderBy(col("doc_id"))
    }),

    "mm_resize_plan" -> ((s, dir) => {
      // integer-exact resize geometry (fit-within-224, no upscale) over the
      // decoded dims — the auditable planning half of a resize pipeline
      Multimodal.resizePlan(Multimodal.decodeStub(
        Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text"),
        "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_frame_sample" -> ((s, dir) => {
      Multimodal.frameSample(
        Multimodal.withBinaryMeta(spread(t(s, dir, "documents")), "doc_id", "text"), "doc_id", 4)
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    "mm_decode_bmp" -> ((s, dir) => {
      // REAL pixel decode: deterministic 24-bit BMP fixtures (dims and
      // channel values are integer functions of doc_id/x/y), decoded from
      // the BYTES by the pure-JVM parser; the oracle recomputes every stat
      // from the FORMULA via a range cross join — any header/stride/flip/
      // BGR defect in the decoder breaks the hash
      Multimodal.decodeBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_resize_bmp" -> ((s, dir) => {
      // REAL pixel resampling: nearest-neighbor fit-within-16 downscale of
      // the BMP fixtures, all-integer source mapping (x*srcW div outW) —
      // the oracle recomputes the resampled image's stats from the pixel
      // formula at the sampled coordinates
      Multimodal.resampleBmp(
        Multimodal.bmpFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

    "mm_decode_wav" -> ((s, dir) => {
      // REAL audio decode: deterministic PCM16 RIFF/WAVE fixtures (frame
      // count, channels, rate and every sample are integer functions of
      // doc_id/frame/channel), decoded from the BYTES by the pure-JVM
      // chunk-walking parser; the oracle recomputes every stat from the
      // FORMULA — any offset/sign/width/interleave defect breaks the hash
      Multimodal.decodeWav(
        Multimodal.wavFixtures(spread(t(s, dir, "documents")), "doc_id"), "doc_id")
        .orderBy(col("doc_id"))
    }),

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
      entry(s)
    }))

  // ------------------------------------------------------------- oracle

  /** Shared HLL oracle (direct sketch == lossless register-max rollup). */
  private val hllDistinctSql =
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
    "dedup_simhash_sql" -> oracleSqlBase("dedup_simhash"),

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

    // the zone-map pruned read must return exactly the plain filter's rows
    "layout_skipping" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE doc_id >= 100 AND doc_id <= 300 ORDER BY doc_id""".stripMargin,

    "layout_skipping_dist" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE doc_id >= 100 AND doc_id <= 300 ORDER BY doc_id""".stripMargin,

    // ...and so must the bloom-pruned equality read
    "layout_bloom_skipping" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE source = 'src7' ORDER BY doc_id""".stripMargin,

    // deterministic HLL: registers from the 40-bit md5 hash (5 index bits /
    // 35 rank bits), integer-scaled harmonic mean, alpha_32 = 0.697; the
    // m = 32 power of two keeps the alpha*m^2*2^36 numerator bit-identical
    "sketch_hll_distinct" -> hllDistinctSql,
    // register max is associative: the rolled-up sketch must be bit-identical
    // to sketching the coarse group directly — shares the direct oracle
    "sketch_hll_rollup" -> hllDistinctSql,

    // fixed-point PageRank, 3 unrolled iterations — every step integer
    // division + order-free integer sums, so the ranks are bit-identical
    "graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), e AS (
        |  SELECT cn AS src, sn AS dst FROM pairs
        |  UNION ALL SELECT sn AS src, cn AS dst FROM pairs
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
        |)
        |SELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM r3 ORDER BY node""".stripMargin,

    // personalized variant: same fixed point, restart vector on the seed set
    "graph_ppr" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), e AS (
        |  SELECT cn AS src, sn AS dst FROM pairs
        |  UNION ALL SELECT sn AS src, cn AS dst FROM pairs
        |), deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |seeds AS (SELECT DISTINCT cn AS node FROM pairs WHERE cn % 20 = 0),
        |ns AS (SELECT count(*) AS ns FROM seeds),
        |r0 AS (
        |  SELECT src AS node,
        |    CASE WHEN src IN (SELECT node FROM seeds)
        |      THEN 1000000000 // (SELECT ns FROM ns) ELSE 0 END AS rank
        |  FROM deg),
        |r1 AS (
        |  SELECT nodes.src AS node,
        |    CASE WHEN nodes.src IN (SELECT node FROM seeds)
        |      THEN 150000000 // (SELECT ns FROM ns) ELSE 0 END
        |    + 85 * coalesce(sum(r0.rank // d2.deg), 0) // 100 AS rank
        |  FROM deg nodes
        |  LEFT JOIN e ON e.dst = nodes.src
        |  LEFT JOIN deg d2 ON d2.src = e.src
        |  LEFT JOIN r0 ON r0.node = e.src
        |  GROUP BY nodes.src
        |), r2 AS (
        |  SELECT nodes.src AS node,
        |    CASE WHEN nodes.src IN (SELECT node FROM seeds)
        |      THEN 150000000 // (SELECT ns FROM ns) ELSE 0 END
        |    + 85 * coalesce(sum(r1.rank // d2.deg), 0) // 100 AS rank
        |  FROM deg nodes
        |  LEFT JOIN e ON e.dst = nodes.src
        |  LEFT JOIN deg d2 ON d2.src = e.src
        |  LEFT JOIN r1 ON r1.node = e.src
        |  GROUP BY nodes.src
        |), r3 AS (
        |  SELECT nodes.src AS node,
        |    CASE WHEN nodes.src IN (SELECT node FROM seeds)
        |      THEN 150000000 // (SELECT ns FROM ns) ELSE 0 END
        |    + 85 * coalesce(sum(r2.rank // d2.deg), 0) // 100 AS rank
        |  FROM deg nodes
        |  LEFT JOIN e ON e.dst = nodes.src
        |  LEFT JOIN deg d2 ON d2.src = e.src
        |  LEFT JOIN r2 ON r2.node = e.src
        |  GROUP BY nodes.src
        |)
        |SELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM r3 ORDER BY node""".stripMargin,

    "graph_triangles" ->
      """WITH sk AS (SELECT s_suppkey AS k FROM supplier),
        |e0 AS (
        |  SELECT k AS u, k + 1 AS v FROM sk WHERE k + 1 IN (SELECT k FROM sk)
        |  UNION ALL
        |  SELECT k AS u, k + 2 AS v FROM sk WHERE k + 2 IN (SELECT k FROM sk)
        |),
        |und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM e0),
        |deg AS (
        |  SELECT n, count(*) AS deg FROM (
        |    SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und) q GROUP BY 1
        |),
        |o AS (
        |  SELECT
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b)
        |      THEN und.a ELSE und.b END AS s,
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND und.a < und.b)
        |      THEN und.b ELSE und.a END AS t
        |  FROM und JOIN deg da ON da.n = und.a JOIN deg db ON db.n = und.b
        |),
        |tri AS (
        |  SELECT e1.s AS x, e1.t AS y, e2.t AS z
        |  FROM o e1 JOIN o e2 ON e1.t = e2.s
        |  JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t
        |)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |  SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri) q
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_kcore" ->
      """WITH sk AS (SELECT s_suppkey AS k FROM supplier),
        |base AS (
        |  SELECT k AS a, k + 1 AS b FROM sk WHERE k + 1 IN (SELECT k FROM sk)
        |  UNION ALL
        |  SELECT k AS a, k + 2 AS b FROM sk WHERE k + 2 IN (SELECT k FROM sk)
        |),
        |e0 AS (SELECT a, b FROM base UNION SELECT b, a FROM base),
        |k1 AS (SELECT a FROM e0 GROUP BY 1 HAVING count(*) >= 3),
        |e1 AS (SELECT e0.a, e0.b FROM e0
        |       JOIN k1 ka ON ka.a = e0.a JOIN k1 kb ON kb.a = e0.b),
        |k2 AS (SELECT a FROM e1 GROUP BY 1 HAVING count(*) >= 3),
        |e2 AS (SELECT e1.a, e1.b FROM e1
        |       JOIN k2 ka ON ka.a = e1.a JOIN k2 kb ON kb.a = e1.b),
        |k3 AS (SELECT a FROM e2 GROUP BY 1 HAVING count(*) >= 3),
        |e3 AS (SELECT e2.a, e2.b FROM e2
        |       JOIN k3 ka ON ka.a = e2.a JOIN k3 kb ON kb.a = e2.b)
        |SELECT CAST(a AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e3 GROUP BY 1 ORDER BY node""".stripMargin,

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

    "q25_hourly_cms_stream" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type FROM events
        |), fam AS (SELECT range AS family FROM range(0, 4))
        |SELECT h.hour, CAST(f.family AS BIGINT) AS family,
        |  ('0x' || substr(md5(CAST(f.family // 2 AS VARCHAR) || ':' || h.event_type),
        |    1 + 15 * (f.family % 2), 15))::BIGINT % 16 AS bucket,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM h CROSS JOIN fam f
        |GROUP BY 1, 2, 3 ORDER BY hour, family, bucket""".stripMargin,

    "emb_meanpool" ->
      """WITH q AS (
        |  SELECT vec_id // 10 AS grp,
        |    [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), e AS (
        |  SELECT grp, d.range AS pos, qv[d.range + 1] AS x
        |  FROM q CROSS JOIN range(0, 64) d
        |)
        |SELECT grp, CAST(pos + 1 AS BIGINT) AS dim,
        |  CAST(sum(x) AS BIGINT) // count(*) AS pooled
        |FROM e GROUP BY 1, 2 ORDER BY grp, dim""".stripMargin,

    "emb_rp_project" ->
      """WITH w AS (
        |  SELECT j.range AS j, d.range AS d,
        |    CASE WHEN ('0x' || substr(md5('lsh:42:' || j.range || ':' || d.range), 1, 15))::BIGINT & 1 = 1
        |         THEN 1 ELSE -1 END AS wt
        |  FROM range(0, 16) j, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |)
        |SELECT q.vec_id, CAST(w.j + 1 AS BIGINT) AS dim,
        |  CAST(sum(w.wt * q.qv[w.d + 1]) AS BIGINT) AS y
        |FROM q CROSS JOIN w GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin,

    "events_value_outliers" ->
      """WITH b AS (
        |  SELECT event_id AS id, event_type AS g,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS xc FROM events
        |), m AS (
        |  SELECT g, count(*) AS n, CAST(sum(xc) AS BIGINT) // count(*) AS mean_c
        |  FROM b GROUP BY 1
        |), d AS (
        |  SELECT b.id, b.g, b.xc, b.xc - m.mean_c AS dev_c,
        |    (b.xc - m.mean_c) * (b.xc - m.mean_c) // 10000 AS dev_d2
        |  FROM b JOIN m USING (g)
        |), v AS (
        |  SELECT g, CAST(sum(dev_d2) AS BIGINT) // count(*) AS var_d2 FROM d GROUP BY 1
        |)
        |SELECT d.id AS event_id, d.g AS event_type, d.xc AS value_c, d.dev_c,
        |  CAST(CASE WHEN d.dev_d2 > 9 * v.var_d2 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM d JOIN v USING (g) ORDER BY event_id""".stripMargin,

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

    "funnel_stages" ->
      """WITH s0 AS (
        |  SELECT user_id AS u, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT s0.u, s0.ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.u AND e.event_type = 'click' AND e.ts > s0.ts_0
        |  GROUP BY 1, 2
        |), s2 AS (
        |  SELECT s1.u, s1.ts_0, s1.ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.u AND e.event_type = 'purchase' AND e.ts > s1.ts_1
        |  GROUP BY 1, 2, 3
        |)
        |SELECT u AS user_id, ts_0 AS ts_view, ts_1 AS ts_click, ts_2 AS ts_purchase,
        |  CAST(1 + CASE WHEN ts_1 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN ts_2 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage_reached
        |FROM s2 ORDER BY user_id""".stripMargin,

    "funnel_stages_windowed" ->
      """WITH s0 AS (
        |  SELECT user_id AS u, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT s0.u, s0.ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.u AND e.event_type = 'click' AND e.ts > s0.ts_0
        |    AND e.ts <= s0.ts_0 + INTERVAL 24 HOURS
        |  GROUP BY 1, 2
        |), s2 AS (
        |  SELECT s1.u, s1.ts_0, s1.ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.u AND e.event_type = 'purchase' AND e.ts > s1.ts_1
        |    AND e.ts <= s1.ts_1 + INTERVAL 24 HOURS
        |  GROUP BY 1, 2, 3
        |)
        |SELECT u AS user_id, ts_0 AS ts_view, ts_1 AS ts_click, ts_2 AS ts_purchase,
        |  CAST(1 + CASE WHEN ts_1 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN ts_2 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage_reached
        |FROM s2 ORDER BY user_id""".stripMargin,

    "funnel_summary" ->
      """WITH s0 AS (
        |  SELECT user_id AS u, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT s0.u, s0.ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.u AND e.event_type = 'click' AND e.ts > s0.ts_0
        |  GROUP BY 1, 2
        |), s2 AS (
        |  SELECT s1.u, s1.ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.u AND e.event_type = 'purchase' AND e.ts > s1.ts_1
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |  CAST(count(*) AS BIGINT) AS n_users FROM s2
        |UNION ALL SELECT 2, 'click', CAST(count(ts_1) AS BIGINT) FROM s2
        |UNION ALL SELECT 3, 'purchase', CAST(count(ts_2) AS BIGINT) FROM s2
        |ORDER BY stage""".stripMargin,

    // the decay weight table is generated from the SAME Scala constants the
    // Spark plan embeds — the curve is data, not computation, in both engines
    "events_decayed_value" ->
      s"""WITH w AS (
         |  SELECT [${graft.operators.Behavior.decayWeights(7.0,
              graft.operators.Behavior.defaultMaxAge(7.0)).mkString(", ")}] AS wts
         |), ref AS (
         |  SELECT max(CAST(ts AS DATE)) AS ref_day FROM events
         |)
         |SELECT e.user_id,
         |  CAST(sum(CAST(floor(e.value*100 + 0.5) AS BIGINT)
         |    * w.wts[least(ref.ref_day - CAST(e.ts AS DATE),
         |        ${graft.operators.Behavior.defaultMaxAge(7.0)}) + 1]) AS BIGINT) AS score_scaled,
         |  CAST(CAST(sum(CAST(floor(e.value*100 + 0.5) AS BIGINT)
         |    * w.wts[least(ref.ref_day - CAST(e.ts AS DATE),
         |        ${graft.operators.Behavior.defaultMaxAge(7.0)}) + 1]) AS BIGINT) AS DOUBLE)
         |    / 1e9 / 100.0 AS score
         |FROM events e, ref, w
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_top_paths" ->
      """WITH seq3 AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step3
        |  FROM events
        |)
        |SELECT step1, step2, step3, count(*) AS n_paths
        |FROM seq3 WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20""".stripMargin,

    "events_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), pairs AS (
        |  SELECT from_type, to_type, count(*) AS n_ab
        |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_type, CAST(sum(n_ab) AS BIGINT) AS n_a FROM pairs GROUP BY 1
        |)
        |SELECT p.from_type, p.to_type, p.n_ab, t.n_a,
        |  CAST(p.n_ab AS DOUBLE) / t.n_a AS p
        |FROM pairs p JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "cohort_retention" ->
      """WITH c AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events
        |)
        |SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day,
        |  CAST(a.act_day - c.cohort_day AS BIGINT) AS day_offset,
        |  count(*) AS n_users
        |FROM c JOIN a USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // streaming HLL: same register/estimate math as sketch_hll_distinct but
    // per event-hour over user_id
    "q21_hourly_distinct_stream" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10))::BIGINT AS hv
        |  FROM events
        |), reg AS (
        |  SELECT hour, hv >> 35 AS bucket,
        |    max(CASE WHEN (hv & 34359738367) = 0 THEN 36
        |             ELSE 36 - length(bin(hv & 34359738367)) END) AS register
        |  FROM h GROUP BY 1, 2
        |), agg AS (
        |  SELECT hour, count(*) AS v_filled,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(36 - register AS INT)) AS BIGINT)
        |      + (32 - count(*)) * 68719476736 AS s_scaled
        |  FROM reg GROUP BY 1
        |)
        |SELECT hour, CAST(v_filled AS BIGINT) AS v_filled,
        |  CAST(s_scaled AS BIGINT) AS s_scaled,
        |  floor((CASE WHEN 0.697 * 1024 * 68719476736 / s_scaled <= 80.0 AND v_filled < 32
        |              THEN 32.0 * ln(32.0 / CAST(32 - v_filled AS DOUBLE))
        |              ELSE 0.697 * 1024 * 68719476736 / s_scaled END) * 1e6 + 0.5) / 1e6
        |    AS est_distinct
        |FROM agg ORDER BY hour""".stripMargin,

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
        |FROM d ORDER BY doc_id""".stripMargin,

    "events_rolling_7d" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day, n_events, value_cents,
        |  CAST(sum(n_events) OVER w AS BIGINT) AS n_events_window,
        |  CAST(sum(value_cents) OVER w AS BIGINT) AS value_cents_window
        |FROM daily
        |WINDOW w AS (PARTITION BY user_id ORDER BY day - DATE '1970-01-01'
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,

    "basket_part_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |n AS (SELECT count(DISTINCT b) AS n FROM bi),
        |ic AS (SELECT i, count(*) AS n_i FROM bi GROUP BY 1),
        |p AS (
        |  SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab
        |  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT p.item_a, p.item_b, p.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
        |  CAST((SELECT n FROM n) AS DOUBLE) * p.n_ab / ia.n_i / ib.n_i AS lift
        |FROM p JOIN ic ia ON ia.i = p.item_a JOIN ic ib ON ib.i = p.item_b
        |ORDER BY lift DESC, item_a, item_b LIMIT 100""".stripMargin,

    "events_hourly_spikes" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), win AS (
        |  SELECT hour, event_type, n,
        |    count(*) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS m,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s,
        |    sum(n * n) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS q
        |  FROM hourly
        |)
        |SELECT hour, event_type, n, CAST(COALESCE(m, 0) AS BIGINT) AS m,
        |  CAST(CASE WHEN m >= 6 AND (m*n - s) * (m*n - s) > 9 * (m*q - s*s)
        |            THEN CASE WHEN m*n - s > 0 THEN 1 WHEN m*n - s < 0 THEN -1 ELSE 0 END
        |            ELSE 0 END AS BIGINT) AS spike
        |FROM win ORDER BY hour, event_type""".stripMargin,

    "drift_embedding_shift" ->
      """WITH b AS (
        |  SELECT [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), c AS (
        |  SELECT [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings WHERE vec_id % 3 != 0
        |), bm AS (
        |  SELECT d.range AS d, CAST(sum(qv[d.range + 1]) AS BIGINT) // count(*) AS m1
        |  FROM b CROSS JOIN range(0, 64) d GROUP BY 1
        |), cm AS (
        |  SELECT d.range AS d, CAST(sum(qv[d.range + 1]) AS BIGINT) // count(*) AS m2
        |  FROM c CROSS JOIN range(0, 64) d GROUP BY 1
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_dims,
        |  CAST(sum((m1 - m2) * (m1 - m2)) AS BIGINT) AS shift_sq_scaled,
        |  sqrt(CAST(CAST(sum((m1 - m2) * (m1 - m2)) AS BIGINT) AS DOUBLE)) / 1000000.0 AS shift_l2
        |FROM bm JOIN cm USING (d)""".stripMargin,

    "drift_ks" ->
      """WITH b AS (SELECT n_chars AS v FROM documents),
        |c AS (SELECT n_chars AS v FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0),
        |u AS (
        |  SELECT v, CAST(sum(c1) AS BIGINT) AS c1, CAST(sum(c2) AS BIGINT) AS c2 FROM (
        |    SELECT v, 1 AS c1, 0 AS c2 FROM b
        |    UNION ALL SELECT v, 0 AS c1, 1 AS c2 FROM c
        |  ) q GROUP BY 1
        |), cum AS (
        |  SELECT v,
        |    sum(c1) OVER (ORDER BY v) AS cum1,
        |    sum(c2) OVER (ORDER BY v) AS cum2,
        |    sum(c1) OVER () AS n1,
        |    sum(c2) OVER () AS n2
        |  FROM u
        |)
        |SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
        |  CAST(max(abs(n2*cum1 - n1*cum2)) AS BIGINT) AS d_num,
        |  CAST(max(abs(n2*cum1 - n1*cum2)) AS DOUBLE)
        |    / CAST(max(n1) * max(n2) AS DOUBLE) AS ks_d
        |FROM cum""".stripMargin,

    "drift_psi" ->
      """WITH bks AS (SELECT range AS bucket FROM range(0, 12)),
        |b AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_base
        |  FROM documents GROUP BY 1
        |), c AS (
        |  SELECT greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_cur
        |  FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0 GROUP BY 1
        |), j AS (
        |  SELECT bks.bucket, coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM bks LEFT JOIN b USING (bucket) LEFT JOIN c USING (bucket)
        |), tot AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb, CAST(sum(n_cur) AS BIGINT) AS tc FROM j
        |), terms AS (
        |  SELECT tb, tc,
        |    CAST(floor(ln(CAST(n_base + 1 AS DOUBLE) * CAST(tc + 12 AS DOUBLE)
        |      / (CAST(n_cur + 1 AS DOUBLE) * CAST(tb + 12 AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS qln,
        |    CAST(floor((CAST(n_base + 1 AS DOUBLE) / CAST(tb + 12 AS DOUBLE)
        |      - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 12 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS qpq
        |  FROM j, tot
        |)
        |SELECT tb AS n_base, tc AS n_cur,
        |  CAST(sum(qpq * qln) AS BIGINT) AS psi_scaled,
        |  CAST(CAST(sum(qpq * qln) AS BIGINT) AS DOUBLE) / 1e15 AS psi
        |FROM terms GROUP BY 1, 2""".stripMargin,

    "drift_psi_by_lang" ->
      """WITH bks AS (SELECT range AS bucket FROM range(0, 12)),
        |gs AS (
        |  SELECT DISTINCT lang FROM documents
        |  UNION
        |  SELECT DISTINCT lang FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0
        |),
        |frame AS (SELECT gs.lang, bks.bucket FROM gs CROSS JOIN bks),
        |b AS (
        |  SELECT lang, greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_base
        |  FROM documents GROUP BY 1, 2
        |), c AS (
        |  SELECT lang, greatest(least(CAST(floor(n_chars / 50) AS BIGINT), 11), 0) AS bucket,
        |    count(*) AS n_cur
        |  FROM documents WHERE n_chars >= 150 OR doc_id % 3 = 0 GROUP BY 1, 2
        |), j AS (
        |  SELECT frame.lang, frame.bucket,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |  FROM frame LEFT JOIN b USING (lang, bucket) LEFT JOIN c USING (lang, bucket)
        |), tot AS (
        |  SELECT lang, CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_cur) AS BIGINT) AS tc FROM j GROUP BY 1
        |), terms AS (
        |  SELECT j.lang, tot.tb, tot.tc,
        |    CAST(floor(ln(CAST(n_base + 1 AS DOUBLE) * CAST(tc + 12 AS DOUBLE)
        |      / (CAST(n_cur + 1 AS DOUBLE) * CAST(tb + 12 AS DOUBLE))) * 1e9 + 0.5) AS BIGINT) AS qln,
        |    CAST(floor((CAST(n_base + 1 AS DOUBLE) / CAST(tb + 12 AS DOUBLE)
        |      - CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 12 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS qpq
        |  FROM j JOIN tot USING (lang)
        |)
        |SELECT lang, tb AS n_base, tc AS n_cur,
        |  CAST(sum(qpq * qln) AS BIGINT) AS psi_scaled,
        |  CAST(CAST(sum(qpq * qln) AS BIGINT) AS DOUBLE) / 1e15 AS psi
        |FROM terms GROUP BY 1, 2, 3 ORDER BY lang""".stripMargin,

    "corpus_upsert" ->
      """WITH changes AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN text ELSE text || ' v2' END AS text,
        |    lang, source, n_chars,
        |    CASE WHEN doc_id % 17 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM documents WHERE doc_id % 17 = 0 OR doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 100000, 'new ' || text, lang, source, n_chars, 'upsert'
        |  FROM documents WHERE doc_id < 20
        |)
        |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM changes)
        |UNION ALL
        |SELECT doc_id, text, lang, source, n_chars FROM changes WHERE op = 'upsert'
        |ORDER BY doc_id""".stripMargin,

    // same MERGE semantics as corpus_upsert — but executed through the
    // versioned-manifest commit protocol (v1 init + copy-on-write v2)
    "lake_versioned_merge" ->
      """WITH changes AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN text ELSE text || ' v2' END AS text,
        |    lang, source, n_chars,
        |    CASE WHEN doc_id % 17 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM documents WHERE doc_id % 17 = 0 OR doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 100000, 'new ' || text, lang, source, n_chars, 'upsert'
        |  FROM documents WHERE doc_id < 20
        |)
        |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM changes)
        |UNION ALL
        |SELECT doc_id, text, lang, source, n_chars FROM changes WHERE op = 'upsert'
        |ORDER BY doc_id""".stripMargin,

    // reading v1 AFTER the v2 merge commit must return the original corpus
    "lake_time_travel" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    // one Lloyd refinement step: initial cells from the md5 centroids (same
    // CTEs as knn_ivf), new centroids = per-(cell, dim) truncating integer
    // mean, re-assignment by max dot (ties to the smaller cell id)
    "emb_kmeans_refine" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), dots0 AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY 1, 2
        |), a0 AS (
        |  SELECT vec_id, c AS cell0 FROM (
        |    SELECT vec_id, c,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
        |    FROM dots0) WHERE rn = 1
        |), cent AS (
        |  SELECT a0.cell0 AS cell, d.range AS d,
        |    CAST(sum(q.qv[d.range + 1]) AS BIGINT) // count(*) AS wt
        |  FROM q JOIN a0 USING (vec_id) CROSS JOIN range(0, 64) d
        |  GROUP BY 1, 2
        |), dots1 AS (
        |  SELECT q.vec_id, cent.cell AS c, sum(cent.wt * q.qv[cent.d + 1]) AS dot
        |  FROM q CROSS JOIN cent GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, c AS cell1 FROM (
        |    SELECT vec_id, c,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
        |    FROM dots1) WHERE rn = 1
        |)
        |SELECT a0.vec_id, CAST(a0.cell0 AS BIGINT) AS cell_init,
        |  CAST(a1.cell1 AS BIGINT) AS cell_refined
        |FROM a0 JOIN a1 USING (vec_id) ORDER BY vec_id""".stripMargin,

    // sequential Poisson sampling: integer priorities (hash div weight) make
    // the weighted draw itself hash-comparable
    "sample_weighted" ->
      """SELECT doc_id, n_chars,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT // n_chars
        |    AS priority
        |FROM documents WHERE n_chars >= 1
        |ORDER BY priority, doc_id LIMIT 100""".stripMargin)

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE)/10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) * (100 + CAST(floor(l_tax*100 + 0.5) AS BIGINT))) AS DOUBLE)/1000000.0 AS sum_charge
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q3_top_orders_per_customer" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,

    "q4_filter_pushdown" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity > 40
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q5_top10_orders" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",

    "q6_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q7_distinct_parts_per_flag" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q8_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q9_events_json_props" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(json_extract_string(props, '$.k')) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q11_events_hourly_stream" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q27_enriched_nation_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |  CAST(c_nationkey AS BIGINT) AS nation, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events JOIN customer ON c_custkey = user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q12_rollup_order_stats" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    // q13's sessions aggregated to per-user engagement features
    "q22_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) <= INTERVAL 30 MINUTE
        |         THEN 0 ELSE 1 END AS new_sess
        |  FROM e
        |), grp AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM marked
        |), sessions AS (
        |  SELECT user_id, count(*) AS n_events,
        |    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |  FROM grp GROUP BY user_id, sess
        |)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
        |  CAST(max(n_events) AS BIGINT) AS max_session_events,
        |  CAST(CAST(sum(dur_us) AS BIGINT) AS DOUBLE) / count(*) / 1e6 AS avg_session_secs
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q23_pivot_status_by_priority" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT_n",
        |  coalesce(CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) FILTER (o_orderpriority = '1-URGENT') AS DOUBLE)/100.0, 0.0) AS "1-URGENT_rev",
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH_n",
        |  coalesce(CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) FILTER (o_orderpriority = '2-HIGH') AS DOUBLE)/100.0, 0.0) AS "2-HIGH_rev",
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM_n",
        |  coalesce(CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) FILTER (o_orderpriority = '3-MEDIUM') AS DOUBLE)/100.0, 0.0) AS "3-MEDIUM_rev",
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED_n",
        |  coalesce(CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS DOUBLE)/100.0, 0.0) AS "4-NOT SPECIFIED_rev",
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW_n",
        |  coalesce(CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) FILTER (o_orderpriority = '5-LOW') AS DOUBLE)/100.0, 0.0) AS "5-LOW_rev"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_cube_order_stats" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,

    "q13_user_sessions" ->
      """WITH e AS (
        |  -- TIMESTAMP_NS -> microsecond TIMESTAMP (same truncation Spark applies)
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) <= INTERVAL 30 MINUTE
        |         THEN 0 ELSE 1 END AS new_sess
        |  FROM e
        |), grp AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM marked
        |)
        |SELECT user_id, count(*) AS n_events, min(ts) AS started, max(ts) AS ended
        |FROM grp GROUP BY user_id, sess ORDER BY user_id, started""".stripMargin,

    // q13's gaps-and-islands sessions, minus those still OPEN at the final
    // watermark: with delay 0 the watermark lands on max(ts) in ms, and a
    // session's event-time timeout (armed at ended_ms + gap_ms + 1) fires
    // only if strictly before it — the exact Spark timeout rule
    "q14_user_sessions_stream" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) <= INTERVAL 30 MINUTE
        |         THEN 0 ELSE 1 END AS new_sess
        |  FROM e
        |), grp AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM marked
        |), sessions AS (
        |  SELECT user_id, count(*) AS n_events, min(ts) AS started, max(ts) AS ended
        |  FROM grp GROUP BY user_id, sess
        |)
        |SELECT user_id, n_events, started, ended FROM sessions
        |WHERE epoch_us(ended) // 1000 + 30 * 60 * 1000 + 1
        |      < (SELECT max(epoch_us(CAST(ts AS TIMESTAMP)) // 1000) FROM e)
        |ORDER BY user_id, started""".stripMargin,

    "q15_events_asof_orders" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ot, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |  FROM orders
        |), o1 AS (
        |  SELECT o_custkey, ot, o_orderkey, o_totalprice FROM o WHERE rn = 1
        |)
        |SELECT e.event_id, e.user_id, e.ts, o1.o_orderkey, o1.o_totalprice
        |FROM e ASOF LEFT JOIN o1 ON e.user_id = o1.o_custkey AND e.ts >= o1.ot
        |ORDER BY event_id""".stripMargin,

    "q26_events_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ot, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |  FROM orders
        |), o1 AS (
        |  SELECT o_custkey, ot, o_orderkey, o_totalprice FROM o WHERE rn = 1
        |), nxt AS (
        |  SELECT e.event_id, min(o1.ot) AS nt
        |  FROM e LEFT JOIN o1 ON o1.o_custkey = e.user_id AND o1.ot >= e.ts
        |  GROUP BY e.event_id
        |)
        |SELECT e.event_id, e.user_id, e.ts, o1.o_orderkey, o1.o_totalprice
        |FROM e JOIN nxt USING (event_id)
        |LEFT JOIN o1 ON o1.o_custkey = e.user_id AND o1.ot = nxt.nt
        |ORDER BY event_id""".stripMargin,

    "q20_purchase_attribution_outer_stream" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), wm AS (
        |  SELECT least(
        |    (SELECT max(epoch_us(ts) // 1000) FROM e WHERE event_type = 'purchase'),
        |    (SELECT max(epoch_us(ts) // 1000) FROM e WHERE event_type = 'click')) AS w_ms
        |), matched AS (
        |  SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |    p.ts AS purchase_ts, c.ts AS click_ts
        |  FROM e p JOIN e c
        |    ON p.event_type = 'purchase' AND c.event_type = 'click'
        |   AND c.user_id = p.user_id
        |   AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |), unmatched AS (
        |  SELECT p.event_id AS purchase_id, CAST(NULL AS BIGINT) AS click_id, p.user_id,
        |    p.ts AS purchase_ts, CAST(NULL AS TIMESTAMP) AS click_ts
        |  FROM e p, wm
        |  WHERE p.event_type = 'purchase'
        |    AND p.event_id NOT IN (SELECT purchase_id FROM matched)
        |    AND epoch_us(p.ts) < wm.w_ms * 1000
        |)
        |SELECT * FROM matched
        |UNION ALL SELECT * FROM unmatched
        |ORDER BY purchase_id, click_id""".stripMargin,

    "q18_purchase_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |)
        |SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |  p.ts AS purchase_ts, c.ts AS click_ts
        |FROM e p JOIN e c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin,

    "q17_urgent_revenue_bloom" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q16_price_band_rangejoin" ->
      """WITH bands AS (
        |  SELECT n_nationkey AS band_id,
        |    n_nationkey * 3777.0 AS lo,
        |    n_nationkey * 3777.0 + 2000.0 + (n_nationkey % 7) * 1500.0 AS hi
        |  FROM nation
        |)
        |SELECT band_id, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,

    "q10_active_buyers_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "layout_compacted" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "layout_zorder" ->
      """WITH b AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    CAST(ntile(256) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) - 1 AS BIGINT) AS b0,
        |    CAST(ntile(256) OVER (ORDER BY l_suppkey, l_orderkey, l_linenumber) - 1 AS BIGINT) AS b1
        |  FROM lineitem
        |)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(list_sum([(((b0 >> k) & 1) << (2*k)) + (((b1 >> k) & 1) << (2*k + 1)) FOR k IN range(0, 8)]) AS BIGINT) AS zval
        |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin,

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

    "dedup_cdc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, text AS t, length(text) AS n FROM documents
        |), cuts AS (
        |  SELECT doc_id, t, n,
        |    [p FOR p IN range(16, n + 1) IF
        |       list_sum([CAST(ascii(substr(t, CAST(p AS INT) - 16 + k, 1)) AS BIGINT)
        |                 * ([853136842, 188810867, 522219709, 274910315, 718545499,
        |                     281243405, 621975598, 891031477, 512613922, 887503681,
        |                     28629151, 923521, 29791, 961, 31, 1])[k]
        |                 FOR k IN range(1, 17)]) % 1000000007 % 64 = 0] AS cuts
        |  FROM d
        |), segs AS (
        |  SELECT doc_id,
        |    list_prepend(CAST(0 AS BIGINT), cuts) AS s0,
        |    list_append(cuts, CAST(n AS BIGINT)) AS e0, t
        |  FROM cuts
        |), ch AS (
        |  SELECT doc_id, chunk FROM (
        |    SELECT doc_id,
        |      unnest([substr(t, CAST(s0[i] AS INT) + 1, CAST(e0[i] - s0[i] AS INT))
        |              FOR i IN range(1, len(s0) + 1)]) AS chunk
        |    FROM segs) q
        |  WHERE chunk != ''
        |), df AS (
        |  SELECT chunk, count(DISTINCT doc_id) AS ndocs FROM ch GROUP BY 1
        |)
        |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS shared_frac
        |FROM ch JOIN df USING (chunk) GROUP BY 1 ORDER BY ch.doc_id""".stripMargin,

    "corpus_stats_incremental" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

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

    "emb_normalized" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(e AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, CAST(list_sum([x*x FOR x IN qv]) AS BIGINT) AS n2 FROM q
        |), u AS (
        |  SELECT vec_id, n2, unnest(range(1, len(qv)+1)) AS dim, unnest(qv) AS qval FROM n
        |)
        |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |  CASE WHEN n2 = 0 THEN 0
        |       ELSE CAST(floor(qval*1000000.0 / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) END AS nq
        |FROM u ORDER BY vec_id, dim""".stripMargin,

    "emb_int8" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(e AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR e IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_max([abs(x) FOR x IN qv]) AS mq FROM q
        |), u AS (
        |  SELECT vec_id, mq, unnest(range(1, len(qv)+1)) AS dim, unnest(qv) AS qval FROM n
        |)
        |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        |  CASE WHEN mq = 0 THEN 0
        |       ELSE CAST(floor(qval*127.0 / CAST(mq AS DOUBLE) + 0.5) AS BIGINT) END AS q8,
        |  CAST(mq AS BIGINT) AS scale_q
        |FROM u ORDER BY vec_id, dim""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "dedup_ngram_jaccard" ->
      """WITH prepared AS (
        |  SELECT doc_id, lang, CAST(floor(length(text) / 100) AS BIGINT) AS len_bucket,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM (SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        |)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
        |  FROM prepared a JOIN prepared b
        |    ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // same semantics as dedup_ngram_jaccard — the prefix-filter path must
    // produce the identical pair set, so it shares the oracle verbatim
    "dedup_ngram_jaccard_prefix" ->
      """WITH prepared AS (
        |  SELECT doc_id, lang, CAST(floor(length(text) / 100) AS BIGINT) AS len_bucket,
        |    list_distinct([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS grams
        |  FROM (SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        |)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
        |  FROM prepared a JOIN prepared b
        |    ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

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

    "emb_negatives" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, c AS cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |    FROM dots)
        |  WHERE cr = 1
        |), ranked AS (
        |  SELECT a.vec_id AS anchor_id, c.vec_id AS neg_id,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY md5(a.vec_id || ':' || c.vec_id), c.vec_id) AS rank
        |  FROM assign a JOIN assign c ON c.cell != a.cell
        |  WHERE a.vec_id < 20
        |)
        |SELECT anchor_id, CAST(rank AS BIGINT) AS rank, neg_id
        |FROM ranked WHERE rank <= 3 ORDER BY anchor_id, rank""".stripMargin,

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
        |ORDER BY s.vec_id""".stripMargin,

    "knn_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < 20 AND b.vec_id != a.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "knn_lsh" ->
      """WITH w AS (
        |  SELECT h.range AS h, d.range AS d,
        |    CASE WHEN ('0x' || substr(md5('lsh:42:' || h.range || ':' || d.range), 1, 15))::BIGINT & 1 = 1
        |         THEN 1 ELSE -1 END AS wt
        |  FROM range(0, 8) h, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), dots AS (
        |  SELECT q.vec_id, w.h, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.h
        |), sigs AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << h ELSE 0 END) AS BIGINT) AS sig
        |  FROM dots GROUP BY vec_id
        |), probes AS (
        |  SELECT vec_id, sig AS probe FROM sigs WHERE vec_id < 20
        |  UNION ALL
        |  SELECT s.vec_id, xor(s.sig, CAST(1 << h.range AS BIGINT)) AS probe
        |  FROM sigs s CROSS JOIN range(0, 8) h WHERE s.vec_id < 20
        |), cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM probes p JOIN sigs c ON c.sig = p.probe AND c.vec_id != p.vec_id
        |), scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM cand
        |  JOIN n a ON a.vec_id = cand.query_id
        |  JOIN n b ON b.vec_id = cand.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "knn_ivf" ->
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
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), cand AS (
        |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |), scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM cand
        |  JOIN n a ON a.vec_id = cand.query_id
        |  JOIN n b ON b.vec_id = cand.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "eval_ivf_recall" ->
      """WITH w AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) DESC, b.vec_id) AS rank
        |    FROM n a CROSS JOIN n b
        |    WHERE a.vec_id < 20 AND a.vec_id != b.vec_id) q WHERE rank <= 10
        |), dots AS (
        |  SELECT q.vec_id, w.c, sum(w.wt * q.qv[w.d + 1]) AS dot
        |  FROM q CROSS JOIN w GROUP BY q.vec_id, w.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |        CAST(list_sum([na.qv[i] * nb.qv[i] FOR i IN range(1, len(na.qv) + 1)]) AS DOUBLE)
        |          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC, a.vec_id) AS rank
        |    FROM probes p
        |    JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |    JOIN n na ON na.vec_id = p.vec_id
        |    JOIN n nb ON nb.vec_id = a.vec_id) q WHERE rank <= 10
        |), hit AS (
        |  SELECT t.query_id, count(*) AS n_hit
        |  FROM truth t JOIN cand c ON c.query_id = t.query_id AND c.neighbor_id = t.neighbor_id
        |  GROUP BY 1
        |)
        |SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_truth,
        |  CAST(COALESCE(max(hit.n_hit), 0) AS BIGINT) AS n_hit,
        |  CAST(COALESCE(max(hit.n_hit), 0) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
        |FROM truth t LEFT JOIN hit ON hit.query_id = t.query_id
        |GROUP BY 1 ORDER BY t.query_id""".stripMargin,

    "eval_rp_rank_tau" ->
      """WITH q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), scored0 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_full
        |  FROM n a CROSS JOIN n b
        |  WHERE a.vec_id < 20 AND a.vec_id != b.vec_id
        |), top AS (
        |  SELECT query_id, neighbor_id, cos_full FROM (
        |    SELECT query_id, neighbor_id, cos_full,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos_full DESC, neighbor_id) AS rank
        |    FROM scored0) WHERE rank <= 10
        |), w AS (
        |  SELECT j.range AS j, d.range AS d,
        |    CASE WHEN ('0x' || substr(md5('lsh:42:' || j.range || ':' || d.range), 1, 15))::BIGINT & 1 = 1
        |         THEN 1 ELSE -1 END AS wt
        |  FROM range(0, 16) j, range(0, 64) d
        |), rq AS (
        |  SELECT q.vec_id, w.j, CAST(sum(w.wt * q.qv[w.d + 1]) AS BIGINT) AS y
        |  FROM q CROSS JOIN w GROUP BY 1, 2
        |), rn AS (
        |  SELECT vec_id, CAST(sum(y * y) AS BIGINT) AS rn2 FROM rq GROUP BY 1
        |), rdot AS (
        |  SELECT t.query_id, t.neighbor_id, t.cos_full,
        |    CAST(sum(qa.y * qb.y) AS BIGINT) AS dt
        |  FROM top t
        |  JOIN rq qa ON qa.vec_id = t.query_id
        |  JOIN rq qb ON qb.vec_id = t.neighbor_id AND qb.j = qa.j
        |  GROUP BY 1, 2, 3
        |), scored AS (
        |  SELECT r.query_id, r.neighbor_id, r.cos_full,
        |    CAST(r.dt AS DOUBLE) / (sqrt(CAST(na.rn2 AS DOUBLE)) * sqrt(CAST(nb.rn2 AS DOUBLE))) AS cos_rp
        |  FROM rdot r
        |  JOIN rn na ON na.vec_id = r.query_id
        |  JOIN rn nb ON nb.vec_id = r.neighbor_id
        |), pairs AS (
        |  SELECT l.query_id,
        |    (CASE WHEN l.cos_full > r.cos_full THEN 1 WHEN l.cos_full < r.cos_full THEN -1 ELSE 0 END)
        |    * (CASE WHEN l.cos_rp > r.cos_rp THEN 1 WHEN l.cos_rp < r.cos_rp THEN -1 ELSE 0 END) AS sgn
        |  FROM scored l JOIN scored r
        |    ON l.query_id = r.query_id AND l.neighbor_id < r.neighbor_id
        |)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END)
        |     - sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS tau
        |FROM pairs GROUP BY 1 ORDER BY query_id""".stripMargin,

    "knn_pq" ->
      """WITH w0 AS (
        |  SELECT m.range AS m, c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('pq:42:' || m.range || ':' || c.range || ':' || d.range), 1, 15))::BIGINT % 250001 - 125000 AS wt
        |  FROM range(0, 8) m, range(0, 16) c, range(0, 8) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), sdist0 AS (
        |  SELECT q.vec_id, w0.m, w0.c,
        |    CAST(sum((q.qv[w0.m*8 + w0.d + 1] - w0.wt) * (q.qv[w0.m*8 + w0.d + 1] - w0.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN w0 GROUP BY 1, 2, 3
        |), codes0 AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist0) WHERE rn = 1
        |), trained AS (
        |  SELECT co.m, co.code AS c, d.range AS d,
        |    CAST(sum(q.qv[co.m*8 + d.range + 1]) AS BIGINT) // count(*) AS wt
        |  FROM codes0 co JOIN q USING (vec_id) CROSS JOIN range(0, 8) d
        |  GROUP BY 1, 2, 3
        |), books AS (
        |  SELECT w0.m, w0.c, w0.d, COALESCE(t.wt, w0.wt) AS wt
        |  FROM w0 LEFT JOIN trained t ON t.m = w0.m AND t.c = w0.c AND t.d = w0.d
        |), sdist AS (
        |  SELECT q.vec_id, b.m, b.c,
        |    CAST(sum((q.qv[b.m*8 + b.d + 1] - b.wt) * (q.qv[b.m*8 + b.d + 1] - b.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN books b GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist) WHERE rn = 1
        |), adist AS (
        |  SELECT qd.vec_id AS query_id, co.vec_id AS neighbor_id, CAST(sum(qd.dist) AS BIGINT) AS ad
        |  FROM codes co JOIN sdist qd ON qd.m = co.m AND qd.c = co.code
        |  WHERE qd.vec_id < 20 AND qd.vec_id != co.vec_id
        |  GROUP BY 1, 2
        |), short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY ad, neighbor_id) AS arank
        |    FROM adist) WHERE arank <= 40
        |), scored AS (
        |  SELECT short.query_id, short.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM short
        |  JOIN n a ON a.vec_id = short.query_id
        |  JOIN n b ON b.vec_id = short.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "knn_ivfpq" ->
      """WITH cw AS (
        |  SELECT c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('ivf:42:' || c.range || ':' || d.range), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM range(0, 16) c, range(0, 64) d
        |), q AS (
        |  SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT) FOR x IN embedding] AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv, list_sum([x*x FOR x IN qv]) AS n2 FROM q
        |), dots AS (
        |  SELECT q.vec_id, cw.c, sum(cw.wt * q.qv[cw.d + 1]) AS dot
        |  FROM q CROSS JOIN cw GROUP BY q.vec_id, cw.c
        |), ranked_cells AS (
        |  SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS cr
        |  FROM dots
        |), assign AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr = 1
        |), probes AS (
        |  SELECT vec_id, c AS cell FROM ranked_cells WHERE cr <= 4 AND vec_id < 20
        |), w0 AS (
        |  SELECT m.range AS m, c.range AS c, d.range AS d,
        |    ('0x' || substr(md5('pq:42:' || m.range || ':' || c.range || ':' || d.range), 1, 15))::BIGINT % 250001 - 125000 AS wt
        |  FROM range(0, 8) m, range(0, 16) c, range(0, 8) d
        |), sdist0 AS (
        |  SELECT q.vec_id, w0.m, w0.c,
        |    CAST(sum((q.qv[w0.m*8 + w0.d + 1] - w0.wt) * (q.qv[w0.m*8 + w0.d + 1] - w0.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN w0 GROUP BY 1, 2, 3
        |), codes0 AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist0) WHERE rn = 1
        |), trained AS (
        |  SELECT co.m, co.code AS c, d.range AS d,
        |    CAST(sum(q.qv[co.m*8 + d.range + 1]) AS BIGINT) // count(*) AS wt
        |  FROM codes0 co JOIN q USING (vec_id) CROSS JOIN range(0, 8) d
        |  GROUP BY 1, 2, 3
        |), books AS (
        |  SELECT w0.m, w0.c, w0.d, COALESCE(t.wt, w0.wt) AS wt
        |  FROM w0 LEFT JOIN trained t ON t.m = w0.m AND t.c = w0.c AND t.d = w0.d
        |), sdist AS (
        |  SELECT q.vec_id, b.m, b.c,
        |    CAST(sum((q.qv[b.m*8 + b.d + 1] - b.wt) * (q.qv[b.m*8 + b.d + 1] - b.wt)) AS BIGINT) AS dist
        |  FROM q CROSS JOIN books b GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
        |    FROM sdist) WHERE rn = 1
        |), adist AS (
        |  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id, CAST(sum(qd.dist) AS BIGINT) AS ad
        |  FROM probes p
        |  JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id
        |  JOIN codes co ON co.vec_id = a.vec_id
        |  JOIN sdist qd ON qd.vec_id = p.vec_id AND qd.m = co.m AND qd.c = co.code
        |  GROUP BY 1, 2
        |), short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY ad, neighbor_id) AS arank
        |    FROM adist) WHERE arank <= 40
        |), scored AS (
        |  SELECT short.query_id, short.neighbor_id,
        |    CAST(list_sum([a.qv[i] * b.qv[i] FOR i IN range(1, len(a.qv) + 1)]) AS DOUBLE)
        |      / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
        |  FROM short
        |  JOIN n a ON a.vec_id = short.query_id
        |  JOIN n b ON b.vec_id = short.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

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

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0, [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(text, '')]),
        |    (acc, code) -> (acc * 31 + code) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(hex(encode(substr(text, 1, 4)))) AS magic,
        |  sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_decode_stub" ->
      """SELECT doc_id,
        |  CAST(64 + h % 512 AS INT) AS width,
        |  CAST(64 + (h >> 16) % 512 AS INT) AS height,
        |  3 AS channels
        |FROM (
        |  SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "mm_resize_plan" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(64 + h % 512 AS BIGINT) AS width,
        |    CAST(64 + (h >> 16) % 512 AS BIGINT) AS height
        |  FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM documents)
        |)
        |SELECT doc_id, width, height,
        |  CASE WHEN greatest(width, height) <= 224 THEN width
        |       ELSE width * 224 // greatest(width, height) END AS out_w,
        |  CASE WHEN greatest(width, height) <= 224 THEN height
        |       ELSE height * 224 // greatest(width, height) END AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT % 60000 + 1000 AS duration_ms
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, n_bytes, duration_ms, k.range AS frame_idx
        |  FROM m CROSS JOIN range(0, 4) k
        |)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(duration_ms * frame_idx // 4 AS BIGINT) AS frame_ts_ms,
        |  CAST(n_bytes * frame_idx // 4 AS BIGINT) AS frame_offset
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // the decoder reads BYTES; this recomputes from the pixel FORMULA over
    // a bounded range cross join (dims <= 32) — row-weighted wsum_r pins
    // the bottom-up flip, distinct per-channel formulas pin BGR order
    "mm_decode_bmp" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS BIGINT) AS width,
        |    CAST(8 + (doc_id * 7) % 25 AS BIGINT) AS height
        |  FROM documents
        |), px AS (
        |  SELECT d.doc_id, d.width, d.height, xs.range AS x, ys.range AS y
        |  FROM d CROSS JOIN range(0, 33) xs CROSS JOIN range(0, 33) ys
        |  WHERE xs.range < d.width AND ys.range < d.height
        |)
        |SELECT doc_id, width, height, CAST(3 AS BIGINT) AS channels,
        |  CAST(sum((x + 3*y + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*x + y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x + y + doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((y + 1) * ((x + 3*y + doc_id) % 256)) AS BIGINT) AS wsum_r
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    "mm_resize_bmp" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 25 AS BIGINT) AS src_w,
        |    CAST(8 + (doc_id * 7) % 25 AS BIGINT) AS src_h
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, src_w, src_h,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_w
        |         ELSE src_w * 16 // greatest(src_w, src_h) END AS out_w,
        |    CASE WHEN greatest(src_w, src_h) <= 16 THEN src_h
        |         ELSE src_h * 16 // greatest(src_w, src_h) END AS out_h
        |  FROM d
        |), px AS (
        |  SELECT g.doc_id, g.src_w, g.src_h, g.out_w, g.out_h, ys.range AS y,
        |    (xs.range * g.src_w // g.out_w) AS sx, (ys.range * g.src_h // g.out_h) AS sy
        |  FROM g CROSS JOIN range(0, 16) xs CROSS JOIN range(0, 16) ys
        |  WHERE xs.range < g.out_w AND ys.range < g.out_h
        |)
        |SELECT doc_id, src_w, src_h, out_w, out_h,
        |  CAST(sum((sx + 3*sy + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*sx + sy) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((sx + sy + doc_id) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((y + 1) * ((sx + 3*sy + doc_id) % 256)) AS BIGINT) AS wsum_r
        |FROM px GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id""".stripMargin,

    "mm_decode_wav" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |    CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
        |    CAST(64 + doc_id % 193 AS BIGINT) AS n_frames
        |  FROM documents
        |), s AS (
        |  SELECT d.doc_id, d.channels, d.sample_rate, d.n_frames,
        |    i.range AS i, c.range AS ch,
        |    (i.range * (3 + c.range) + d.doc_id * 11) % 4001 - 2000 AS v
        |  FROM d CROSS JOIN range(0, 257) i CROSS JOIN range(0, 2) c
        |  WHERE i.range < d.n_frames AND c.range < d.channels
        |)
        |SELECT doc_id, channels, sample_rate, n_frames,
        |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(sum(v * v) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN ch = 0 THEN (i + 1) * v ELSE 0 END) AS BIGINT) AS wsum_c0
        |FROM s GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin,

    "gen_integer_seq" ->
      "SELECT CAST(range AS BIGINT) AS v FROM range(0, 10000) ORDER BY v",

    "gen_enum_ordered" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |  ['bronze','gold','silver'][CAST(floor(CAST(range AS DOUBLE) * 3 / 9999) AS INT) + 1] AS tier
        |FROM range(0, 9999) ORDER BY id""".stripMargin)
}
