package graft

import graft.config.ConfigParser
import graft.engine.Engine
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational + streaming surface over the TPC-H-ish tables (q1..q28).
  *
  * One registry of [[SparkEntry]]'s query/oracle surface — split per family
  * in round 10 (the single 4.4k-line object was becoming unreviewable).
  * Exactness patterns are documented on [[SparkEntry]].
  */
private[graft] trait RelationalQueries extends QueryHelpers {

  protected def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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


    "q37_part_hierarchy" -> ((s, dir) => {
      // hierarchy flattening (BOM/taxonomy shape): parts form a 4-ary
      // forest (parent = (k-1) div 4, root 0); pointer DOUBLING resolves
      // every node's (root, level) in log(depth) self-joins — 5 doublings
      // cover depth 32, vs depth-many passes for the naive walk
      val p = t(s, dir, "part").select(col("p_partkey").cast("long").as("k"))
        .withColumn("parent", when(col("k") === 0L, lit(null).cast("long"))
          .otherwise(expr("(k - 1) div 4")))
      graft.operators.Graph.flattenHierarchy(p, "k", "parent", doublings = 5)
        .orderBy(col("node"))
    }),


    "q36_hourly_late_drop_stream" -> ((s, dir) => {
      // the late-data axis no other streaming gate exercises: pre-Jan-5
      // events arrive one micro-batch AFTER the recent tranche, so the
      // 1-hour watermark drops every one of them, and append mode emits
      // only the windows the final watermark passed — both effects encoded
      // in the oracle's watermark cut (q19/q20 precedent)
      graft.streaming.EventStream
        .runHourlyLateDropOverRawEvents(s, s"$dir/events.parquet",
          s"late_${System.nanoTime()}", "2024-01-05 00:00:00")
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


    "events_attribution_markov" -> ((s, dir) => {
      // data-driven attribution beyond first/last touch: removal-effect
      // credit from the absorbing journey chain — per-channel removal
      // chains iterated driver-side over the bounded transition counts,
      // base + 10 removal chains each unrolled 12 rounds in the oracle
      val ev = events(s, dir)
      val touches = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("channel"))
      val conv = ev.filter(col("event_type") === "purchase").select(col("user_id"))
      graft.operators.Behavior.markovAttribution(
        touches, "user_id", "ts", "event_id", "channel", conv, "user_id")
        .orderBy(col("channel"))
    }),


    "events_touch_attribution" -> ((s, dir) => {
      // first-touch vs last-touch credit comparison: per purchase, the
      // earliest and latest qualifying click in the 30-min window (ties by
      // click id), credited to the click's props-derived channel — the two
      // models every marketing dashboard argues about, on one relation
      val ev = events(s, dir)
      val pairs = graft.streaming.EventStream.attributionJoin(
        graft.streaming.EventStream.purchaseSide(ev),
        graft.streaming.EventStream.clickSide(ev), lookbackMin = 30)
      val chan = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("channel"))
      val touched = pairs.groupBy(col("purchase_id"))
        .agg(min(struct(col("click_ts"), col("click_id"))).as("f"),
          max(struct(col("click_ts"), col("click_id"))).as("l"))
        .select(col("purchase_id"), col("f.click_id").as("first_click"),
          col("l.click_id").as("last_click"))
      val first = touched
        .join(chan.select(col("cid").as("first_click"), col("channel")), "first_click")
        .groupBy(col("channel")).agg(count(lit(1)).as("n_first"))
      val last = touched
        .join(chan.select(col("cid").as("last_click"), col("channel")), "last_click")
        .groupBy(col("channel")).agg(count(lit(1)).as("n_last"))
      first.join(last, Seq("channel"), "full")
        .na.fill(0L, Seq("n_first", "n_last"))
        .orderBy(col("channel"))
    }),

    "q34_salted_flag_stats" -> ((s, dir) => {
      // skew-proof aggregation gated end-to-end: lineitem has only 3
      // returnflag keys (maximal skew — every key is hot), so the plain
      // groupBy funnels through 3 reducers at any cluster size; the
      // two-stage salted plan spreads each key over 16 buckets and MUST
      // reproduce the plain aggregate bit-for-bit (the oracle IS the
      // unsalted query — that equality is the whole correctness claim)
      graft.operators.Skew.saltedAgg(
        t(s, dir, "lineitem")
          .withColumn("cents", cents(col("l_extendedprice"))),
        Seq("l_returnflag"), tiebreaker = "l_orderkey", buckets = 16,
        aggs = Map(
          "n_items" -> (count(lit(1)), sum(col("n_items"))),
          "sum_cents" -> (sum(col("cents")), sum(col("sum_cents"))),
          "max_cents" -> (max(col("cents")), max(col("max_cents")))))
        .orderBy(col("l_returnflag"))
    }),

    "q35_salted_type_enrich" -> ((s, dir) => {
      // the salted-JOIN twin of q34: a 5-key dimension join (every key
      // hot) runs with the small side replicated per salt bucket and the
      // big side salted — must lose/duplicate NOTHING vs the plain join
      import s.implicits._
      val dim = Seq(("view", 1L), ("click", 2L), ("purchase", 5L),
        ("signup", 3L), ("error", 0L)).toDF("event_type", "weight")
      val enriched = graft.operators.Skew.saltedBroadcastableJoin(
        events(s, dir), dim, "event_type", "event_id", buckets = 8)
      enriched.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("weight")).as("weight"),
          sum(col("weight")).as("weighted_total"))
        .orderBy(col("event_type"))
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

    "q29_stream_dedup_redelivery" -> ((s, dir) => {
      // every event delivered TWICE (two independent file streams over the
      // same file, unioned), deduped by event_id within the watermark: the
      // drained rows must be the ORIGINAL event set exactly — exactly-once
      // restored from an at-least-once source — so the per-type rollup
      // hash-matches a plain batch oracle over the raw table
      graft.streaming.EventStream
        .runDedupRedeliveryOverRawEvents(
          s, s"$dir/events.parquet", s"dedup_redeliver_${System.nanoTime()}")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          (sum(cents(col("value"))).cast("double") / 100.0).as("sum_value"))
        .orderBy(col("event_type"))
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


    "q31_abc_parts" -> ((s, dir) => {
      // Pareto/ABC segmentation of parts by revenue: rank by cents total,
      // classify by exclusive-prior cumulative per-mille share (A < 800,
      // B < 950, C) — the 80/20 prioritizer; the global window runs over
      // the 2000-key part relation, never the fact table
      graft.operators.Features.abcClasses(
        t(s, dir, "lineitem"), "l_partkey", cents(col("l_extendedprice")))
        .orderBy(col("key"))
    }),


    "q38_sole_late_supplier" -> ((s, dir) => {
      // TPC-H Q21 shape on this schema: suppliers who were the ONLY late
      // shipper (ship > order date + 60d) in a multi-supplier order —
      // semi-join (multi-supplier orders) + anti-join (no OTHER late
      // supplier) + count, all co-partitioned on the order key; the
      // distinct (order, supplier) collapse bounds every relation by the
      // participation matrix, never the fact table
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val lo = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (datediff(col("l_shipdate"), col("o_orderdate")) > 60).as("late"))
      val multi = lo.groupBy(col("ok")).agg(countDistinct(col("sk")).as("nsup"))
        .filter(col("nsup") >= 2).select(col("ok"))
      val lr = lo.filter(col("late")).select(col("ok"), col("sk")).distinct()
      val other = lr.select(col("ok").as("ok2"), col("sk").as("sk2"))
      lr.join(multi, Seq("ok"), "left_semi")
        .join(other, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_anti")
        .groupBy(col("sk"))
        .agg(count(lit(1)).as("numwait"))
        .select(col("sk").as("s_suppkey"), col("numwait"))
        .orderBy(col("s_suppkey"))
    }),


    "q30_interval_overlap" -> ((s, dir) => {
      // interval x interval OVERLAP join with no equi key — supplier
      // availability windows vs part demand windows, both derived
      // arithmetically so the engines build identical intervals; bucketed
      // into an equi-join, each pair emitted from exactly ONE bucket (the
      // one holding the overlap's start), so no DISTINCT pass
      val sup = t(s, dir, "supplier").select(
        col("s_suppkey"),
        ((col("s_suppkey") * 13) % 997).cast("double").as("s_lo"))
        .withColumn("s_hi", col("s_lo") + lit(5.0) + (col("s_suppkey") % 23).cast("double"))
      val prt = t(s, dir, "part").filter(col("p_partkey") < 500).select(
        col("p_partkey"),
        ((col("p_partkey") * 7) % 997).cast("double").as("p_lo"))
        .withColumn("p_hi", col("p_lo") + lit(3.0) + (col("p_partkey") % 17).cast("double"))
      graft.operators.RangeJoin.overlap(
        sup, "s_lo", "s_hi", prt, "p_lo", "p_hi", bucketWidth = 16.0)
        .select(col("s_suppkey"), col("p_partkey"),
          greatest(col("s_lo"), col("p_lo")).as("ov_lo"),
          least(col("s_hi"), col("p_hi")).as("ov_hi"))
        .orderBy(col("s_suppkey"), col("p_partkey"))
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
    }))

  /** Generated oracle for Markov removal-effect attribution: journey
    * transitions from the click stream, then base + one removal chain per
    * channel, each unrolled `iters` fixed-point absorption rounds (the
    * unigram/hilbert programmatic-oracle precedent — states are the
    * bounded channel set, every relation a handful of rows). */
  private def markovAttributionOracleSql(channels: Seq[Int] = 0 to 9, iters: Int = 12): String = {
    def chain(tag: String, cntRel: String, outsRel: String): Seq[String] = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      parts += s"${tag}_0 AS (SELECT f, CAST(0 AS BIGINT) AS p FROM $outsRel)"
      for (k <- 1 to iters)
        parts += s"${tag}_$k AS (SELECT c.f, CAST(sum(c.c * CASE WHEN c.t = 100 THEN 1000000 " +
          s"WHEN c.t = 101 THEN 0 ELSE COALESCE(p.p, 0) END) AS BIGINT) // o.o AS p " +
          s"FROM $cntRel c JOIN $outsRel o ON o.f = c.f " +
          s"LEFT JOIN ${tag}_${k - 1} p ON p.f = c.t GROUP BY c.f, o.o)"
      parts.toSeq
    }
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    ctes += """clicks AS (
              |  SELECT user_id AS u, ts, event_id AS tie,
              |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ch
              |  FROM events WHERE event_type = 'click')""".stripMargin
    ctes += "conv AS (SELECT DISTINCT user_id AS u FROM events WHERE event_type = 'purchase')"
    ctes += """sq AS (
              |  SELECT u, ch,
              |    lag(ch) OVER (PARTITION BY u ORDER BY ts, tie) AS prev,
              |    row_number() OVER (PARTITION BY u ORDER BY ts, tie) AS rn,
              |    row_number() OVER (PARTITION BY u ORDER BY ts DESC, tie DESC) AS rnd,
              |    u IN (SELECT u FROM conv) AS has_conv
              |  FROM clicks)""".stripMargin
    ctes += """tr AS (
              |  SELECT CASE WHEN rn = 1 THEN -1 ELSE prev END AS f, ch AS t FROM sq
              |  UNION ALL
              |  SELECT ch AS f, CASE WHEN has_conv THEN 100 ELSE 101 END AS t FROM sq WHERE rnd = 1)""".stripMargin
    ctes += "cnt AS MATERIALIZED (SELECT f, t, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2)"
    ctes += "outs AS MATERIALIZED (SELECT f, CAST(sum(c) AS BIGINT) AS o FROM cnt GROUP BY 1)"
    ctes ++= chain("b", "cnt", "outs")
    for (r <- channels) {
      ctes += s"cnt_r$r AS (SELECT f, CASE WHEN t = $r THEN 101 ELSE t END AS t, c FROM cnt WHERE f != $r)"
      ctes += s"outs_r$r AS (SELECT f, CAST(sum(c) AS BIGINT) AS o FROM cnt_r$r GROUP BY 1)"
      ctes ++= chain(s"r$r", s"cnt_r$r", s"outs_r$r")
    }
    ctes += "res AS (" + channels.map(r =>
      s"SELECT CAST($r AS BIGINT) AS channel, " +
        s"(SELECT p FROM b_$iters WHERE f = -1) AS base_micro, " +
        s"COALESCE((SELECT p FROM r${r}_$iters WHERE f = -1), 0) AS removed_micro")
      .mkString(" UNION ALL ") + ")"
    ctes += "eff AS (SELECT channel, base_micro, removed_micro, " +
      "greatest(0, base_micro - removed_micro) AS effect_micro FROM res)"
    ctes += "tot AS (SELECT CAST(sum(effect_micro) AS BIGINT) AS te FROM eff)"
    "WITH " + ctes.mkString(",\n") +
      """
        |SELECT channel, base_micro, removed_micro, effect_micro,
        |  CASE WHEN (SELECT te FROM tot) = 0 THEN 0
        |       ELSE effect_micro * 1000000 // (SELECT te FROM tot) END AS credit_micro
        |FROM eff ORDER BY channel""".stripMargin
  }

  protected def relationalOracles: Map[String, String] = Map(

    "events_attribution_markov" -> markovAttributionOracleSql(),
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

    // redelivery dedup restores exactly-once: the oracle is the PLAIN batch
    // rollup — every original event counted exactly once
    "q29_stream_dedup_redelivery" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    "q9_events_json_props" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(json_extract_string(props, '$.k')) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    "q11_events_hourly_stream" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // the engine's log-round pointer doubling vs the oracle's linear
    // recursive CTE — same (root, level) fixpoint from two different
    // algorithms is exactly the cross-check we want
    "q37_part_hierarchy" ->
      """WITH RECURSIVE p AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS k,
        |    CASE WHEN p_partkey = 0 THEN NULL
        |         ELSE CAST((p_partkey - 1) // 4 AS BIGINT) END AS par
        |  FROM part
        |), r AS (
        |  SELECT k AS node, k AS root, CAST(0 AS BIGINT) AS level
        |  FROM p WHERE par IS NULL
        |  UNION ALL
        |  SELECT c.k, r.root, r.level + 1
        |  FROM p c JOIN r ON c.par = r.node
        |)
        |SELECT node, root, level FROM r ORDER BY node""".stripMargin,


    // on-time tranche only (every pre-cutoff row is dropped as late), and
    // only windows whose end the final watermark passed: w_ms = ms-floored
    // max on-time ts − 1h (the q19/q20 watermark formula)
    "q36_hourly_late_drop_stream" ->
      """WITH ot AS (
        |  SELECT ts, event_type, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |), w AS (
        |  SELECT (epoch_us(max(ts)) // 1000) - 3600000 AS w_ms FROM ot
        |), agg AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |  FROM ot GROUP BY 1, 2
        |)
        |SELECT hour, event_type, n_events, sum_value
        |FROM agg, w
        |WHERE (epoch_us(hour) // 1000) + 3600000 <= w.w_ms
        |ORDER BY 1, 2""".stripMargin,


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


    // integer cents, BIGINT running sum, per-mille integer shares — the
    // classification is bit-portable
    // the Q21 shape re-derived: late = day-diff > 60, sole-late via
    // NOT EXISTS over the distinct (order, supplier) late relation
    "q38_sole_late_supplier" ->
      """WITH lo AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    date_diff('day', o_orderdate, l_shipdate) > 60 AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), multi AS (SELECT ok FROM lo GROUP BY 1 HAVING count(DISTINCT sk) >= 2),
        |lr AS (SELECT DISTINCT ok, sk FROM lo WHERE late),
        |sole AS (
        |  SELECT l1.ok, l1.sk FROM lr l1
        |  WHERE l1.ok IN (SELECT ok FROM multi)
        |    AND NOT EXISTS (SELECT 1 FROM lr l2 WHERE l2.ok = l1.ok AND l2.sk != l1.sk)
        |)
        |SELECT CAST(sk AS BIGINT) AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |FROM sole GROUP BY 1 ORDER BY s_suppkey""".stripMargin,

    "q31_abc_parts" ->
      """WITH per AS (
        |  SELECT l_partkey AS key,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem GROUP BY 1
        |), t AS (SELECT CAST(sum(v) AS BIGINT) AS t FROM per),
        |c AS (
        |  SELECT key, v,
        |    CAST(sum(v) OVER (ORDER BY v DESC, key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM per
        |)
        |SELECT key, v AS value_cents, cum AS cum_cents,
        |  CAST((cum - v) * 1000 // (SELECT t FROM t) AS BIGINT) AS prev_permille,
        |  CASE WHEN (cum - v) * 1000 // (SELECT t FROM t) < 800 THEN 'A'
        |       WHEN (cum - v) * 1000 // (SELECT t FROM t) < 950 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c ORDER BY key""".stripMargin,


    // plain overlap predicate — the bucketed rewrite must be invisible
    "q30_interval_overlap" ->
      """WITH sup AS (
        |  SELECT s_suppkey,
        |    CAST((s_suppkey * 13) % 997 AS DOUBLE) AS s_lo,
        |    CAST((s_suppkey * 13) % 997 AS DOUBLE) + 5.0 + CAST(s_suppkey % 23 AS DOUBLE) AS s_hi
        |  FROM supplier
        |), prt AS (
        |  SELECT p_partkey,
        |    CAST((p_partkey * 7) % 997 AS DOUBLE) AS p_lo,
        |    CAST((p_partkey * 7) % 997 AS DOUBLE) + 3.0 + CAST(p_partkey % 17 AS DOUBLE) AS p_hi
        |  FROM part WHERE p_partkey < 500
        |)
        |SELECT s_suppkey, p_partkey,
        |  greatest(s_lo, p_lo) AS ov_lo, least(s_hi, p_hi) AS ov_hi
        |FROM sup JOIN prt ON s_lo < p_hi AND p_lo < s_hi
        |ORDER BY s_suppkey, p_partkey""".stripMargin,


    "q10_active_buyers_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,


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


    // window pairs re-derived, first/last by (ts, id), channels from the
    // same json path, full-outer credit fusion
    "events_touch_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS click_id, user_id, ts AS cts,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS channel
        |  FROM events WHERE event_type = 'click'
        |), pairs AS (
        |  SELECT p.purchase_id, c.click_id, c.cts, c.channel
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cts >= p.pts - INTERVAL 30 MINUTE AND c.cts <= p.pts
        |), ranked AS (
        |  SELECT purchase_id, click_id, channel,
        |    row_number() OVER (PARTITION BY purchase_id ORDER BY cts ASC, click_id ASC) AS rf,
        |    row_number() OVER (PARTITION BY purchase_id ORDER BY cts DESC, click_id DESC) AS rl
        |  FROM pairs
        |), f AS (
        |  SELECT channel, CAST(count(*) AS BIGINT) AS n_first FROM ranked WHERE rf = 1 GROUP BY 1
        |), l AS (
        |  SELECT channel, CAST(count(*) AS BIGINT) AS n_last FROM ranked WHERE rl = 1 GROUP BY 1
        |)
        |SELECT coalesce(f.channel, l.channel) AS channel,
        |  CAST(coalesce(f.n_first, 0) AS BIGINT) AS n_first,
        |  CAST(coalesce(l.n_last, 0) AS BIGINT) AS n_last
        |FROM f FULL OUTER JOIN l ON f.channel = l.channel
        |ORDER BY channel""".stripMargin,

    // plain dimension join — the salted plan must reproduce it exactly
    "q35_salted_type_enrich" ->
      """WITH dim(event_type, weight) AS (VALUES
        |  ('view', 1), ('click', 2), ('purchase', 5), ('signup', 3), ('error', 0))
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(d.weight) AS BIGINT) AS weight,
        |  CAST(sum(d.weight) AS BIGINT) AS weighted_total
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1 ORDER BY e.event_type""".stripMargin,

    // the UNSALTED aggregate — salted == plain is the correctness claim
    "q34_salted_flag_stats" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(max(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

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
        |FROM agg ORDER BY hour""".stripMargin)
}
