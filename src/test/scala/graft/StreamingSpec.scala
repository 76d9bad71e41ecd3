package graft

import graft.streaming.EventStream

import org.apache.spark.sql.functions._

/** Structured-streaming surface: the streaming hourly aggregation must agree
  * with its batch form over the same input, and sessionization must split on
  * gaps. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streaming hourly agg equals batch hourly agg") {
    // write a ns-free copy of events (streaming schema uses TimestampType)
    val dir = java.nio.file.Files.createTempDirectory("events_us").toString
    val ev = EventStream.rawEvents(spark, "/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(dir)

    val batch = EventStream.hourlyAgg(spark.read.parquet(dir))
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = EventStream.runHourlyBatchOverStream(spark, dir, "hourly_test")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(batch.nonEmpty)
    assert(batch == stream)
  }

  test("streaming HLL distinct-users equals the batch register/finalize path") {
    val raw = "/root/testdata/sf0.001/events.parquet"
    val batch = EventStream.hourlyDistinctUsers(EventStream.rawEvents(spark, raw))
      .orderBy("window_start").collect().toSeq
    val stream = EventStream.runHourlyDistinctOverRawEvents(spark, raw, "hll_parity_test")
      .orderBy("window_start").collect().toSeq
    assert(batch.nonEmpty)
    assert(batch == stream)
    // per-window state really is bounded: v_filled can never exceed m = 32
    assert(batch.forall(_.getLong(1) <= 32L))
  }

  test("checkpointed restart: appended windows are never re-emitted, values match batch") {
    // the crash/redeploy contract of a production streaming job: stop the
    // query, add data, restart from the SAME checkpoint — finalized windows
    // must come out exactly once, with batch-identical values
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("restart_src"); val out = tmp("restart_out"); val ck = tmp("restart_ck")
    val ev = EventStream.rawEvents(spark, "/root/testdata/sf0.001/events.parquet")
    val cut = ev.selectExpr("percentile(CAST(ts AS DOUBLE), 0.5)").head().getDouble(0)
    ev.filter(col("ts").cast("double") <= cut).write.parquet(s"$src/p1")
    def runPhase(): Unit = {
      val stream = spark.readStream.schema(EventStream.EventSchema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$src/p*")
      val q = EventStream.hourlyAgg(stream).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    runPhase()
    val phase1 = spark.read.parquet(out).count()
    assert(phase1 > 0, "phase 1 must finalize at least one window")
    ev.filter(col("ts").cast("double") > cut).write.parquet(s"$src/p2")
    runPhase() // restart from the same checkpoint
    val got = spark.read.parquet(out)
    assert(got.count() > phase1, "restart must emit the newly finalized windows")
    // exactly-once across the restart: no window/type appears twice
    assert(got.count() == got.select($"window_start", $"event_type").distinct().count(),
      "restart re-emitted already-finalized windows")
    // every emitted row matches the batch twin bit-for-bit
    val batch = EventStream.hourlyAgg(ev)
      .withColumnRenamed("n_events", "b_n").withColumnRenamed("sum_value", "b_sum")
    val joined = got.join(batch, Seq("window_start", "event_type"), "left")
    assert(joined.filter($"b_n".isNull || $"n_events" =!= $"b_n"
      || $"sum_value" =!= $"b_sum").isEmpty,
      "emitted window diverges from the batch twin")
  }

  /** Writes a genuinely TIMESTAMP(NANOS)-annotated events file (the old
    * fixture generation's physical type). Spark cannot write nanos parquet,
    * so this goes through the parquet-mr example writer. */
  private def writeNanosEventsFile(
      file: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = Types.buildMessage()
      .addField(Types.optional(PrimitiveTypeName.INT64).named("event_id"))
      .addField(Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.optional(PrimitiveTypeName.INT64).named("user_id"))
      .addField(Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.optional(PrimitiveTypeName.DOUBLE).named("value"))
      .addField(Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val w = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), spark.sparkContext.hadoopConfiguration))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    rows.foreach { case (id, ns, uid, et, v, p) =>
      w.write(gf.newGroup().append("event_id", id).append("ts", ns)
        .append("user_id", uid).append("event_type", et).append("value", v)
        .append("props", p))
    }
    w.close()
  }

  test("events ts unit is footer-detected: nanos truncates, micros reads native, junk refuses") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    // 1. the live fixture (currently TIMESTAMP_MICROS) must take the native
    //    branch and decode into the plausible epoch window
    val fixture = "/root/testdata/sf0.001/events.parquet"
    assert(!EventStream.tsIsNanos(spark, fixture))
    val firstMs = EventStream.rawEvents(spark, fixture)
      .select($"ts").head().getTimestamp(0).getTime
    assert(firstMs > java.sql.Timestamp.valueOf("1990-01-01 00:00:00").getTime)

    // 2. a synthetic TIMESTAMP(NANOS) file must take the div-1000
    //    truncating branch
    val nanosDir = tmp("ev_nanos")
    val baseNs = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond * 1000000000L
    val nsVals = Seq(baseNs + 123456789L, baseNs + 999L) // sub-µs tails must truncate
    writeNanosEventsFile(s"$nanosDir/part-0.parquet",
      nsVals.zipWithIndex.map { case (ns, i) => (i.toLong, ns, 1L, "click", 1.0, "{}") })
    assert(EventStream.tsIsNanos(spark, nanosDir))
    val gotUs = EventStream.rawEvents(spark, nanosDir)
      .select(unix_micros($"ts")).collect().map(_.getLong(0)).sorted.toSeq
    assert(gotUs == nsVals.map(_ / 1000L).sorted, "nanos branch must floor-truncate to µs")

    // 3. an unannotated INT64 ts (no timestamp logical type) must fail
    //    LOUDLY instead of being read under a guessed unit
    val junkDir = tmp("ev_junk")
    Seq(1L, 2L).toDF("ts").write.mode("overwrite").parquet(junkDir)
    val refusal = intercept[IllegalStateException](EventStream.rawEvents(spark, junkDir))
    assert(refusal.getMessage.contains("refusing to guess"))

    // 4. a correctly-annotated µs file whose VALUES sit in 1970 (the silent
    //    garbage signature of unit drift) must trip the epoch preflight
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val driftDir = tmp("ev_drift")
    s2.range(1).select(timestamp_micros(lit(1234567L)).as("ts"))
      .write.mode("overwrite").parquet(driftDir)
    val drift = intercept[IllegalArgumentException](EventStream.rawEvents(spark, driftDir))
    assert(drift.getMessage.contains("epoch window"))

    // 5. a directory mixing NANOS and native-unit files must refuse: one
    //    read branch cannot decode both, and the probe checks EVERY footer
    val mixedDir = tmp("ev_mixed")
    writeNanosEventsFile(s"$mixedDir/part-0.parquet",
      Seq((0L, baseNs + 1L, 1L, "click", 1.0, "{}")))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fixture),
      java.nio.file.Paths.get(s"$mixedDir/part-1.parquet"))
    val mixed = intercept[IllegalArgumentException](EventStream.tsIsNanos(spark, mixedDir))
    assert(mixed.getMessage.contains("mixes timestamp units"))
  }

  test("streaming CMS equals the batch counters and stays depth×width-bounded per window") {
    val raw = "/root/testdata/sf0.001/events.parquet"
    val batch = EventStream.hourlyTypeCms(EventStream.rawEvents(spark, raw))
      .orderBy("window_start", "family", "bucket").collect().toSeq
    val stream = EventStream.runHourlyCmsOverRawEvents(spark, raw, "cms_parity_test")
      .orderBy("window_start", "family", "bucket").collect().toSeq
    assert(batch.nonEmpty)
    assert(batch == stream)
    // bounded state: at most depth×width = 64 counter rows per window
    val perWindow = batch.groupBy(_.getTimestamp(0)).map(_._2.size)
    assert(perWindow.forall(_ <= 64), perWindow.toString)
  }

  test("sessionizeByGap: micros precision, inclusive gap boundary, raw-stream parity") {
    val g = 30L * 60 * 1000000 // 30 min in micros
    val ev = Seq(
      EventStream.MicroEvent(1L, 0L),
      EventStream.MicroEvent(1L, g), // exactly the gap -> same session (inclusive)
      EventStream.MicroEvent(1L, 2 * g + 1), // one micro past -> new session
      EventStream.MicroEvent(2L, 5L)).toDS()
    val sessions = EventStream.sessionizeByGap(ev, g)
      .collect().sortBy(s => (s.user_id, s.started_us))
    assert(sessions.map(s => (s.user_id, s.n_events, s.started_us, s.ended_us)).toSeq ==
      Seq((1L, 2L, 0L, g), (1L, 1L, 2 * g + 1, 2 * g + 1), (2L, 1L, 5L, 5L)))

    // streaming the raw nanos parquet equals the batch aggregation over it —
    // and neither path leaks session conf (the nanos schema is declared, not
    // conf-switched)
    val raw = "/root/testdata/sf0.001/events.parquet"
    val confBefore = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val batch = EventStream.hourlyAgg(EventStream.rawEvents(spark, raw))
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = EventStream.runHourlyOverRawEvents(spark, raw, "raw_hourly_test")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(batch.nonEmpty && batch == stream)
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") == confBefore)
  }

  test("session_window vs custom sessionizer: identical sessions, incl. AT the gap boundary") {
    // the q28 gate shares q13's oracle because the two sessionizers agree
    // EVERYWHERE — including exactly-gap spacing: session_window's merge
    // rule is inclusive (an event at last + gap extends the session), the
    // same `t - last <= gap` the custom state machine applies. Verified
    // here empirically rather than assumed — the analogous left-outer
    // watermark boundary (q20) needed an empirical pin too.
    val g = 30L * 60 * 1000000
    def builtin(ts: Seq[Long]): Seq[(Long, Long, Long)] =
      ts.map(t => (1L, t)).toDF("user_id", "ts_us")
        .withColumn("ts", timestamp_micros($"ts_us"))
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select($"n", unix_micros($"w.start").as("s"),
          unix_micros($"w.end") - g as "e")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    def custom(ts: Seq[Long]): Seq[(Long, Long, Long)] =
      EventStream.sessionizeByGap(
        ts.map(EventStream.MicroEvent(1L, _)).toDS(), g)
        .collect().map(s => (s.n_events, s.started_us, s.ended_us)).toSeq.sorted
    // off-boundary: one micro inside the gap merges, one past it splits
    val off = Seq(0L, g - 1, 3 * g)
    assert(builtin(off) == custom(off))
    assert(custom(off) == Seq((1L, 3 * g, 3 * g), (2L, 0L, g - 1)))
    // AT the boundary both merge: inclusive semantics on both sides
    val at = Seq(0L, g)
    assert(custom(at) == Seq((2L, 0L, g)))
    assert(builtin(at) == custom(at))
    // one micro PAST the gap both split
    val past = Seq(0L, g + 1)
    assert(builtin(past) == custom(past))
    assert(custom(past).size == 2)
  }

  test("raw-file stream glob is anchored: prefixed sibling files are NOT ingested") {
    // a bare file path needs a glob for FileStreamSource; `path*` would also
    // match `events.parquet_extra` — the anchored `{name}` form must not
    val dir = java.nio.file.Files.createTempDirectory("events_glob")
    // nanos-annotated files: the glob test doubles as nanos-branch coverage
    writeNanosEventsFile(dir.resolve("events.parquet").toString,
      Seq((1L, 1700000000L * 1000000000L, 10L, "click", 1.0, "{}"),
        (2L, 1700000100L * 1000000000L, 11L, "view", 2.0, "{}")))
    writeNanosEventsFile(dir.resolve("events.parquet_extra").toString,
      Seq((99L, 1700009999L * 1000000000L, 99L, "click", 9.0, "{}")))
    val got = EventStream.runHourlyOverRawEvents(
      spark, dir.resolve("events.parquet").toString, "glob_test")
    assert(got.agg(sum("n_events")).collect()(0).getLong(0) == 2L,
      "anchored glob must read exactly the named file, not prefixed siblings")
  }

  test("sessionizeStream: one session survives micro-batch boundaries, closes on watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gapUs = 30L * 60 * 1000000
    val t0 = 1700000000L * 1000000L // micros
    def ev(user: Long, us: Long) =
      EventStream.SessionEvent(user, new java.sql.Timestamp(us / 1000), us)
    val input = MemoryStream[EventStream.SessionEvent]
    val sessions = EventStream.sessionizeStream(input.toDS(), gapUs, "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // one user session deliberately SPLIT across two micro-batches
      input.addData(ev(1L, t0), ev(1L, t0 + 60L * 1000000))
      q.processAllAvailable()
      input.addData(ev(1L, t0 + 120L * 1000000))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() == 0, "session still open — nothing emitted yet")
      // advance the watermark far past user 1's gap, then one more batch so
      // the armed event-time timeout fires
      input.addData(ev(2L, t0 + 10L * 3600L * 1000000))
      q.processAllAvailable()
      input.addData(ev(2L, t0 + 11L * 3600L * 1000000))
      q.processAllAvailable()
      val got = spark.table("sess_stream").as[EventStream.MicroSession].collect()
        .filter(_.user_id == 1L)
      assert(got.toSeq == Seq(EventStream.MicroSession(1L, 3L, t0, t0 + 120L * 1000000)),
        s"expected ONE merged session for user 1, got ${got.toSeq}")
    } finally q.stop()
  }

  test("sessionizeStream: out-of-order event within watermark never rewinds session bounds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gapUs = 30L * 60 * 1000000
    val t0 = 1700000000L * 1000000L
    def ev(user: Long, us: Long) =
      EventStream.SessionEvent(user, new java.sql.Timestamp(us / 1000), us)
    val input = MemoryStream[EventStream.SessionEvent]
    val sessions = EventStream.sessionizeStream(input.toDS(), gapUs, "2 hours")
    val q = sessions.writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      input.addData(ev(1L, t0 + 60L * 1000000))
      q.processAllAvailable()
      // LATE but within-watermark event, earlier than the open session's
      // start: must merge via min/max, not rewind `last` (which would arm the
      // timeout too early and split the session)
      input.addData(ev(1L, t0))
      q.processAllAvailable()
      input.addData(ev(1L, t0 + 120L * 1000000))
      q.processAllAvailable()
      // push the watermark far past the gap, then once more to fire timeouts
      input.addData(ev(2L, t0 + 10L * 3600L * 1000000))
      q.processAllAvailable()
      input.addData(ev(2L, t0 + 11L * 3600L * 1000000))
      q.processAllAvailable()
      val got = spark.table("sess_ooo").as[EventStream.MicroSession].collect()
        .filter(_.user_id == 1L)
      assert(got.toSeq == Seq(EventStream.MicroSession(1L, 3L, t0, t0 + 120L * 1000000)),
        s"expected one session spanning [t0, t0+120s] despite out-of-order arrival, got ${got.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join drains to exactly the batch join's rows") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val ev = EventStream.rawEvents(spark, path)
    val batch = EventStream.attributionJoin(
        EventStream.purchaseSide(ev), EventStream.clickSide(ev), lookbackMin = 120)
      .orderBy("purchase_id", "click_id").collect().toSeq
    val stream = EventStream.runAttributionOverRawEvents(
        spark, path, lookbackMin = 120, "0 seconds", "attr_parity_test")
      .orderBy("purchase_id", "click_id").collect().toSeq
    assert(batch.nonEmpty, "no purchase-click pairs in fixture")
    assert(batch == stream)
  }

  test("left-outer stream-stream join: null rows emitted exactly below the min watermark") {
    val dir = java.nio.file.Files.createTempDirectory("outer_probe").toString
    val base = 1700000000000000000L // ns epoch
    val min = 60L * 1000000000L
    // purchases every minute for 120 min, all users distinct (no matches);
    // one unmatchable click at +60 min pins the click-side watermark
    val purchases = (0 until 120).map { i =>
      (1000L + i, base + i * min, 10000L + i, "purchase", 1.0, "{}")
    }
    val click = Seq((9999L, base + 60 * min, 99999L, "click", 1.0, "{}"))
    writeNanosEventsFile(s"$dir/part-0.parquet", purchases ++ click)
    val res = EventStream.runAttributionOverRawEvents(
      spark, dir, lookbackMin = 30, "0 seconds", "outer_boundary_pin", leftOuter = true)
    val emitted = res.filter($"click_id".isNull).select($"purchase_id")
      .as[Long].collect().map(_ - 1000L).sorted.toSeq
    // query watermark = min(purchase max +119, click max +60) = +60; an
    // unmatched purchase surfaces iff purchase_ts < watermark (STRICT: the
    // +60 purchase stays buffered) — the rule the q20 oracle mirrors
    assert(emitted == (0L until 60L), s"emitted=$emitted")
  }

  test("streaming dedup drops redelivered event ids within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("events_dup").toString
    val t0 = 1700000000000L
    val ev = Seq(
      (1L, new java.sql.Timestamp(t0), "click"),
      (2L, new java.sql.Timestamp(t0 + 1000), "view"),
      (1L, new java.sql.Timestamp(t0), "click"), // redelivery of event 1
      (3L, new java.sql.Timestamp(t0 + 2000), "click"))
      .toDF("event_id", "ts", "event_type")
    ev.write.mode("overwrite").parquet(dir)
    val schema = ev.schema
    val stream = EventStream.dedupStream(
      spark.readStream.schema(schema).parquet(dir), Seq("event_id"), "1 hour")
    val q = stream.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_test").select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("sessionize splits on gaps and aggregates values") {
    val t0 = 1700000000000L
    val events = Seq(
      EventStream.Event(1, new java.sql.Timestamp(t0), 1L, "click", 1.0),
      EventStream.Event(2, new java.sql.Timestamp(t0 + 60000), 1L, "view", 2.0),
      EventStream.Event(3, new java.sql.Timestamp(t0 + 10000000), 1L, "click", 5.0),
      EventStream.Event(4, new java.sql.Timestamp(t0), 2L, "view", 7.0)).toDS()
    val sessions = EventStream.sessionize(events, gapMillis = 30 * 60 * 1000)
      .collect().sortBy(s => (s.user_id, s.started.getTime))
    assert(sessions.length == 3)
    val u1 = sessions.filter(_.user_id == 1L)
    assert(u1(0).n_events == 2 && u1(0).total_value == 3.0)
    assert(u1(1).n_events == 1 && u1(1).total_value == 5.0)
    assert(sessions.count(_.user_id == 2L) == 1)
  }

  test("jsonl corpus ingest: incremental, exactly-once across runs, transform applied") {
    import graft.streaming.CorpusIngest
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("ingest").toString
    val landing = s"$root/landing"
    val table = s"$root/corpus"
    val ckpt = s"$root/ckpt"
    new java.io.File(landing).mkdirs()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def drop(name: String, ids: Range): Unit = {
      val w = new java.io.PrintWriter(s"$landing/$name")
      try ids.foreach(i => w.println(s"""{"doc_id":$i,"text":"doc number $i"}"""))
      finally w.close()
    }
    // keep only even doc_ids: the curation-at-ingest hook
    val evenOnly = (df: org.apache.spark.sql.DataFrame) => df.filter(col("doc_id") % 2 === 0)

    drop("batch1a.jsonl", 0 until 10)
    drop("batch1b.jsonl", 10 until 30)
    val n1 = CorpusIngest.ingestJsonlOnce(spark, landing, schema, table, ckpt, evenOnly)
    assert(n1 == 15, s"first drain: $n1")
    // second run with nothing new: zero rows, no re-ingestion
    assert(CorpusIngest.ingestJsonlOnce(spark, landing, schema, table, ckpt, evenOnly) == 0L)
    // a later file lands; only IT is processed
    drop("batch2.jsonl", 30 until 40)
    val n2 = CorpusIngest.ingestJsonlOnce(spark, landing, schema, table, ckpt, evenOnly)
    assert(n2 == 5, s"incremental drain: $n2")
    // committed table: exactly the even ids, once each
    val got = spark.read.parquet(table).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 40L by 2).toSeq)
  }

  test("modelStream: live-stream rows are bit-identical to batch rows at the same id") {
    import graft.config.ConfigParser
    import graft.engine.Engine
    val cfg = ConfigParser.parseYaml(
      """
        |random_seed: 42
        |models:
        |  m:
        |    rows_count: 1000
        |    columns:
        |      - { name: u, type: uuid }
        |      - { name: v, type: integer, type_params: { bit_width: 64, from: 0, to: 999 }, distinct_percentage: 1 }
        |      - { name: seg, type: string, values: [a, b, c], null_percentage: 0.1 }
        |""".stripMargin)
    val m = cfg.model("m")
    val q = Engine.modelStream(spark, cfg, m, rowsPerSecond = 5000, includeRowId = true)
      .writeStream.format("memory").queryName("gen_stream").outputMode("append").start()
    try {
      // let a couple of micro-batches land
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (spark.table("gen_stream").isEmpty && System.nanoTime() < deadline) {
        q.processAllAvailable()
      }
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("gen_stream")
    assert(!streamed.isEmpty, "no stream rows arrived")
    // every streamed row equals the batch row with the same id
    val plans = graft.gen.Planner.planModel(cfg, m)
    val batch = spark.range(0, m.rowsCount)
      .select(col("id").as("row_id") +: plans.map(_.expr(col("id"))): _*)
      .select(col("row_id"), col("u").as("bu"), col("v").as("bv"), col("seg").as("bseg"))
    val joined = streamed.join(batch, "row_id")
    assert(joined.count() == streamed.count())
    val mismatches = joined.filter(
      col("u") =!= col("bu") || col("v") =!= col("bv") ||
        !(col("seg") <=> col("bseg")))
    assert(mismatches.count() == 0)
  }

  test("late-data drop: pre-cutoff tranche contributes nothing, trailing windows withheld") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val cutoff = "2024-01-05 00:00:00"
    val res = EventStream.runHourlyLateDropOverRawEvents(
      spark, path, s"late_spec_${System.nanoTime()}", cutoff)
    val cut = lit(cutoff).cast("timestamp")
    // (a) every late row was dropped: no emitted window precedes the cutoff
    assert(res.filter(col("window_start") < cut).count() == 0L)
    // (b) append mode withholds windows the watermark never passed: the
    // on-time tranche's final hour(s) are absent from the result
    val onTime = EventStream.rawEvents(spark, path).filter(col("ts") >= cut)
    val maxStart = onTime.agg(max(date_trunc("hour", col("ts")))).collect()(0).getTimestamp(0)
    assert(res.filter(col("window_start") === maxStart).count() == 0L,
      "the trailing window must stay withheld (watermark never passed its end)")
    // (c) emitted windows carry the exact batch aggregation values
    val batchTwin = EventStream.hourlyAgg(onTime)
      .select(col("window_start"), col("event_type"), col("n_events").as("bn"))
    val j = res.join(batchTwin, Seq("window_start", "event_type"))
    assert(j.count() == res.count())
    assert(j.filter(col("n_events") =!= col("bn")).count() == 0L)
  }
}
