package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Open-session accumulator carried in `GroupState` across micro-batches.
  *
  * MUST be a top-level public case class: Spark's state-store encoder
  * resolves bean-style accessors via Janino-generated code, and a `private`
  * class nested in an object (the previous shape) fails accessor resolution
  * at runtime with a `CompileException` on the first micro-batch. The field
  * is `lastUs` (not `last`) for the same reason — `last` collides with
  * `Traversable.last` during the generated-code method lookup. */
final case class SessionState(n: Long, total: Double, startUs: Long, lastUs: Long)

/** Structured-Streaming surface over the `events` table shape:
  * watermarked tumbling-window aggregation and stateful sessionization.
  *
  * The reference engine is a bounded pipeline with streaming-flavored
  * mechanics but no event-time semantics (SURVEY §2.8); this module is the
  * Spark-native extension: the same aggregations run identically over
  * `readStream` (live) and `read` (backfill) because they share one logical
  * plan builder.
  */
object EventStream {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema used for the TIMESTAMP(NANOS) branch: Spark 4 cannot infer
    * nanos parquet (schema inference throws). Declaring the schema with ts
    * as LongType sidesteps inference entirely — the INT64 column reads as
    * raw nano-epoch longs with NO session conf
    * (`spark.sql.legacy.parquet.nanosAsLong` is only consulted by the
    * inference path), so query builders stop mutating session state. */
  val NanosEventSchema: StructType = StructType(EventSchema.map {
    case f if f.name == "ts" => f.copy(dataType = LongType)
    case f => f
  })

  // One footer probe + one first-row epoch check per distinct path per JVM.
  // Both are O(one file's metadata / first row group) regardless of table
  // size, so the preflight cost stays constant at any scale.
  private val tsNanosCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private val epochChecked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** True iff the parquet footer under `path` declares `ts` as
    * TIMESTAMP(NANOS). MICROS/MILLIS read natively as TimestampType; any
    * other physical encoding (e.g. an unannotated INT64) fails LOUDLY here
    * instead of being misinterpreted downstream — a wrong timestamp unit
    * produces silently-garbage 1970-era data, the one failure mode this
    * probe exists to prevent. */
  def tsIsNanos(spark: SparkSession, path: String): Boolean =
    tsNanosCache.computeIfAbsent(path, _ => Boolean.box(detectTsNanos(spark, path))).booleanValue()

  private def detectTsNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val hConf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hConf)
    val files =
      if (fs.getFileStatus(p).isFile) Seq(p)
      else fs.listStatus(p)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName.toString)
        .map(_.getPath)
        .toSeq
    require(files.nonEmpty, s"no data files under events path $path")
    // Probe EVERY data file's footer and require they agree on the unit: a
    // directory where one writer appended micros next to nanos files would
    // otherwise read the minority files under the wrong branch and only the
    // probed file's first row would ever be epoch-checked. Footer-only reads,
    // O(#files) metadata — the same cost class as Spark's own schema
    // inference over the directory, and a one-time cached probe per JVM.
    val units = files.map { file =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, hConf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        require(schema.containsField("ts"),
          s"events parquet file $file has no `ts` column")
        val prim = schema.getType(Seq("ts"): _*).asPrimitiveType()
        val isNanos = prim.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          // Spark's legacy INT96 timestamp: unannotated but self-describing
          // (julian day + nanos-of-day) — Spark decodes it natively
          case null if prim.getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96 => false
          case other =>
            throw new IllegalStateException(
              s"events `ts` in $file has parquet logical type $other " +
                s"(${prim.getPrimitiveTypeName}); expected TIMESTAMP(MILLIS|MICROS|NANOS) " +
                "or INT96 — refusing to guess the epoch unit")
        }
        file -> isNanos
      } finally reader.close()
    }
    val (nanoFiles, nativeFiles) = units.partition(_._2)
    require(nanoFiles.isEmpty || nativeFiles.isEmpty,
      s"events directory $path mixes timestamp units: " +
        s"NANOS in ${nanoFiles.map(_._1.getName).mkString(",")} vs " +
        s"native in ${nativeFiles.map(_._1.getName).mkString(",")} — a single " +
        "read branch cannot decode both; rewrite the minority files")
    nanoFiles.nonEmpty
  }

  /** Loud preflight against epoch-unit drift: the first row's ts must land
    * in a plausible epoch window. A wrong unit shifts EVERY timestamp by
    * ~1000x (ns read as µs -> year 1970; µs read as ns -> year ~1970 too
    * after div), so one row decides — no full min(ts) scan needed. */
  private def preflightEpoch(df: DataFrame, path: String): Unit =
    if (!epochChecked.contains(path)) {
      // ts is nullable in EventSchema: probe the first NON-NULL value, or
      // pass trivially if none exists (an all-null column has no epoch).
      df.select(col("ts")).where(col("ts").isNotNull).limit(1).collect().headOption.foreach { r =>
        val ms = r.getTimestamp(0).getTime
        val lo = java.sql.Timestamp.valueOf("1990-01-01 00:00:00").getTime
        val hi = java.sql.Timestamp.valueOf("2100-01-01 00:00:00").getTime
        require(ms >= lo && ms < hi,
          s"events `ts` at $path decodes to ${r.getTimestamp(0)} — outside the " +
            "plausible [1990, 2100) epoch window; the parquet timestamp unit was " +
            "almost certainly misdetected (fixture drift?)")
      }
      epochChecked.add(path)
    }

  /** Batch read of the events table with ts normalized to TimestampType
    * (µs precision) WHATEVER the file's physical unit: the footer probe
    * picks the branch, so a fixture that changes between TIMESTAMP(NANOS)
    * and TIMESTAMP_MICROS keeps reading correctly. The nanos branch
    * truncates to microseconds — the same truncation DuckDB applies
    * natively. MUST be integer `div`: `/` on longs is IEEE double division,
    * and at nano-epoch magnitude (~1.7e18) the quotient rounds UP by 1 µs
    * on ~half the inputs. */
  def rawEvents(spark: SparkSession, path: String): DataFrame = {
    val df =
      if (tsIsNanos(spark, path))
        spark.read.schema(NanosEventSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else
        spark.read.schema(EventSchema).parquet(path)
    preflightEpoch(df, path)
    df
  }

  /** Streaming twin of [[rawEvents]]: same footer-probe branch, same
    * normalized output schema, over `readStream`. */
  private def rawEventsStream(s2: SparkSession, path: String): DataFrame =
    if (tsIsNanos(s2, path))
      s2.readStream.schema(NanosEventSchema).parquet(anchoredGlob(s2, path))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      s2.readStream.schema(EventSchema).parquet(anchoredGlob(s2, path))

  /** The shared logical plan: tumbling hourly window per event type.
    * Works for both batch and streaming inputs. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // fixed-point cents (exact, order-independent, engine-portable sums)
        (sum(floor(col("value") * 100 + lit(0.5)).cast("long")).cast("double") / 100.0)
          .as("sum_value"))
      .select(
        col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming read of an events directory -> hourly agg -> memory sink;
    * returns the materialized result after draining available input.
    * Complete mode so trailing windows (not yet past the watermark) are
    * included — append mode would hold them back until later input. */
  def runHourlyBatchOverStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val stream = spark.readStream.schema(EventSchema).parquet(dir)
    drainToMemory(hourlyAgg(stream), name)
  }

  /** Hourly DISTINCT-USER estimates as a streaming HLL sketch: one
    * watermarked window aggregation whose state per window is m = 32 longs
    * (the register file) no matter how many users appear — the sketch shape
    * that keeps windowed COUNT DISTINCT bounded-state at 100 TB. Uses the
    * single-Aggregator register form ([[graft.operators.Sketches.HllRegisterAgg]])
    * because streaming allows exactly one aggregation; the finalize
    * projection is shared with the batch sketch, so stream == batch ==
    * DuckDB oracle bit-for-bit. */
  def hourlyDistinctUsers(events: DataFrame): DataFrame = {
    val hll = udaf(new graft.operators.Sketches.HllRegisterAgg)
    val agg = events
      .withWatermark("ts", "1 hour")
      .withColumn("h", graft.operators.Sketches.hash40(col("user_id")))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(hll(col("h")).as("regs"))
    graft.operators.Sketches.hllFinalize(agg, "regs")
      .select(col("w.start").as("window_start"),
        col("v_filled"), col("s_scaled"), col("est_distinct"))
  }

  /** Streaming drive of [[hourlyDistinctUsers]] directly over the raw
    * events parquet (same harness as [[runHourlyOverRawEvents]]). */
  def runHourlyDistinctOverRawEvents(spark: SparkSession, path: String, name: String): DataFrame = {
    val s2 = statePinnedSession(spark)
    drainToMemory(hourlyDistinctUsers(rawEventsStream(s2, path)), name)
  }

  /** Streaming Count-Min sketch: per-hour (family, bucket) frequency
    * counters over the event-type stream. State per window is bounded by
    * depth×width REGARDLESS of type cardinality — the frequency complement
    * to [[hourlyDistinctUsers]]'s HLL registers, and like it a plain
    * order-free aggregation, so batch and stream share one shape and one
    * DuckDB oracle. Counters are bucket-wise mergeable: per-hour sketches
    * roll up to day/month without re-reading events. */
  def hourlyTypeCms(events: DataFrame, depth: Int = 4, width: Int = 16): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("family"),
          (graft.functions.TextFns.md5Long(col("event_type"), i) % width).as("bucket"))): _*))
        .as("fb"))
      .groupBy(window(col("ts"), "1 hour").as("w"),
        col("fb.family").as("family"), col("fb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("family").cast("long").as("family"),
        col("bucket"), col("cnt"))

  /** Streaming drive of [[hourlyTypeCms]] (same raw-parquet harness). */
  def runHourlyCmsOverRawEvents(spark: SparkSession, path: String, name: String): DataFrame = {
    val s2 = statePinnedSession(spark)
    drainToMemory(hourlyTypeCms(rawEventsStream(s2, path)), name)
  }

  /** Stream-static enrichment: the third streaming join shape next to the
    * inner/left-outer stream-stream attribution joins — the event stream
    * joins a STATIC broadcast dimension (no watermarks or join state on the
    * dim side; the standard "enrich clicks with account metadata" pattern),
    * then one watermarked window aggregation per (hour, nation). Cents
    * fixed-point keeps the value sum oracle-exact. */
  def enrichedHourlyByNation(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .join(broadcast(customers.select(
        col("c_custkey").cast("long").as("user_id"),
        col("c_nationkey").cast("long").as("nation"))), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("nation"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
      .select(col("w.start").as("window_start"), col("nation"),
        col("n_events"), (col("cents").cast("double") / 100.0).as("sum_value"))

  /** Streaming drive of [[enrichedHourlyByNation]] over the raw events
    * parquet (same harness as [[runHourlyOverRawEvents]]). */
  def runEnrichedHourlyOverRawEvents(
      spark: SparkSession, path: String, customersPath: String, name: String): DataFrame = {
    val s2 = statePinnedSession(spark)
    drainToMemory(
      enrichedHourlyByNation(rawEventsStream(s2, path), s2.read.parquet(customersPath)), name)
  }

  def runHourlyOverRawEvents(spark: SparkSession, path: String, name: String): DataFrame = {
    // isolated child session pins stateful-operator parallelism to the
    // (tiny) state volume — see runAttributionOverRawEvents
    val s2 = statePinnedSession(spark)
    drainToMemory(hourlyAgg(rawEventsStream(s2, path)), name)
  }

  /** Child session (shared SparkContext, own conf) with the shuffle/state
    * partition count sized for small-state bounded drains — the per-job
    * alternative to mutating the caller's session conf. */
  private def statePinnedSession(spark: SparkSession, partitions: Int = 8): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    s2
  }

  /** Fresh EPHEMERAL checkpoint dir for one bounded drain, preferring
    * tmpfs (/dev/shm) when present (r18, guide §6): a bounded gate's
    * checkpoint — offset/commit WAL fsyncs per micro-batch plus
    * state-store delta files — is pure disk latency on a disk-backed
    * /tmp. Spark's default temp checkpoint (java.io.tmpdir) has IDENTICAL
    * durability (scratch, deleted with the query), so this changes where
    * the scratch lives, never the semantics; every drain passes a fresh
    * dir, so no state survives between runs (the no-cross-run-caching
    * contract). `SPARK_GRAFT_STREAM_CK_DIR` overrides the base (a
    * cluster's fast scratch volume); durable production pipelines pass a
    * real fault-tolerant checkpointLocation instead of using these
    * bounded-drain helpers (CorpusIngest does exactly that). */
  private def ephemeralCheckpoint(): String = {
    import java.nio.file.{Files, Paths}
    val base = sys.env.get("SPARK_GRAFT_STREAM_CK_DIR").map(Paths.get(_))
      .orElse(Some(Paths.get("/dev/shm"))
        .filter(p => Files.isDirectory(p) && Files.isWritable(p)))
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
    Files.createTempDirectory(base, "graft_ck_").toString
  }

  /** Recursive best-effort delete of an [[ephemeralCheckpoint]] dir once
    * its query stopped (the memory sink holds the rows; bench runs drain
    * repeatedly, so scratch must not accumulate — on tmpfs it would
    * otherwise pin RAM). */
  private def dropCheckpoint(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case _: Exception => () }

  /** FileStreamSource accepts globs but rejects a bare FILE as basePath
    * (directories only). A naive `path + "*"` glob matches ANY sibling whose
    * name merely starts with the file name (`events.parquet_old`,
    * `events.parquet2`) and silently ingests extra rows; `{name}` is an
    * exact-match alternation, so only the named file qualifies. Directories
    * pass through untouched. */
  private def anchoredGlob(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new java.io.FileNotFoundException(s"events path does not exist: $path")
    if (fs.getFileStatus(p).isFile) {
      // escape Hadoop glob metacharacters so a literal name like `a[1].parquet`
      // builds an exact-match pattern instead of a malformed/over-matching one
      val escaped = p.getName.replaceAll("([{}\\[\\]*?,\\\\])", "\\\\$1")
      new org.apache.hadoop.fs.Path(p.getParent, "{" + escaped + "}").toString
    } else path
  }

  private def drainToMemory(agg: DataFrame, name: String): DataFrame = {
    val ck = ephemeralCheckpoint()
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", ck)
      .format("memory")
      .queryName(name)
      .start()
    try { q.processAllAvailable(); q.stop() } finally dropCheckpoint(ck)
    agg.sparkSession.table(name)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Long, total_value: Double,
      started: java.sql.Timestamp, ended: java.sql.Timestamp)

  /** Streaming exact dedup: drop repeated `event_id`s arriving within the
    * watermark horizon — the streaming counterpart of `Dedup.exact` for
    * at-least-once upstream sources (file redelivery, replayed Kafka
    * offsets). `dropDuplicatesWithinWatermark` keeps only `idCols` state and
    * evicts it once the watermark passes, so state stays bounded at any
    * scale (a plain `dropDuplicates` on a stream retains ALL keys forever). */
  def dedupStream(events: DataFrame, idCols: Seq[String], watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Exactly-once under redelivery, end-to-end: the SAME event file is read
    * by TWO independent file-stream sources unioned together (every event
    * delivered twice — the at-least-once upstream simulated structurally,
    * not by mutating fixtures), then [[dedupStream]] on event_id drops the
    * replays. The drained rows are the exact original event set, which is
    * what makes this oracle-checkable: dedup keyed on a UNIQUE id keeps one
    * of two IDENTICAL rows, so the result is arrival-order independent.
    * Append-mode drain; per-type aggregation happens on the drained batch
    * (chaining a streaming agg after dedup would add a second stateful
    * operator this gate doesn't need). */
  def runDedupRedeliveryOverRawEvents(
      spark: SparkSession, path: String, name: String): DataFrame = {
    val s2 = statePinnedSession(spark)
    val doubled = rawEventsStream(s2, path).unionByName(rawEventsStream(s2, path))
    val ck = ephemeralCheckpoint()
    val q = dedupStream(doubled, Seq("event_id"), "1 hour").writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ck)
      .format("memory")
      .queryName(name)
      .start()
    try { q.processAllAvailable(); q.stop() } finally dropCheckpoint(ck)
    s2.table(name)
  }

  /** Watermark LATE-DATA DROP, end to end — the semantics every streaming
    * gate so far leaves unexercised (their fixtures arrive in one batch, so
    * nothing is ever late): the event history is split at `cutoffTs` and fed
    * as TWO micro-batches in inverted time order — recent events first, the
    * pre-cutoff tranche arriving AFTER the watermark has advanced past it.
    * [[hourlyAgg]]'s 1-hour watermark then (a) DROPS every late row (their
    * windows were finalized when the watermark passed), and (b) in append
    * mode emits exactly the windows whose end the final watermark passed —
    * trailing windows stay withheld. The result is therefore a pure
    * function of the fixture: hourly agg over the on-time tranche,
    * restricted to `window_end <= max(on-time ts, ms-floored) − 1h` — the
    * oracle-expressible watermark cut (the q19/q20 precedent; the fixture
    * has no exact hour-boundary max ts, so <= vs < cannot diverge).
    *
    * Batch order is pinned STRUCTURALLY (no modification-time games, which
    * proved unreliable on local filesystems): the on-time tranche is the
    * only data on disk when the query starts and is fully drained first;
    * the late tranche is written while the query is live and drained as a
    * later micro-batch — the StreamingSpec stop-append-restart precedent
    * without the restart. Scale note: the two-tranche rewrite is harness
    * plumbing — production late data arrives late on its own. */
  def runHourlyLateDropOverRawEvents(spark: SparkSession, path: String,
      name: String, cutoffTs: String): DataFrame = {
    val s2 = statePinnedSession(spark)
    val base = rawEvents(s2, path)
    val dir = java.nio.file.Files.createTempDirectory("graft_late_feed").toString
    val cut = lit(cutoffTs).cast("timestamp")
    base.filter(col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(s"$dir/a")
    val stream = s2.readStream.schema(EventSchema).parquet(s"$dir/*/part-*")
    val ck = ephemeralCheckpoint()
    val q = hourlyAgg(stream).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ck)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable() // drain the on-time tranche; watermark advances
      base.filter(col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(s"$dir/b")
      q.processAllAvailable() // the late tranche arrives behind the watermark
    } finally {
      q.stop()
      dropCheckpoint(ck)
      // the feed rewrite is ~2x the events fixture per call — bench runs
      // this repeatedly, so the temp dir must not accumulate. The memory
      // sink holds the result rows, so the files are dead once q stops.
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s2.sparkContext.hadoopConfiguration).delete(p, true)
    }
    s2.table(name)
  }

  final case class MicroEvent(user_id: Long, ts_us: Long)
  final case class MicroSession(user_id: Long, n_events: Long, started_us: Long, ended_us: Long)

  /** Gap-based sessionization at FULL microsecond precision (timestamps as
    * micros longs end-to-end, so session bounds survive a cross-engine
    * comparison exactly — `java.sql.Timestamp.getTime` would truncate to
    * millis). Same `flatMapGroupsWithState` machinery as [[sessionize]];
    * this variant is the one under the DuckDB oracle gate
    * (`q13_user_sessions`), where the oracle is the classic gaps-and-islands
    * lag/cumsum formulation.
    *
    * BATCH-ONLY CONTRACT: in batch execution each group arrives complete in
    * one invocation, so sorting it and ignoring `GroupState` is exact. On a
    * real stream this function would split sessions at every micro-batch
    * boundary — use [[sessionizeStream]] there, which carries open sessions
    * in `GroupState` with an event-time timeout. */
  def sessionizeByGap(events: Dataset[MicroEvent], gapMicros: Long): Dataset[MicroSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, MicroSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[MicroEvent], state: GroupState[SessionState]) =>
          val sorted = rows.map(_.ts_us).toArray
          java.util.Arrays.sort(sorted)
          val out = scala.collection.mutable.ArrayBuffer.empty[MicroSession]
          var n = 0L
          var start = 0L
          var last = 0L
          sorted.foreach { t =>
            if (n == 0L) { n = 1L; start = t; last = t }
            else if (t - last <= gapMicros) { n += 1L; last = t }
            else {
              out += MicroSession(userId, n, start, last)
              n = 1L; start = t; last = t
            }
          }
          if (n > 0L) out += MicroSession(userId, n, start, last)
          out.iterator
      }
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)

  /** STREAMING gap-based sessionization: open sessions live in `GroupState`
    * with an EVENT-TIME timeout, so a session spanning micro-batches is ONE
    * session (the batch-only variants above would split it at every batch
    * boundary).
    *
    * Protocol per micro-batch and user:
    *  - merge the batch's events (sorted — bounded by the micro-batch, never
    *    the user's full history) into the open session carried in state;
    *  - emit sessions closed by an in-batch gap immediately;
    *  - keep the trailing open session in state and arm a timeout at
    *    `last + gap`; when the watermark passes it, Spark calls back with
    *    `hasTimedOut` and the session is emitted and the state freed.
    *
    * State is O(1) per active user (one open session — n/start/last), and
    * eviction is watermark-driven, so state size is bounded by the number of
    * users active inside one gap window — the property that makes this safe
    * on an unbounded stream. Events later than the watermark are dropped by
    * Spark before reaching the function (standard late-data contract).
    *
    * `ts` (TimestampType) drives the watermark; `ts_us` carries the exact
    * microsecond value so session bounds match the batch variant bit-for-bit. */
  def sessionizeStream(
      events: Dataset[SessionEvent], gapMicros: Long, watermark: String): Dataset[MicroSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, MicroSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(MicroSession(userId, s.n, s.startUs, s.lastUs))
          } else {
            val batch = rows.map(_.ts_us).toArray // one micro-batch, not full history
            java.util.Arrays.sort(batch)
            val out = scala.collection.mutable.ArrayBuffer.empty[MicroSession]
            var cur = state.getOption.orNull
            batch.foreach { t =>
              if (cur == null) cur = SessionState(1L, 0.0, t, t)
              // gap is measured against the session's MAX timestamp; an event
              // earlier than lastUs (out-of-order within the watermark) merges
              // without rewinding the bounds — min/max keeps ended_us and the
              // armed timeout monotone
              else if (t - cur.lastUs <= gapMicros) cur = cur.copy(n = cur.n + 1,
                startUs = math.min(cur.startUs, t), lastUs = math.max(cur.lastUs, t))
              else {
                out += MicroSession(userId, cur.n, cur.startUs, cur.lastUs)
                cur = SessionState(1L, 0.0, t, t)
              }
            }
            if (cur != null) {
              state.update(cur)
              // timeout must land strictly past the current watermark
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, cur.lastUs / 1000 + gapMicros / 1000 + 1))
            }
            out.iterator
          }
      }
  }

  /** End-to-end [[sessionizeStream]] over the raw events parquet
    * (unit-normalized via [[rawEventsStream]]), drained through a memory sink: the file source reads all files
    * in ONE micro-batch (watermark 0 while it runs, so nothing is late),
    * the watermark then advances to `max(ts) - delay`, and Spark runs the
    * required follow-up batch in which event-time timeouts fire. Emitted =
    * sessions whose timeout (`last_ms + gap_ms + 1`) lies before that final
    * watermark; trailing still-open sessions remain in state — the streaming
    * contract, mirrored exactly by the `q14` oracle's closing filter. */
  def runSessionsOverRawEvents(
      spark: SparkSession, path: String, gapMicros: Long,
      watermark: String, name: String): DataFrame = {
    val s2 = statePinnedSession(spark)
    import s2.implicits._
    // unix_micros(timestamp_micros(x)) == x exactly, so ts_us carries the
    // same microsecond value on both the nanos and native branches
    val stream = rawEventsStream(s2, path)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("ts"), col("ts_us"))
      .as[SessionEvent]
    val ck = ephemeralCheckpoint()
    val q = sessionizeStream(stream, gapMicros, watermark).toDF().writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ck)
      .format("memory")
      .queryName(name)
      .start()
    try { q.processAllAvailable(); q.stop() } finally dropCheckpoint(ck)
    s2.table(name)
  }

  /** Purchase side of the attribution join: renamed so each side owns its
    * event-time column (a stream-stream join needs a watermark per side). */
  def purchaseSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase").select(
      col("event_id").as("purchase_id"),
      col("user_id").as("p_user"),
      col("ts").as("purchase_ts"))

  def clickSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click").select(
      col("event_id").as("click_id"),
      col("user_id").as("c_user"),
      col("ts").as("click_ts"))

  /** Per-user purchase←click attribution: every (purchase, click) pair of
    * the same user where the click landed within `lookbackMin` minutes
    * before (or at) the purchase — the classic ad-attribution /
    * feature-generation interval join, as ONE shared logical plan for batch
    * and streaming inputs.
    *
    * On a stream (both inputs from `readStream`, each side watermarked on
    * its own event-time column) this is a Spark stream-stream INNER join:
    * the equi-key (user) partitions state, and the time-range condition is
    * what makes unbounded-input state bounded — Spark derives a state
    * watermark from it and evicts buffered clicks once the purchase-side
    * watermark passes `click_ts + lookback`, and buffered purchases once the
    * click-side watermark passes `purchase_ts`. Without the range bound the
    * join would buffer both streams forever; with it, state is O(events per
    * user per lookback window) — safe at any scale. Inner-join matches emit
    * as soon as both rows arrive (nothing is withheld for the watermark), so
    * draining a bounded input yields exactly the batch join's rows. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame, lookbackMin: Int): DataFrame =
    purchases.join(clicks,
      col("p_user") === col("c_user")
        && col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookbackMin MINUTES")
        && col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))

  /** LEFT OUTER form of [[attributionJoin]]: purchases with no qualifying
    * click still appear, with null click columns. On a stream this is the
    * semantic that needs the watermark most: a null row can only be emitted
    * once the watermark PROVES no future click can match (click_ts <=
    * purchase_ts bounds the wait), so unmatched purchases surface with a
    * watermark's delay rather than never or too early. Spark requires
    * exactly the watermark + time-range condition this plan carries. */
  def attributionJoinLeftOuter(
      purchases: DataFrame, clicks: DataFrame, lookbackMin: Int): DataFrame =
    purchases.join(clicks,
      col("p_user") === col("c_user")
        && col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookbackMin MINUTES")
        && col("click_ts") <= col("purchase_ts"),
      "left_outer")
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))

  /** End-to-end STREAMING [[attributionJoin]] over the raw events parquet
    * (unit-normalized): two watermarked file streams over the same source,
    * joined, drained through an append-mode memory sink. With
    * `leftOuter = true`, the drained result additionally contains the
    * null-click rows for unmatched purchases whose state the final
    * watermark evicted (trailing purchases the watermark has not yet
    * cleared stay buffered — the streaming contract, mirrored by the
    * oracle's closing rule). */
  def runAttributionOverRawEvents(
      spark: SparkSession, path: String, lookbackMin: Int,
      watermark: String, name: String, leftOuter: Boolean = false,
      statePartitions: Int = 4): DataFrame = {
    // A stream-stream join keeps one state store per shuffle partition PER
    // SIDE and pays open/commit on each per micro-batch — cost ~linear in
    // partition count while this query's state is tiny. An isolated child
    // session (shared SparkContext, own conf — NOT a mutation of the
    // caller's session) pins the stateful operator's partition count: the
    // per-job knob for sizing state parallelism to state volume. Results
    // are partition-count-independent; only parallelism changes.
    // (q19 at sf0.1: 7.9 s -> 2.9 s steady-state from this alone.)
    val s2 = statePinnedSession(spark, statePartitions)
    // An INNER stream-stream join emits every result in the data batch
    // itself; the trailing no-data micro-batch exists only to advance the
    // watermark and evict state (~0.5 s of state-store open/commit at any
    // data size). Skip it for inner joins; LEFT OUTER needs it - that is
    // the batch that emits the unmatched-left nulls.
    if (!leftOuter)
      s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // ONE file-stream source feeding both join sides (a genuine self-join):
    // a second source would re-list the directory and keep its own offset
    // WAL per micro-batch — measured ~0.9 s of pure per-source fixed cost
    // at any data size (q11's whole floor). Watermarks are per-branch, so
    // each side still declares its own event-time column.
    val raw = rawEventsStream(s2, path)
    val p = purchaseSide(raw).withWatermark("purchase_ts", watermark)
    val c = clickSide(raw).withWatermark("click_ts", watermark)
    val joined =
      if (leftOuter) attributionJoinLeftOuter(p, c, lookbackMin)
      else attributionJoin(p, c, lookbackMin)
    val ck = ephemeralCheckpoint()
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ck)
      .format("memory")
      .queryName(name)
      .start()
    try { q.processAllAvailable(); q.stop() } finally dropCheckpoint(ck)
    s2.table(name)
  }

  /** Stateful sessionization with a processing-time gap timeout —
    * `flatMapGroupsWithState` over `KeyValueGroupedDataset`, the Spark-native
    * custom-state extension point (SURVEY §2.8/§2.9). BATCH-ONLY, like
    * [[sessionizeByGap]] — see [[sessionizeStream]] for the streaming form. */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // batch-mode usage: sessions close on gaps within the sorted group
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur: Option[SessionState] = None
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastUs <= gapMillis =>
                cur = Some(s.copy(n = s.n + 1, total = s.total + e.value, lastUs = t))
              case Some(s) =>
                out += Session(userId, s.n, s.total,
                  new java.sql.Timestamp(s.startUs), new java.sql.Timestamp(s.lastUs))
                cur = Some(SessionState(1, e.value, t, t))
              case None =>
                cur = Some(SessionState(1, e.value, t, t))
            }
          }
          cur.foreach(s => out += Session(userId, s.n, s.total,
            new java.sql.Timestamp(s.startUs), new java.sql.Timestamp(s.lastUs)))
          out.iterator
      }
  }
}
