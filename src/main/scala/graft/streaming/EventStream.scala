package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

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

  /** Same as [[runHourlyBatchOverStream]] but streaming DIRECTLY over raw
    * TIMESTAMP(NANOS) parquet (the `events` table's physical type): ts is
    * surfaced as a nanos long via the legacy reader conf and truncated to
    * microseconds in-stream — no temp rewrite of the source. At scale this
    * matters: re-materializing the input to change a timestamp unit would
    * double the IO of every backfill. */
  def runHourlyOverRawEvents(spark: SparkSession, path: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nanosSchema = StructType(EventSchema.map {
      case f if f.name == "ts" => f.copy(dataType = LongType)
      case f => f
    })
    // "*" turns a single-FILE path into a glob: FileStreamSource accepts
    // globs but rejects a bare file as basePath (directories only)
    // integer `div`, not `/`: double division of nano-epoch longs rounds
    // the microsecond quotient up on ~half the inputs
    val stream = spark.readStream.schema(nanosSchema).parquet(path + "*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    drainToMemory(hourlyAgg(stream), name)
  }

  private def drainToMemory(agg: DataFrame, name: String): DataFrame = {
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    agg.sparkSession.table(name)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Long, total_value: Double,
      started: java.sql.Timestamp, ended: java.sql.Timestamp)
  private final case class SessionState(n: Long, total: Double, start: Long, last: Long)

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

  final case class MicroEvent(user_id: Long, ts_us: Long)
  final case class MicroSession(user_id: Long, n_events: Long, started_us: Long, ended_us: Long)

  /** Gap-based sessionization at FULL microsecond precision (timestamps as
    * micros longs end-to-end, so session bounds survive a cross-engine
    * comparison exactly — `java.sql.Timestamp.getTime` would truncate to
    * millis). Same `flatMapGroupsWithState` machinery as [[sessionize]];
    * this variant is the one under the DuckDB oracle gate
    * (`q13_user_sessions`), where the oracle is the classic gaps-and-islands
    * lag/cumsum formulation. */
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

  /** Stateful sessionization with a processing-time gap timeout —
    * `flatMapGroupsWithState` over `KeyValueGroupedDataset`, the Spark-native
    * custom-state extension point (SURVEY §2.8/§2.9). */
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
              case Some(s) if t - s.last <= gapMillis =>
                cur = Some(s.copy(n = s.n + 1, total = s.total + e.value, last = t))
              case Some(s) =>
                out += Session(userId, s.n, s.total,
                  new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last))
                cur = Some(SessionState(1, e.value, t, t))
              case None =>
                cur = Some(SessionState(1, e.value, t, t))
            }
          }
          cur.foreach(s => out += Session(userId, s.n, s.total,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last)))
          out.iterator
      }
  }
}
