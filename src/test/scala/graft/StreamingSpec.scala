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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    ev.write.mode("overwrite").parquet(dir)

    val batch = EventStream.hourlyAgg(spark.read.parquet(dir))
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = EventStream.runHourlyBatchOverStream(spark, dir, "hourly_test")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(batch.nonEmpty)
    assert(batch == stream)
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

    // streaming the raw nanos parquet equals the batch aggregation over it
    val raw = "/root/testdata/sf0.001/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchEv = spark.read.parquet(raw)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val batch = EventStream.hourlyAgg(batchEv)
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = EventStream.runHourlyOverRawEvents(spark, raw, "raw_hourly_test")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(batch.nonEmpty && batch == stream)
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
}
