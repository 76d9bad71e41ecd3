package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental corpus ingestion: JSONL landing directory -> parquet table,
  * exactly-once across restarts.
  *
  * The pattern every training-data pipeline needs at the front door: crawlers
  * drop newline-delimited JSON files into a landing prefix; each ingest run
  * picks up ONLY the files not yet committed, applies an optional transform
  * (curation filter, normalization, PII redaction — any DataFrame function),
  * and appends to the canonical parquet corpus.
  *
  * Exactly-once comes from Structured Streaming's own contract — the file
  * source records processed files in the checkpoint WAL and the file sink
  * commits atomically through its manifest — so a crashed run resumes without
  * dups or gaps; nothing hand-rolled. `Trigger.AvailableNow` drains
  * everything pending and STOPS, which turns the streaming query into a
  * restartable incremental batch job (cron-able; the scheduler the reference
  * lacks). At 100 TB scale the same query, minus the trigger, runs
  * continuously.
  *
  * The schema is declared, not inferred: file-stream sources require it, and
  * a corpus contract should not drift with whatever the newest crawl file
  * contains.
  */
object CorpusIngest {

  /** Drain all pending JSONL files from `landingDir` into `tableDir`.
    * Returns the number of NEW rows committed this run. */
  def ingestJsonlOnce(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      tableDir: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity,
      maxFilesPerTrigger: Option[Int] = None): Long = {
    val before = committedRows(spark, tableDir)
    var reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val src = reader.json(landingDir)
    val q = transform(src).writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    committedRows(spark, tableDir) - before
  }

  /** Rows visible through the file-sink manifest (the committed view — raw
    * directory listings would count uncommitted task files). */
  def committedRows(spark: SparkSession, tableDir: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(tableDir, "_spark_metadata"))) 0L
    else spark.read.parquet(tableDir).count()
  }
}
