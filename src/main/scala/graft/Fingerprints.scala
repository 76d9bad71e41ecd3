package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-table input fingerprints for the correctness gate.
  *
  * Round 8 lost its entire events family to silent fixture drift: the
  * driver's `events.parquet` changed physical type between rounds and the
  * misread produced 1970-era garbage that still aggregated, joined, and
  * wrote parquet without a single error. This module is the gate's
  * self-protection: before any query runs, every input table's row count,
  * key-column range, and time-column range are computed, printed for the
  * round log, and CHECKED — a time column whose min/max falls outside the
  * plausible [1990, 2100) epoch window aborts the run loudly instead of
  * letting a full round of silently-wrong output through.
  *
  * Cost: one count+min/max aggregation per table (a single scan each at gate
  * SF; at production scale the same check would ride on footer statistics
  * instead — the parquet column min/max in each footer — so the contract
  * stays O(metadata), not O(data)).
  */
object Fingerprints {

  final case class ColFp(name: String, dataType: String, min: String, max: String)
  final case class TableFp(table: String, rows: Long, cols: Seq[ColFp])

  private val EpochLo = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")
  private val EpochHi = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")

  /** Columns worth fingerprinting: the leading (key) column plus every
    * date/time column — the two places unit/epoch drift shows up. */
  private def fpCols(df: DataFrame): Seq[StructField] = {
    val fields = df.schema.fields
    val timeish = fields.filter(f =>
      f.dataType == TimestampType || f.dataType == DateType || f.dataType == TimestampNTZType)
    (fields.take(1) ++ timeish).distinct.toSeq
  }

  def fingerprint(spark: SparkSession, table: String, df: DataFrame): TableFp = {
    val cols = fpCols(df)
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(f => Seq(
        min(col(f.name)).cast("string").as(s"min_${f.name}"),
        max(col(f.name)).cast("string").as(s"max_${f.name}")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    TableFp(table, r.getAs[Long]("rows"),
      cols.map(f => ColFp(f.name, f.dataType.simpleString,
        Option(r.getAs[String](s"min_${f.name}")).getOrElse("null"),
        Option(r.getAs[String](s"max_${f.name}")).getOrElse("null"))))
  }

  /** Epoch sanity: every time-typed column's observed range must sit inside
    * [1990, 2100). Pure over the fingerprint values so a spec can probe it
    * without files. */
  def assertSane(fps: Seq[TableFp]): Unit = fps.foreach { fp =>
    fp.cols.filter(c => c.dataType.startsWith("timestamp") || c.dataType == "date")
      .foreach { c =>
        if (c.min != "null") {
          // string min/max of a cast timestamp/date is ISO-ordered, so a
          // lexicographic bound check equals a temporal one
          val lo = EpochLo.toString.take(10)
          val hi = EpochHi.toString.take(10)
          require(c.min.take(10) >= lo && c.max.take(10) < hi,
            s"FINGERPRINT FAILURE: ${fp.table}.${c.name} spans [${c.min}, ${c.max}] — " +
              s"outside the plausible [$lo, $hi) epoch window. The input fixture's " +
              "physical encoding has almost certainly drifted (wrong timestamp unit?); " +
              "refusing to produce silently-wrong output.")
        }
      }
  }

  /** Fingerprints every known input table under `sfDir` (skipping absent
    * ones), prints one log line per table, and fails fast on anomalies. */
  def report(spark: SparkSession, sfDir: String): Seq[TableFp] = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // Existence goes through Hadoop FS (same as every reader) so the
    // preflight still guards object-store paths — java.io.File would skip
    // every table on s3a:// and the gate would pass vacuously.
    val hConf = spark.sessionState.newHadoopConf()
    val fps = tables.flatMap { t =>
      val path = s"$sfDir/$t.parquet"
      val hPath = new org.apache.hadoop.fs.Path(path)
      if (!hPath.getFileSystem(hConf).exists(hPath)) None
      else {
        // events goes through the unit-normalizing reader — the fingerprint
        // must see the same bytes the queries will
        val df =
          if (t == "events") graft.streaming.EventStream.rawEvents(spark, path)
          else spark.read.parquet(path)
        val note =
          if (t == "events")
            if (graft.streaming.EventStream.tsIsNanos(spark, path)) " ts_unit=NANOS(div1000)"
            else " ts_unit=native"
          else ""
        val fp = fingerprint(spark, t, df)
        println(s"[fingerprint] table=$t rows=${fp.rows}$note " +
          fp.cols.map(c => s"${c.name}:${c.dataType}=[${c.min},${c.max}]").mkString(" "))
        Some(fp)
      }
    }
    require(fps.nonEmpty,
      s"FINGERPRINT FAILURE: zero input tables found under $sfDir — the gate " +
        "would pass vacuously. Wrong directory, or a filesystem the configured " +
        "Hadoop FS cannot see.")
    assertSane(fps)
    fps
  }
}
