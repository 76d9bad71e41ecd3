package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-engineering and data-profiling operators for curation pipelines.
  *
  * Both operators here are deliberately built WITHOUT a global sort: the
  * naive forms (ntile for binning, ORDER BY for profiling extremes) totally
  * order the corpus — the one operation that cannot scale past a single
  * reducer's worth of data. Quantile binning instead computes k-1 exact
  * percentile THRESHOLDS (one aggregation) and assigns bins by comparison
  * (scan-speed projection); profiling is plain aggregation.
  */
object Features {

  /** Equi-depth (quantile) binning of a BIGINT column into k bins:
    * thresholds are exact `percentile(col, i/k)` cut points — Spark's
    * interpolation is bit-identical to DuckDB `quantile_cont` on BIGINT
    * inputs (pinned r5, corpus_quantiles) — and the assignment
    * `1 + Σ [v > t_i]` is a pure projection against k-1 literal doubles.
    * No global sort, no window: ONE aggregate + one scan, so the operator
    * is corpus-size-indifferent where ntile would funnel 100 TB through a
    * single total order. Returns per-bin (bin, n, min_v, max_v).
    *
    * Values equal to a threshold fall in the lower bin (strict `>` on both
    * engines); heavy ties can therefore make bins uneven — inherent to
    * equi-depth binning on discrete data, not an implementation artifact. */
  def binByQuantiles(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "need at least two bins")
    val aggs = (1 until k).map(i =>
      expr(s"percentile($valueCol, ${i.toDouble / k})").as(s"t$i"))
    val cuts = df.agg(aggs.head, aggs.tail: _*).head()
    val thresholds = (0 until k - 1).map(cuts.getDouble)
    val bin = thresholds.foldLeft(lit(1L)) { (acc, t) =>
      acc + when(col(valueCol) > lit(t), lit(1L)).otherwise(lit(0L))
    }
    df.select(bin.as("bin"), col(valueCol).as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  /** One-pass table profiler — the "ANALYZE TABLE" a pipeline runs after
    * every ingest: per column, row count, null count, exact distinct count,
    * and min/max rendered as strings for a uniform schema. A single
    * aggregation over the scan (Spark plans the multiple DISTINCTs via one
    * Expand — k× the rows map-side, still one pass over storage, no second
    * read of a 100 TB table); the unpivot to one row per column is
    * metadata-sized. */
  /** The profiler's single aggregation — exposed so plan tests can pin the
    * one-scan property ([[profile]]'s returned frame is literal). */
  private[graft] def profileAgg(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // ONE action; the per-column unpivot is built from the collected row
    // (6 values per column — metadata), not by re-running the aggregate
    val row = profileAgg(df, cols).head()
    val spark = df.sparkSession
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(i * 5), row.getLong(i * 5 + 1), row.getLong(i * 5 + 2),
        row.getString(i * 5 + 3), row.getString(i * 5 + 4))
    }.toDF("column", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
  }
}
