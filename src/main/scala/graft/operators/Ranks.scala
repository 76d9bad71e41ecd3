package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT total ranking — the scale-safe replacement for a global
  * `row_number()`/`ntile()` window (which moves the whole relation to one
  * task: the classic cliff [[graft.plans.WindowAudit]] guards against).
  *
  * Decomposition: the global rank of a row under ORDER BY (value, ties...)
  * is
  *
  *   rank = (# rows with a strictly smaller value)            — the OFFSET
  *        + (row_number among equal-value rows, ordered by ties)
  *
  * The offset needs only the VALUE-DOMAIN relation (`GROUP BY value` counts
  * — an aggregate whose row count is a statistic of the data, not the
  * data), so its cumulative window is metadata-sized and audit-clean; the
  * within-value row_number is a PARTITIONED window that scales out. One
  * shuffle for the aggregate, one equi-join of the offsets back to the
  * rows, one partitioned window — every stage distributed. Skew bound: the
  * largest single task is the heaviest value group, not the table.
  *
  * Determinism contract: `tieCols` must totally order rows WITHIN each
  * value group (a primary key suffices); then ranks are bit-identical to
  * the single-task `row_number() OVER (ORDER BY value, ties...)`, so
  * DuckDB oracles keep their plain global-window formulation while the
  * Spark side runs the distributed plan.
  */
object Ranks {

  /** Append 1-based global rank `out` under ORDER BY (`valueCol`,
    * `tieCols`...), plus the total row count as `nOut` (ntile arithmetic
    * needs it; computed as a second metadata window over the same value
    * domain — no extra pass over the data). Helper columns are dropped. */
  def globalRank(df: DataFrame, valueCol: String, tieCols: Seq[String],
      out: String, nOut: String): DataFrame = {
    val dom = df.groupBy(col(valueCol).as("__rk_v"))
      .agg(count(lit(1)).as("__rk_cnt"))
    val offs = dom
      .withColumn("__rk_off", coalesce(
        sum(col("__rk_cnt")).over(Window.orderBy(col("__rk_v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(nOut, sum(col("__rk_cnt")).over(Window.partitionBy()))
      .select(col("__rk_v"), col("__rk_off"), col(nOut))
    val wLoc = Window.partitionBy(col(valueCol)).orderBy(tieCols.map(col): _*)
    df.join(offs, col(valueCol) === col("__rk_v"))
      .withColumn(out, col("__rk_off") + row_number().over(wLoc).cast("long"))
      .drop("__rk_v", "__rk_off")
  }

  /** [[globalRank]] + the ntile projection: append the ZERO-based
    * equi-depth bucket of `valueCol` (ties broken by `tieCols`) as `out`.
    *
    * SQL ntile(k) over n rows gives the first (n mod k) buckets ceil(n/k)
    * rows and the rest floor(n/k) — pure integer arithmetic once the
    * global rank is known, so this distributed plan is bit-identical to
    * `ntile(k) OVER (ORDER BY value, ties...) - 1` (oracles keep the plain
    * window formulation). The ELSE branch's divisor floor(n/k) is zero
    * only when n < k, and then rank ≤ n = (n mod k)·1 keeps every row in
    * the THEN branch (CASE evaluates lazily, so ANSI never divides). */
  def rankBucket(df: DataFrame, valueCol: String, tieCols: Seq[String],
      buckets: Int, out: String): DataFrame =
    globalRank(df, valueCol, tieCols, "__rk_rank", "__rk_n")
      .withColumn(out, expr(
        s"""CASE WHEN __rk_rank <= (__rk_n % $buckets) * ((__rk_n div $buckets) + 1)
           |THEN (__rk_rank - 1) div ((__rk_n div $buckets) + 1)
           |ELSE (__rk_n % $buckets)
           |  + (__rk_rank - 1 - (__rk_n % $buckets) * ((__rk_n div $buckets) + 1))
           |    div (__rk_n div $buckets)
           |END""".stripMargin))
      .drop("__rk_rank", "__rk_n")
}
