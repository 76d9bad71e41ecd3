package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

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
  * ==Value-domain cardinality contract (r16 verdict #2)==
  * "Metadata-sized" holds only while the DOMAIN is small relative to the
  * data: ranking a near-unique column (a raw float score, a primary key)
  * makes `GROUP BY value` ≈ the corpus and the cumulative window becomes
  * the very single-task cliff this decomposition replaces — invisibly,
  * because the audit accepts any Aggregate child. The guard is therefore
  * IN THE PLAN: a metadata count over the domain relation (shares the
  * window node the total-count already needs — zero extra jobs) raises a
  * loud error when the domain exceeds `maxDomain` (default 10M rows ≈
  * ~320 MB in the single cumulative task — the
  * [[graft.operators.Graph]] `maxBroadcastRows` precedent). Remedy stated
  * in the error: quantize/bucket the value first (rank buckets, then rank
  * within buckets), or raise the cap deliberately at the call site.
  *
  * ==NULL contract==
  * SQL engines disagree on where NULL ranks (Spark NULLS FIRST vs DuckDB
  * NULLS LAST by default), and the offsets equi-join would silently DROP
  * null-valued rows while still counting them in the totals. Both silent;
  * so the operator refuses loudly instead: any NULL in the value column
  * raises from inside the domain scan (plan-embedded `raise_error`, the
  * perceptron convention — no separate guard job). Callers rank
  * `coalesce`d or pre-filtered columns deliberately.
  *
  * Determinism contract: `tieCols` must totally order rows WITHIN each
  * value group (a primary key suffices); then ranks are bit-identical to
  * the single-task `row_number() OVER (ORDER BY value, ties...)`, so
  * DuckDB oracles keep their plain global-window formulation while the
  * Spark side runs the distributed plan.
  */
object Ranks {

  /** Default domain-cardinality cap: the cumulative-offset task holds one
    * row per distinct value (~32 B each) — 10M ≈ 320 MB, comfortably
    * inside one executor task yet far above any value domain that
    * deserves exact per-value ranking (quantize first beyond it). */
  val MaxDomainDefault: Long = 10000000L

  private def nullGuard(c: Column, colName: String, op: String): Column =
    when(c.isNull, raise_error(lit(
      s"Ranks.$op: NULL in value column '$colName' — NULL rank position " +
        "diverges across engines (NULLS FIRST vs LAST) and the offset " +
        "join would drop the rows; coalesce or filter nulls first")))
      .otherwise(c)

  private def domainGuard(domCnt: Column, cap: Long, op: String): Column =
    when(domCnt > cap, raise_error(concat(
      lit(s"Ranks.$op: value domain has "), domCnt.cast("string"),
      lit(s" distinct values > maxDomain=$cap — the cumulative-offset " +
        "window would be data-sized (the single-task cliff this " +
        "decomposition exists to avoid); quantize/bucket the value " +
        "first, or raise maxDomain deliberately at the call site"))))

  /** Append 1-based global rank `out` under ORDER BY (`valueCol`,
    * `tieCols`...), plus the total row count as `nOut` (ntile arithmetic
    * needs it; computed as a second metadata window over the same value
    * domain — no extra pass over the data). Helper columns are dropped.
    *
    * Refuses loudly (see object scaladoc) on NULL values and on value
    * domains larger than `maxDomain`; both checks ride the existing plan
    * (no extra jobs). */
  def globalRank(df: DataFrame, valueCol: String, tieCols: Seq[String],
      out: String, nOut: String,
      maxDomain: Long = MaxDomainDefault): DataFrame = {
    val checked = df.withColumn(valueCol,
      nullGuard(col(valueCol), valueCol, "globalRank"))
    // Two passes over the input BY MEASUREMENT (r17): a one-pass variant
    // (domain = the rn==1 slice of the ranking window's own exchange, the
    // pairRanks shape) was tried and benched SLOWER here — the slice
    // re-executes the window SORT once per consumer on top of the reused
    // exchange, while this domain aggregate is a sort-free hash agg; with
    // near-data-sized value domains (layout keys) the extra sort dominates
    // the saved input evaluation. pairRanks keeps the slice shape because
    // its stacked input doubles the rows AND its projection (a tokenizer)
    // is the dominant cost there.
    val dom = checked.groupBy(col(valueCol).as("__rk_v"))
      .agg(count(lit(1)).as("__rk_cnt"))
    val wAll = Window.partitionBy()
    val offs = dom
      .withColumn("__rk_off", coalesce(
        sum(col("__rk_cnt")).over(Window.orderBy(col("__rk_v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // domain count shares the unordered metadata window with the total —
      // the guard costs no extra shuffle or job, and fires on first use
      .withColumn(nOut, sum(col("__rk_cnt")).over(wAll))
      .withColumn("__rk_off", coalesce(
        domainGuard(count(lit(1)).over(wAll), maxDomain, "globalRank"),
        col("__rk_off")))
      .select(col("__rk_v"), col("__rk_off"), col(nOut))
    val wLoc = Window.partitionBy(col(valueCol)).orderBy(tieCols.map(col): _*)
    checked.join(offs, col(valueCol) === col("__rk_v"))
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
      buckets: Int, out: String,
      maxDomain: Long = MaxDomainDefault): DataFrame =
    globalRank(df, valueCol, tieCols, "__rk_rank", "__rk_n", maxDomain)
      .withColumn(out, expr(
        s"""CASE WHEN __rk_rank <= (__rk_n % $buckets) * ((__rk_n div $buckets) + 1)
           |THEN (__rk_rank - 1) div ((__rk_n div $buckets) + 1)
           |ELSE (__rk_n % $buckets)
           |  + (__rk_rank - 1 - (__rk_n % $buckets) * ((__rk_n div $buckets) + 1))
           |    div (__rk_n div $buckets)
           |END""".stripMargin))
      .drop("__rk_rank", "__rk_n")

  /** BOTH columns' global ranks in ONE fused pipeline — for consumers that
    * rank two features of the same relation and join the ranks on id
    * (Spearman ρ): two separate [[globalRank]] calls cost two aggregates,
    * two joins, two windows and — the dominant cost when the ranked
    * columns are computed (a tokenizer, a regex) — FOUR scans of the
    * input. This stacks the columns into (id, which, value) — 2n rows —
    * and runs one partitioned window pass that yields BOTH the
    * within-value row_number and the value counts; the value-domain
    * relation is the rn==1 slice of the same pass (ReusedExchange: the
    * input projection evaluates once), so the whole dual ranking is one
    * scan, one data-sized exchange, one domain-sized cumulative window
    * and one offsets join, then a pivot back to one row per id (r16
    * verdict #4: feature_rank_corr's 2.39× floor cost).
    *
    * Exactness: within each `which` branch the rank is the same
    * offset+row_number decomposition as [[globalRank]] — the cumulative
    * window is PARTITIONED BY which and ordered by that branch's value
    * (the inactive branch's value column is constant-NULL inside a
    * partition, so it never affects the order) — hence bit-identical per
    * column to `row_number() OVER (ORDER BY value, id)`. Same NULL
    * refusal and per-branch `maxDomain` guard as [[globalRank]]. The
    * offsets join back null-safely (`<=>`) because each stacked row
    * carries one real value and one NULL.
    *
    * Output: (id, aRank, bRank), one row per input row. */
  def pairRanks(df: DataFrame, idCol: String, aCol: String, bCol: String,
      aRank: String, bRank: String,
      maxDomain: Long = MaxDomainDefault): DataFrame = {
    val aT: DataType = df.select(col(aCol)).schema.head.dataType
    val bT: DataType = df.select(col(bCol)).schema.head.dataType
    val stacked = df.select(col(idCol).as("__pr_id"),
        nullGuard(col(aCol), aCol, "pairRanks").as("__pr_a"),
        nullGuard(col(bCol), bCol, "pairRanks").as("__pr_b"))
      .select(col("__pr_id"), explode(array(
        struct(lit("a").as("w"), col("__pr_a").as("va"),
          lit(null).cast(bT).as("vb")),
        struct(lit("b").as("w"), lit(null).cast(aT).as("va"),
          col("__pr_b").as("vb")))).as("s"))
      .select(col("__pr_id"), col("s.w").as("__pr_w"),
        col("s.va").as("__pr_va"), col("s.vb").as("__pr_vb"))
    // ONE pass computes both the within-value row_number and the value
    // counts (two frames over the same (which, value) partitioning — one
    // exchange); the domain relation is then just the rn==1 rows of the
    // SAME exchange output (ReusedExchange — the possibly-expensive input
    // projection, e.g. a tokenizer, evaluates once, not once per pass)
    val wVal = Window.partitionBy(col("__pr_w"), col("__pr_va"),
      col("__pr_vb"))
    val ranked = stacked
      .withColumn("__pr_rn",
        row_number().over(wVal.orderBy(col("__pr_id"))).cast("long"))
      .withColumn("__pr_cnt", count(lit(1)).over(wVal))
    val dom = ranked.filter(col("__pr_rn") === 1L)
      .select(col("__pr_w").as("__pr_dw"), col("__pr_va").as("__pr_dva"),
        col("__pr_vb").as("__pr_dvb"), col("__pr_cnt").as("__pr_dcnt"))
    val wBranch = Window.partitionBy(col("__pr_dw"))
    val offs = dom
      .withColumn("__pr_off", coalesce(
        sum(col("__pr_dcnt")).over(wBranch
          .orderBy(col("__pr_dva"), col("__pr_dvb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__pr_off", coalesce(
        domainGuard(count(lit(1)).over(wBranch), maxDomain, "pairRanks"),
        col("__pr_off")))
      .select(col("__pr_dw"), col("__pr_dva"), col("__pr_dvb"),
        col("__pr_off"))
    // offs is domain-sized (≤ maxDomain per branch) and the big side is
    // already hash-partitioned on the join keys by the window exchange —
    // the join re-shuffles only the offsets
    ranked
      .join(offs, col("__pr_w") === col("__pr_dw") &&
        col("__pr_va") <=> col("__pr_dva") &&
        col("__pr_vb") <=> col("__pr_dvb"))
      .withColumn("__pr_r", col("__pr_off") + col("__pr_rn"))
      .groupBy(col("__pr_id").as(idCol))
      .agg(max(when(col("__pr_w") === "a", col("__pr_r"))).as(aRank),
        max(when(col("__pr_w") === "b", col("__pr_r"))).as(bRank))
  }
}
