package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations and snapshot auditing — the checks
  * a corpus pipeline runs after every ingest before promoting a snapshot
  * (the Deequ/expectations pattern re-expressed as plain aggregation).
  *
  * Constraint evaluation is ONE aggregation pass over the scan: every rule
  * contributes a violation-count aggregate, so checking 20 rules on 100 TB
  * costs one read, not 20. Snapshot diff is a single full-outer equi-join
  * on the key — both sides hash-partition on it, nothing else moves.
  */
object Quality {

  /** One data-quality expectation. `label` keys the report row; `violations`
    * is an aggregate expression counting offending rows. */
  final case class Rule(label: String, violations: Column)

  /** Per-group completeness audit: for every (group, column), row count,
    * null count and a per-mille null rate — the "which SOURCE stopped
    * sending field X" monitor a global null rate hides (one broken feed
    * inside a healthy corpus moves the total by noise). ONE aggregation
    * pass (all per-column null sums in the same agg), unpivoted via
    * `stack` — 20 columns on 100 TB still cost a single scan, the same
    * contract as [[check]]. Integer per-mille, no float. */
  def completeness(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to audit")
    // names are interpolated into the stack() SQL below: escape quotes in
    // the label literal and backtick-quote the aliases so a column named
    // `weird col` (or worse) can't parse-error or mis-bind
    cols.foreach(c => require(!c.contains("`"),
      s"column name with a backtick cannot be audited: $c"))
    val nullSums = cols.map(c => // backtick-quoted: a dot in a plain col()
      // reference would resolve as struct-field access, not a column name
      sum(when(col(s"`$c`").isNull, 1L).otherwise(0L)).as(s"__n_$c"))
    val base = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_rows"), nullSums: _*)
    val stackArgs = cols.map(c =>
      s"'${c.replace("'", "''")}', `__n_$c`").mkString(", ")
    base.select(col("grp").as(groupCol), col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) as (column, n_nulls)"))
      .withColumn("null_permille", expr("n_nulls * 1000 div n_rows"))
  }

  /** Referential-integrity check for a batch of foreign-key relationships:
    * per relationship, child rows whose key has NO parent (orphans), plus
    * the child row count and min/max orphan key for triage — the star-
    * schema promotion gate beside [[check]]'s per-column expectations.
    * Each relationship is one LEFT ANTI equi-join (broadcast when the
    * parent key set fits, shuffle otherwise) + one aggregate; null child
    * keys are not orphans (SQL FK semantics — pair with [[notNull]] to
    * forbid them). */
  def fkOrphans(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    relations.map { case (label, child, childKey, parent, parentKey) =>
      val flagged = child.select(col(childKey).as("k"))
        .join(parent.select(col(parentKey).as("k")).distinct()
          .withColumn("__p", lit(1L)), Seq("k"), "left")
      val isOrphan = col("k").isNotNull && col("__p").isNull
      flagged.agg(
        count(lit(1)).as("n_child"),
        sum(when(isOrphan, 1L).otherwise(0L)).as("n_orphans"),
        min(when(isOrphan, col("k"))).cast("long").as("min_orphan_key"),
        max(when(isOrphan, col("k"))).cast("long").as("max_orphan_key"))
        .select(lit(label).as("relationship"), col("n_child"),
          col("n_orphans"), col("min_orphan_key"), col("max_orphan_key"))
    }.reduce(_ unionByName _)

  /** `col` must never be null. */
  def notNull(c: String): Rule =
    Rule(s"not_null($c)", sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** `col` values must be unique (violations = non-null rows beyond the
    * first of each value; counts each duplicate row, not each duplicated
    * value). NULLs are ignored — both `count(col)` and `count_distinct`
    * skip them, so duplicate NULL keys are never violations and an all-
    * NULL column passes; pair with [[notNull]] for key columns, same as
    * the [[inRange]]/[[acceptedValues]] convention. */
  def unique(c: String): Rule =
    Rule(s"unique($c)", count(col(c)) - count_distinct(col(c)))

  /** `col` must lie in [lo, hi]; nulls are not range violations (pair with
    * [[notNull]] to forbid them). */
  def inRange(c: String, lo: Long, hi: Long): Rule =
    Rule(s"in_range($c,$lo,$hi)",
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L)))

  /** `col` must be one of `values` (nulls excluded, as with [[inRange]]). */
  def acceptedValues(c: String, values: Seq[String]): Rule =
    Rule(s"accepted_values($c)",
      sum(when(col(c).isNotNull && !col(c).isInCollection(values), 1L).otherwise(0L)))

  /** Conditional expectation (Deequ's `satisfies` with a where-clause):
    * every row matching `cond` must also satisfy `expect` — the
    * cross-field rules ([[inRange]] and friends are single-column) that
    * catch "purchases with zero value" or "zh docs tagged source=web-en".
    * A row where `expect` evaluates to NULL under a matching `cond` is a
    * violation (unknown is not compliance — pair with [[notNull]] if the
    * field is allowed to be absent). Same one-aggregate contract as every
    * rule. */
  def implies(label: String, cond: Column, expect: Column): Rule =
    Rule(s"implies($label)",
      sum(when(cond && !coalesce(expect, lit(false)), 1L).otherwise(0L)))

  /** The COMBINATION of `cols` must be unique (composite business key) —
    * violations count duplicate rows beyond the first of each combination.
    * NULL fields participate in the combination (two (NULL, 'a') rows ARE
    * duplicates — struct equality, not SQL null-propagation), which is the
    * useful reading for a key audit. */
  def uniqueTogether(cols: Seq[String]): Rule = {
    require(cols.size >= 2, "uniqueTogether needs at least two columns (use unique for one)")
    Rule(s"unique_together(${cols.mkString(",")})",
      count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
  }

  /** The single aggregation all rules share — exposed so plan tests can
    * pin the one-scan property (the returned frame of [[check]] is built
    * from the collected row and carries no scan). */
  private[graft] def checkAgg(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r => r.violations.cast("long").as(r.label))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Evaluate every rule in ONE pass. Returns (rule, violations, passed)
    * with passed as 0/1 BIGINT (cross-engine-stable instead of boolean). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val row = checkAgg(df, rules).head()
    val spark = df.sparkSession
    import spark.implicits._
    rules.zipWithIndex.map { case (r, i) =>
      val v = row.getLong(i)
      (r.label, v, if (v == 0L) 1L else 0L)
    }.toDF("rule", "violations", "passed")
  }

  /** Row-level diff of two corpus snapshots keyed on `keyCol`: which keys
    * were added, removed, changed (any of `cols` differs, null-safely), or
    * unchanged. The ingest audit that catches silent overwrites and
    * accidental deletions before a snapshot is promoted. */
  def snapshotDiff(
      base: DataFrame, current: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    val b = base.select(
      (col(keyCol).as("k") +: lit(1L).as("__b") +: cols.map(c => col(c).as(s"b_$c"))): _*)
    val c = current.select(
      (col(keyCol).as("k") +: lit(1L).as("__c") +: cols.map(cn => col(cn).as(s"c_$cn"))): _*)
    val changed = cols.map(cn => not(col(s"b_$cn") <=> col(s"c_$cn")))
      .reduce(_ || _)
    b.join(c, Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("__b").isNull, lit("added"))
          .when(col("__c").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Conflicting-duplicate detection: groups of records that agree on a
    * content key (hash of the payload) but DISAGREE on an attribute —
    * identical documents carrying different language tags or licence
    * labels, the label-noise class exact dedup silently papers over (it
    * keeps one row and an arbitrary winner's metadata). Surfacing the
    * conflict is a QA gate BEFORE dedup chooses.
    *
    * Per conflicted key: member count, distinct attribute count, and the
    * sorted comma-joined attribute list (sort_array over collect_set —
    * deterministic regardless of partition order; NULL attributes are
    * their own value via a sentinel so "tagged vs untagged" is a conflict
    * too). Only keys with ≥ 2 distinct attribute values emit.
    *
    * Scale shape: one hash groupBy with map-side combine; the collected
    * set is per-group attribute-domain bounded, never corpus-sized.
    * Returns (content_key, n_records, n_values, values). */
  def conflictingRecords(df: DataFrame, contentKey: Column, attr: Column): DataFrame = {
    df.select(contentKey.as("content_key"),
        coalesce(attr.cast("string"), lit(" null")).as("v"))
      .groupBy(col("content_key"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("v")).as("n_values"),
        array_join(sort_array(collect_set(col("v"))), ",").as("values"))
      .filter(col("n_values") >= 2)
  }

  /** Benford's-law first-digit micro-probabilities, LITERAL on both
    * engines (log10(1+1/d)·10⁶, the literal-weight-table rule — no
    * transcendental is evaluated anywhere). */
  private val BenfordMicro: Seq[Long] = Seq(
    301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** Benford's-law first-digit audit over a POSITIVE integer measure — the
    * fabricated/synthetic-amounts detector (organically-grown magnitudes
    * follow log-uniform leading digits; uniform generators, capped fields
    * and hand-typed figures don't): per digit the observed count, the
    * observed share ×10⁶ (exact decomposed product), the literal Benford
    * expectation and the signed deviation. Total |dev| > ~150000 is the
    * conventional "not organic" line; the caller sums. Nonpositive values
    * are EXCLUDED and reported via n_total vs Σn (Benford is undefined
    * there, silently binning them would fake conformity). One map-side-
    * combined digit aggregate; output is exactly ≤ 9 rows. */
  def benford(df: DataFrame, valueCol: Column): DataFrame = {
    val pos = df.select(valueCol.cast("long").as("v")).filter(col("v") > 0)
    val digits = pos
      .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expected = org.apache.spark.sql.functions.array(BenfordMicro.map(lit): _*)
    digits
      .withColumn("n_pos", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("share_micro",
        expr("(n div n_pos) * 1000000 + ((n % n_pos) * 1000000) div n_pos"))
      .withColumn("expected_micro", element_at(expected, col("digit").cast("int")))
      .withColumn("dev_micro", col("share_micro") - col("expected_micro"))
      .select(col("digit"), col("n"), col("n_pos"), col("share_micro"),
        col("expected_micro"), col("dev_micro"))
  }
}
