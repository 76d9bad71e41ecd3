package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the LATEST right
  * row of the same key whose timestamp is <= the left timestamp — the
  * standard feature-pipeline primitive ("state of the account when the event
  * happened") that Spark has no native operator for (DuckDB: `ASOF JOIN`,
  * pandas: `merge_asof`).
  *
  * Implementation composes existing operators instead of a custom physical
  * plan (the preferred extension order): both sides are tagged and UNIONed,
  * then ONE window pass per key in time order carries the most recent right
  * payload forward onto each left row (`last(ignoreNulls = true)`).
  *
  * Scale shape: one shuffle of (|L| + |R|) rows by key — no join explosion,
  * no per-key quadratic work, and no range-condition fallback to
  * BroadcastNestedLoopJoin (the naive `l JOIN r ON key AND rt <= lt` plus
  * groupBy-max does O(|L_k| * |R_k|) work per key and shuffles the blowup).
  * Skewed keys degrade to the window sort of the hot key, not to a cross
  * product. At equal timestamps the right row sorts FIRST, so a same-instant
  * right row IS visible to the left row (inclusive <=, matching ASOF JOIN).
  *
  * Right-side rows must be unique per (key, time); pre-aggregate if not —
  * [[latestPerKeyTime]] does the canonical "keep highest tiebreak" reduction.
  */
object AsOf {

  /** One right row per (key, time): keeps the row with the greatest
    * `tiebreakCol` — makes the as-of result deterministic when a key has
    * several rows at one timestamp. One map-side-combinable shuffle. */
  def latestPerKeyTime(
      right: DataFrame, keyCol: String, timeCol: String, tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(timeCol))
      .orderBy(col(tiebreakCol).desc)
    right
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Left as-of join. `rightPayload` are the right columns to carry onto
    * left rows (NULL when no right row at or before the left time). Column
    * name collisions between sides are the caller's to resolve beforehand.
    *
    * PRECONDITION: `right` must be unique per (key, time) — the window
    * orders only by (__t, __side), so duplicate same-instant right rows
    * would make the carried payload nondeterministic across runs. Reduce
    * with [[latestPerKeyTime]] first. */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows sort before left rows at the same (key, time) so an
    // equal-timestamp right row is visible (inclusive as-of)
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // ONE struct per right row, not per-column carries: `last(ignoreNulls)`
    // on separate columns would skip a legitimately-NULL payload field and
    // resurrect an older row's value; the struct is non-null as a whole, so
    // the newest right row wins field-for-field
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      struct(rightPayload.map(col): _*).as("__p"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"__c.$c").as(c)): _*)
  }

  /** Forward as-of join: attach the EARLIEST right row with rt >= lt —
    * "what happened next" (next order after the event, next deploy after
    * the alert). Mirror image of [[asofJoin]]: same union + one window
    * pass, but the frame looks FORWARD (`first(ignoreNulls)` over
    * currentRow..unboundedFollowing) and left rows sort before right rows
    * at equal timestamps so a same-instant right row is still visible
    * (inclusive >=). Same scale shape: one shuffle of |L|+|R| rows by key,
    * no join explosion. Same PRECONDITION as [[asofJoin]]: `right` must be
    * unique per (key, time) ([[latestPerKeyTime]]) or the chosen payload
    * among same-instant duplicates is nondeterministic. */
  def asofJoinForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(1).as("__side"),
      struct(rightPayload.map(col): _*).as("__p"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned.withColumn("__c", first(col("__p"), ignoreNulls = true).over(w))
    carried
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"__c.$c").as(c)): _*)
  }
}
