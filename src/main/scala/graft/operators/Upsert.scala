package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style incremental table maintenance: apply a keyed change set
  * (upserts + deletes) to a base snapshot — the write-side primitive every
  * continuously-maintained corpus needs (refreshed crawls, re-scored
  * documents, takedown deletions) expressed as plain relational algebra so
  * Catalyst plans it like any join.
  *
  * Semantics (same as SQL MERGE with WHEN MATCHED UPDATE / WHEN NOT MATCHED
  * INSERT / WHEN MATCHED AND op='delete' THEN DELETE):
  *   result = base rows whose key has NO change  ∪  change rows with op='upsert'
  *
  * Plan shape: ONE left-anti equi-join of base against the (typically tiny)
  * change-key set — broadcast when small — plus a union. No window, no full
  * rewrite logic in the operator: at 100 TB the physical rewrite is bounded
  * by pairing this with [[Layout.compact]]-style range clustering and a
  * zone map over the key, so only files whose key range intersects the
  * change set need rewriting (the lakehouse copy-on-write shape).
  */
object Upsert {

  /** `changes` must carry the base schema plus an `op` column
    * ('upsert' | 'delete'). Returns the merged table (op dropped). */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val keys = changes.select(col(keyCol)).distinct()
    val kept = base.join(broadcast(keys), Seq(keyCol), "left_anti")
    val upserts = changes.filter(col("op") === "upsert").drop("op")
      .select(base.columns.map(col).toIndexedSeq: _*)
    kept.unionByName(upserts)
  }

  /** The files a copy-on-write rewrite must touch: zone-map entries whose
    * [min,max] key range intersects any change key. Everything else is
    * untouched — the pruning that keeps merge cost proportional to the
    * change set, not the table. */
  /** Slowly-changing-dimension TYPE 2 apply: fold a batch of keyed changes
    * (each carrying an effective timestamp) into a history table where
    * every key holds a chain of versions with `[valid_from, valid_to)`
    * intervals and an `is_current` flag — THE dimension-table pattern that
    * lets facts join "the customer as they were at order time" instead of
    * silently rewriting history (type 1). A change CLOSES the key's open
    * version at its effective time and opens a new one; unchanged keys
    * pass through untouched; brand-new keys open their first version.
    *
    * `base` is the existing history (pass `initScd2`'s output on first
    * load); `changes` carries the key, the new attribute columns and
    * `effCol`. At most one NON-NULL-timed change per key per batch
    * (standard SCD contract — feed finer-grained feeds through the batch
    * boundary or pre-collapse them); duplicates and null effective times
    * are refused up front in one validation job, and an effective time
    * that would INVERT an open interval raises at execution — every
    * chain-corrupting input throws rather than picks silently. All timestamp
    * comparisons are exact; rows are never mutated, only closed — history
    * is append-shaped, which is what makes this a narrow join + union at
    * any scale (one equi-join of base against the change keys; no window).
    * `valid_to` is NULL for open versions. */
  def scd2Apply(base: DataFrame, changes: DataFrame, keyCol: String,
      effCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    // ONE validation job: duplicate keys AND null effective times are both
    // chain-corrupting (a null eff would leave two is_current versions) —
    // refused up front, together
    val bad = changes.groupBy(col(keyCol))
      .agg(count(lit(1)).as("c"),
        sum(when(col(effCol).isNull, 1L).otherwise(0L)).as("n"))
      // coalesce: over an EMPTY change batch the sums are NULL and the
      // primitive getLong would NPE — an empty batch is a valid no-op
      .agg(coalesce(sum(when(col("c") > 1, 1L).otherwise(0L)), lit(0L)).as("dups"),
        coalesce(sum(col("n")), lit(0L)).as("nulls"))
      .head()
    require(bad.getLong(0) == 0 && bad.getLong(1) == 0,
      s"refusing ambiguous batch: ${bad.getLong(0)} duplicated keys, " +
        s"${bad.getLong(1)} null effective times")
    val ch = changes.select((col(keyCol) +: col(effCol).as("__eff") +:
      attrCols.map(col)): _*)
    val chKeyed = ch.select(col(keyCol), col("__eff"))
    // close the open version of every changed key at the change's time; an
    // effective time BEFORE the open version's start would invert the
    // interval AND overlap the new version — the raise_error fires at
    // execution (inside the kept valid_to expression, so never pruned)
    val closed = base
      .join(chKeyed, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("is_current") === 1L && col("__eff").isNotNull,
          when(col("__eff") < col("valid_from"),
            raise_error(concat(lit("scd2: effective time precedes the open version for key "),
              col(keyCol).cast("string"))).cast("timestamp"))
            .otherwise(col("__eff")))
          .otherwise(col("valid_to")))
      .withColumn("is_current",
        when(col("__eff").isNotNull, lit(0L)).otherwise(col("is_current")))
      .drop("__eff")
    // open the new version per change
    val opened = ch
      .withColumnRenamed("__eff", "valid_from")
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(1L))
      .select(closed.columns.map(col): _*)
    closed.unionByName(opened)
  }

  /** First-load bootstrap for [[scd2Apply]]: every row becomes its key's
    * open version effective at `effCol`. */
  def initScd2(snapshot: DataFrame, keyCol: String, effCol: String,
      attrCols: Seq[String]): DataFrame =
    snapshot.select((col(keyCol) +: col(effCol).as("valid_from") +:
      attrCols.map(col)): _*)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(1L))

  def touchedFiles(zoneMap: DataFrame, changes: DataFrame, keyCol: String): DataFrame =
    zoneMap.join(broadcast(changes.select(col(keyCol)).distinct()),
      col(keyCol) >= col("min_key") && col(keyCol) <= col("max_key"), "left_semi")
}
