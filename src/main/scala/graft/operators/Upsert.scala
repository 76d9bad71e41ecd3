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
  def touchedFiles(zoneMap: DataFrame, changes: DataFrame, keyCol: String): DataFrame =
    zoneMap.join(broadcast(changes.select(col(keyCol)).distinct()),
      col(keyCol) >= col("min_key") && col(keyCol) <= col("max_key"), "left_semi")
}
