package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for caches that intentionally outlive their operator call.
  *
  * Iterative/multi-consumer operators (pagerank's edge+degree relations,
  * basket's distinct (basket, item) stream, the final k-core edge set, …)
  * persist relations that remain referenced by the RETURNED DataFrame's
  * plan — they cannot be unpersisted before the caller materializes the
  * result, so they stay cached "for the caller's lifetime". A long-lived
  * serving session that runs many such operators would accumulate every
  * call's residual cache (hundreds of entries across a full `Verify`
  * gate). This registry makes the leak collectable: operators route
  * surviving persists through [[persist]] (or [[register]] a custom
  * release), and the session calls [[release]] once it has CONSUMED the
  * results.
  *
  * Contract: after `release()`, previously returned DataFrames may be
  * UNUSABLE — plain persisted relations silently recompute, but
  * localCheckpoint-backed results (connectedComponents labels, deep
  * pagerank chains) have truncated lineage and cannot be replayed. Call it
  * only at a consume-boundary (after a write/collect), never mid-pipeline.
  *
  * Thread-safety: registrations and release are lock-free queue ops; a
  * release concurrent with registrations releases what it sees and leaves
  * later registrations for the next call.
  *
  * SINGLE-CONSUMER contract: the registry is process-global with no
  * ownership scoping, so `release()` drops EVERY registered residual —
  * including another in-flight pipeline's. In a concurrent serving session,
  * serialize pipelines around their release (or skip release and accept the
  * cached-lifetime leak); today's callers (Verify / Bench / MicroBench) are
  * single-threaded by construction. */
object Residuals {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Persist `df` (MEMORY_AND_DISK, the repo-wide level for operator
    * caches) and register its unpersist for the next [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    register(() => { p.unpersist(blocking = false); () })
    p
  }

  /** Register a custom release action (e.g. [[Dedup.releaseCheckpoint]]
    * for localCheckpoint-backed results). */
  def register(releaseFn: () => Unit): Unit = live.add(releaseFn)

  /** Run and drop every registered release action. Safe to call when empty;
    * individual failures (e.g. an already-stopped context) are swallowed so
    * one dead entry can't pin the rest. */
  def release(): Unit = {
    var f = live.poll()
    while (f != null) {
      try f() catch { case _: Exception => () }
      f = live.poll()
    }
  }

  /** Number of registered-but-unreleased residuals (observability/tests). */
  def pending: Int = live.size
}
