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
  * SCOPING (r12): registrations land in the calling thread's CURRENT scope
  * — the process-global default unless the harness opened its own via
  * [[withScope]]. `release()` drains only the current scope, so two
  * harnesses sharing a JVM (each wrapped in its own scope) can no longer
  * drop each other's in-flight caches — the r11 single-consumer footgun.
  * Scopes are inherited lexically, not across threads: a thread outside
  * any `withScope` (e.g. a streaming micro-batch callback) registers into
  * the default scope, which the plain `Residuals.release()` of an
  * unscoped caller still drains.
  *
  * Thread-safety: registrations and release are lock-free queue ops; a
  * release concurrent with registrations releases what it sees and leaves
  * later registrations for the next call. */
object Residuals {

  /** One harness's residual set. Obtain via [[newScope]], activate with
    * [[withScope]], drain with [[Scope.release]] (or `Residuals.release()`
    * from inside the scope). */
  final class Scope private[operators] () {
    private val live = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

    private[operators] def add(releaseFn: () => Unit): Unit = live.add(releaseFn)

    /** Run and drop every release action registered IN THIS SCOPE. Safe to
      * call when empty; individual failures (e.g. an already-stopped
      * context) are swallowed so one dead entry can't pin the rest. */
    def release(): Unit = {
      var f = live.poll()
      while (f != null) {
        try f() catch { case _: Exception => () }
        f = live.poll()
      }
    }

    /** Registered-but-unreleased residuals in this scope. */
    def pending: Int = live.size
  }

  private val default = new Scope
  private val current = new ThreadLocal[Scope] {
    override def initialValue(): Scope = default
  }

  /** A fresh, empty scope (not yet active on any thread). */
  def newScope(): Scope = new Scope

  /** Run `body` with `s` as the calling thread's current scope; restores
    * the previous scope afterwards (nesting-safe). Does NOT release on
    * exit — the harness decides its consume boundaries. */
  def withScope[T](s: Scope)(body: => T): T = {
    val prev = current.get()
    current.set(s)
    try body finally current.set(prev)
  }

  /** Persist `df` (MEMORY_AND_DISK, the repo-wide level for operator
    * caches) and register its unpersist in the current scope. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    register(() => { p.unpersist(blocking = false); () })
    p
  }

  /** Register a custom release action (e.g. [[Dedup.releaseCheckpoint]]
    * for localCheckpoint-backed results) in the current scope. */
  def register(releaseFn: () => Unit): Unit = current.get().add(releaseFn)

  /** Drain the CURRENT scope (the process default when unscoped). */
  def release(): Unit = current.get().release()

  /** Registered-but-unreleased residuals in the current scope. */
  def pending: Int = current.get().pending
}
