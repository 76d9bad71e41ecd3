package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Purpose-built execution session for rounds-bounded fixpoint loops whose
  * PER-ROUND MOVED DATA is node-sized (r17 verdict #1 — "make it a
  * per-loop choice").
  *
  * Why: under AQE every materialized exchange becomes its own query-stage
  * job (~25 ms of driver scheduling on this harness — measured r17:
  * graph_scc_full ran 450 stage-jobs of ~1.2 tasks), so a k-round loop
  * over tiny relations pays k × stages × latency regardless of data. For
  * loops with NO mid-loop action, AQE OFF collapses the whole unrolled
  * chain into ONE job; r17 measured a prototype 2.8× faster on
  * pivot-class loops. The flip side: loops that exchange EDGE-sized
  * relations each round (sccDecompose's subE/ce builds, kCore's
  * re-partitioned shrinking edge set) NEED AQE's coalescing — scc_full
  * measured 13 → 35 s with AQE off — so this is opt-in per loop, applied
  * only where the loop-invariant edge relations are pre-partitioned
  * caches and only node-sized relations cross exchanges per round
  * (pagerank/ppr inflow, frontier expansions, walk positions).
  *
  * Mechanics: an ISOLATED child session (shared SparkContext, cache
  * manager and checkpoint dir; own conf — the streaming gates'
  * statePinnedSession pattern, never a caller-conf mutation) with AQE off
  * and shuffle partitions from `spark.graft.fixpoint.partitions`
  * (default: the caller's spark.sql.shuffle.partitions — scale-adaptive,
  * no literals; size it on a cluster exactly as you size shuffle
  * partitions for node-sized relations). Semantics-bearing confs (ANSI,
  * session time zone, reliable-checkpoint mode) are copied from the
  * caller: `newSession()` starts from BUILDER options only, and losing a
  * runtime-set ANSI or reliable-checkpoint flag inside a loop would
  * silently change contracts. Results are partition-count- and
  * AQE-independent (pure integer algebra — the pagerank determinism
  * contract), which is what makes this an execution choice, not a
  * semantic one. `spark.graft.fixpoint.enabled=false` returns the
  * caller's session unchanged (the A/B and kill switch).
  */
private[graft] object Fixpoint {

  /** Session conf: "false" disables the child session entirely. */
  val EnabledConf = "spark.graft.fixpoint.enabled"

  /** Session conf: shuffle partition count for loop exchanges inside the
    * fixpoint session (default: caller's spark.sql.shuffle.partitions). */
  val PartitionsConf = "spark.graft.fixpoint.partitions"

  private val carried = Seq(
    "spark.sql.ansi.enabled",
    "spark.sql.session.timeZone",
    Checkpoints.ReliableConf)

  /** Child session with AQE off + pinned shuffle partitions (or the
    * caller's session unchanged when disabled). */
  def session(parent: SparkSession): SparkSession = {
    val enabled = sys.env.getOrElse("SPARK_GRAFT_FIXPOINT",
      parent.conf.get(EnabledConf, "true"))
    if (enabled == "0" || enabled.equalsIgnoreCase("false")) return parent
    val s2 = parent.newSession()
    for (k <- carried; v <- parent.conf.getOption(k)) s2.conf.set(k, v)
    s2.conf.set("spark.sql.shuffle.partitions",
      parent.conf.get(PartitionsConf,
        parent.conf.get("spark.sql.shuffle.partitions")))
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2
  }

  /** Re-home `df` into `s`. Safe here because lifted plans are
    * self-contained (file relations carry their own index; no catalog
    * references) and the CacheManager is SHARED across sessions of one
    * SparkContext — a relation persisted by the caller is found by the
    * child session's planner, so caches BUILD under the caller's plan
    * (AQE on) and are only PROBED inside the loop. No-op when `df`
    * already belongs to `s`. */
  def lift(s: SparkSession, df: DataFrame): DataFrame =
    if (df.sparkSession eq s) df
    else org.apache.spark.sql.graftbridge.PlanExec.ofPlan(s, df.queryExecution.analyzed)
}
