package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for fixpoint loops, with a cluster-reliability knob.
  *
  * Default: `localCheckpoint` — blocks live on executors, zero extra I/O,
  * the right call for local mode and bounded loops. On a real cluster an
  * executor loss (or a dynamic-allocation decommission) destroys
  * localCheckpoint blocks mid-fixpoint, and because the lineage was
  * truncated they CANNOT be recomputed — a multi-hour 100 TB SCC/pagerank/
  * connected-components run dies with the executor. Setting the session
  * conf `spark.graft.checkpoint.reliable=true` (plus
  * `sparkContext.setCheckpointDir(...)` on a fault-tolerant store) swaps
  * every loop-carried truncation in [[Graph]] and [[Dedup]] to a reliable
  * `checkpoint()`: the generation is written to the checkpoint dir and
  * survives any executor loss. [[Dedup.releaseCheckpoint]] still frees the
  * in-memory copy either way; reliable checkpoint FILES are bounded by the
  * live generations per loop and are reclaimed by
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` or by deleting
  * the checkpoint dir with the application.
  *
  * Both modes return a plan truncated to a `LogicalRDD` leaf, so the
  * fixpoint plan-growth contract (see [[Graph.sccDecompose]]) and the
  * release contract are identical; labels are bit-identical by construction
  * (GraphSpec pins it).
  */
private[graft] object Checkpoints {

  /** Session conf key: "true" swaps localCheckpoint for reliable
    * checkpoint() in every fixpoint loop that truncates through here. */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Truncate `df`'s lineage, materializing now when `eager` (one job).
    * Lazy (`eager = false`) lets the caller fuse materialization with its
    * first action over the result — the one-job-per-round probe pattern. */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf.getOption(ReliableConf).exists(_.toBoolean)
    if (reliable) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true requires sparkContext.setCheckpointDir(...) on a " +
          "fault-tolerant store (the reliable mode exists precisely because " +
          "executor-local blocks do not survive executor loss)")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }
}
