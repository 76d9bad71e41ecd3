package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Gate-wide guard against the classic scale cliff: a `Window` with no
  * PARTITION BY moves the ENTIRE input to one task ("WindowExec: No
  * Partition Defined" — fine on metadata, fatal on a 100 TB relation).
  *
  * The repo's documented global windows are all METADATA-sized by
  * construction — the BLEU per-n rollup (maxN rows), the AUC score-domain
  * cumulative pass (distinct scores), [[graft.operators.Layout.compactionPlan]]
  * (one row per file) — and each of those inputs is aggregate-reduced
  * before the window. That is the checkable invariant (r14 verdict #5):
  * an unpartitioned Window is acceptable ONLY when its input subtree has
  * been reduced by an Aggregate / Deduplicate (or is a literal
  * LocalRelation/OneRowRelation/Range), i.e. its row count is a
  * statistic of the data, not the data. [[graft.Verify]] runs this audit
  * over every gate query each round, so a future query that windows a
  * raw relation globally fails its own gate instead of shipping a
  * single-task shuffle; PlanSpec unit-pins both directions.
  *
  * Heuristic note: "reduced somewhere below" does not prove the window
  * input is small (an aggregate joined back to a fact table would pass),
  * but every false negative still has a total ORDER BY gate and a bench
  * cell watching it — this audit exists to catch the silent default, not
  * to replace plan review. */
object WindowAudit {

  /** Render every unpartitioned Window whose input is NOT
    * aggregate-reduced (empty = plan is clean). */
  def globalDataWindows(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case w: Window if w.partitionSpec.isEmpty && !reduced(w.child) =>
        w.simpleString(160)
    }
  }

  /** Loud variant for [[graft.Verify]]: names the query and the offending
    * window node. */
  def assertMetadataWindows(df: DataFrame, queryName: String): Unit = {
    val bad = globalDataWindows(df)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"$queryName: unpartitioned Window over a non-reduced (data-sized) input — " +
          "partition the window or aggregate first:\n" + bad.mkString("\n"))
  }

  private def reduced(p: LogicalPlan): Boolean = p.exists {
    case _: Aggregate | _: Deduplicate | _: LocalRelation | _: OneRowRelation |
        _: Range => true
    case _ => false
  }
}
