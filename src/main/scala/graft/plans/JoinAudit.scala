package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical._

/** Gate-wide guard against the OTHER silent scale cliff ([[WindowAudit]]
  * covers single-task windows): a join with NO equality key between two
  * data-sized relations executes as a CartesianProduct or a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons that look fine at test
  * SF and melt at 100 TB. Every pair generator in this repo is deliberately
  * an EQUI-join on a bucket key (LSH band, length band, gram, cell);
  * this audit makes that a checked invariant of the WHOLE gate rather than
  * a per-family PlanSpec pin, so a future query that joins on an
  * inequality alone fails its own gate instead of shipping quadratic work.
  *
  * A non-equi join is accepted when EITHER input's reduction frontier
  * proves it metadata-sized (same walk as [[WindowAudit]]: an Aggregate /
  * Deduplicate / GlobalLimit / literal leaf; a Join only when both inputs
  * are) — tiny × huge nested loops are the legitimate broadcast-baseline
  * shape — OR when either side carries an EXPLICIT `broadcast()` hint: the
  * author has declared that side memory-resident (every brute-force
  * baseline and probe-set eval in this repo does), which is exactly the
  * opposite of the silent quadratic this audit exists to catch (the full
  * r16 sweep: all 27 non-equi gate joins were hinted, zero silent).
  * Anything else must be named in `allow` — loudly, at the call site. */
object JoinAudit extends PredicateHelper {

  /** Render every UNHINTED data × data join with no equality predicate
    * (empty = plan is clean). */
  def quadraticJoins(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case j: Join if !hasEquiKey(j) && !declaredBroadcast(j) &&
          !reduced(j.left) && !reduced(j.right) =>
        j.simpleString(160)
    }
  }

  private def declaredBroadcast(j: Join): Boolean =
    j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
      j.hint.rightHint.exists(_.strategy.contains(BROADCAST))

  /** Default bound on a broadcast-hinted side of a non-equi join: far
    * above every legitimate probe/baseline set in the gate (the largest
    * is tens of thousands of rows at sf1) and far below data-sized — a
    * hinted side beyond it is either a mis-hinted fact relation (the
    * silent quadratic wearing a hint) or a driver-OOM risk at scale. */
  val MaxHintedRowsDefault: Long = 1000000L

  /** The hinted side subplans of every non-equi join that is accepted
    * ONLY because of its broadcast hint (no equi key, neither side
    * reduction-frontier-bounded). These are the joins where the hint is
    * load-bearing — [[assertBroadcastBounds]] counts them. */
  def hintedNonEquiSides(df: DataFrame): Seq[(String, LogicalPlan)] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case j: Join if !hasEquiKey(j) && declaredBroadcast(j) &&
          !reduced(j.left) && !reduced(j.right) =>
        Seq(
          if (j.hint.leftHint.exists(_.strategy.contains(BROADCAST)))
            Some(("left", j.left)) else None,
          if (j.hint.rightHint.exists(_.strategy.contains(BROADCAST)))
            Some(("right", j.right)) else None).flatten
    }.flatten
  }

  /** Execution-context companion to [[assertEquiJoins]] (r16 verdict #3):
    * a `broadcast()` hint waives the equi-key requirement but must NOT be
    * an unbounded waiver — a future query could hint a data-sized side
    * and ship the quadratic anyway (plus a driver OOM at scale). This
    * COUNTS each load-bearing hinted side (executes the subplan — cheap
    * for genuine probe sets, and bounded by one scan even when the check
    * is about to fail) and refuses above `maxHintedRows`. Runs in
    * [[graft.Verify]] where an execution context exists; the plan-only
    * sweep ([[graft.PlanSweep]]) stays count-free by default. */
  def assertBroadcastBounds(df: DataFrame, queryName: String,
      maxHintedRows: Long = MaxHintedRowsDefault): Unit = {
    val sides = hintedNonEquiSides(df)
    if (sides.isEmpty) return
    sides.foreach { case (which, side) =>
      val n = org.apache.spark.sql.graftbridge.PlanExec
        .ofPlan(df.sparkSession, side).count()
      if (n > maxHintedRows)
        throw new IllegalStateException(
          s"$queryName: broadcast()-hinted $which side of a non-equi join " +
            s"has $n rows > $maxHintedRows — the hint declared it " +
            "memory-resident but it is data-sized (a silent quadratic " +
            "plus a driver-OOM risk at scale); key the join on a " +
            "bucket/band or genuinely reduce the hinted side:\n" +
            side.simpleString(160))
    }
  }

  /** Loud variant for [[graft.Verify]]: names the query and the offending
    * join node unless the query is on the documented allowlist. */
  def assertEquiJoins(df: DataFrame, queryName: String,
      allow: Set[String]): Unit = {
    if (allow.contains(queryName)) return
    val bad = quadraticJoins(df)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"$queryName: non-equi join between two data-sized inputs — " +
          "key the join on a bucket/band or reduce a side first:\n" +
          bad.mkString("\n"))
  }

  // a usable hash key is an equality whose two sides evaluate against
  // OPPOSITE join inputs (either orientation); same-side equalities and
  // literal comparisons are residual filters, not keys
  private def hasEquiKey(j: Join): Boolean = {
    def oneSided(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    j.condition.exists(splitConjunctivePredicates(_).exists {
      case EqualTo(l, r) =>
        (oneSided(l, j.left) && oneSided(r, j.right)) ||
          (oneSided(l, j.right) && oneSided(r, j.left))
      case EqualNullSafe(l, r) =>
        (oneSided(l, j.left) && oneSided(r, j.right)) ||
          (oneSided(l, j.right) && oneSided(r, j.left))
      case _ => false
    })
  }

  private def reduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case _: Range => true
    case j: Join => reduced(j.left) && reduced(j.right)
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(reduced)
  }
}
