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
  * The reduction test walks the window child's REDUCTION FRONTIER (r15
  * ADVICE): descend through unary nodes; a branch is reduced when it hits
  * an Aggregate / Deduplicate / GlobalLimit (or a literal-sized leaf). A
  * Join is reduced only when BOTH inputs are (metadata ⋈ metadata stays
  * metadata — the epochAlloc budget-broadcast shape; an aggregate joined
  * back to a raw fact relation fails, which is the `exists`-anywhere
  * false negative this walk replaces). A Union is reduced iff every
  * branch is (k metadata relations stacked are still metadata). Sample is
  * deliberately NOT a reducer: a fraction of a 100 TB relation scales
  * with the relation. Still a heuristic — the audit catches the silent
  * default, it does not replace plan review. */
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

  private def reduced(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case _: Range => true // literal row count, known at plan time
    case f: Filter if topRowsPerGroup(f) => true // ≤ k rows per group value
    case j: Join => reduced(j.left) && reduced(j.right) // metadata ⋈ metadata only
    case leaf if leaf.children.isEmpty => false // raw relation reached
    case other => other.children.forall(reduced) // unary pass-through; Union = all branches
  }

  /** `Filter(row_number == k | <= k)` over a PARTITIONED Window keeps at
    * most k rows per distinct partition-key value — the same domain-sized
    * reduction class as GROUP BY (one row per group), just computed through
    * a window instead of an aggregate. This is [[graft.operators.Ranks]]'
    * rn==1 domain-slice shape (r17): the value-domain relation derives from
    * the SAME exchange as the data-sized ranking, so the input projection
    * evaluates once. Only RowNumber qualifies: rank()/dense_rank() ties are
    * unbounded per group. The Window must be partitioned — an unpartitioned
    * row_number is itself the cliff this audit exists to catch. */
  private def topRowsPerGroup(f: Filter): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    // descend through Projects to the Window, collecting alias indirection
    // (id -> aliased expression) so the filtered attribute traces back to
    // the window expression it renames
    def unwrapCast(e: Expression): Expression = e match {
      case c: Cast => unwrapCast(c.child)
      case other => other
    }
    // collect the exprIds of row_number outputs from PARTITIONED windows in
    // the chain of Project/Window nodes below the filter (the optimizer
    // splits differently-framed window expressions of one logical pass into
    // stacked Window nodes), plus Project alias indirection
    def collect(p: LogicalPlan, depth: Int,
        rnIds: Set[ExprId], aliases: Map[ExprId, Expression])
        : (Set[ExprId], Map[ExprId, Expression]) = p match {
      case _ if depth > 8 => (rnIds, aliases)
      case w: Window =>
        val more =
          if (w.partitionSpec.isEmpty) Set.empty[ExprId]
          else w.windowExpressions.collect {
            case a: Alias if (unwrapCast(a.child) match {
              case we: WindowExpression => we.windowFunction.isInstanceOf[RowNumber]
              case _ => false
            }) => a.exprId
          }.toSet
        collect(w.child, depth + 1, rnIds ++ more, aliases)
      case pr: Project =>
        val more = pr.projectList.collect { case a: Alias => a.exprId -> a.child }.toMap
        collect(pr.child, depth + 1, rnIds, aliases ++ more)
      case _ => (rnIds, aliases)
    }
    val (rnIds, aliases) = collect(f.child, 0, Set.empty, Map.empty)
    if (rnIds.isEmpty) false
    else {
      def isRn(e: Expression): Boolean = unwrapCast(e) match {
        case a: AttributeReference =>
          rnIds.contains(a.exprId) ||
            aliases.get(a.exprId).exists(isRn)
        case _ => false
      }
      // rn == k keeps ≤ 1 row per group for ANY k; rn <= k keeps k rows
      // per group, so the literal itself must be small or "reduced" means
      // k·|domain| ~ data-sized (r17 ADVICE — rn <= 10000000 is no
      // reduction). 1024 covers every top-k shape in the gate with room.
      def smallK(l: Literal): Boolean = l.value match {
        case i: Byte => i >= 0
        case i: Short => i >= 0 && i <= 1024
        case i: Int => i >= 0 && i <= 1024
        case i: Long => i >= 0L && i <= 1024L
        case _ => false
      }
      def pins(e: Expression): Boolean = e match {
        case And(l, r) => pins(l) || pins(r)
        case EqualTo(a, _: Literal) => isRn(a)
        case EqualTo(_: Literal, a) => isRn(a)
        case LessThanOrEqual(a, l: Literal) => isRn(a) && smallK(l)
        case LessThan(a, l: Literal) => isRn(a) && smallK(l)
        case _ => false
      }
      pins(f.condition)
    }
  }
}
