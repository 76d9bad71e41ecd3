package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow `private[sql]` bridge: turn an (already-analyzed/optimized)
  * logical subplan back into an executable DataFrame. Used by
  * [[graft.plans.JoinAudit.assertBroadcastBounds]] to COUNT the
  * broadcast-hinted side of a non-equi join, and by
  * [[graft.operators.Fixpoint.lift]] to re-home a loop relation into the
  * isolated fixpoint session (r18). Nothing else may grow here: one
  * method, read-only semantics, no optimizer or session-state access. */
object PlanExec {
  def ofPlan(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
