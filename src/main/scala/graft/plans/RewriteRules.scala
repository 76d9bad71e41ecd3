package graft.plans

import graft.functions.Kernels

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rules for the graft kernels — the `Rule[LogicalPlan]`
  * extension seam (§2.9c), injected by [[GraftExtensions]] or added to a live
  * session via [[RewriteRules.register]].
  *
  * `CollapseNormalize`: `normalizeText` is idempotent (its output contains no
  * uppercase, no controls, no whitespace runs), so
  * `normalizeText(normalizeText(x))` rewrites to one application. Layered
  * curation pipelines hit this constantly — each stage defensively
  * normalizes its input, and without the rule every document pays the NFC +
  * casefold + scan pass twice. The rewrite happens in the optimizer, so it
  * fires no matter which operator (or SQL via `graft_normalize`) produced
  * the nesting. */
object RewriteRules {

  object CollapseNormalize extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
      case outer: StaticInvoke
          if outer.functionName == "normalizeText" &&
            outer.staticObject == Kernels.getClass &&
            (outer.arguments.headOption match {
              case Some(inner: StaticInvoke) =>
                inner.functionName == "normalizeText" && inner.staticObject == Kernels.getClass
              case _ => false
            }) =>
        outer.arguments.head
    }
  }

  val all: Seq[Rule[LogicalPlan]] = Seq(CollapseNormalize)

  /** Add the rules to an already-running session (the non-extension path —
    * `experimental.extraOptimizations` is Spark's public live-session seam). */
  def register(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    val missing = all.filterNot(current.contains)
    if (missing.nonEmpty) spark.experimental.extraOptimizations = current ++ missing
  }
}
