package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Approximate-query-processing switch (`Rule[LogicalPlan]` rung of the
  * custom-operator ladder, injected via
  * `SparkSessionExtensions.injectOptimizerRule`).
  *
  * When `spark.graft.approx.countDistinct = true`, every single-column
  * `count(DISTINCT x)` in the logical plan is rewritten to
  * HyperLogLog++ (`approx_count_distinct`, rsd from
  * `spark.graft.approx.rsd`, default 2%). At 100 TB this turns the
  * exact-distinct plan — an Expand multiplying every row per distinct
  * aggregate plus a second shuffle on the distinct key — into ONE
  * map-combinable pass with a few-KB mergeable sketch per group.
  *
  * Semantics-changing, therefore strictly OPT-IN per session/query and
  * off by default (the correctness gate runs with it off; behavior is
  * spec'd in SkewApproxSpec). Multi-column `count(DISTINCT a, b)` and
  * filtered variants are left untouched.
  *
  * The rewrite replaces only the aggregate FUNCTION inside the
  * existing `AggregateExpression`, so result attribute ids, names, and
  * the LongType output survive — nothing downstream re-resolves.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private val enabledKey = "spark.graft.approx.countDistinct"
  private val rsdKey = "spark.graft.approx.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "false").toBoolean) return plan
    val rsd = conf.getConfString(rsdKey, "0.02").toDouble
    plan.transform {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child, rsd),
              isDistinct = false)
        }
    }
  }
}
