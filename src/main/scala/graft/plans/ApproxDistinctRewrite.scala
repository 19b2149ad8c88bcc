package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` to
  * HyperLogLog++ when `spark.graft.approxDistinct` is true.
  *
  * At 100 TB an exact distinct count shuffles the full key set; the
  * sketch aggregates map-side into a bounded buffer. BI-style engines
  * expose exactly this switch — dashboards opt in, billing queries
  * don't. The rewrite targets the single-distinct aggregate pattern
  * (the common dashboard shape); multi-distinct aggregates have already
  * been expanded by RewriteDistinctAggregates before user-provided
  * rules run and pass through untouched — a conservative miss, never a
  * wrong answer.
  *
  * Deployment: `spark.sql.extensions=graft.GraftExtensions` injects it
  * into every session ([[graft.GraftExtensions]]); tests attach it via
  * `spark.experimental.extraOptimizations` (both run in the
  * user-provided batch). The conf is read at OPTIMIZE time, so a
  * session can flip it per query without rebuilding anything.
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val RelativeSD = 0.05

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get("spark.graft.approxDistinct", "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressionsUp {
          case ae: AggregateExpression if ae.isDistinct =>
            ae.aggregateFunction match {
              case Count(children) if children.size == 1 =>
                ae.copy(
                  aggregateFunction =
                    HyperLogLogPlusPlus(children.head, RelativeSD),
                  isDistinct = false)
              case _ => ae
            }
        }
    }
}
