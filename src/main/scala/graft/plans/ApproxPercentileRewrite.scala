package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DoubleType, NumericType}

import graft.functions.LogHistQuantileAgg

/** Opt-in approximate-quantile rewrite — the second rung of the AQP
  * ladder next to [[ApproxDistinctRewrite]]: when
  * `spark.graft.approxPercentile = true`, every exact
  * `percentile(x, p)` aggregate in the plan is rewritten to the
  * deterministic log-histogram sketch aggregate
  * ([[graft.functions.LogHistQuantileAgg]], γ=1.1, value error ≤ ~5%
  * — half a geometric bucket), replacing the per-group
  * all-distinct-values buffer (unbounded on continuous columns, the
  * classic exact-percentile OOM at warehouse scale) with one count
  * per occupied bucket.
  *
  * Like the distinct rewrite, the caller's SQL stays untouched and
  * the answer remains externally REPLAYABLE: the bucket arithmetic is
  * elementary (sign·γ^(⌊ln|v|/ln γ⌋+0.5)) and the selection rule is
  * first-rep-reaching-q·n, both of which a DuckDB oracle runs
  * verbatim — order-free, merge-order-free, deterministic.
  *
  * Scope guards: scalar foldable numeric percentage only (array
  * percentiles left intact), unit frequency only (weighted
  * percentile keeps exact semantics), deterministic numeric child,
  * non-DISTINCT. Flag parsing is tolerant (only case/ws variants of
  * "true" enable). NaN inputs are dropped by the sketch (exact
  * percentile sorts NaN last — a documented semantic delta on data
  * that should not contain NaN).
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxPercentile", "false")
        .trim.equalsIgnoreCase("true")) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae: AggregateExpression if !ae.isDistinct =>
            ae.aggregateFunction match {
              case p: Percentile if inScope(p) =>
                // reverse (ORDER BY x DESC) percentile at q == ascending
                // percentile at 1-q; the sketch only sorts ascending.
                val q = pctOf(p.percentageExpression)
                ae.copy(aggregateFunction = LogHistQuantileAgg(
                  Cast(p.child, DoubleType), if (p.reverse) 1.0 - q else q))
              case _ => ae
            }
        }
    }

  private def inScope(p: Percentile): Boolean =
    p.child.deterministic &&
      p.child.dataType.isInstanceOf[NumericType] &&
      p.percentageExpression.foldable &&
      p.percentageExpression.dataType.isInstanceOf[NumericType] &&
      (p.frequencyExpression match {
        case Literal(1L, _) => true
        case Literal(1, _) => true
        case _ => false
      })

  private def pctOf(e: Expression): Double = e.eval() match {
    case d: Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"unexpected percentage literal: $other")
  }
}
