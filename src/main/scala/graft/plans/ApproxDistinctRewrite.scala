package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, Md5, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

import graft.functions.HllAgg

/** Opt-in approximate-query-processing rewrite (the BlinkDB-class
  * trade a 100 TB warehouse actually wants): when
  * `spark.graft.approxDistinct = true`, every single-column exact
  * `count(DISTINCT x)` in the plan is rewritten to the deterministic
  * md5-register HLL aggregate ([[graft.functions.HllAgg]], m=512,
  * ±~4.6% rel. error) — turning the Expand/double-shuffle distinct
  * plan into ONE map-side-combined pass carrying a 512-byte buffer
  * per group.
  *
  * Why a Rule and not a function: the caller's SQL stays untouched
  * (`SELECT count(DISTINCT user_id) ...` — BI tools, dashboards,
  * generated queries), the accuracy trade is a session-level switch,
  * and because graft's HLL is md5-deterministic the rewritten answer
  * is still externally REPLAYABLE (DuckDB oracle on the same SQL) —
  * unlike `spark.sql.optimizer.*` approximations over xxhash64.
  *
  * Scope guards: single argument, deterministic child, no
  * FILTER-clause interaction (the filter is preserved on the
  * aggregate expression), multi-column distincts left intact.
  * Registered via [[graft.functions.GraftExtensions]]
  * (injectOptimizerRule) and `Graft.registerAll`
  * (experimental.extraOptimizations) so both deployment shapes get
  * it; with the flag unset (default) the rule is identity.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct", "false")
        .trim.equalsIgnoreCase("true")) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae: AggregateExpression if ae.isDistinct =>
            ae.aggregateFunction match {
              case Count(Seq(c)) if c.deterministic =>
                Cast(Round(ae.copy(
                  aggregateFunction = HllAgg(md5Of(c)),
                  isDistinct = false), Literal(0)), LongType)
              case _ => ae
            }
        }
    }

  /** md5(cast(x as string)) — the [[graft.operators.HllSketch]]
    * hashing convention, so the rewritten estimate is bit-identical
    * to the relational sketch path and its DuckDB mirror.
    *
    * Caveat (scope guard): distinct-equivalence is over the STRING
    * RENDERING of the value, which can split equality classes that
    * exact `count(DISTINCT)` merges — e.g. `-0.0` and `0.0` doubles
    * render as two strings and count as two HLL values. That delta is
    * within the documented ±4.6% envelope and affects only
    * floating-point children with mixed zero signs (or NaN payload
    * variants); normalize upstream (`nanvl(x, x) + 0.0`) if exact
    * zero-sign merging matters.
    */
  private def md5Of(c: Expression): Expression =
    Md5(Cast(Cast(c, StringType), BinaryType))
}
