package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in Catalyst optimizer rule: rewrite exact `count(DISTINCT x)` to a
  * HyperLogLog++ sketch (`approx_count_distinct`) when
  * `spark.graft.approxDistinct.enabled=true`.
  *
  * Why a RULE and not a code edit: at 100 TB an exact distinct count is a
  * full shuffle of every distinct value (plus an Expand when it shares an
  * Aggregate with other functions), while HLL++ is a constant-size
  * (~1.4 KB at 5% rsd) mergeable buffer — the q58 swap-in. Doing the swap
  * in the optimizer means EVERY query in the library — and any ad-hoc
  * SQL a user writes — picks it up from one session flag, with no query
  * rewritten by hand. Off by default: the oracle gate runs exact.
  *
  * Scope: single-argument distinct counts only (the common case;
  * multi-column distinct has no direct sketch equivalent) — and the
  * rewrite keeps the output attribute name and LongType, so downstream
  * schemas are unchanged.
  *
  * Injection: `GraftExtensions` wires it via `injectOptimizerRule`; an
  * already-running session can add it with
  * `spark.experimental.extraOptimizations ++= Seq(ApproxDistinctRewrite)`.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct.enabled"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else {
      val rsd = conf.getConfString(RsdKey, "0.05").toDouble
      plan.transform { case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
            ae.copy(aggregateFunction = HyperLogLogPlusPlus(child, rsd, 0, 0),
              isDistinct = false)
        }
      }
    }
}
