package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Runtime guard: FAIL any physical plan that contains a
  * `CartesianProductExec` — the engine's plan-quality policy
  * (PlanQualitySpec bans the shape across all declared queries),
  * enforced for ARBITRARY user queries at execution time through the
  * [[graft.functions.GraftExtensions]] session-extension hook.
  *
  * Rationale: on a 1000-executor cluster an unbounded n×m join is the
  * single fastest way to turn a typo'd join condition into a
  * cluster-wide incident — the output cardinality is quadratic before
  * the first byte spills. Spark's own `spark.sql.crossJoin.enabled`
  * legacy guard was removed in 3.0; this rule restores the guard at the
  * PHYSICAL level, where broadcast-NLJ (a deliberate, bounded
  * tiny-broadcast pattern the engine itself uses for similarity
  * scoring) is distinguishable from a true cartesian — a logical-plan
  * check cannot tell them apart because the physical strategy decides.
  *
  * Injected through TWO hooks so coverage does not depend on the AQE
  * conf: `injectQueryStagePrepRule` (runs before any query stage under
  * AQE, default in Spark 4.x) and `injectColumnarRule` (whose
  * pre-transition pass runs in `QueryExecution.preparations` for every
  * physical plan, AQE or not — the non-AQE gap the round-6 advisor
  * flagged). Both paths inspect and pass the plan through untouched;
  * firing twice under AQE is harmless because the rule is a pure
  * check. Escape hatch: `spark.graft.failOnCartesian=false`
  * (per-session conf) for the rare deliberate tiny cross product.
  */
case class CartesianGuardRule(session: SparkSession) extends Rule[SparkPlan] {
  override def apply(plan: SparkPlan): SparkPlan = {
    if (conf.getConfString(CartesianGuardRule.Conf, "true").toBoolean)
      plan.foreach {
        case _: CartesianProductExec =>
          throw new IllegalStateException(
            "graft: CartesianProduct in the physical plan — an unbounded n×m join " +
              "never survives production scale. Add an equi-join key, broadcast() a " +
              s"provably small side, or set ${CartesianGuardRule.Conf}=false to override.")
        case _ => ()
      }
    plan
  }
}

object CartesianGuardRule {
  val Conf = "spark.graft.failOnCartesian"
}

/** The guard's non-AQE carrier: `ColumnarRule.preColumnarTransitions`
  * runs inside `QueryExecution.preparations` on every physical plan
  * regardless of `spark.sql.adaptive.enabled`, so sessions built with
  * AQE off still get the cartesian check (the query-stage-prep hook
  * never fires for them). Pure inspection — no columnar replacement.
  */
class CartesianGuardColumnarRule(session: SparkSession)
    extends org.apache.spark.sql.execution.ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] = CartesianGuardRule(session)
}
