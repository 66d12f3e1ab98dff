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
  * Injected via `injectQueryStagePrepRule`, so under AQE (default in
  * Spark 4.x) it runs before any query stage executes; the rule
  * inspects and passes the plan through untouched. Escape hatch:
  * `spark.graft.failOnCartesian=false` (per-session conf) for the rare
  * deliberate tiny cross product.
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
