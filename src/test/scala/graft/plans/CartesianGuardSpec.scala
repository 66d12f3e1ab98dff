package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The cartesian runtime guard: the engine's plan-quality policy
  * enforced on live physical plans (PlanQualitySpec proves no DECLARED
  * query plans the shape; this rule guards ARBITRARY user queries on an
  * extension-built session).
  */
class CartesianGuardSpec extends SparkSpecBase {

  private def cartesianPlan = {
    // no join condition + broadcast disabled -> CartesianProductExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(10).select(col("id").as("a"))
      val b = spark.range(10).select(col("id").as("b"))
      a.crossJoin(b).queryExecution.sparkPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a CartesianProductExec plan fails with the policy message") {
    val p = cartesianPlan
    assert(p.toString.contains("CartesianProduct"), s"fixture must plan a cartesian:\n$p")
    val e = intercept[IllegalStateException] { CartesianGuardRule(spark)(p) }
    assert(e.getMessage.contains("CartesianProduct") && e.getMessage.contains(CartesianGuardRule.Conf),
      s"error must name the shape and the escape hatch: ${e.getMessage}")
  }

  test("equi-join and broadcast-NLJ plans pass through untouched") {
    val a = spark.range(10).select(col("id").as("k"), col("id").as("a"))
    val b = spark.range(10).select(col("id").as("k"), col("id").as("b"))
    val equi = a.join(b, "k").queryExecution.sparkPlan
    assert(CartesianGuardRule(spark)(equi) eq equi)
    // the engine's own sanctioned tiny-broadcast cross join is a
    // BroadcastNestedLoopJoin, NOT a cartesian — must pass
    val bnlj = a.crossJoin(broadcast(b)).queryExecution.sparkPlan
    assert(bnlj.toString.contains("BroadcastNestedLoopJoin"), bnlj.toString)
    assert(CartesianGuardRule(spark)(bnlj) eq bnlj)
  }

  test("the escape hatch disables the guard for a deliberate cross product") {
    val p = cartesianPlan
    spark.conf.set(CartesianGuardRule.Conf, "false")
    try assert(CartesianGuardRule(spark)(p) eq p)
    finally spark.conf.unset(CartesianGuardRule.Conf)
  }

  test("GraftExtensions registers the guard on an extension-built session") {
    // builder internals (buildQueryStagePrepRules) are private[sql]; the
    // end-to-end proof needs a fresh JVM-level session built with
    // spark.sql.extensions=graft.functions.GraftExtensions, which a
    // shared-session suite can't construct — assert the injection
    // contract holds (apply registers without error) and the rule's
    // behavior on real plans above
    val e = new graft.functions.GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    e.apply(exts) // no exception = the injection contract holds
  }
}
