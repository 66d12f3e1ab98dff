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
    val e = new graft.functions.GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    e.apply(exts) // no exception = the injection contract holds
  }

  /** End-to-end proof on a REAL extension-built session with AQE OFF:
    * the query-stage-prep hook never runs without AQE, so this pins the
    * columnar-rule carrier (the round-6 advisor's gap). The session is
    * built over the suite's existing SparkContext with default/active
    * cleared so the builder constructs a fresh SessionState and applies
    * `spark.sql.extensions`.
    */
  test("extension-built session fails a cartesian end-to-end with AQE off") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // force the shared context up first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // `spark.sql.extensions` is a STATIC conf read from the
      // SparkContext's conf (fixed at context launch) — on a shared
      // test context the builder string is ignored, so load the same
      // GraftExtensions.apply through Builder.withExtensions, the
      // equivalent programmatic path.
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions()(_))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
      assert(s2 ne spark, "builder must construct a fresh session, not reuse the suite's")
      val a = s2.range(10).select(col("id").as("a"))
      val b = s2.range(10).select(col("id").as("b"))
      val err = intercept[Throwable] { a.crossJoin(b).collect() }
      val messages = Iterator.iterate(err)(_.getCause).takeWhile(_ != null).take(8)
        .map(t => String.valueOf(t.getMessage)).mkString(" | ")
      assert(messages.contains("CartesianProduct"),
        s"guard must fire through the non-AQE columnar path, got: $messages")
      // and a legitimate equi-join still runs on the same session
      val ok = s2.range(10).select(col("id").as("k"))
        .join(s2.range(10).select(col("id").as("k")), "k").count()
      assert(ok == 10L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
