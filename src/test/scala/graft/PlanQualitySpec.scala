package graft

import graft.ops.{Relational, Similarity}
import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards for the 100 TB design properties
  * (SURVEY.md §4 / BASELINE "scale-design bar"): filters and projections
  * must reach the parquet scan, dimension joins must broadcast, and the
  * similarity joins must never degenerate into cartesian products.
  */
class PlanQualitySpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("q01: predicate pushed to parquet, untouched columns pruned from the scan") {
    val p = physical(Relational.q01ScanProjectFilter(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), p)
    assert(!p.contains("l_tax"), "scan should not read unprojected columns")
  }

  test("q02: dimension side is broadcast — no shuffle join for customer⋈orders") {
    val p = physical(Relational.q02InnerJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q12: point lookup pushes the equality filter into the scan") {
    val p = physical(Relational.q12PointLookup(spark, sf))
    assert(p.contains("EqualTo(o_orderkey,42)"), p)
  }

  test("q16: anti-join stays a hash join, not a nested loop") {
    val p = physical(Relational.q16DeleteAntijoin(spark, sf))
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21: candidate generation is an equi-join, never a cartesian product") {
    val p = physical(Similarity.q21JaccardNeardup(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("sorted_intersect_count"), "verify stage must use the native expression")
  }

  test("q22: tiny query side is broadcast under the corpus scan") {
    val p = physical(Similarity.q22TopkCosine(spark, sf))
    assert(p.contains("Broadcast"), p)
  }

  test("q25/q55: sketch and shingle candidate joins stay equi-joins on native exprs") {
    val p25 = physical(graft.ops.Sketches.q25MinhashNeardup(spark, sf))
    assert(!p25.contains("CartesianProduct"), p25)
    // the banding join must key on scalar band hashes (h0..h7) exploded
    // once per row — minhash_signature itself collapses into the
    // aggregate's result projection, which the plan string omits
    assert(p25.contains("posexplode(array(h0"), "scalar banding expected:\n" + p25)
    assert(p25.contains("shingle_hashes"), "token build must use the native codegen expr")
    val p55 = physical(Similarity.q55ShingleNeardup(spark, sf))
    assert(!p55.contains("CartesianProduct"), p55)
    assert(p55.contains("shingle_hashes"), "shingle build must use the native codegen expr")
  }

  test("q54: per-stratum top-k is one hash exchange (window), no extra shuffles") {
    val p = physical(graft.ops.TrainingData.q54HashSample(spark, sf))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("q18: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = physical(Relational.q18TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q13: the groupBy after the window reuses the user_id partitioning (one shuffle)") {
    val p = physical(graft.ops.Events.q13Sessionize(spark, sf))
    // exchanges: one hash(user_id) for the window, one range for the final
    // ORDER BY — the (user_id, session_id) aggregation must NOT add a third
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("q48: pivot compiles to partial+final hash aggregate, one shuffle") {
    val p = physical(graft.ops.Analytics.q48Pivot(spark, sf))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial + final aggregate expected:\n" + p)
  }

  test("q49: unpivot is pure Expand — no exchange before the output sort") {
    val p = physical(graft.ops.Analytics.q49Unpivot(spark, sf))
    assert(p.contains("Expand"), p)
    assert(!p.contains("Exchange hashpartitioning"), "unpivot must not shuffle:\n" + p)
  }
}
