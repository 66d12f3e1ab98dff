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
}
