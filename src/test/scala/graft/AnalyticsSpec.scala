package graft

import graft.ops.Analytics

/** Specs for analytics operators whose correctness guard is not (only)
  * the DuckDB oracle.
  */
class AnalyticsSpec extends SparkSpecBase {

  test("q38b approx percentiles track exact q38 within 1% at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val exact = Analytics.q38Percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Analytics.q38bApproxPercentiles(spark, sf).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    for (r <- approx; i <- 1 to 4) {
      val (a, x) = (r.getDouble(i), exact(r.getString(0)).getDouble(i))
      // accuracy=10000 on sf0.001 group sizes keeps the sketch near-exact;
      // the residual gap is approx returning a data value vs type-7
      // interpolation in the exact twin
      assert(math.abs(a - x) <= 0.01 * math.max(1.0, math.abs(x)),
        s"${r.getString(0)} col $i: approx $a vs exact $x")
    }
  }
}
