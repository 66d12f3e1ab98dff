package graft

import org.apache.spark.sql.Row

/** End-to-end smoke over the real sf0.001 testdata: every declared query
  * runs and returns rows, and `queries`/`oracleSql` keys stay in sync
  * (the driver's correctness gate needs both).
  */
class EngineSmokeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("every declared query has oracle SQL (or is explicitly oracle-free)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query impl: $orphans")
    assert(missing.forall(OracleFree.contains),
      s"queries without oracle SQL not declared oracle-free: ${missing -- OracleFree}")
  }

  /** Query keys intentionally without a DuckDB oracle (non-SQL-expressible
    * sketch/sampling ops) — the driver records a weaker rows-only check.
    */
  private val OracleFree: Set[String] =
    Set("q25_minhash_neardup", "q26_simhash_neardup", "q32b_ivf_trained",
      "q32c_ivf_multiprobe", "q38b_approx_percentiles", "q47_approx_distinct",
      "q50_stratified_sample", "q57_sketch_rollup", "q94_semdedup",
      "q120_knn_label_ivf")

  test("entry returns rows on a vanilla session") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Tables.events fails fast with the fix when the nanos conf is off") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val e = intercept[IllegalArgumentException] {
        Tables.events(spark, sf)
      }
      assert(e.getMessage.contains("nanosAsLong"),
        s"error must name the conf and the fix: ${e.getMessage}")
    } finally spark.conf.set(key, prev)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val rows: Array[Row] = fn(spark, sf).collect()
      assert(rows.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }
}
