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
      "q57_sketch_rollup", "q94_semdedup",
      // q239b: HLL day-sketch merge — sketch registers are
      // engine-specific (q47/q57's class); RollingActivesSketchSpec
      // bounds the WAU error against exact q239
      "q239b_rolling_actives_hll",
      "q120_knn_label_ivf", "q131_ivf_sq8",
      // q146: LSH-banded candidate edges (Spark xxhash64) — q25's class
      "q146_sketch_clusters",
      // q164-q166: file-LAYOUT facts (file names, byte sizes, per-file
      // rows) — the oracle's row views cannot observe storage layout;
      // StorageSpec pins exact outputs on controlled multi-file fixtures
      "q164_storage_stats", "q165_clustering_audit", "q166_compaction_plan",
      // q184: per-FILE event-time ranges — same file-layout class
      "q184_retention_plan",
      // q185: per-file FOOTER schemas — invisible to the row views by
      // construction (Spark projects the declared schema over them)
      "q185_schema_drift")

  test("entry returns rows on a vanilla session") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Tables.events adapts to the file's ts layout: micros read directly, raw longs convert") {
    // Driver testdata currently ships TIMESTAMP(MICROS): must read
    // directly and land in the generator's 2024 window (a mis-applied
    // nanos div-1000 would shift every event to 1970).
    import org.apache.spark.sql.functions.{min => smin, year}
    val y = Tables.events(spark, sf)
      .select(year(smin(org.apache.spark.sql.functions.col("ts"))))
      .head().getInt(0)
    assert(y == 2024, s"micros events.ts must stay in the generator window, got year $y")
    // Legacy/fixture layout (raw nanos as LongType) still converts.
    val dir = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    val nanos2024 = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z
    val fixture = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, nanos2024, 1L, "click", 1.0, "{}")), 1),
      Tables.eventsRawSchema)
    fixture.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ts = Tables.events(spark, dir).select("ts").head().getTimestamp(0)
    assert(ts.toInstant.toString.startsWith("2024-01-01T00:00:00"),
      s"raw-nanos fixture must convert to micros, got $ts")
  }

  test("TIMESTAMP(NANOS) file: converts under the legacy conf, fails fast with the fix without it") {
    // checked-in fixture with a true parquet TIMESTAMP(NANOS) ts column
    // (Spark cannot write one) — ts[0] = 1700000000.123456789s.
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("src/test/resources/events_nanos.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val ts = Tables.events(spark, dir).select("ts").orderBy("event_id").head().getTimestamp(0)
    assert(ts.toInstant.toString == "2023-11-14T22:13:20.123456Z",
      s"NANOS fixture must truncate to micros under nanosAsLong, got $ts")
    // conf OFF: the probe must rethrow with the curated session-build
    // message naming the conf (not Spark's raw schema-converter error).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val e = intercept[IllegalArgumentException](Tables.events(spark, dir).collect())
      assert(e.getMessage.contains("nanosAsLong"), s"curated message expected, got: ${e.getMessage}")
    } finally spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val rows: Array[Row] = fn(spark, sf).collect()
      assert(rows.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }
}
