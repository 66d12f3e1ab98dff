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

  test("q88 decimal pack near its documented bounds: huge avg_unit and near-10^18 suppkey stay exact") {
    val dir = tmpDir()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val bigKey = 999999999999999999L // 10^18 − 1, the pack's suppkey ceiling
    def li(id: Long, pk: Long, sk: Long, price: Double) =
      org.apache.spark.sql.Row(id, pk, sk, 1, 1.0, price, 0.0, 0.0, "N", "O", ts)
    write(dir, "lineitem", df(Tables.lineitemSchema,
      // part 1: avg_unit 10¹⁴ (the largest power of ten DECIMAL(19,4)
      // carries; avg·10⁴ = 10¹⁸, under the (20,0) overflow edge at
      // 10²⁰) on the max-key supplier vs avg 2.0 on supplier 7 — a
      // silent pack overflow would null the min and skip the cheap
      // supplier (round-14 ADVICE's failure mode)
      li(1L, 1L, bigKey, 1.0e14),
      li(2L, 1L, 7L, 2.0),
      // part 2: an exact avg tie (3.5) — the suppkey low digits must
      // decide, and the max key must not corrupt the comparison
      li(3L, 2L, bigKey, 3.5),
      li(4L, 2L, 5L, 3.5)))
    write(dir, "supplier", df(Tables.supplierSchema,
      org.apache.spark.sql.Row(bigKey, "sMAX", 0, 1.0),
      org.apache.spark.sql.Row(7L, "s7", 0, 1.0),
      org.apache.spark.sql.Row(5L, "s5", 0, 1.0)))
    val out = graft.ops.Relational.q88CheapestSupplierPerPart(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 7L, 2.0), (2L, 5L, 3.5)), out.toSeq)
  }

  test("q176 equi-depth: heavy value owns its bin, light values pack, skipped ids allowed") {
    val dir = tmpDir()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def li(id: Long, qty: Double) =
      org.apache.spark.sql.Row(id, 9L, 7L, 1, qty, 2.0, 0.0, 0.0, "N", "O", ts)
    // 16 rows of v=1 (2/3 of the mass) + one row each of v=2..9
    val rows = (1L to 16L).map(li(_, 1.0)) ++ (2 to 9).map(v => li(100L + v, v.toDouble))
    write(dir, "lineitem", df(Tables.lineitemSchema, rows: _*))
    val out = Analytics.q176EquidepthHistogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // hand-computed: rows_before*16 div 24 per value
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 16L, 1L),   // the heavy value owns bin 0; ids 1-9 skipped
      (10L, 2L, 2L, 1L, 1L), (11L, 3L, 3L, 1L, 1L), (12L, 4L, 5L, 2L, 2L),
      (13L, 6L, 6L, 1L, 1L), (14L, 7L, 8L, 2L, 2L), (15L, 9L, 9L, 1L, 1L)), out.toSeq)
    assert(out.map(_._4).sum == 24L)
    // bins partition the ordered domain: each bin's lo follows the
    // previous bin's hi
    assert(out.toSeq.sliding(2).forall { case Seq(a, b) => b._2 > a._3; case _ => true })
  }

  test("q207 HHI: dominant supplier flags; the exact 0.25 boundary does not (strict compare)") {
    val dir = tmpDir()
    writeWarehouse(dir)
    write(dir, "part", df(Tables.partSchema,
      org.apache.spark.sql.Row(1L, "p1", "BR_A", "T", 1, 1.0),
      org.apache.spark.sql.Row(2L, "p2", "BR_B", "T", 1, 1.0)))
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def li(id: Long, pk: Long, sk: Long, qty: Double) =
      org.apache.spark.sql.Row(id, pk, sk, 1, qty, 1.0, 0.0, 0.0, "N", "O", ts)
    write(dir, "lineitem", df(Tables.lineitemSchema,
      // BR_A: 9 vs 1 → Σq² = 82, 4·82 > 10² → concentrated
      li(1L, 1L, 1L, 9.0), li(2L, 1L, 2L, 1.0),
      // BR_B: 4 × 5 → Σq² = 100, 4·100 = 20² exactly → NOT concentrated
      li(3L, 2L, 1L, 5.0), li(4L, 2L, 2L, 5.0),
      li(5L, 2L, 3L, 5.0), li(6L, 2L, 4L, 5.0)))
    // sum_sq is BIGINT at the output edge since round 10 (SURVEY §7.3:
    // wide decimals stay internal)
    val out = graft.ops.Relational.q207SupplierConcentration(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("BR_A", 2L, 10L, 82L, true),
      ("BR_B", 4L, 20L, 100L, false)), out.toSeq)
  }

  test("q209 latency: interpolated p90, pre-order ship floors to -1, per-priority isolation") {
    val dir = tmpDir()
    writeWarehouse(dir)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    write(dir, "orders", df(Tables.ordersSchema,
      org.apache.spark.sql.Row(1L, 1L, "O", 1.0, ts("2024-01-01 00:00:00"), "1-URGENT"),
      org.apache.spark.sql.Row(2L, 1L, "O", 1.0, ts("2024-01-01 00:00:00"), "5-LOW")))
    def li(id: Long, ok: Long, ship: String) =
      org.apache.spark.sql.Row(ok, 9L, 7L, id.toInt, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(ship))
    write(dir, "lineitem", df(Tables.lineitemSchema,
      li(1L, 1L, "2024-01-02 00:00:00"),   // +1 day
      li(2L, 1L, "2024-01-03 00:00:00"),   // +2 days
      li(3L, 1L, "2024-01-04 00:00:00"),   // +3 days
      li(4L, 2L, "2023-12-31 12:00:00")))  // −12 h → floors to −1
    val out = graft.ops.Relational.q209FulfillmentLatency(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    // p90 of [1,2,3]: 0.9·2 = 1.8 → 2 + 0.8·(3−2) = 2.8
    assert(out.toSeq == Seq(
      ("1-URGENT", 3L, 1L, 2.0, 2.8, 3L),
      ("5-LOW", 1L, -1L, -1.0, -1.0, -1L)), out.toSeq)
  }

  test("q191 growth accounting: first-month orders all count new; later months split by cohort") {
    val dir = tmpDir()
    def o(id: Long, c: Long, ym: String, price: Double) =
      org.apache.spark.sql.Row(id, c, "O", price,
        java.sql.Timestamp.valueOf(s"$ym-15 00:00:00"), "1-URGENT")
    write(dir, "orders", df(Tables.ordersSchema,
      o(1L, 1L, "2024-01", 10.0), o(2L, 1L, "2024-01", 20.0), // c1 new in Jan, 2 orders
      o(3L, 1L, "2024-02", 40.0),                             // c1 returns in Feb
      o(4L, 2L, "2024-02", 80.0)))                            // c2 new in Feb
    val out = graft.ops.Relational.q191GrowthAccounting(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    val jan = 2024L * 12 + 1
    assert(out(jan) == ((2L, 1L, 30.0, null)), out(jan))        // no returning revenue yet
    assert(out(jan + 1) == ((2L, 1L, 80.0, 40.0)), out(jan + 1))
  }

  test("q176 equi-depth: empty lineitem yields zero bins, not a crash") {
    val dir = tmpDir()
    writeEmptyWarehouse(dir)
    assert(Analytics.q176EquidepthHistogram(spark, dir).count() == 0L)
    // growth accounting over zero orders: no months
    assert(graft.ops.Relational.q191GrowthAccounting(spark, dir).count() == 0L)
    // concentration over zero lineitems: no brands
    assert(graft.ops.Relational.q207SupplierConcentration(spark, dir).count() == 0L)
    // latency over zero lineitems: no priorities
    assert(graft.ops.Relational.q209FulfillmentLatency(spark, dir).count() == 0L)
  }
}
