package graft.ops

import graft.{SparkSpecBase, Tables}

/** q239b (HLL day-sketch rolling actives) vs exact q239: identical day
  * grid, bounded relative error. The sketch leg is declared rows-only
  * (registers are engine-specific), so THIS spec is its correctness
  * contract — the q38b/q38 exact-vs-sketch pairing.
  */
class RollingActivesSketchSpec extends SparkSpecBase {

  test("q239b: same day grid as exact q239; DAU/WAU within 5% relative error at sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = Events.q239RollingActives(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Events.q239bRollingActivesHll(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet,
      s"day grids must match: ${(approx.keySet -- exact.keySet, exact.keySet -- approx.keySet)}")
    // default DataSketches HLL (lgK 12) holds ~1.6% rsd; 5% is the
    // loose gate that still catches a wrong merge (a dropped day's
    // sketch shows up as a ~1/7 WAU dent, far outside it)
    for ((day, (dauE, wauE)) <- exact) {
      val (dauA, wauA) = approx(day)
      if (dauE > 0)
        assert(math.abs(dauA - dauE).toDouble / dauE <= 0.05,
          s"day $day dau: exact $dauE approx $dauA")
      else assert(dauA == 0L, s"day $day: empty day must estimate 0, got $dauA")
      if (wauE > 0)
        assert(math.abs(wauA - wauE).toDouble / wauE <= 0.05,
          s"day $day wau: exact $wauE approx $wauA")
      else assert(wauA == 0L, s"day $day: empty window must estimate 0, got $wauA")
    }
  }

  test("q239b ≡ q239 EXACTLY on randomized small-cardinality corpora (seeded): HLL coupon mode + union stay exact") {
    // below ~hundreds of distinct values a DataSketches HLL (lgK 12)
    // holds raw coupons and estimates EXACTLY, and a union of
    // coupon-mode sketches stays coupon-mode — so at small cardinality
    // the sketch leg must equal the exact leg bit-for-bit, which turns
    // the ≤5% error gate into an equality property. Randomized shapes:
    // sparse user sets, multi-day gaps (zero-fill windows), repeat
    // activity inside one window (union-not-sum).
    val rnd = new scala.util.Random(20260815L)
    val day0 = 1704067200L * Ns
    val dayNs = 86400L * Ns
    (1 to 4).foreach { trial =>
      val dir = tmpDir()
      val nEvents = 30 + rnd.nextInt(50)
      var id = 0L
      val rows = (1 to nEvents).map { _ =>
        id += 1
        val day = rnd.nextInt(20).toLong
        val user = (1 + rnd.nextInt(25)).toLong // ≤ 25 distinct users
        (id, day0 + day * dayNs + id * 1000L, user, "click", 1.0, "{}")
      }
      writeEvents(dir, rows: _*)
      val exact = Events.q239RollingActives(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val approx = Events.q239bRollingActivesHll(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(approx == exact, s"trial $trial (n=$nEvents): sketch diverged\n$approx\nvs\n$exact")
    }
  }

  test("q239b: NULL users count, in parity with exact q239 (pre-coalesced to the reserved id)") {
    // exact q239's distinct() keeps a (NULL, day) row and counts it;
    // hll_sketch_agg would skip NULLs, so the op coalesces user_id to
    // Long.MinValue first. At these cardinalities HLL is coupon-mode
    // exact, so the two legs must agree EXACTLY on a null-user corpus.
    val dir = tmpDir()
    val day0 = 1704067200L * Ns
    val dayNs = 86400L * Ns
    import org.apache.spark.sql.Row
    write(dir, "events", df(Tables.eventsRawSchema,
      Row(1L, day0, 1L, "click", 1.0, "{}"),
      Row(2L, day0, null, "click", 1.0, "{}"), // null user, day 0
      Row(3L, day0 + dayNs, null, "view", 1.0, "{}"), // null user, day 1
      Row(4L, day0 + 2L * dayNs, 2L, "click", 1.0, "{}")))
    val exact = Events.q239RollingActives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val approx = Events.q239bRollingActivesHll(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(exact.head._2 == 2L, s"exact q239 must count the null user on day 0: $exact")
    assert(approx == exact, s"null-user corpus: sketch leg diverged\n$approx\nvs\n$exact")
  }

  test("q239b: wau_7d is never below dau (clamped — independent sketch estimates are not monotone)") {
    val sf = "/root/testdata/sf0.01"
    val out = Events.q239bRollingActivesHll(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"day ${r.getLong(0)}: wau_7d ${r.getLong(2)} < dau ${r.getLong(1)}")
    }
  }

  test("q239b: a user active on several window days counts once (sketch union dedups)") {
    val dir = tmpDir()
    // one user active every day for 10 days + a second user on day 3
    val day0 = 1704067200L * Ns // 2024-01-01 in raw nanos
    val dayNs = 86400L * Ns
    val rows = (0L until 10L).map(d =>
      (d, day0 + d * dayNs, 1L, "click", 1.0, "{}")) :+
      (100L, day0 + 3L * dayNs, 2L, "click", 1.0, "{}")
    writeEvents(dir, rows: _*)
    val out = Events.q239bRollingActivesHll(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // at these cardinalities (1-2 users) HLL is exact: every window
    // containing day 3 reads 2, the rest 1 — never 7 (union, not sum)
    val byDay = out.map(t => t._1 -> t).toMap
    val d0 = out.map(_._1).min
    for ((day, dau, wau) <- out) {
      val expDau = if (day == d0 + 3) 2L else 1L
      val expWau = if (day >= d0 + 3 && day <= d0 + 9) 2L else 1L
      assert(dau == expDau, s"day ${day - d0}: dau $dau != $expDau")
      assert(wau == expWau, s"day ${day - d0}: wau $wau != $expWau")
    }
    assert(byDay.size == 10)
  }
}
