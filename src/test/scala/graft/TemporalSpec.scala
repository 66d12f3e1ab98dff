package graft

import graft.ops.Temporal

/** Semantics + plan-shape specs for the temporal joins (q42 as-of,
  * q43 interval): inclusive bounds, left semantics, per-key isolation,
  * and the scale guarantees (one shuffle for as-of; never a nested-loop
  * join for the interval join).
  */
class TemporalSpec extends SparkSpecBase {

  private def asofRows(dir: String) =
    Temporal.q42AsofJoin(spark, dir).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap

  test("q42 as-of: latest prior purchase per user; equal ts matches; no prior → null") {
    val dir = tmpDir()
    writeEvents(dir,
      // user 1: purchases at 10s (id 100) and 50s (id 101)
      (100L, 10L * Ns, 1L, "purchase", 5.0, "{}"),
      (101L, 50L * Ns, 1L, "purchase", 7.0, "{}"),
      // clicks: before any purchase / exactly at one / after both
      (1L, 5L * Ns, 1L, "click", 0.0, "{}"),
      (2L, 10L * Ns, 1L, "click", 0.0, "{}"),
      (3L, 60L * Ns, 1L, "click", 0.0, "{}"),
      // user 2 clicks but never purchases; user 1 noise of another type
      (4L, 100L * Ns, 2L, "click", 0.0, "{}"),
      (5L, 55L * Ns, 1L, "error", 0.0, "{}"))
    val got = asofRows(dir)
    assert(got == Map(1L -> -1L, 2L -> 100L, 3L -> 101L, 4L -> -1L))
  }

  test("q43 interval: strictly-after lower bound, inclusive 1-day upper, per-user") {
    val dir = tmpDir()
    val T0 = 1000L * Ns
    writeEvents(dir,
      (1L, T0, 1L, "view", 0.0, "{}"),
      (2L, T0 + Hour, 1L, "view", 0.0, "{}"),
      (3L, T0 + 86400L * Ns, 1L, "view", 0.0, "{}"), // exactly +1d from id 1
      (4L, T0 + 86400L * Ns + 1000L, 1L, "view", 0.0, "{}"), // +1d and 1µs
      (5L, T0 + Hour, 2L, "view", 0.0, "{}")) // other user, never paired
    val got = Temporal.q43RangeJoin(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 2L, 3600L), (1L, 3L, 86400L), // (1,4) is 1µs past the bound
      (2L, 3L, 82800L), (2L, 4L, 82800L),
      (3L, 4L, 0L))) // 1µs gap floors to 0s
  }

  test("q42 plan: one hash shuffle serves the whole as-of (plus the output sort)") {
    val p = Temporal.q42AsofJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("q43 plan: bucketized equi-join — no nested-loop or cartesian join") {
    val p = Temporal.q43RangeJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }
}
