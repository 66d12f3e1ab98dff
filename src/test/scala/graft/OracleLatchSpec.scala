package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the q224 oracle's latch contract (SparkEntry.oracleSql):
  * the recursive-CTE unroll count comes from the engine's converged
  * coreness round count, latched by the staged build BEFORE Verify
  * dumps oracle_sql.json. Latch = 0 (build never ran, or q224 failed
  * under Verify's catch-and-continue) must render a LOUD DuckDB-error
  * sentinel, never a fixed-round unroll that could under-converge on a
  * chain-shaped graph and dump a silently wrong oracle.
  */
class OracleLatchSpec extends AnyFunSuite {

  private def q224Sql(latch: Long): String = {
    val saved = graft.ops.Similarity.corenessRoundsLatch.get
    graft.ops.Similarity.corenessRoundsLatch.set(latch)
    try SparkEntry.oracleSql("q224_core_decomposition")
    finally graft.ops.Similarity.corenessRoundsLatch.set(saved)
  }

  test("latch = 0 renders the error() sentinel, not an under-converged unroll") {
    val sql = q224Sql(0L)
    assert(sql.contains("error("), s"want a loud DuckDB error, got: $sql")
    assert(sql.contains("corenessRoundsLatch = 0"), sql)
    assert(!sql.contains("RECURSIVE"), "a latch-less dump must not ship a fixed unroll")
  }

  test("latched round count drives the unroll (floored at 32 — past-fixpoint rounds are no-ops)") {
    val sql40 = q224Sql(40L)
    assert(sql40.contains("it.r < 40") && sql40.contains("WHERE r = 40"), sql40)
    // a tiny converged count still unrolls the 32-round floor
    val sql3 = q224Sql(3L)
    assert(sql3.contains("it.r < 32") && sql3.contains("WHERE r = 32"), sql3)
  }
}
