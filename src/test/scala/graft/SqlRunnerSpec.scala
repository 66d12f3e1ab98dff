package graft

/** S4/S5: multi-statement SQL executor + catalog listing. */
class SqlRunnerSpec extends SparkSpecBase {

  test("multi-statement SQL returns the last result; catalog lists tables") {
    SqlRunner.registerTables(spark, "/root/testdata/sf0.001")
    val tables = SqlRunner.listTables(spark)
    assert(Set("lineitem", "customer", "events", "documents").subsetOf(tables.toSet))
    val df = SqlRunner.q(spark,
      "SELECT count(*) AS n FROM lineitem; SELECT max(o_orderkey) AS mx FROM orders")
    assert(df.columns.toSeq == Seq("mx"))
    assert(df.collect().head.getLong(0) == 1499L)
  }

  test("errors surface instead of being swallowed (reference sql_wrapper bug)") {
    intercept[Exception] {
      SqlRunner.q(spark, "SELECT 1; SELECT * FROM no_such_table").collect()
    }
  }

  test("RUNTIME error in a non-final SELECT surfaces (statements execute, not just analyze)") {
    intercept[Exception] {
      SqlRunner.q(spark, "SELECT raise_error('mid-script failure'); SELECT 1 AS ok")
    }
  }
}
