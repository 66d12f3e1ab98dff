package graft

import graft.functions.GraftFunctions

/** Native expression specs: SQL surface, codegen path (DataFrame eval),
  * and edge cases for sorted_intersect_count.
  */
class FunctionsSpec extends SparkSpecBase {

  test("sorted_intersect_count via SQL: overlap, disjoint, empty, null") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1,2,3,5), array(2,3,4,5)) AS a, " +
        "sorted_intersect_count(array(1,2), array(3,4)) AS b, " +
        "sorted_intersect_count(CAST(array() AS ARRAY<INT>), array(1)) AS c, " +
        "sorted_intersect_count(CAST(NULL AS ARRAY<INT>), array(1)) AS d").collect().head
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 0)
    assert(r.getInt(2) == 0)
    assert(r.isNullAt(3))
  }

  test("matches size(array_intersect) over generated sorted sets (codegen path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      rnd.shuffle(0 to 60).take(rnd.nextInt(30) + 1).sorted,
      rnd.shuffle(0 to 60).take(rnd.nextInt(30) + 1).sorted))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      call_function("sorted_intersect_count", col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0L)
  }

  test("GraftExtensions injects the function at session build time") {
    // the running shared session wasn't built with the extension; verify
    // the injector wires the same builder without error
    val e = new graft.functions.GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    e.apply(exts) // no exception = registration contract holds
  }
}
