package graft.tools

import org.apache.spark.sql.SparkSession

/** One-JVM head-to-head of q178 manifest shapes (the round-10 shape
  * discipline: interleaved reps in a single session, min + spread per
  * shape, never cross-run comparisons). Round 10 measured the
  * STRING-keyed union-first form slower (2.20-2.57 s vs 1.93-2.11);
  * this probe tests the PACKED-LONG variant the verdict's Next #4
  * implies: union the tagged pk projections BEFORE any aggregate and
  * run ONE (tbl_id·256 + bucket)-keyed exchange (≤ 2,560 long-keyed
  * groups), names re-attached from a 10-row broadcast at the end.
  *
  * Usage: runMain graft.tools.Q178Shape [sfDir] [reps]
  */
object Q178Shape {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    def time(label: String, f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        System.gc(); (s, n)
      }
      println(f"[q178shape] $label%-12s min ${ts.map(_._1).min}%.2f s  " +
        f"reps ${ts.map(t => f"${t._1}%.2f").mkString(", ")}  rows ${ts.head._2}")
    }
    val a = () => graft.ops.Audit.q178MerkleManifest(spark, sfDir)
    val b = () => graft.ops.Audit.q178MerkleManifestPacked(spark, sfDir)
    // equality first: the packed shape must be output-identical
    val rowsA = a().collect().map(_.toSeq).toSeq
    val rowsB = b().collect().map(_.toSeq).toSeq
    require(rowsA == rowsB, s"shape divergence: ${rowsA.diff(rowsB).take(3)} vs ${rowsB.diff(rowsA).take(3)}")
    println(s"[q178shape] outputs identical (${rowsA.size} rows)")
    // a/b/a/b call order interleaves the shapes so neither claims the
    // cold-cache rep (the equality check above is the shared warmup)
    time("ten-stage", a().count())
    time("packed", b().count())
    time("ten-stage", a().count())
    time("packed", b().count())
    spark.stop()
  }
}
