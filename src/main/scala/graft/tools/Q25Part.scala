package graft.tools

import org.apache.spark.sql.SparkSession

/** One-JVM probe for SCALING.md §2.1's q25 hypothesis: the 1.28
  * measured 3×→10× exponent is shuffle DENSITY over the pinned 32
  * partitions (they fatten 10× while the count stays put), not a
  * superlinear term in the operator. If re-planning the same 10× run
  * with more shuffle partitions closes the gap toward linear, the
  * attribution is measured; if the time doesn't move, something in the
  * plan really grows superlinearly. Same core count both ways
  * (local[32]) — only the partition count varies, interleaved reps.
  *
  * Usage: runMain graft.tools.Q25Part [sfDir] [reps]
  */
object Q25Part {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sfx10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    graft.ops.Sketches.q25MinhashNeardup(spark, sfDir).count() // staging + warmup

    def run(parts: Int): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      graft.ops.Sketches.q25MinhashNeardup(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      System.gc(); s
    }
    val settings = Seq(32, 128)
    val times = (1 to reps).flatMap(_ => settings.map(p => p -> run(p)))
    settings.foreach { p =>
      val ts = times.filter(_._1 == p).map(_._2)
      println(f"[q25part] partitions=$p%-4d min ${ts.min}%.2f s  reps ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    // join-regime readout: does the verify side still broadcast at this
    // scale, or has the 32 MB gate degraded it to a shuffle join? The
    // plan is inspected AFTER execution — under AQE the pre-execution
    // executedPlan is the initial (isFinalPlan=false) plan, and AQE can
    // swap join strategies at runtime; only the post-run final plan
    // reports the regime that actually executed.
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val df = graft.ops.Sketches.q25MinhashNeardup(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    def count(s: String, pat: String): Int = s.sliding(pat.length).count(_ == pat)
    println(s"[q25part] plan joins: BroadcastHashJoin=${count(plan, "BroadcastHashJoin")} " +
      s"SortMergeJoin=${count(plan, "SortMergeJoin")} ShuffledHashJoin=${count(plan, "ShuffledHashJoin")}")
    spark.stop()
  }
}
