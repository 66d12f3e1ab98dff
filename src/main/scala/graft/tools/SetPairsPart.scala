package graft.tools

import org.apache.spark.sql.SparkSession

/** One-JVM probe for the cascade sweep's one above-linear family
  * (SCALING.md §2.3): `set_pairs_45` measured slope 1.27 on the
  * 10×→30× step inside CascadeProbe's fixed 32 shuffle partitions.
  * Q25Part's question again: is that a superlinear term in the prefix
  * cascade itself, or shuffle DENSITY over pinned partitions (32
  * partitions each carrying 30× the bytes)? Same decomposition: the
  * same build re-planned at more partitions, same core count,
  * interleaved reps, candidate/verify volumes unchanged. The probe
  * times the RAW builder (`Similarity.setPairsAbove(...).count()`),
  * not the staged write, so parquet-out cost is excluded and the
  * registry cannot memoize between reps.
  *
  * Usage: runMain graft.tools.SetPairsPart [sfDir] [reps]
  */
object SetPairsPart {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sfx30")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val groups = graft.ops.Similarity.stagedUnigramGroups(spark, sfDir)
    val bytes = graft.ops.Similarity.documentsSizeBytes(spark, sfDir)
    groups.count() // staging + page-cache warmup

    def run(parts: Int): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val n = graft.ops.Similarity.setPairsAbove(groups, 4, 5, bytes).count()
      val s = (System.nanoTime() - t0) / 1e9
      System.gc()
      println(f"[setpairs] partitions=$parts%-4d $s%.2f s  ($n pairs)")
      s
    }
    val settings = Seq(32, 128)
    val times = (1 to reps).flatMap(_ => settings.map(p => p -> run(p)))
    settings.foreach { p =>
      val ts = times.filter(_._1 == p).map(_._2)
      println(f"[setpairs] partitions=$p%-4d min ${ts.min}%.2f s  reps ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    // join-regime readout from the post-run final plan (AQE can swap
    // strategies at runtime — the Q25Part lesson)
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    val df = graft.ops.Similarity.setPairsAbove(groups, 4, 5, bytes)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    def cnt(pat: String): Int = plan.sliding(pat.length).count(_ == pat)
    println(s"[setpairs] plan joins: BroadcastHashJoin=${cnt("BroadcastHashJoin")} " +
      s"SortMergeJoin=${cnt("SortMergeJoin")} ShuffledHashJoin=${cnt("ShuffledHashJoin")} " +
      s"BroadcastNestedLoopJoin=${cnt("BroadcastNestedLoopJoin")}")
    spark.stop()
  }
}
