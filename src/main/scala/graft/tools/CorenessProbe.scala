package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the coreness staged build alone on each given corpus and
  * prints its converged round count — the working measurement behind
  * the round-14 look at the build's dominant family (226 s of the
  * 577.9 s 30× cascade, §2.4): is the cost many-rounds × fixed
  * overhead (a frontier/delta iteration pays off) or few fat rounds
  * (it will not)?
  *
  * Usage: runMain graft.tools.CorenessProbe <dir1> [<dir2> ...]
  */
object CorenessProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CorenessProbe <dir1> [<dir2> ...]")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    args.foreach { dir =>
      // pre-build the upstream pairs so the timing is coreness alone
      graft.ops.Similarity.stagedSetPairs45(spark, dir).count()
      graft.ops.Similarity.corenessRoundsLatch.set(0L)
      val t0 = System.nanoTime()
      val n = graft.ops.Similarity.stagedCoreness(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = graft.ops.Similarity.corenessRoundsLatch.get()
      println(f"[coreness] $dir%-28s $sec%8.1f s  $rounds%d rounds  ($n%,d vertices)")
    }
    spark.stop()
  }
}
