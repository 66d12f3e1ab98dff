package graft.tools

import org.apache.spark.sql.SparkSession

/** One-line plan audit of EVERY declared query against a corpus dir —
  * the round-14 optimization checklist's data source. For each key,
  * executes the query's own QueryExecution (toRdd, so AQE finalizes)
  * and prints counts of the plan features the optimization guide says
  * to look at (§2.4 exchanges, §3.1 join strategy, window/sort nodes),
  * read from the FINAL plan section only (the Q25Part lesson).
  *
  * Usage: runMain graft.tools.PlanSurvey <dir> [keyPrefixFilter]
  */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanSurvey <dir> [keyPrefix]")
    val dir = args.head
    val prefix = args.lift(1).getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def finalOnly(plan: String): String = {
      val i = plan.indexOf("== Initial Plan ==")
      if (i < 0) plan else plan.substring(0, i)
    }
    def n(plan: String, pat: String): Int = plan.sliding(pat.length).count(_ == pat)
    println("key,sec,exchange,bhj,smj,shj,bnlj,cartesian,window,sort,scans")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (key, fn) =>
        try {
          val df = fn(spark, dir)
          val t0 = System.nanoTime()
          df.queryExecution.toRdd.count()
          val sec = (System.nanoTime() - t0) / 1e9
          val p = finalOnly(df.queryExecution.executedPlan.toString)
          println(f"$key,$sec%.2f,${n(p, "Exchange")},${n(p, "BroadcastHashJoin")}," +
            s"${n(p, "SortMergeJoin")},${n(p, "ShuffledHashJoin")}," +
            s"${n(p, "BroadcastNestedLoopJoin")},${n(p, "CartesianProduct")}," +
            s"${n(p, "Window")},${n(p, "Sort ")},${n(p, "Scan parquet")}")
        } catch {
          case e: Throwable => println(s"$key,FAILED: ${e.getMessage}")
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
