package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the AQE-final executedPlan of the named declared queries
  * against a corpus dir — the working tool behind choosing/maintaining
  * the canary's plan-shape pins (the Q25Part lesson: only the final
  * plan reports the join regime that actually executed, so pins must
  * be chosen from exactly this string).
  *
  * Usage: runMain graft.tools.PlanDump <dir> <key1> [<key2> ...]
  *
  * With SPARK_GRAFT_PLAN_OUT=<outdir> and SPARK_GRAFT_PLAN_SUFFIX=
  * <suffix> set, additionally writes each key's `.explain("formatted")`
  * string (of the SAME executed-and-finalized QueryExecution) to
  * `<outdir>/<key>_<suffix>.txt` — the committed plan evidence for the
  * optimization rounds (plans/r14/<key>_{before,after}.txt).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <dir> <key1> [<key2> ...]")
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxMetadataStringLength", "500") // full scan paths
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    args.tail.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, dir)
      // drive THIS QueryExecution (df.count() plans a separate
      // aggregate and leaves this plan's AQE un-finalized)
      df.queryExecution.toRdd.count()
      println(s"===== $key =====")
      println(df.queryExecution.executedPlan.toString)
      out.foreach { o =>
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(o)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve(s"${key}_$suffix.txt"), formatted)
      }
    }
    spark.stop()
  }
}
