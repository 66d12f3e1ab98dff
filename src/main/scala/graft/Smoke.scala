package graft

import org.apache.spark.sql.SparkSession

/** Local smoke drive of the driver contract: runs `SparkEntry.entry` on a
  * vanilla session (exactly what the driver's t1 smoke does) and prints
  * the row count + plan. `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    df.show(5, truncate = false)
    require(n > 0, "entry must return >0 rows")
    spark.stop()
  }
}
