package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal Spark-primitive timings (repeat scalar sum, small shuffle,
  * tiny parquet write) — separates JVM/codegen warmup, shuffle
  * machinery, and disk from operator cost when a run looks uniformly
  * slow. Prints three reps of each so warm-vs-cold is visible.
  */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[host] $name rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    t("range_sum")(spark.range(2000000).selectExpr("sum(id*2)").collect())
    t("shuffle_32")(spark.range(1000000).selectExpr("id % 1000 as k", "id as v")
      .groupBy("k").sum("v").collect())
    t("parquet_write") {
      spark.range(100000).toDF("id").write.mode("overwrite")
        .parquet("/tmp/graft_hostprobe")
    }
    t("parquet_read")(spark.read.parquet("/tmp/graft_hostprobe").count())
    spark.stop()
  }
}
