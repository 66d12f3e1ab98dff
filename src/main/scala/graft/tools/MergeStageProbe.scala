package graft.tools

import org.apache.spark.sql.SparkSession

/** Times each staged delta-merge demo family build in sequence on a
  * fresh JVM — build-cost attribution for the q244/q245 staging
  * (which family dominates the cold first rep).
  *
  * Usage: runMain graft.tools.MergeStageProbe <corpusDir>
  */
object MergeStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("warmup")(spark.range(2000000).selectExpr("sum(id*2)").collect()(0).getLong(0))
    t("merge_base_groups")(graft.ops.Similarity.stagedMergeBaseGroups(spark, dir).count())
    t("merge_base_pairs")(graft.ops.Similarity.stagedMergeBasePairs(spark, dir).count())
    t("merge_base_labels")(graft.ops.Similarity.stagedMergeBaseLabels(spark, dir).count())
    t("merge_tagged")(graft.ops.Similarity.stagedMergeTagged(spark, dir).count())
    t("merge_fresh_pairs")(graft.ops.Similarity.stagedMergeFreshPairs(spark, dir).count())
    t("q244 readout")(graft.ops.Similarity.q244SetPairsDeltaMerge(spark, dir).count())
    t("q245 readout")(graft.ops.Similarity.q245LabelsDeltaMerge(spark, dir).count())
    spark.stop()
  }
}
