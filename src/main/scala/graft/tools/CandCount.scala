package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints, for each given corpus dir, the unigram J ≥ 4/5 prefix
  * join's EMITTED candidate count and its EVALUATED bucket statistics
  * (Σ per-prefix-token C(bucket, 2) and the hottest bucket's
  * C(n, 2) — the canary's `cascade_candidate_volume` /
  * `cascade_bucket_skew` pins; see
  * [[graft.ops.Similarity.cascadeBucketStats]]). Used to
  * (re-)baseline the canary ceilings and to record the ordering
  * divergence curve (SCALING.md §6.1's table: at 3× a hash-order
  * revert moves the emitted count 10.57M → 17.24M and the volume
  * 72.98M → 101.27M — both inside a 2× gate's headroom — while the
  * max bucket jumps 4.20M → 16.09M, a 3.8× overshoot, and grows
  * with the square of scale (1.16B at 30×); the skew pin, plus the
  * in-memory shared-pool ordering probe, is what catches a revert).
  *
  * Usage: runMain graft.tools.CandCount <dir1> [<dir2> ...]
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CandCount <dir1> [<dir2> ...]")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"[candcount] ordering probe: ${graft.ops.Similarity.orderingProbeCandidates(spark)}%,d candidates (canonical = 0)")
    args.foreach { dir =>
      var t0 = System.nanoTime()
      val (v, m) = graft.ops.Similarity.cascadeBucketStats(spark, dir)
      val tv = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val n = graft.ops.Similarity.cascadeCandidateCount(spark, dir)
      val tn = (System.nanoTime() - t0) / 1e9
      println(f"[candcount] $dir%-28s bucket volume $v%,d max $m%,d ($tv%.1f s)  emitted $n%,d ($tn%.1f s)")
    }
    spark.stop()
  }
}
