package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Steady-state cost of the streaming cascade ingest loop
  * ([[graft.streaming.StreamingOps.CascadeIngestState]]): drains a
  * corpus in N equal micro-batches through `cascadeIngestStream` and
  * prints each batch's ingest wall time plus the final-state row
  * counts, checked against the cold batch cascade. The claim to
  * verify is the loop's, not cascadeMerge's (DeltaProbe measures
  * that): per-batch cost stays flat as the ACCUMULATED state grows —
  * the merge reads base state linearly and re-pairs only against the
  * batch — so a continuously-fed dedup service does not slow down as
  * its corpus accretes.
  *
  * Usage: runMain graft.tools.IngestLoopProbe <corpusDir> [nBatches]
  */
object IngestLoopProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IngestLoopProbe <corpusDir> [nBatches]")
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    val bytes = graft.ops.Similarity.documentsSizeBytes(spark, dir)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ingest_probe").toString
    val state = new graft.streaming.StreamingOps.CascadeIngestState(
      spark, stateDir, 4, 5, bytes)
    // drive ingest() directly with doc_id-mod batches: the probe
    // measures the state fold, not MemoryStream plumbing (StreamingSpec
    // proves the stream wiring)
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    (0 until nBatches).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b.toLong)
      val t0 = System.nanoTime()
      state.ingestBatch(batch)
      val sec = (System.nanoTime() - t0) / 1e9
      val nPairs = state.pairs.get.count()
      println(f"[ingestloop] $dir%-26s batch ${b + 1}%2d/$nBatches%-2d $sec%7.1f s  (state pairs: $nPairs%,d)")
    }
    val finalLabels = state.labels.get.count()
    val coldLabels = graft.ops.Similarity.componentLabels(spark, dir).count()
    require(finalLabels == coldLabels,
      s"drained label count $finalLabels != cold $coldLabels")
    println(f"[ingestloop] $dir%-26s drained state ≡ cold cascade label count ($finalLabels%,d docs)")
    spark.stop()
  }
}
