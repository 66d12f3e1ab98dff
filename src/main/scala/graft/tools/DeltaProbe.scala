package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the delta-merge economics of the cascade's expensive
  * families (VERDICT r13 Next #1's "measured point"): for each given
  * corpus dir, times the COLD set-pairs build and CC labeling over the
  * full corpus against [[graft.ops.Similarity.pairsMerge]] /
  * [[graft.ops.Similarity.labelsMerge]] folding a 1/16 and a 1/4
  * delta into pre-staged base state (base collapse/pairs/labels built
  * untimed, as a production pipeline would hold them staged; the
  * delta's token sets are checkpointed untimed too — a real ingest
  * batch arrives as its own files, not as a filter over the full
  * corpus). Two claims to verify: merge wall time sits far below the
  * cold rebuild at every scale (the asymmetric join never re-pairs
  * base×base — its remaining corpus term is the LINEAR rank/remap
  * pass), and merge cost GROWS with the delta fraction at a fixed
  * corpus. Row counts are asserted merge ≡ recompute as a scale-level
  * sanity on top of DeltaMergeSpec.
  *
  * Usage: runMain graft.tools.DeltaProbe <dir1> [<dir2> ...]
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DeltaProbe <dir1> [<dir2> ...]")
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
    import graft.ops.Similarity._

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { dir =>
      val bytes = documentsSizeBytes(spark, dir)
      val full = tokenSetGroupsBy(docTokenSets(spark, dir)).localCheckpoint(true)
      val (coldPairs, coldPairsSec) = timed {
        val p = setPairsAbove(full, 4, 5, bytes).localCheckpoint(true)
        p.count(); p
      }
      val coldPairsN = coldPairs.count()
      val (_, coldLblSec) = timed {
        val (l, _) = hashMinLabels(full.select(col("gid")), coldPairs.select(col("ga"), col("gb")))
        l.count()
      }
      println(f"[deltaprobe] $dir%-28s cold: pairs $coldPairsSec%8.1f s ($coldPairsN%,d rows)  labels $coldLblSec%8.1f s")

      Seq(16L, 4L).foreach { denom =>
        val toks = docTokenSets(spark, dir)
        val deltaToks = toks.filter(pmod(col("doc_id"), lit(denom)) === 0).localCheckpoint(true)
        val base = tokenSetGroupsBy(
          toks.filter(pmod(col("doc_id"), lit(denom)) =!= 0)).localCheckpoint(true)
        val basePairs = setPairsAbove(base, 4, 5, bytes).localCheckpoint(true)
        basePairs.count()
        val (bl, _) = hashMinLabels(base.select(col("gid")), basePairs.select(col("ga"), col("gb")))
        val baseLabels = expandClusterLabels(base, bl).localCheckpoint(true)

        val (mpN, pairsSec) = timed {
          pairsMerge(base, basePairs, deltaToks, 4, 5, bytes).count()
        }
        val (_, lblSec) = timed {
          labelsMerge(base, baseLabels, deltaToks, 4, 5, bytes).count()
        }
        require(mpN == coldPairsN,
          s"pairsMerge row count $mpN != cold $coldPairsN at $dir denom=$denom")
        println(f"[deltaprobe] $dir%-28s delta 1/$denom%-2d: pairsMerge $pairsSec%8.1f s  labelsMerge $lblSec%8.1f s")
      }
    }
    spark.stop()
  }
}
