package graft.tools

import org.apache.spark.sql.SparkSession

/** Build-only timing of the staged cascade — the one-time per-corpus
  * materialization phase (VERDICT r11 Next #1). Every prior SCALING.md
  * number measures a query's STEADY STATE with the cascade pre-built;
  * rep 1 of the first stage-consuming query carried the cascade as an
  * unattributed ~110-125 s lump at 10×. This probe isolates it: each of
  * the 18 staged families from [[graft.ops.Similarity.q135StagingManifest]]'s
  * fixed inventory is forced individually, in the same dependency order
  * the manifest uses, with the wall time of its eager parquet write
  * recorded — so the output is a per-family build cost at each scale
  * and the fitted growth of the total.
  *
  * Discipline = the Q25Part/Q178Shape one: ONE JVM for all scales
  * (identical codegen/GC state), warmup action first, reps interleaved
  * across scale dirs so page-cache and heap drift spread evenly, full
  * registry eviction ([[graft.ops.Similarity.evictStagedSession]])
  * before every rep so every timing is a cold registry build (input
  * parquet stays page-cached after rep 1 at every scale — the probe
  * measures compute shape, not disk).
  *
  * Usage: runMain graft.tools.CascadeProbe <reps> <dir1> [<dir2> ...]
  * Prints one line per (dir, family) with min/all reps, and a total
  * line per dir.
  */
object CascadeProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    val dirs = args.tail.toSeq
    require(dirs.nonEmpty, "usage: CascadeProbe <reps> <dir1> [<dir2> ...]")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS: §2.3's post-fix footnote (a) — the
    // 10×-at-32 set_pairs point carries one skewed straggler partition
    // that 128-way hashing removes; the recorded curve should be the
    // clean one, so the probe takes the partition count from the env.
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    // The fixed manifest inventory in its dependency order
    // (Similarity.q135StagingManifest): later builds may read earlier
    // staged relations, so a family's time is its MARGINAL cost with
    // predecessors staged; the per-dir sum is the full cascade.
    def families(dir: String): Seq[(String, () => Unit)] = {
      import graft.ops._
      Seq(
        "unigram_groups" -> (() => Similarity.stagedUnigramGroups(spark, dir)),
        "set_pairs_45" -> (() => Similarity.stagedSetPairs45(spark, dir)),
        "shingle_groups" -> (() => Similarity.stagedShingleGroups(spark, dir)),
        "shingle_ranked" -> (() => Similarity.stagedShingleRanked(spark, dir)),
        "component_labels" -> (() => Similarity.componentLabels(spark, dir)),
        "ivf_model" -> (() => Similarity.stagedIvfModel(spark, dir)),
        "bpe_merges" -> (() => TrainingData.stagedBpeMerges(spark, dir)),
        "prep_deduped" -> (() => CorpusPrep.stagedPrepDeduped(spark, dir)),
        "prep_groups" -> (() => CorpusPrep.stagedPrepGroups(spark, dir)),
        "prep_pairs_45" -> (() => CorpusPrep.stagedPrepPairs45(spark, dir)),
        "clean_pack" -> (() => TrainingData.stagedCleanPack(spark, dir)),
        "dsir_weights" -> (() => TrainingData.stagedDsirWeights(spark, dir)),
        "sketch_labels" -> (() => Sketches.stagedSketchLabels(spark, dir)),
        "pagerank_scores" -> (() => Similarity.stagedPagerankScores(spark, dir)),
        "coreness" -> (() => Similarity.stagedCoreness(spark, dir)),
        "tf_postings" -> (() => TextOps.stagedTfPostings(spark, dir)),
        "doc_lengths" -> (() => TextOps.stagedDocLengths(spark, dir)),
        "pos_postings" -> (() => TextOps.stagedPositionalPostings(spark, dir)),
      ).map { case (k, f) => k -> (() => { f(); () }) }
    }

    // times(dir)(family) = seconds per rep
    val acc = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; dir <- dirs) {
      graft.ops.Similarity.evictStagedSession(spark)
      System.gc()
      var total = 0.0
      families(dir).foreach { case (k, f) =>
        val t0 = System.nanoTime()
        f()
        val s = (System.nanoTime() - t0) / 1e9
        acc((dir, k)) = acc((dir, k)) :+ s
        total += s
      }
      acc((dir, "TOTAL")) = acc((dir, "TOTAL")) :+ total
      println(f"[cascade] rep $r dir $dir total $total%.1f s")
    }
    dirs.foreach { dir =>
      println(s"== $dir ==")
      (families(dir).map(_._1) :+ "TOTAL").foreach { k =>
        val ts = acc((dir, k))
        println(f"[cascade] ${k}%-18s min ${ts.min}%7.2f s  reps ${ts.map(t => f"$t%.2f").mkString(", ")}")
      }
    }
    spark.stop()
  }
}
