package graft.ops

import graft.{SparkSpecBase, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Incremental maintenance for the staged families (round-12 VERDICT
  * Next #4; round-13 Next #1/#6): the batch delta-merge entry points
  * must be row-identical to a cold rebuild over the full corpus —
  * q210's merge ≡ recompute contract, proven here for the bare-union
  * class (tf_postings, doc_lengths, pos_postings), the exact-dup
  * collapse ([[Similarity.collapseMerge]]), and the cascade's
  * expensive families: the qualifying set pairs
  * ([[Similarity.pairsMerge]] — re-keyed base pairs + ONE asymmetric
  * delta-vs-(base ∪ delta) prefix join, never base×base again) and
  * the component labels ([[Similarity.labelsMerge]] — hash-min over
  * the contracted super-node graph, sized by the delta), on BOTH pair
  * cascades (unigram at 4/5, shingle at 3/5 — the merge machinery is
  * generic over the token-set column and threshold). The declared
  * q242–q246 keys carry the same contract to the driver's DuckDB
  * oracle; these tests pin it engine-side, including the cases the
  * even/odd corpus split cannot reach: a delta doc relabeling a base
  * group's gid (with and without edges), a delta group BRIDGING two
  * base components, and empty deltas.
  */
class DeltaMergeSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("tfPostingsMerge ≡ cold recompute on the real corpus (even/odd split)") {
    val docs = Tables.documents(spark, sf)
    val base = TextOps.tfPostingsOf(docs.filter(pmod(col("doc_id"), lit(2L)) === 0))
    val merged = TextOps.tfPostingsMerge(base, docs.filter(pmod(col("doc_id"), lit(2L)) === 1))
    val cold = TextOps.tfPostingsOf(docs)
    assert(rows(merged).nonEmpty)
    assert(rows(merged) == rows(cold))
  }

  test("tfPostingsMerge with an empty delta is the base relation") {
    val docs = Tables.documents(spark, sf)
    val base = TextOps.tfPostingsOf(docs)
    val merged = TextOps.tfPostingsMerge(base, docs.filter(lit(false)))
    assert(rows(merged) == rows(base))
  }

  test("docLengthsMerge / posPostingsMerge ≡ cold recompute (even/odd split)") {
    val docs = Tables.documents(spark, sf)
    val even = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
    val odd = docs.filter(pmod(col("doc_id"), lit(2L)) === 1)
    val dl = TextOps.docLengthsMerge(
      TextOps.docLengthsOfPostings(TextOps.tfPostingsOf(even)), odd)
    assert(rows(dl).nonEmpty)
    assert(rows(dl) == rows(TextOps.docLengthsOfPostings(TextOps.tfPostingsOf(docs))))
    val pp = TextOps.posPostingsMerge(TextOps.posPostingsOf(even), odd)
    assert(rows(pp).nonEmpty)
    assert(rows(pp) == rows(TextOps.posPostingsOf(docs)))
  }

  test("collapseMerge ≡ cold recompute on the real corpus (even/odd split)") {
    GraftFunctions.register(spark)
    val toks = Similarity.docTokenSets(spark, sf)
    val base = Similarity.tokenSetGroupsBy(toks.filter(pmod(col("doc_id"), lit(2L)) === 0))
    val merged = Similarity.collapseMerge(base, toks.filter(pmod(col("doc_id"), lit(2L)) === 1))
      .select("toks", "gid", "members", "sz")
    val cold = Similarity.collapsedCorpus(spark, sf).select("toks", "gid", "members", "sz")
    assert(rows(merged).nonEmpty)
    assert(rows(merged) == rows(cold))
  }

  test("collapseMerge relabels a group when the delta brings a smaller doc_id") {
    import spark.implicits._
    // base: docs 10 and 11 share a token set -> group gid 10; delta doc
    // 1 has the SAME set -> merged gid must re-derive to 1 (gid = min
    // member is the collapse's defining invariant), members sorted
    val baseToks = Seq((10L, Seq(7L, 9L)), (11L, Seq(7L, 9L)), (12L, Seq(3L)))
      .toDF("doc_id", "toks")
    val deltaToks = Seq((1L, Seq(7L, 9L)), (2L, Seq(5L))).toDF("doc_id", "toks")
    val merged = Similarity.collapseMerge(Similarity.tokenSetGroupsBy(baseToks), deltaToks)
      .orderBy("gid")
      .collect().map(r => (r.getLong(1), r.getSeq[Long](2).toList)).toList
    assert(merged == List(
      (1L, List(1L, 10L, 11L)), (2L, List(2L)), (12L, List(12L))))
  }

  test("pairsMerge ≡ cold setPairsAbove on the real corpus (even/odd split)") {
    GraftFunctions.register(spark)
    val bytes = Similarity.documentsSizeBytes(spark, sf)
    val toks = Similarity.docTokenSets(spark, sf)
    val base = Similarity.tokenSetGroupsBy(toks.filter(pmod(col("doc_id"), lit(2L)) === 0))
    val basePairs = Similarity.setPairsAbove(base, 4, 5, bytes)
    val merged = Similarity.pairsMerge(base, basePairs,
      toks.filter(pmod(col("doc_id"), lit(2L)) === 1), 4, 5, bytes)
    val cold = Similarity.setPairsAbove(
      Similarity.tokenSetGroupsBy(toks), 4, 5, bytes)
    assert(rows(merged).nonEmpty)
    assert(rows(merged) == rows(cold))
  }

  test("labelsMerge ≡ cold hash-min labels on the real corpus (even/odd split)") {
    GraftFunctions.register(spark)
    val bytes = Similarity.documentsSizeBytes(spark, sf)
    val toks = Similarity.docTokenSets(spark, sf)
    val base = Similarity.tokenSetGroupsBy(toks.filter(pmod(col("doc_id"), lit(2L)) === 0))
    val basePairs = Similarity.setPairsAbove(base, 4, 5, bytes)
    val (bl, _) = Similarity.hashMinLabels(base.select(col("gid")),
      basePairs.select(col("ga"), col("gb")))
    val merged = Similarity.labelsMerge(base, Similarity.expandClusterLabels(base, bl),
      toks.filter(pmod(col("doc_id"), lit(2L)) === 1), 4, 5, bytes)
    val coldGroups = Similarity.tokenSetGroupsBy(toks)
    val (cl, _) = Similarity.hashMinLabels(coldGroups.select(col("gid")),
      Similarity.setPairsAbove(coldGroups, 4, 5, bytes).select(col("ga"), col("gb")))
    val cold = Similarity.expandClusterLabels(coldGroups, cl)
    assert(rows(merged).nonEmpty)
    assert(rows(merged) == rows(cold))
  }

  // the delta class the even/odd corpus split cannot force: a single
  // delta group whose new edges BRIDGE two previously separate base
  // components. Token design: J(A,B) = J(C,D) = J(E,B) = J(E,C) =
  // 9/11 ≥ 0.8 (pairs), J(B,C) = 8/12 < 0.8 (base components stay
  // apart), so the delta E must pull {10,11} and {20,21} into ONE
  // component labeled 10.
  private def bridgeBase = Seq(
    10L -> (1L to 10L).toSeq, 11L -> (2L to 11L).toSeq,
    20L -> (4L to 13L).toSeq, 21L -> (5L to 14L).toSeq)
  private def bridgeDelta = Seq(30L -> (3L to 12L).toSeq)

  private def toksDf(docs: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    docs.toDF("doc_id", "toks")
  }

  test("pairsMerge ≡ cold when the delta bridges two base clusters") {
    GraftFunctions.register(spark)
    val base = Similarity.tokenSetGroupsBy(toksDf(bridgeBase))
    val basePairs = Similarity.setPairsAbove(base, 4, 5, BigInt(1))
    val merged = Similarity.pairsMerge(base, basePairs,
      toksDf(bridgeDelta), 4, 5, BigInt(1))
    val cold = Similarity.setPairsAbove(
      Similarity.tokenSetGroupsBy(toksDf(bridgeBase ++ bridgeDelta)), 4, 5, BigInt(1))
    // the cold side routes through the ≤64-universe masked path, the
    // merge's new pairs through the general asymmetric prefix join —
    // identical output is exactly the strategy-independence contract
    assert(rows(cold).size == 4)
    assert(rows(merged) == rows(cold))
  }

  test("labelsMerge relabels both bridged base components to one label") {
    GraftFunctions.register(spark)
    val base = Similarity.tokenSetGroupsBy(toksDf(bridgeBase))
    val basePairs = Similarity.setPairsAbove(base, 4, 5, BigInt(1))
    val (bl, _) = Similarity.hashMinLabels(base.select(col("gid")),
      basePairs.select(col("ga"), col("gb")))
    val baseLabels = Similarity.expandClusterLabels(base, bl)
    // precondition: two separate base components
    assert(baseLabels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList ==
      List((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L)))
    val merged = Similarity.labelsMerge(base, baseLabels,
      toksDf(bridgeDelta), 4, 5, BigInt(1))
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList ==
      List((10L, 10L), (11L, 10L), (20L, 10L), (21L, 10L), (30L, 10L)))
  }

  test("labelsMerge lowers a component's label when a delta doc relabels its group (zero new edges)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // base: docs 10, 11 exact dups -> one group, gid 10, label 10; the
    // delta doc 2 is another exact dup -> gid re-derives to 2, and the
    // component label must follow even though no new PAIR appears
    val base = Similarity.tokenSetGroupsBy(toksDf(Seq(10L -> (1L to 10L).toSeq, 11L -> (1L to 10L).toSeq)))
    val baseLabels = Seq((10L, 10L), (11L, 10L)).toDF("doc_id", "cluster_id")
    val merged = Similarity.labelsMerge(base, baseLabels,
      toksDf(Seq(2L -> (1L to 10L).toSeq)), 4, 5, BigInt(1))
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList ==
      List((2L, 2L), (10L, 2L), (11L, 2L)))
  }

  test("cascadeMerge (shared tagged merge + delta join) ≡ the per-family merges") {
    GraftFunctions.register(spark)
    val base = Similarity.tokenSetGroupsBy(toksDf(bridgeBase))
    val basePairs = Similarity.setPairsAbove(base, 4, 5, BigInt(1))
    val (bl, _) = Similarity.hashMinLabels(base.select(col("gid")),
      basePairs.select(col("ga"), col("gb")))
    val baseLabels = Similarity.expandClusterLabels(base, bl)
    val (groups, pairs, labels) = Similarity.cascadeMerge(
      base, basePairs, baseLabels, toksDf(bridgeDelta), 4, 5, BigInt(1))
    assert(rows(groups) == rows(Similarity.collapseMerge(base, toksDf(bridgeDelta))
      .select("gid", "toks", "sz", "members")))
    assert(rows(pairs) ==
      rows(Similarity.pairsMerge(base, basePairs, toksDf(bridgeDelta), 4, 5, BigInt(1))))
    assert(rows(labels) ==
      rows(Similarity.labelsMerge(base, baseLabels, toksDf(bridgeDelta), 4, 5, BigInt(1))))
  }

  test("pairsMerge/labelsMerge with an empty delta are the base relations") {
    GraftFunctions.register(spark)
    val base = Similarity.tokenSetGroupsBy(toksDf(bridgeBase))
    val basePairs = Similarity.setPairsAbove(base, 4, 5, BigInt(1))
    val emptyToks = toksDf(bridgeBase).filter(lit(false))
    assert(rows(Similarity.pairsMerge(base, basePairs, emptyToks, 4, 5, BigInt(1)))
      == rows(basePairs))
    val (bl, _) = Similarity.hashMinLabels(base.select(col("gid")),
      basePairs.select(col("ga"), col("gb")))
    val baseLabels = Similarity.expandClusterLabels(base, bl)
    assert(rows(Similarity.labelsMerge(base, baseLabels, emptyToks, 4, 5, BigInt(1)))
      == rows(baseLabels))
  }

  test("q242/q243 declared keys equal their cold recomputes") {
    GraftFunctions.register(spark)
    val q242 = rows(TextOps.q242TfPostingsDeltaMerge(spark, sf))
    assert(q242.nonEmpty && q242 == rows(
      TextOps.tfPostingsOf(Tables.documents(spark, sf))))
    val gold = Similarity.collapsedCorpus(spark, sf)
      .select(explode(col("members")).as("doc_id"), col("gid").as("group_id"))
    val q243 = rows(Similarity.q243CollapseDeltaMerge(spark, sf))
    assert(q243.nonEmpty && q243 == rows(gold))
  }

  test("q244/q245 declared keys equal their cold q21/q62 readouts") {
    GraftFunctions.register(spark)
    val q244 = rows(Similarity.q244SetPairsDeltaMerge(spark, sf))
    assert(q244.nonEmpty && q244 == rows(Similarity.q21JaccardNeardup(spark, sf)))
    val q245 = rows(Similarity.q245LabelsDeltaMerge(spark, sf))
    assert(q245.nonEmpty && q245 == rows(Similarity.q62DedupClusters(spark, sf)))
  }

  test("pairsMerge ≡ cold on the SHINGLE cascade (word 3-grams, threshold 3/5)") {
    // the family-generality claim: the same merge entry point, nothing
    // changed but the token space and (p, q)
    GraftFunctions.register(spark)
    val bytes = Similarity.documentsSizeBytes(spark, sf)
    val toks = Similarity.shingleDocSets(spark, sf)
    val base = Similarity.tokenSetGroupsBy(toks.filter(pmod(col("doc_id"), lit(2L)) === 0))
    val basePairs = Similarity.setPairsAbove(base, 3, 5, bytes)
    val merged = Similarity.pairsMerge(base, basePairs,
      toks.filter(pmod(col("doc_id"), lit(2L)) === 1), 3, 5, bytes)
    val cold = Similarity.setPairsAbove(
      Similarity.tokenSetGroupsBy(toks), 3, 5, bytes)
    assert(rows(merged).nonEmpty)
    assert(rows(merged) == rows(cold))
  }

  test("q246 declared key equals the cold q55 readout") {
    GraftFunctions.register(spark)
    val q246 = rows(Similarity.q246ShinglePairsDeltaMerge(spark, sf))
    assert(q246.nonEmpty && q246 == rows(Similarity.q55ShingleNeardup(spark, sf)))
  }

  test("sketchLabelsMerge ≡ cold sketch labels on the real corpus (BANDING route, even/odd split)") {
    GraftFunctions.register(spark)
    val bytes = Similarity.documentsSizeBytes(spark, sf)
    val toks = Similarity.docTokenSets(spark, sf)
    val base = Similarity.tokenSetGroupsBy(toks.filter(pmod(col("doc_id"), lit(2L)) === 0))
    // the testdata's unigram vocabulary is dense → flat by the routing
    // statistic on both the base and the merged corpus (LshAdvantageSpec
    // pins the full-corpus route): this case exercises the asymmetric
    // BANDING join
    assert(!Similarity.zipfLikeDf(base), "fixture must exercise the banding route")
    val baseLabels = Sketches.sketchLabelsOf(base, bytes)
    val merged = Sketches.sketchLabelsMerge(base, baseLabels,
      toks.filter(pmod(col("doc_id"), lit(2L)) === 1), bytes)
    val cold = Sketches.sketchLabelsOf(Similarity.tokenSetGroupsBy(toks), bytes)
    assert(rows(merged).nonEmpty)
    assert(rows(merged) == rows(cold))
  }

  // hapax-dominated fixture for the PREFIX route: exact-dup group
  // {10, 11} (toks 1-10) near-dups doc 20 (J = 9/11 ≥ 0.8); ten filler
  // docs of unique tokens push the rare-df fraction over half; the
  // delta doc 40 chains a new edge onto doc 20 (J(20,40) = 9/11) while
  // staying under threshold vs the group (J = 8/12) — the component
  // extends through the delta, labels continue from the base state.
  private def zipfSketchBase: Seq[(Long, Seq[Long])] = Seq(
    10L -> (1L to 10L).toSeq, 11L -> (1L to 10L).toSeq,
    20L -> ((1L to 9L) :+ 11L).toSeq) ++
    (0 until 10).map(i => (30L + i) -> (1000L + 100L * i to 1004L + 100L * i).toSeq)
  private def zipfSketchDelta: Seq[(Long, Seq[Long])] =
    Seq(40L -> ((1L to 8L) ++ Seq(11L, 12L)).toSeq)

  test("sketchLabelsMerge ≡ cold on a Zipf-like corpus (PREFIX route; delta extends a base component)") {
    GraftFunctions.register(spark)
    val base = Similarity.tokenSetGroupsBy(toksDf(zipfSketchBase))
    assert(Similarity.zipfLikeDf(base), "fixture must exercise the prefix route")
    val baseLabels = Sketches.sketchLabelsOf(base, BigInt(1))
    val merged = Sketches.sketchLabelsMerge(base, baseLabels,
      toksDf(zipfSketchDelta), BigInt(1))
    val cold = Sketches.sketchLabelsOf(
      Similarity.tokenSetGroupsBy(toksDf(zipfSketchBase ++ zipfSketchDelta)), BigInt(1))
    assert(rows(merged) == rows(cold))
    // the delta doc joined the {10, 11, 20} component through doc 20
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
      .filter(_._1 <= 40L).filterNot(t => t._1 >= 30L && t._1 < 40L) ==
      List((10L, 10L), (11L, 10L), (20L, 10L), (40L, 10L)))
  }
}
