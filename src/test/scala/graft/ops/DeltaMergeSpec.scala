package graft.ops

import graft.{SparkSpecBase, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Incremental maintenance for the staged families (round-12 VERDICT
  * Next #4): the batch delta-merge entry points must be row-identical
  * to a cold rebuild over the full corpus — q210's merge ≡ recompute
  * contract, proven here for tf_postings ([[TextOps.tfPostingsMerge]])
  * and the exact-dup collapse ([[Similarity.collapseMerge]]). The
  * declared q242/q243 keys carry the same contract to the driver's
  * DuckDB oracle; these tests pin it engine-side, including the
  * degenerate cases the even/odd corpus split cannot reach (a delta
  * doc relabeling a base group's gid; an empty delta).
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
}
