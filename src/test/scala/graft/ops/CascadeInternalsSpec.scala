package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Internals of the near-dup cascade, exercised on BOTH broadcast
  * gates: every test corpus is far under the 128 MB broadcast
  * threshold, so without this spec the shuffle-join verify path — the
  * one a 100 TB corpus takes — would ship untested. Forcing docBytes
  * above the gate must change the PLAN (no broadcast of the group
  * dimension) but not one row of output.
  */
class CascadeInternalsSpec extends SparkSpecBase {

  private def fixture(): String = {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "a b c d e", "en", "s", 1L),
      (2L, "a b c d e", "en", "s", 1L), // exact dup of 1
      (3L, "a b c d e f", "en", "s", 1L), // j = 5/6 vs {a..e}
      (4L, "a b c d f", "en", "s", 1L), // j(3,4) = 5/6
      (5L, "x y z w v", "en", "s", 1L))
    dir
  }

  test("verify+expand: shuffle-join path (docBytes over gate) matches broadcast path") {
    val dir = fixture()
    graft.functions.GraftFunctions.register(spark)
    val groups = Similarity.tokenSetGroups(spark, dir)
    val cands = Similarity.prefixJoinCandidates(groups, 4, 5)
    def run(docBytes: BigInt): Seq[String] = {
      val setPairs = Similarity.verifySetJaccardWithMembers(cands, groups, 0.8, docBytes)
      Similarity.expandWithMembers(setPairs, groups, "jaccard", lit(1.0))
        .orderBy("doc_a", "doc_b").collect().map(_.toString).toSeq
    }
    // disable auto-broadcast so only the gate's explicit hint can
    // broadcast — on a real 100 TB corpus the stats exceed the auto
    // threshold and this is exactly the planner state the gate sees
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaBroadcast = run(BigInt(1)) // under gate -> hinted broadcast
      val viaShuffle = run(BigInt(Long.MaxValue)) // over gate -> real shuffle join
      assert(viaBroadcast.nonEmpty)
      assert(viaBroadcast == viaShuffle)
      assert(viaBroadcast.exists(_.startsWith("[1,2,1.0]"))) // exact dup pair, J=1
      def verifyPlan(docBytes: BigInt): String =
        Similarity.verifySetJaccardWithMembers(cands, groups, 0.8, docBytes)
          .queryExecution.executedPlan.toString()
      assert(verifyPlan(BigInt(1)).contains("BroadcastHashJoin"),
        "under-gate verify must broadcast the group dimension via the hint")
      assert(!verifyPlan(BigInt(Long.MaxValue)).contains("BroadcastHashJoin"),
        "over-gate verify must fall back to a shuffle join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("expandNearDupPairs (join-based, q26 path) agrees with expandWithMembers") {
    val dir = fixture()
    graft.functions.GraftFunctions.register(spark)
    val groups = Similarity.tokenSetGroups(spark, dir)
    val cands = Similarity.prefixJoinCandidates(groups, 4, 5)
    val withMembers = Similarity.verifySetJaccardWithMembers(cands, groups, 0.8, BigInt(1))
    val a = Similarity.expandWithMembers(withMembers, groups, "jaccard", lit(1.0))
      .orderBy("doc_a", "doc_b").collect().map(_.toString).toSeq
    val b = Similarity.expandNearDupPairs(withMembers.select("ga", "gb", "jaccard"),
        groups, BigInt(1), "jaccard", lit(1.0))
      .orderBy("doc_a", "doc_b").collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
