package graft.ops

import graft.SparkSpecBase
import graft.functions.GraftFunctions

/** MEASURES the LSH banding join's candidate advantage over the exact
  * prefix join (VERDICT r2 #2: the engine's "banding beats prefix
  * filtering as corpora grow" claim was asserted, not measured).
  *
  * The adversarial corpus is the prefix filter's worst case: every doc
  * draws 30 tokens from one shared pool plus 30 unique tokens, so every
  * doc's SORTED token array starts with shared pool tokens (the pool's
  * lowest hashes sit in every prefix) and the prefix equi-join emits
  * essentially ALL pairs — while pairwise Jaccard is only 30/90 ≈ 0.33,
  * far under the 0.8 threshold, so banding collides rarely
  * (P ≈ 1-(1-0.33⁴)⁸ ≈ 0.09 per pair). Both operators still return the
  * correct (empty) answer; the difference is how many candidates they
  * pay to verify — the number that decides feasibility at 100 TB.
  *
  * The flip side — corpora where both filters prune well and the shared
  * verify dominates — is SketchRecallSpec's clustered corpus, where q25
  * additionally pins recall ≥ 0.95. Together: banding's candidate set is
  * never the quadratic blow-up, and its recall cost is bounded.
  */
class LshAdvantageSpec extends SparkSpecBase {

  private def adversarialCorpus(nDocs: Int): String = {
    val dir = tmpDir()
    val docs = (0 until nDocs).map { i =>
      val common = (0 until 30).map(k => s"common$k")
      val unique = (0 until 30).map(k => s"doc${i}u$k")
      (i.toLong, (common ++ unique).mkString(" "), "en", "s", 1L)
    }
    writeDocuments(dir, docs: _*)
    dir
  }

  test("banding candidates ≪ prefix candidates where prefix filtering degrades") {
    val dir = adversarialCorpus(100)
    GraftFunctions.register(spark)
    val groups = Similarity.tokenSetGroups(spark, dir)
    val prefixCands = Similarity.prefixJoinCandidates(groups, 4, 5).count()
    val lshCands = Sketches.minhashBandCandidates(groups).count()
    // the prefix filter fully degenerates: every one of the C(100,2)
    // pairs shares a prefix token, so the exact path must verify all of
    // them (measured: 4950 = all pairs)
    assert(prefixCands == 100L * 99 / 2,
      s"corpus should defeat the prefix filter, got $prefixCands candidates")
    // banding prunes by ACTUAL similarity, which is low — measured 1154
    // (≈ 23% of pairs); assert strictly under half to leave slack for
    // hash-function changes while keeping the advantage real
    assert(lshCands < prefixCands / 2,
      s"LSH candidate set ($lshCands) should be well under the prefix join's ($prefixCands)")
    // and both still give the right (empty) answer — candidates are not
    // results; verification removes every sub-threshold pair
    assert(Similarity.q21JaccardNeardup(spark, dir).count() == 0)
    assert(Sketches.q25MinhashNeardup(spark, dir).count() == 0)
  }
}
