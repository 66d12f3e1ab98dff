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

  /** Round 11's adversarial corpus (30 tokens from one shared pool +
    * 30 unique per doc) defeated the HASH-ordered prefix join: the
    * pool's lowest hashes sat in every prefix and all 4,950 pairs were
    * candidates. Round 12's canonical (df ASC, token ASC) ordering
    * DEFEATS that corpus — pool tokens are the most frequent, sort
    * last, and never enter a prefix (measured: 0 candidates). The
    * test below keeps that as a pin.
    */
  private def sharedPoolCorpus(nDocs: Int): String = {
    val dir = tmpDir()
    val docs = (0 until nDocs).map { i =>
      val common = (0 until 30).map(k => s"common$k")
      val unique = (0 until 30).map(k => s"doc${i}u$k")
      (i.toLong, (common ++ unique).mkString(" "), "en", "s", 1L)
    }
    writeDocuments(dir, docs: _*)
    dir
  }

  /** The CANONICAL order's residual worst case: a quadratic prefix
    * blow-up needs a high-df token inside prefixes, which rarest-first
    * ordering forbids — unless EVERY token has the same df, leaving
    * the order no pruning signal. 60 tokens per doc drawn
    * seeded-uniform from a 150-token universe (just above the ≤64
    * bitmask fast path): df ≈ 40 everywhere, every doc's 13-token
    * prefix concentrates on the same lowest-ranked tokens, and most
    * pairs collide — while pairwise Jaccard stays ≈ 0.25, far under
    * 0.8, so banding collides rarely. Candidates are what each
    * strategy PAYS to verify; both still answer (empty) correctly.
    */
  private def uniformDfCorpus(nDocs: Int): String = {
    val dir = tmpDir()
    val docs = (0 until nDocs).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L + 1)
      val toks = rnd.shuffle((0 until 150).toVector).take(60).sorted
        .map(t => s"tok$t")
      (i.toLong, toks.mkString(" "), "en", "s", 1L)
    }
    writeDocuments(dir, docs: _*)
    dir
  }

  test("banding candidates ≪ prefix candidates where prefix filtering degrades") {
    GraftFunctions.register(spark)
    // pin the round-12 win first: the shared-frequent-pool corpus that
    // degenerated the hash-ordered prefix join to ALL 4,950 pairs now
    // yields ZERO candidates under canonical ordering (pool tokens
    // sort last and stay out of every prefix)
    val poolGroups = Similarity.tokenSetGroups(spark, sharedPoolCorpus(100))
    assert(Similarity.prefixJoinCandidates(poolGroups, 4, 5).count() == 0L,
      "canonical df-ordering must keep shared frequent tokens out of prefixes")
    // the residual worst case: uniform df leaves the canonical order no
    // signal and the prefix join degrades toward all pairs again
    val dir = uniformDfCorpus(100)
    val groups = Similarity.tokenSetGroups(spark, dir)
    val prefixCands = Similarity.prefixJoinCandidates(groups, 4, 5).count()
    val lshCands = Sketches.minhashBandCandidates(groups).count()
    assert(prefixCands > 100L * 99 / 2 / 2,
      s"uniform-df corpus should defeat the prefix filter, got $prefixCands candidates")
    // banding prunes by ACTUAL similarity, which is low; assert strictly
    // under half of the prefix join's set to leave slack for hash-
    // function changes while keeping the advantage real
    assert(lshCands < prefixCands / 2,
      s"LSH candidate set ($lshCands) should be well under the prefix join's ($prefixCands)")
    // and both still give the right (empty) answer — candidates are not
    // results; verification removes every sub-threshold pair
    assert(Similarity.q21JaccardNeardup(spark, dir).count() == 0)
    assert(Sketches.q25MinhashNeardup(spark, dir).count() == 0)
  }

  test("candidate-strategy routing: Zipf-like df routes to the prefix join, flat df to banding") {
    GraftFunctions.register(spark)
    // the df statistic (Similarity.zipfLikeDf) is PPJoin's pruning
    // precondition read off the corpus: prefixes prune iff a rare-token
    // mass exists to fill them. The shared-pool corpus is hapax-
    // dominated (30 pool tokens at df=100, 3000 unique at df=1) ->
    // prefix join; the uniform-df corpus has no rare mass (df ~ 40
    // everywhere) -> banded path.
    val poolGroups = Similarity.tokenSetGroups(spark, sharedPoolCorpus(100))
    assert(Similarity.zipfLikeDf(poolGroups),
      "hapax-dominated corpus must route to the prefix join")
    val uniGroups = Similarity.tokenSetGroups(spark, uniformDfCorpus(100))
    assert(!Similarity.zipfLikeDf(uniGroups),
      "flat-df corpus must route to the banded path")
    // the synthetic testdata's unigram vocabulary is tiny and dense
    // (df high everywhere): flat by the statistic -> banded, so q146's
    // committed behavior on the test corpora is unchanged
    assert(!Similarity.zipfLikeDf(
      Similarity.stagedUnigramGroups(spark, "/root/testdata/sf0.001")))
  }
}
