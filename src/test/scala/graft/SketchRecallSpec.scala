package graft

import graft.functions.GraftFunctions
import graft.ops.{Similarity, Sketches}

/** Hard recall guards for the two oracle-free near-dup sketches
  * (VERDICT r1 #3): q25's only driver-side signal is a rows-only count,
  * so this spec pins its recall against the exact q21 on a known-cluster
  * corpus, and pins q26 against a brute-force hamming ground truth
  * (4-chunk pigeonhole is EXACT for hamming ≤ 3: three flipped bits
  * cannot touch all four 16-bit chunks, so every true pair shares a
  * chunk — output must EQUAL the brute-force set, not approximate it).
  * Everything is hash-deterministic: fixed corpus, fixed seeds.
  */
class SketchRecallSpec extends SparkSpecBase {

  /** 12 clusters × 5 near-identical docs (30 base tokens; each variant
    * swaps one token for a fresh one → pairwise J ∈ {28/32, 29/31} ≥
    * 0.8) + 40 unrelated noise docs. True near-dup pairs: exactly the
    * 10 within-cluster pairs per cluster = 120.
    */
  private def clusteredCorpus(): String = {
    val dir = tmpDir()
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var id = 0L
    for (c <- 0 until 12) {
      val base = (0 until 30).map(k => s"c${c}t$k")
      for (m <- 0 until 5) {
        val text = (if (m == 0) base else base.updated(m * 3, s"c${c}var$m")).mkString(" ")
        docs += ((id, text, "en", "s", text.length.toLong)); id += 1
      }
    }
    for (n <- 0 until 40) {
      val text = (0 until 25).map(k => s"noise${n}w$k").mkString(" ")
      docs += ((id, text, "en", "s", text.length.toLong)); id += 1
    }
    writeDocuments(dir, docs.toSeq: _*)
    dir
  }

  test("q21 exact: finds exactly the 120 within-cluster pairs") {
    val dir = clusteredCorpus()
    val out = Similarity.q21JaccardNeardup(spark, dir).collect()
    assert(out.length == 120, s"expected 120 exact pairs, got ${out.length}")
    // all pairs are within one 5-doc cluster: ids differ by < 5 and share a cluster block
    assert(out.forall(r => r.getLong(0) / 5 == r.getLong(1) / 5))
  }

  test("q25 minhash-lsh: output ⊆ q21 and recall ≥ 0.95 on the clustered corpus") {
    val dir = clusteredCorpus()
    val exact = Similarity.q21JaccardNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Sketches.q25MinhashNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("q56 survivors: exactly the cluster minima plus all noise docs") {
    val dir = clusteredCorpus()
    val survivors = Similarity.q56NeardupSurvivors(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val expected = (0 until 12).map(c => c * 5L).toSet ++ (60L until 100L).toSet
    assert(survivors == expected,
      s"missing: ${expected -- survivors}; extra: ${survivors -- expected}")
  }

  test("q62 clusters: every 5-doc near-dup cluster is ONE component labeled by its min") {
    val dir = clusteredCorpus()
    val out = Similarity.q62DedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ((0 until 60).map(d => d.toLong -> (d / 5 * 5).toLong) ++
      (60 until 100).map(d => d.toLong -> d.toLong)).toMap
    assert(out == expected,
      s"diff: ${out.toSet -- expected.toSet} / ${expected.toSet -- out.toSet}")
  }

  test("q62: clusters are transitive closures — chains merge where the pair list stops") {
    // A≈B (9/11) and B≈C (9/11) but A vs C is only 8/12 < 0.8: the pair
    // operator (q21) must NOT report (A,C); the cluster operator must
    // still place all three in one component — the non-transitivity gap
    // that makes both operators necessary
    val dir = tmpDir()
    val base = (1 to 10).map(k => s"t$k")
    writeDocuments(dir,
      (1L, base.mkString(" "), "en", "s", 1L),
      (2L, (base.take(9) :+ "u").mkString(" "), "en", "s", 1L),
      (3L, (base.take(8) ++ Seq("u", "v")).mkString(" "), "en", "s", 1L),
      (4L, (1 to 10).map(k => s"z$k").mkString(" "), "en", "s", 1L))
    val pairs = Similarity.q21JaccardNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"pair list: $pairs")
    val clusters = Similarity.q62DedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L), s"clusters: $clusters")
  }

  test("q26 simhash: output EQUALS brute-force hamming ≤ 3 ground truth") {
    val dir = clusteredCorpus()
    GraftFunctions.register(spark)
    val sigs = Tables.documents(spark, dir).selectExpr("doc_id",
      "simhash64(sort_array(array_distinct(transform(split(text, ' '), t -> xxhash64(t))))) AS sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = sigs.keys.toSeq.sorted
    val truth = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b) -> h.toLong).toMap
    val out = Sketches.q26SimhashNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == truth,
      s"missing: ${truth.keySet -- out.keySet}; extra: ${out.keySet -- truth.keySet}")
  }
}
