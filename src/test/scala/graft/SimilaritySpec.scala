package graft

import graft.ops.{Similarity, TextOps}

/** Semantic specs for text/similarity extension operators, including the
  * SURVEY.md §5.2.3 property-style invariants (jaccard bounds/symmetry,
  * cosine(v,v)≈1, dedup idempotence) on hand-checkable fixtures.
  */
class SimilaritySpec extends SparkSpecBase {

  test("q21 jaccard: identical docs = 1.0, 5/6 overlap kept, 4/6 dropped") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e", "en", "s", 9L), // j(1,2)=1.0
      (3L, "a b c d f", "en", "s", 9L), // j(1,3)=4/6=0.667 < 0.8
      (4L, "a b c d e f", "en", "s", 11L)) // j(1,4)=5/6=0.833
    val out = Similarity.q21JaccardNeardup(spark, dir).collect()
    val pairs = out.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // (3,4): {a,b,c,d,f} vs {a,b,c,d,e,f} = 5/6 ≥ 0.8 — also a pair
    assert(pairs.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 4L)) == 0.8333)
    // bounds invariant
    assert(out.forall(r => r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
  }

  test("q21 jaccard: duplicate tokens in text don't affect the set semantics") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "a a a b b c d e", "en", "s", 1L),
      (2L, "e d c b a", "en", "s", 1L))
    val out = Similarity.q21JaccardNeardup(spark, dir).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("q22 cosine: identical vector ranks first with sim 1.0") {
    val dir = tmpDir()
    val v = Seq.fill(4)(0.5f)
    writeEmbeddings(dir,
      (0L, v, 0), (1L, Seq(1f, 0f, 0f, 0f), 0), (2L, Seq(0f, 1f, 0f, 0f), 0),
      (3L, Seq(-1f, -1f, -1f, -1f), 0), (4L, Seq(1f, 1f, 0f, 0f), 0),
      (5L, v, 1), (6L, Seq(0.5f, 0.5f, 0f, 0f), 1), (7L, Seq(-0.5f, -0.5f, -0.5f, -0.5f), 1))
    val out = Similarity.q22TopkCosine(spark, dir).collect()
    val q0 = out.filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
    assert(q0.head.getLong(2) == 5L && q0.head.getDouble(3) == 1.0)
    assert(q0.last.getDouble(3) >= -1.0 && q0.head.getDouble(3) <= 1.0)
    // query 3 is the negation of vec 7 -> sim exactly 1.0 with 7
    val q3 = out.filter(r => r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(q3.head.getLong(2) == 7L && q3.head.getDouble(3) == 1.0)
  }

  test("q24 array math: norm and mean") {
    val dir = tmpDir()
    writeEmbeddings(dir, (0L, Seq(3f, 4f), 0), (1L, Seq(0f, 0f), 0))
    val out = Similarity.q24MultimodalCols(spark, dir).collect()
    assert(out(0).getLong(1) == 2L && out(0).getDouble(2) == 5.0 && out(0).getDouble(3) == 3.5)
    assert(out(1).getDouble(2) == 0.0)
  }

  test("q55 shingle near-dup: phrase-sensitive — reordering kills bag-of-words pairs") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "the quick brown fox jumps over dogs", "en", "s", 1L),
      (2L, "the quick brown fox jumps over dogs", "en", "s", 1L), // identical phrase
      (3L, "dogs over jumps fox brown quick the", "en", "s", 1L), // same BAG, reversed
      (4L, "totally unrelated words here now ok", "en", "s", 1L))
    val sh = Similarity.q55ShingleNeardup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(sh.keySet == Set((1L, 2L)), s"got ${sh.keySet}")
    assert(sh((1L, 2L)) == 1.0)
    // the unigram q21 pairs 1-3 too (identical token SET) — q55's point
    val uni = Similarity.q21JaccardNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uni.contains((1L, 3L)))
  }

  test("q53 tf-idf: corpus-wide terms score 0, distinctive terms rank first") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "x x y", "en", "s", 1L),
      (2L, "x z", "en", "s", 1L))
    val out = TextOps.q53Tfidf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getDouble(3)))).toMap
    // x appears in both docs: ln(2/2) = 0 regardless of tf
    assert(out((1L, 1L)) == (("y", 0.6931)))  // 1 * ln(2/1) rounded at 4dp
    assert(out((1L, 2L)) == (("x", 0.0)))
    assert(out((2L, 1L)) == (("z", 0.6931)))
    assert(out((2L, 2L)) == (("x", 0.0)))
  }

  test("q20 exact dedup: min doc_id survives per text; idempotent") {
    val dir = tmpDir()
    writeDocuments(dir,
      (5L, "same text here", "en", "s1", 1L),
      (2L, "same text here", "de", "s2", 1L),
      (9L, "different", "en", "s3", 1L))
    val out = TextOps.q20DocDedupExact(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 9L))
    // idempotence: dedup of the surviving set changes nothing
    val dir2 = tmpDir()
    writeDocuments(dir2,
      (2L, "same text here", "de", "s2", 1L), (9L, "different", "en", "s3", 1L))
    assert(TextOps.q20DocDedupExact(spark, dir2).collect().map(_.getLong(0)).toSeq == Seq(2L, 9L))
  }

  test("q115 knn label: separable clusters classify leave-one-out at accuracy 1.0") {
    // 3 labels × 6 tight cluster members: every vector's 5-NN are its
    // own cluster's siblings, so the vote is unanimous (votes = 5).
    // Fixture goes through parquet so the broadcast gate sees real
    // footer statistics (an in-memory LogicalRDD has unknown
    // sizeInBytes = Long.MaxValue, which the gate conservatively — and
    // correctly — rejects; BoundedBroadcastSpec covers that path).
    val rows = for (c <- 0 until 3; m <- 0 until 6) yield {
      val v = Array.fill(64)(0.0f)
      v(c * 8) = 1.0f
      v(c * 8 + 1) = 0.01f * m
      ((c * 6 + m).toLong, v.toSeq, c)
    }
    val dir = tmpDir()
    writeEmbeddings(dir, rows: _*)
    val out = Similarity.knnLabelFrom(Tables.embeddings(spark, dir)).collect()
    assert(out.length == 18)
    out.foreach { r =>
      assert(r.getInt(2) == r.getInt(1), s"vec ${r.getLong(0)} mispredicted")
      assert(r.getLong(3) == 5L && r.getBoolean(4))
    }
  }

  test("q115 knn label: vote ties break to the smaller label") {
    // v0's five nearest carry labels (1,1,2,2,3): a 2-2 tie -> pred 1;
    // v6 sits orthogonal (cosine 0) so it never enters v0's top-5
    def vec(e1: Double): Seq[Float] = {
      val v = Array.fill(64)(0.0f); v(0) = 1.0f; v(1) = e1.toFloat; v.toSeq
    }
    val far = { val v = Array.fill(64)(0.0f); v(32) = 1.0f; v.toSeq }
    val rows = Seq(
      (0L, vec(0.0), 7),
      (1L, vec(0.01), 1), (2L, vec(0.02), 1),
      (3L, vec(0.03), 2), (4L, vec(0.04), 2),
      (5L, vec(0.05), 3),
      (6L, far, 9))
    val dir = tmpDir()
    writeEmbeddings(dir, rows: _*)
    val out = Similarity.knnLabelFrom(Tables.embeddings(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(0L) == ((1, 2L, false)), s"v0 got ${out(0L)}")
  }

  test("q212 provenance: cross-site mirror vs intra-site stamping; singletons excluded") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    writeDocuments(dir,
      // one text mirrored across two sites → cross_site
      (1L, "alpha beta gamma delta epsilon", "en", "sA", 1L),
      (2L, "alpha beta gamma delta epsilon", "en", "sB", 1L),
      // one source stamping its own boilerplate ×3 → NOT cross_site
      (3L, "zeta eta theta iota kappa", "en", "sC", 1L),
      (4L, "zeta eta theta iota kappa", "en", "sC", 1L),
      (5L, "zeta eta theta iota kappa", "en", "sC", 1L),
      // singleton: no provenance row
      (6L, "unique lonely text here now", "en", "sA", 1L))
    val out = graft.ops.Similarity.q212ClusterProvenance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1L, true),
      (3L, 3L, 1L, 3L, false)), out.toSeq)
  }

  test("q23 text stats: stopwords removed, rank by count desc then term") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "the cat cat dog", "en", "s", 1L),
      (2L, "dog cat the the", "en", "s", 1L))
    val out = TextOps.q23TextStats(spark, dir).collect()
    assert(out.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq((1L, "cat", 3L), (2L, "dog", 2L)))
  }

  test("q218 token budget: cluster reps carry the effective budget into THEIR source; tokenless docs drop") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    writeDocuments(dir,
      // intra-source pair in sA: rep (min id) holds the budget once
      (1L, "alpha beta gamma delta epsilon", "en", "sA", 1L),
      (2L, "alpha beta gamma delta epsilon", "en", "sA", 1L),
      // cross-source pair: rep 5 sits in sB, so sC leads NO cluster
      (5L, "zeta eta theta iota kappa", "en", "sB", 1L),
      (6L, "zeta eta theta iota kappa", "en", "sC", 1L),
      // singleton in sB
      (7L, "unique lonely text here now", "en", "sB", 1L),
      // tokenless: no budget contribution anywhere
      (8L, "", "en", "sA", 1L))
    val out = graft.ops.Similarity.q218DedupTokenBudget(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // sA: 2 docs × 5 tokens raw, one rep → 5 effective, ratio 0.5
    assert(out("sA") == ((2L, 10L, 1L, 5L, 0.5)), out)
    // sB: rep of the cross-source pair + the singleton → all effective
    assert(out("sB") == ((2L, 10L, 2L, 10L, 1.0)), out)
    // sC: its only doc is a non-rep copy — zero effective budget
    assert(out("sC") == ((1L, 5L, 0L, 0L, 0.0)), out)
    assert(out.size == 3)
  }

  test("q219 degree histogram: mirror pair at d=1, stamping clique at d=2, singleton absent") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "alpha beta gamma delta epsilon", "en", "sA", 1L),
      (2L, "alpha beta gamma delta epsilon", "en", "sB", 1L),
      (3L, "zeta eta theta iota kappa", "en", "sC", 1L),
      (4L, "zeta eta theta iota kappa", "en", "sC", 1L),
      (5L, "zeta eta theta iota kappa", "en", "sC", 1L),
      (6L, "unique lonely text here now", "en", "sA", 1L))
    val out = graft.ops.Similarity.q219DedupDegreeHist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // docs 1,2 have one partner each; docs 3,4,5 form a 3-clique
    // (degree 2 each — the WITHIN-group pairs must be counted); doc 6
    // has no partners and no row
    assert(out == Seq((1L, 2L), (2L, 3L)), out)
  }

  test("q225 edge jaccard: path edges are cn=0 bridges, triangle edges share one neighbor") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    val t = (1 to 10).map(i => s"t$i")
    val v = (1 to 10).map(i => s"v$i")
    writeDocuments(dir,
      // path 1–2–3: J(1,2)=J(2,3)=9/11 ≥ 4/5, J(1,3)=8/12 < 4/5
      (1L, t.mkString(" "), "en", "s", 1L),
      (2L, (t.take(9) :+ "u1").mkString(" "), "en", "s", 1L),
      (3L, (t.take(8) ++ Seq("u1", "u2")).mkString(" "), "en", "s", 1L),
      // triangle 4–5–6: every pair at 9/11
      (4L, v.mkString(" "), "en", "s", 1L),
      (5L, (v.take(9) :+ "w1").mkString(" "), "en", "s", 1L),
      (6L, (v.take(9) :+ "w2").mkString(" "), "en", "s", 1L))
    val out = graft.ops.Similarity.q225EdgeJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(out == Seq(
      (1L, 2L, 0L, 1L, 2L, 0.0),      // bridge: endpoints share nobody
      (2L, 3L, 0L, 2L, 1L, 0.0),
      (4L, 5L, 1L, 2L, 2L, 0.3333),   // the third vertex is the common neighbor
      (4L, 6L, 1L, 2L, 2L, 0.3333),
      (5L, 6L, 1L, 2L, 2L, 0.3333)), out)
  }

  test("q225 edge jaccard: empty corpus yields no edges") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    writeDocuments(dir)
    assert(graft.ops.Similarity.q225EdgeJaccard(spark, dir).count() == 0)
  }

  test("q227 c(d): path endpoints (d=1) get NULL lcc; the triangle's class averages in the open wedge") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    val t = (1 to 10).map(i => s"t$i")
    val v = (1 to 10).map(i => s"v$i")
    // q225's fixture: path 1–2–3 (edges 12, 23) + triangle 4–5–6
    writeDocuments(dir,
      (1L, t.mkString(" "), "en", "s", 1L),
      (2L, (t.take(9) :+ "u1").mkString(" "), "en", "s", 1L),
      (3L, (t.take(8) ++ Seq("u1", "u2")).mkString(" "), "en", "s", 1L),
      (4L, v.mkString(" "), "en", "s", 1L),
      (5L, (v.take(9) :+ "w1").mkString(" "), "en", "s", 1L),
      (6L, (v.take(9) :+ "w2").mkString(" "), "en", "s", 1L))
    val out = graft.ops.Similarity.q227ClusteringByDegree(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    // d=1: vertices 1 and 3, no wedge possible → NULL lcc
    // d=2: vertices 2 (open wedge, lcc 0) and 4/5/6 (closed, lcc 1)
    //      → Σtri2 = 6, c(2) = 6/(4·2·1) = 0.75, 3 triangle-ends/2... = 3
    assert(out == Seq((1L, 2L, 0L, None), (2L, 4L, 3L, Some(0.75))), out)
  }

  test("q234 outliers: the off-manifold vector tops z²; the dead dim is excluded; hand stats verify") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    // dim0 [0,2,0,2,1]: μ=1, σ²=0.8; dim1 [0,0,2,2,10]: μ=2.8,
    // σ²=13.76 (both exact at q216's 4-dp); dim2 constant → DEAD
    writeEmbeddings(dir,
      (1L, Seq(0f, 0f, 5f), 0), (2L, Seq(2f, 0f, 5f), 0),
      (3L, Seq(0f, 2f, 5f), 0), (4L, Seq(2f, 2f, 5f), 0),
      (5L, Seq(1f, 10f, 5f), 0))
    val out = graft.ops.Similarity.q234EmbeddingOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(out.length == 5, out)
    // v5: dim0 z²=0, dim1 z²=(10−2.8)²/13.76=3.767442 (6-dp floor);
    // the dead dim contributes nothing
    assert(out.head == ((5L, 3.7674, 3.767442)), out.head)
    assert(out.map(_._2).sorted.reverse == out.map(_._2), out) // z² desc
  }

  test("q234 outliers: empty embeddings yield no rows") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    writeEmbeddings(dir)
    assert(graft.ops.Similarity.q234EmbeddingOutliers(spark, dir).count() == 0)
  }

  test("q229 zipf: a perfect 1/r law fits slope −1, r2 1, intercept ln C; empty corpus reports n=0/NULLs") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    // freq(r) = 6/r for ranks 1..3: a, b, c at 6, 3, 2 occurrences —
    // ln(freq) = ln6 − ln(rank) exactly, so OLS recovers the law
    writeDocuments(dir,
      (1L, "a a a b b c", "en", "s", 1L),
      (2L, "a a a b c", "en", "s", 1L))
    val out = graft.ops.TextOps.q229ZipfFit(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 3L, r)
    assert(r.getDouble(1) == -1.0, r)            // slope = Zipf's s
    assert(r.getDouble(2) == 1.7918, r)          // intercept = ln 6 (4-dp)
    assert(r.getDouble(3) == 1.0, r)             // perfect fit
    val empty = tmpDir()
    writeDocuments(empty)
    val e = graft.ops.TextOps.q229ZipfFit(spark, empty).collect()
    assert(e.length == 1 && e(0).getLong(0) == 0L && e(0).isNullAt(1)
      && e(0).isNullAt(2) && e(0).isNullAt(3), e.toSeq)
  }

  test("q230 heaps: one new term per doc accumulates; the decile grid is dense; empty corpus = 10 zero rows") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    // doc i = {common, w_i}: vocabulary grows by exactly one per doc
    // after doc 1's two; doc_ids 1..10 put one doc in each decile
    writeDocuments(dir, (1L to 10L).map(i => (i, s"common w$i", "en", "s", 1L)): _*)
    val out = graft.ops.TextOps.q230HeapsCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = (1L to 10L).map { k =>
      (k, if (k == 1L) 2L else 1L, k, k + 1L)
    }
    assert(out == expected, out)
    val empty = tmpDir()
    writeDocuments(empty)
    val e = graft.ops.TextOps.q230HeapsCurve(spark, empty).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(e == (1L to 10L).map(k => (k, 0L, 0L, 0L)), e)
  }

  test("q227 c(d): empty corpus yields no rows") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    writeDocuments(dir)
    assert(graft.ops.Similarity.q227ClusteringByDegree(spark, dir).count() == 0)
  }
}
