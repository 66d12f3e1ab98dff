package graft

import graft.ops.CorpusPrep

/** Stage-by-stage behavior of the q67 composed pipeline on a fixture
  * that exercises every stage: scrubbing changes tokenization, the
  * length gate drops a short doc, exact dedup collapses identical
  * cleaned texts, near-dup survivor selection drops a ≥ 0.8 variant,
  * and only survivors fan out to chunks.
  */
class CorpusPrepSpec extends SparkSpecBase {

  test("q67: every stage fires; only surviving docs are chunked") {
    val dir = tmpDir()
    val base = (0 until 20).map(i => s"w$i")
    writeDocuments(dir,
      // doc 1: 20 tokens, survives everything -> chunks at 0 and 12
      (1L, base.mkString(" "), "en", "s", 1L),
      // docs 2/3: identical to each other (disjoint vocab from doc 1, so
      // no near-dup edge) -> doc 3 dropped by exact dedup, doc 2 kept;
      // both contain "user", proving the scrub runs before tokenization
      (2L, ((0 until 19).map(i => s"v$i") :+ "user").mkString(" "), "en", "s", 1L),
      (3L, ((0 until 19).map(i => s"v$i") :+ "user").mkString(" "), "en", "s", 1L),
      // doc 4: near-dup of doc 1 (19 of 21 distinct tokens shared,
      // J = 19/21 ≈ 0.90) -> dropped by survivor selection
      (4L, (base.take(19) ++ Seq("extra1", "extra2")).mkString(" "), "en", "s", 1L),
      // doc 5: 5 tokens -> dropped by the length gate
      (5L, "a b c d e", "en", "s", 1L),
      // doc 6: unrelated 12 tokens -> survives, one chunk
      (6L, (0 until 12).map(i => s"z$i").mkString(" "), "en", "s", 1L))
    val out = CorpusPrep.q67CorpusPrep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1 survives: chunks (0: 16 toks) and (1: 8 toks, starts at w12)
    assert(byDoc(1L).map(c => (c._2, c._3)).toSeq == Seq((0L, 16L), (1L, 8L)), byDoc.get(1L))
    assert(byDoc(1L)(1)._4.startsWith("w12 "))
    // doc 2 survives as its dup-group min (2 < 3); doc 3 exact-dup-dropped
    assert(byDoc.contains(2L) && !byDoc.contains(3L))
    // the scrub ran before tokenization: doc 2's chunk text carries <PII>
    assert(byDoc(2L).map(_._4).mkString(" ").contains("<PII>"))
    // doc 4 near-dup-dropped, doc 5 length-gated, doc 6 survives with one chunk
    assert(!byDoc.contains(4L) && !byDoc.contains(5L))
    assert(byDoc(6L).map(c => (c._2, c._3)).toSeq == Seq((0L, 12L)))
  }

  test("q72: drops classified exact vs near, attributed to the dropped doc's source") {
    val dir = tmpDir()
    val base = (1 to 10).map(k => s"t$k")
    writeDocuments(dir,
      (1L, base.mkString(" "), "en", "srcX", 1L), // survivor (group min)
      (2L, base.mkString(" "), "en", "srcX", 1L), // exact dup of 1
      (3L, (base.take(9) :+ "u").mkString(" "), "en", "srcX", 1L), // near-dup of 1 (J=9/11)
      (4L, (1 to 10).map(k => s"z$k").mkString(" "), "en", "srcX", 1L), // unrelated survivor
      (5L, (base.take(9) :+ "v").mkString(" "), "en", "srcY", 1L)) // near-dup of 1, other source
    val out = graft.ops.CorpusPrep.q72DedupReport(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(out("srcX") == ((4L, 1L, 1L, 2L, 0.5)), out("srcX"))
    assert(out("srcY") == ((1L, 0L, 1L, 0L, 0.0)), out("srcY"))
    // the report's survivor counts reconcile with q56's survivor list
    val survivors = graft.ops.Similarity.q56NeardupSurvivors(spark, dir).collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 4L))
    assert(out.values.map(_._4).sum == survivors.size)
  }

  test("q71: common-token docs score low, rare-token docs high; deterministic") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, Seq.fill(10)("common").mkString(" "), "en", "s", 1L),
      (2L, (0 until 10).map(i => s"rare$i").mkString(" "), "en", "s", 1L),
      (3L, Seq.fill(10)("common").mkString(" "), "en", "s", 1L))
    val out = graft.ops.TextOps.q71UnigramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 10L && out(2L)._1 == 10L)
    // 'common' appears 20/30 times (surprisal ln(1.5)); each rareN 1/30 (ln 30)
    assert(out(1L)._2 < out(2L)._2, out)
    assert(out(1L)._2 == out(3L)._2, "identical docs must score identically")
    val again = graft.ops.TextOps.q71UnigramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == out)
  }

  test("q66: shortest quartile dropped per source; ties stay together; singletons survive") {
    val dir = tmpDir()
    // srcA lengths 1..8 tokens, srcB lengths 11..18: a global cutoff
    // would wipe out srcA entirely; the relative filter keeps 6 of 8 in
    // EACH source (cume_dist of the two shortest = .125, .25 ≤ 0.25).
    // srcC is a single doc (cume_dist 1 — never wiped out); srcD is 4
    // docs of IDENTICAL length (all cume_dist 1 — boundary ties are
    // kept or dropped together, no doc_id coin flip)
    val docs = (0 until 8).map { i =>
      (i.toLong, (0 to i).map(k => s"a$k").mkString(" "), "en", "srcA", 1L)
    } ++ (0 until 8).map { i =>
      ((i + 10).toLong, (0 to (i + 10)).map(k => s"b$k").mkString(" "), "en", "srcB", 1L)
    } ++ Seq((30L, "lone doc", "en", "srcC", 1L)) ++
      (0 until 4).map { i => ((40 + i).toLong, "same size text here", "en", "srcD", 1L) }
    writeDocuments(dir, docs: _*)
    val out = graft.ops.TrainingData.q66LengthQuantileFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySource("srcA") == (2L to 7L).toSet, bySource)
    assert(bySource("srcB") == (12L to 17L).toSet, bySource)
    assert(bySource("srcC") == Set(30L), bySource)
    assert(bySource("srcD") == (40L to 43L).toSet, bySource)
  }

  test("q201 variants: distance-1 and depth-2 distance-2 pairs found, d3 excluded, repair direction") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "color color color colour gray grey kitten", "en", "s", 1L),
      (2L, "gray grey abc sitting", "en", "s", 1L),
      (3L, "cba cba cba cba cba", "en", "s", 1L))
    val out = graft.ops.TextOps.q201SpellingVariants(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    assert(out.toSeq == Seq(
      // depth-2 recall: double substitution (abc→cbc→cba) collides on a
      // shared single-char deletion key and verifies at exactly 2
      ("abc", "cba", 2L, 1L, 5L, "cba"),
      ("color", "colour", 1L, 3L, 1L, "color"),
      // tied frequencies → lexicographically smaller canonical
      ("gray", "grey", 1L, 2L, 2L, "gray")), out.toSeq)
    // kitten/sitting (distance 3) must NOT appear even as a candidate
    assert(!out.exists(r => r._1 == "kitten" || r._2 == "sitting"))
  }

  test("q201 variants: empty corpus and all-short vocab return 0 rows") {
    val dir = tmpDir()
    writeDocuments(dir)
    assert(graft.ops.TextOps.q201SpellingVariants(spark, dir).count() == 0)
    writeDocuments(dir, (1L, "ab ba to od", "en", "s", 1L))
    assert(graft.ops.TextOps.q201SpellingVariants(spark, dir).count() == 0)
  }

  test("q202 collocations: bound phrase flags, frequent-filler pairs don't, singleton doc is bigram-free") {
    val dir = tmpDir()
    // 5 docs of "new york" + 6 fillers; one single-token doc.
    // N_tok = 41, N_big = 35; c(new)=c(york)=5, c(f)=30.
    // (new,york): 5·41² = 8405 > 2·5·5·35  = 1750  → collocated
    // (york,f):   5·41² = 8405 > 2·5·30·35 = 10500 fails → not
    // (f,f):     25·41² = 42025 > 2·30·30·35 = 63000 fails → not
    val docs = (1L to 5L).map(i => (i, "new york f f f f f f", "en", "s", 1L)) :+
      ((6L, "solo", "en", "s", 1L))
    writeDocuments(dir, docs: _*)
    val out = graft.ops.TextOps.q202CollocationLift(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("f", "f", 25L, 30L, 30L, false),
      ("new", "york", 5L, 5L, 5L, true),
      ("york", "f", 5L, 5L, 30L, false)), out.toSeq)
  }

  test("q202 collocations: empty corpus returns 0 rows") {
    val dir = tmpDir()
    writeDocuments(dir)
    assert(graft.ops.TextOps.q202CollocationLift(spark, dir).count() == 0)
  }
}
