package graft.ops

import graft.SparkSpecBase

/** q104 (ExactSubstr repeated-span dedup) against a BRUTE-FORCE span
  * finder that never uses the L-gram reduction: it enumerates every
  * token span of every length ≥ L, counts its occurrences across the
  * whole corpus (all docs, all offsets), marks the positions covered by
  * any multiply-occurring span, and reports maximal intervals of the
  * covered set. The engine's gram-window union must equal that — the
  * "span ≥ L repeats iff one of its L-grams repeats" theorem, checked
  * by two independent implementations, including spans at offsets q93's
  * 10-token block grid cannot align with.
  */
class RepeatedSpansSpec extends SparkSpecBase {

  private val L = 15 // must match q104RepeatedSpans

  /** Maximal intervals of positions covered by any ≥L-token span that
    * occurs ≥2 times in the corpus ((doc, offset) occurrences).
    */
  private def bruteSpans(docs: Seq[(Long, Array[String])]): Seq[(Long, Long, Long, Long)] = {
    val occs = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, w) <- docs; len <- L to w.length; i <- 0 to w.length - len)
      occs.updateWith(w.slice(i, i + len).toSeq)(c => Some(c.getOrElse(0) + 1))
    docs.flatMap { case (d, w) =>
      val covered = Array.fill(w.length)(false)
      for (len <- L to w.length; i <- 0 to w.length - len)
        if (occs(w.slice(i, i + len).toSeq) >= 2)
          for (p <- i until i + len) covered(p) = true
      // maximal runs of covered positions
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var p = 0
      while (p < w.length) {
        if (covered(p)) {
          val start = p
          while (p < w.length && covered(p)) p += 1
          spans += ((d, start.toLong, p.toLong, (p - start).toLong))
        } else p += 1
      }
      spans
    }.sortBy(s => (s._1, s._2))
  }

  test("q104 = brute force: cross-doc spans at grid-hostile offsets, within-doc repeat, exact dup") {
    val common = (1 to 20).map(i => s"c$i") // 20-token span shared at DIFFERENT offsets
    val rep = (1 to 15).map(i => s"r$i") // within-doc repeat
    val docs: Seq[(Long, Array[String])] = Seq(
      // common starts at offset 5 in doc1 and offset 2 in doc2 — neither
      // a multiple of q93's block size, the granularity q93 cannot catch
      1L -> ((1 to 5).map(i => s"a$i") ++ common ++ (1 to 3).map(i => s"b$i")).toArray,
      2L -> ((1 to 2).map(i => s"d$i") ++ common ++ (1 to 7).map(i => s"e$i")).toArray,
      3L -> (rep ++ (1 to 5).map(i => s"x$i") ++ rep).toArray,
      4L -> (1 to 30).map(i => s"u$i").toArray, // unique — no spans
      5L -> (1 to 30).map(i => s"u$i").toArray, // exact dup of doc4 — fully covered
      6L -> (1 to 10).map(i => s"s$i").toArray) // under L tokens — no grams
    val dir = tmpDir()
    writeDocuments(dir, docs.map { case (d, w) => (d, w.mkString(" "), "en", "s", 1L) }: _*)
    val got = TextOps.q104RepeatedSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = bruteSpans(docs)
    assert(got == want, s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
    // sanity on the fixture itself: docs 1-3 each have exactly one span,
    // docs 4/5 are fully covered, doc 6 has none
    assert(want.map(_._1) == Seq(1L, 2L, 3L, 3L, 4L, 5L))
    assert(want.filter(_._1 == 1L) == Seq((1L, 5L, 25L, 20L)))
    assert(want.filter(_._1 == 2L) == Seq((2L, 2L, 22L, 20L)))
    // the 5-token x-gap keeps doc3's two occurrences as separate spans
    assert(want.filter(_._1 == 3L) == Seq((3L, 0L, 15L, 15L), (3L, 20L, 35L, 15L)))
    assert(want.filter(_._1 == 4L) == Seq((4L, 0L, 30L, 30L)))
  }

  test("q107 applies the cut: surviving tokens = exactly the brute-force-uncovered positions") {
    val common = (1 to 20).map(i => s"c$i")
    val docs: Seq[(Long, Array[String])] = Seq(
      1L -> ((1 to 5).map(i => s"a$i") ++ common ++ (1 to 3).map(i => s"b$i")).toArray,
      2L -> ((1 to 2).map(i => s"d$i") ++ common ++ (1 to 7).map(i => s"e$i")).toArray,
      3L -> (1 to 16).map(i => s"f$i").toArray, // unique
      4L -> (1 to 16).map(i => s"f$i").toArray) // exact dup -> fully cut, empty clean_text
    val dir = tmpDir()
    writeDocuments(dir, docs.map { case (d, w) => (d, w.mkString(" "), "en", "s", 1L) }: _*)
    val spans = bruteSpans(docs)
    val covered: Map[Long, Set[Long]] = spans.groupBy(_._1)
      .view.mapValues(_.flatMap(s => s._2 until s._3).toSet).toMap
    val want = docs.map { case (d, w) =>
      val keep = w.zipWithIndex.collect {
        case (t, i) if !covered.getOrElse(d, Set.empty).contains(i.toLong) => t
      }
      (d, w.length.toLong, keep.length.toLong, (w.length - keep.length).toLong, keep.mkString(" "))
    }
    val got = TextOps.q107SpanDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got == want, s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
    assert(got.filter(d => d._1 >= 3L).forall(_._5 == ""), "exact-dup docs must be fully cut")
    assert(got.head._5 == ((1 to 5).map(i => s"a$i") ++ (1 to 3).map(i => s"b$i")).mkString(" "))
  }

  /** Brute-force q117: positions of a TRAIN doc covered by any ≥L-token
    * span that occurs verbatim anywhere in the EVAL docs — membership
    * against the eval span set, never the gram reduction.
    */
  private def bruteEvalSpans(train: Seq[(Long, Array[String])],
                             eval: Seq[Array[String]]): Seq[(Long, Long, Long, Long)] = {
    val evalSpans = scala.collection.mutable.Set.empty[Seq[String]]
    for (w <- eval; len <- L to w.length; i <- 0 to w.length - len)
      evalSpans += w.slice(i, i + len).toSeq
    train.flatMap { case (d, w) =>
      val covered = Array.fill(w.length)(false)
      for (len <- L to w.length; i <- 0 to w.length - len)
        if (evalSpans(w.slice(i, i + len).toSeq))
          for (p <- i until i + len) covered(p) = true
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var p = 0
      while (p < w.length) {
        if (covered(p)) {
          val start = p
          while (p < w.length && covered(p)) p += 1
          spans += ((d, start.toLong, p.toLong, (p - start).toLong))
        } else p += 1
      }
      spans
    }.sortBy(s => (s._1, s._2))
  }

  test("q117 = brute force: only eval-suite overlap is flagged, train-train repeats are not") {
    val shared = (1 to 20).map(i => s"q$i")
    val evalDocs = Seq(
      ((1 to 4).map(i => s"m$i") ++ shared).toArray, // shared at offset 4
      (1 to 18).map(i => s"v$i").toArray)
    val trainRep = (1 to 16).map(i => s"t$i")
    val train: Seq[(Long, Array[String])] = Seq(
      1L -> ((1 to 7).map(i => s"a$i") ++ shared ++ Seq("z1")).toArray, // offset 7 ≠ eval's 4
      2L -> (1 to 18).map(i => s"v$i").toArray, // exact copy of an eval doc — fully covered
      3L -> ((1 to 14).map(i => s"q$i") ++ (1 to 5).map(i => s"y$i")).toArray, // 14 < L shared
      4L -> trainRep.toArray, // train-train exact dup: q104 would flag it —
      5L -> trainRep.toArray) //  q117 must NOT (no eval overlap)
    val dir = tmpDir()
    writeDocuments(dir,
      (Seq((100L, evalDocs(0).mkString(" "), "en", "src15", 1L),
        (101L, evalDocs(1).mkString(" "), "en", "src19", 1L)) ++
        train.map { case (d, w) => (d, w.mkString(" "), "en", "src0", 1L) }): _*)
    val got = TextOps.q117EvalSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = bruteEvalSpans(train, evalDocs)
    assert(got == want, s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
    assert(want.map(_._1).distinct == Seq(1L, 2L)) // docs 3-5 clean, eval side never reported
    assert(want.filter(_._1 == 1L) == Seq((1L, 7L, 27L, 20L)))
    assert(want.filter(_._1 == 2L) == Seq((2L, 0L, 18L, 18L)))
  }

  test("q104: adjacent distinct repeats merge into one coverage interval (drop-list semantics)") {
    // two different 15-token repeated spans sitting back to back: the
    // coverage union is one 30-token interval even though no single
    // 30-token span repeats — the cut-list a pipeline materializes
    val s1 = (1 to 15).map(i => s"p$i")
    val s2 = (1 to 15).map(i => s"q$i")
    val docs: Seq[(Long, Array[String])] = Seq(
      1L -> (s1 ++ s2).toArray,
      2L -> (s1 ++ (1 to 5).map(i => s"y$i")).toArray,
      3L -> ((1 to 5).map(i => s"z$i") ++ s2).toArray)
    val dir = tmpDir()
    writeDocuments(dir, docs.map { case (d, w) => (d, w.mkString(" "), "en", "s", 1L) }: _*)
    val got = TextOps.q104RepeatedSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == bruteSpans(docs))
    assert(got.filter(_._1 == 1L) == Seq((1L, 0L, 30L, 30L)))
  }
}
