package graft.ops

import graft.SparkSpecBase

/** q177 triangle census on hand-built pair graphs: a known triangle, a
  * known open wedge (chain), isolated docs, and the empty corpus. The
  * J >= 4/5 edge universe is engineered through token overlap
  * (10-token docs sharing 9 tokens: J = 9/11 >= 0.8).
  */
class TriangleCensusSpec extends SparkSpecBase {

  private def doc(id: Long, toks: Seq[String]): (Long, String, String, String, Long) =
    (id, toks.mkString(" "), "en", "s", 1L)

  private val base = (1 to 9).map(i => s"t$i")

  test("triangle: three mutually-near docs -> 3 vertices, 3 edges, 3 wedges, 1 triangle") {
    val dir = tmpDir()
    writeDocuments(dir,
      doc(1L, base :+ "ua"),
      doc(2L, base :+ "ub"),
      doc(3L, base :+ "uc"),
      // far doc: 8 shared tokens over a 12-token union, J = 8/12 < 0.8
      doc(4L, base.take(8) ++ Seq("v1", "v2")),
      // isolated doc: disjoint vocabulary
      doc(5L, (1 to 10).map(i => s"z$i")))
    graft.functions.GraftFunctions.register(spark)
    val r = Similarity.q177TriangleCensus(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 3L, 3L, 1L)), r)
  }

  test("open wedge: a chain A~B~C with A!~C counts the wedge but no triangle") {
    val dir = tmpDir()
    // B shares 9 tokens with each of A and C, but A and C share only 8
    // (J = 8/12 < 0.8): A = base+a1, C = base.drop(1)+c1+c2? — build
    // explicitly: A = t1..t9 + ua, B = t1..t9 + ub, C = t2..t9 + ub + uc
    // A∩B = 9/11 ≥ .8; B∩C = 9/11 ≥ .8 (t2..t9 + ub); A∩C = 8/12 < .8
    writeDocuments(dir,
      doc(1L, base :+ "ua"),
      doc(2L, base :+ "ub"),
      doc(3L, base.drop(1) ++ Seq("ub", "uc")))
    graft.functions.GraftFunctions.register(spark)
    val r = Similarity.q177TriangleCensus(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 2L, 1L, 0L)), r)
  }

  test("empty corpus: a single zero-count census row, not a crash") {
    val dir = tmpDir()
    writeDocuments(dir)
    graft.functions.GraftFunctions.register(spark)
    val r = Similarity.q177TriangleCensus(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 0L, 0L, 0L)), r)
  }

  test("exact duplicates collapse before the census: a mirrored triangle does not inflate it") {
    val dir = tmpDir()
    // doc 6 is an exact token-set duplicate of doc 1 — the group-level
    // graph must be identical to the plain triangle's
    writeDocuments(dir,
      doc(1L, base :+ "ua"),
      doc(2L, base :+ "ub"),
      doc(3L, base :+ "uc"),
      doc(6L, base :+ "ua"))
    graft.functions.GraftFunctions.register(spark)
    val r = Similarity.q177TriangleCensus(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 3L, 3L, 1L)), r)
  }
}
