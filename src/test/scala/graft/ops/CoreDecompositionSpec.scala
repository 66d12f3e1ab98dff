package graft.ops

import graft.SparkSpecBase

/** q224's correctness guard (OracleFree — an iterated fixpoint is
  * beyond one recursive CTE): exact coreness on fixtures where the
  * k-core structure is known by hand, including the case degree gets
  * WRONG (a star hub: high degree, coreness 1), which is the
  * operator's whole reason to exist next to q219.
  */
class CoreDecompositionSpec extends SparkSpecBase {

  test("q224: 4-clique → coreness 3; triangle → 2; pendant and star leaves → 1; hub degree ≠ coreness") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    val x = (1 to 10).map(i => s"x$i")
    val v = (1 to 10).map(i => s"v$i")
    writeDocuments(dir,
      // 4-clique (J = 9/11 on every pair): coreness 3 each
      (1L, x.mkString(" "), "en", "s", 1L),
      (2L, (x.take(9) :+ "y1").mkString(" "), "en", "s", 1L),
      (3L, (x.take(9) :+ "y2").mkString(" "), "en", "s", 1L),
      (4L, (x.take(9) :+ "y3").mkString(" "), "en", "s", 1L),
      // triangle 5-6-7 + pendant 8 hanging off 5: triangle coreness 2,
      // pendant 1 — and vertex 5 has DEGREE 3 (= the clique vertices'
      // degree) yet coreness 2: degree alone cannot tell these apart
      (5L, v.mkString(" "), "en", "s", 1L),
      (6L, (v.take(9) :+ "w1").mkString(" "), "en", "s", 1L),
      (7L, (v.take(9) :+ "w2").mkString(" "), "en", "s", 1L),
      (8L, (v.drop(1) :+ "z1").mkString(" "), "en", "s", 1L))
    val out = Similarity.q224CoreDecomposition(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 3L), (3L, 4L)), out)
  }

  test("q224: a 20-chain is all coreness 1 (the long-convergence shape stays under the round cap)") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    // chain doc i ~ doc i+1 only: token windows sliding by one over a
    // long alphabet — adjacent windows share 9 of 11 distinct tokens
    // (J = 9/11), windows two apart share 8 of 12 (J = 2/3 < 4/5)
    val toks = (1 to 40).map(i => s"c$i")
    val rows = (0 until 20).map { i =>
      ((i + 1).toLong, toks.slice(i, i + 10).mkString(" "), "en", "s", 1L)
    }
    writeDocuments(dir, rows: _*)
    val out = Similarity.q224CoreDecomposition(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 20L)), out)
  }

  test("q224 ≡ brute-force peel on randomized corpora (seeded): the H-index fixpoint IS the k-core number") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(20260815L)
    // single-substitution docs off a shared base: same-position subs
    // form cliques (J = 9/11), the base doc bridges them, double-subs
    // add sparse tails — clique + bridge + chain shapes in one corpus
    val alphabet = (1 to 30).map(i => s"t$i")
    (1 to 3).foreach { trial =>
      val dir = tmpDir()
      val base = rnd.shuffle(alphabet).take(10)
      val nDocs = 20 + rnd.nextInt(20)
      val rows = (1L to nDocs.toLong).map { i =>
        val nSub = rnd.nextInt(3) // 0, 1 or 2 substitutions
        val positions = rnd.shuffle((0 until 10).toList).take(nSub)
        val toks = base.zipWithIndex.map { case (t, p) =>
          if (positions.contains(p)) s"u${p}_${rnd.nextInt(3)}" else t
        }
        (i, toks.mkString(" "), "en", "s", 1L)
      }
      writeDocuments(dir, rows: _*)
      // test-side replica: collapse → group graph → classic peel
      val sets = rows.map { case (id, text, _, _, _) => id -> text.split(" ").toSet }
      val groups = sets.groupBy(_._2).map { case (s, ds) => ds.map(_._1).min -> s }
      val gids = groups.keys.toSeq
      def jac(a: Set[String], b: Set[String]): Boolean =
        5 * a.intersect(b).size >= 4 * a.union(b).size
      val adj = collection.mutable.Map[Long, collection.mutable.Set[Long]]()
      for (x <- gids; y <- gids if x < y && jac(groups(x), groups(y))) {
        adj.getOrElseUpdate(x, collection.mutable.Set()) += y
        adj.getOrElseUpdate(y, collection.mutable.Set()) += x
      }
      val core = collection.mutable.Map[Long, Long]()
      var k = 0L
      while (adj.nonEmpty) {
        val peel = adj.collect { case (v, ns) if ns.size <= k => v }.toList
        if (peel.isEmpty) k += 1
        else peel.foreach { v =>
          core(v) = k
          adj(v).foreach(n => adj.get(n).foreach(_ -= v))
          adj -= v
        }
      }
      val expected = core.values.groupBy(identity)
        .map { case (c, vs) => (c, vs.size.toLong) }.toSeq.sortBy(_._1)
      val got = Similarity.q224CoreDecomposition(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected, s"trial $trial (nDocs=$nDocs): $got vs $expected")
    }
  }

  test("q227 ≡ brute-force c(d) on randomized corpora (seeded): triangle corners and class means exact") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(20260816L)
    val alphabet = (1 to 30).map(i => s"t$i")
    (1 to 3).foreach { trial =>
      val dir = tmpDir()
      val base = rnd.shuffle(alphabet).take(10)
      val nDocs = 20 + rnd.nextInt(20)
      val rows = (1L to nDocs.toLong).map { i =>
        val positions = rnd.shuffle((0 until 10).toList).take(rnd.nextInt(3))
        val toks = base.zipWithIndex.map { case (t, p) =>
          if (positions.contains(p)) s"u${p}_${rnd.nextInt(3)}" else t
        }
        (i, toks.mkString(" "), "en", "s", 1L)
      }
      writeDocuments(dir, rows: _*)
      // replica graph (q224's test construction), then brute c(d)
      val sets = rows.map { case (id, text, _, _, _) => id -> text.split(" ").toSet }
      val groups = sets.groupBy(_._2).map { case (s, ds) => ds.map(_._1).min -> s }
      val gids = groups.keys.toSeq
      def jac(a: Set[String], b: Set[String]): Boolean =
        5 * a.intersect(b).size >= 4 * a.union(b).size
      val nbrs = gids.map(x => x -> gids.filter(y => y != x && jac(groups(x), groups(y))).toSet)
        .filter(_._2.nonEmpty).toMap
      val perV = nbrs.toSeq.map { case (_, ns) =>
        val tri2 = ns.toSeq.map(u => (nbrs(u) & ns).size.toLong).sum
        (ns.size.toLong, tri2)
      }
      val expected = perV.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, vs) =>
        val t2 = vs.map(_._2).sum
        val lcc = if (d >= 2) Some(math.floor(
          t2.toDouble / (vs.size * d * (d - 1)).toDouble * 10000.0 + 0.5) / 10000.0)
        else None
        (d, vs.size.toLong, t2 / 2, lcc)
      }
      val got = Similarity.q227ClusteringByDegree(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
      assert(got == expected, s"trial $trial (nDocs=$nDocs): $got vs $expected")
    }
  }

  test("q224: empty corpus yields no rows") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir()
    writeDocuments(dir)
    assert(Similarity.q224CoreDecomposition(spark, dir).count() == 0)
  }
}
