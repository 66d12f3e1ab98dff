package graft.ops

import graft.SparkSpecBase

/** Behavior specs for the ranked-retrieval pair: the inverted-index
  * block manifest (q192) and BM25 scoring over it (q193). Fixtures
  * cross the 128-posting block boundary (so blocking is exercised, not
  * vacuous) and pick documents where BM25's length normalization
  * REORDERS a plain-tf ranking — the decision the operator exists for.
  */
class RetrievalSpec extends SparkSpecBase {

  test("q192: posting lists cut at 128 docs; block stats and df reconcile") {
    val dir = tmpDir()
    // term x: docs 1..130 (doc 1 twice → tf 2); term y: doc 1 only
    val rows = (1L to 130L).map { i =>
      (i, if (i == 1L) "x x y" else "x", "en", "s", 1L)
    }
    writeDocuments(dir, rows: _*)
    val out = TextOps.q192PostingBlocks(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // x block 0: postings for docs 1..128, tf sum 129 (doc 1 counts 2)
    assert(out(("x", 0L)) == ((128L, 1L, 128L, 129L, 130L)), out)
    // x block 1: the 2-posting tail
    assert(out(("x", 1L)) == ((2L, 129L, 130L, 2L, 130L)), out)
    assert(out(("y", 0L)) == ((1L, 1L, 1L, 1L, 1L)), out)
    assert(out.size == 3)
  }

  test("q193: length normalization outranks raw tf; scores match the exact double formula") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "q1 q1 q2 q3", "en", "s", 1L), //  dl 4, all 3 query terms
      (2L, "q1 q2 q3 f1 f2 f3 f4 f5 f6 f7 f8 f9", "en", "s", 1L), // dl 12
      (3L, "q1 x1", "en", "s", 1L), // dl 2, one match
      (4L, "z1 z2", "en", "s", 1L)) // no query term: absent
    // fixture-side replica of the scoring tree (same IEEE ops)
    val n = 4.0; val avgdl = 5.0 // (4+12+2+2)/4
    def contrib(tf: Double, df: Double, dl: Double): Double = {
      val c = math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        (tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
      math.floor(c * 1000000.0 + 0.5) / 1000000.0
    }
    // the engine casts each term to DECIMAL(20,6) (half-up) before the
    // exact sum — mirror that, then the 4-dp half-up of the total
    def dec6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def r4(x: BigDecimal): Double =
      x.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = r4(dec6(contrib(2, 3, 4)) + dec6(contrib(1, 2, 4)) * 2)
    val exp2 = r4(dec6(contrib(1, 3, 12)) + dec6(contrib(1, 2, 12)) * 2)
    val exp3 = r4(dec6(contrib(1, 3, 2)))
    val out = TextOps.q193Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1 wins on tf AND brevity; doc 3's single short match still
    // beats nothing; doc 4 never scores
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), out.toSeq)
    assert(out.map(_._2).toSeq == Seq(3L, 3L, 1L), out.toSeq)
    assert(out.map(_._3).toSeq == Seq(exp1, exp2, exp3), out.toSeq)
    // Lucene's +1-shifted idf keeps every contribution positive even
    // for the df=3-of-4 term
    assert(out.forall(_._3 > 0.0))
  }

  test("q193: a long doc with more raw matches loses to a short focused one") {
    val dir = tmpDir()
    // All three docs carry all three query terms (df 3 each — the
    // unambiguous top-3 over the df-1 fillers). Docs 1 and 2 have
    // IDENTICAL tf vectors; doc 2 drowns them in filler. Plain tf ties
    // them — BM25's b-term must break the tie toward the short doc.
    val filler = (1 to 40).map(i => s"f$i").mkString(" ")
    writeDocuments(dir,
      (1L, "k k p r", "en", "s", 1L),
      (2L, s"k k p r $filler", "en", "s", 1L),
      (3L, "k p r", "en", "s", 1L))
    val out = TextOps.q193Bm25(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(out.head == 1L, out)
    assert(out.indexOf(1L) < out.indexOf(2L), out)
    assert(out.toSet == Set(1L, 2L, 3L), out)
  }

  test("q198: only docs matching ALL query terms survive; support stats exact") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "k k p r", "en", "s", 1L), //   all 3 → sum_tf 4, min_tf 1
      (2L, "k p r r r", "en", "s", 1L), // all 3 → sum_tf 5, min_tf 1
      (3L, "k p x", "en", "s", 1L), //     2 of 3 → excluded
      (4L, "k k k k", "en", "s", 1L), //   1 of 3 (high tf!) → excluded
      (5L, "z1 z2", "en", "s", 1L)) //     none → excluded
    // df: k=4, p=3, r=2 > x/z* at 1 → query = {k, p, r}
    val out = TextOps.q198BooleanAnd(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 4L, 1L), (2L, 5L, 1L)), out.toSeq)
  }

  test("q221: adjacency in ORDER only — reversed pairs don't match; tie-break picks the lexicographic phrase") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "p q p q z", "en", "s", 1L), // (p,q)×2, (q,p)×1, (q,z)×1
      (2L, "q p z z", "en", "s", 1L),   // (q,p)×1 more — reversed, must NOT match
      (3L, "x p q y", "en", "s", 1L),   // (p,q)×1 → phrase (p,q) at c=3 over (q,p) c=2
      (4L, "p p q", "en", "s", 1L))     // (p,p) then (p,q): hit at pos 2 only
    val out = TextOps.q221PhraseMatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (3L, 1L, 2L), (4L, 1L, 2L)), out.toSeq)
  }

  test("q221: overlapping self-phrase occurrences all count") {
    val dir = tmpDir()
    writeDocuments(dir, (7L, "a a a a", "en", "s", 1L)) // phrase (a,a), hits 1/2/3
    val out = TextOps.q221PhraseMatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((7L, 3L, 1L)), out.toSeq)
  }

  test("q221b ≡ q221 on the adjacency/tie-break and overlap fixtures; empty tokens don't drift positions") {
    def both(dir: String): (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) = {
      def c(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      (c(TextOps.q221PhraseMatch(spark, dir)), c(TextOps.q221bPhraseMatchIndexed(spark, dir)))
    }
    val d1 = tmpDir()
    writeDocuments(d1,
      (1L, "p q p q z", "en", "s", 1L),
      (2L, "q p z z", "en", "s", 1L),
      (3L, "x p q y", "en", "s", 1L),
      (4L, "p p q", "en", "s", 1L))
    val (scan1, idx1) = both(d1)
    assert(idx1 == scan1 && idx1 == Seq((1L, 2L, 1L), (3L, 1L, 2L), (4L, 1L, 2L)), (scan1, idx1))
    val d2 = tmpDir()
    writeDocuments(d2, (7L, "a a a a", "en", "s", 1L)) // overlapping self-phrase
    val (scan2, idx2) = both(d2)
    assert(idx2 == scan2 && idx2 == Seq((7L, 3L, 1L)), (scan2, idx2))
    // a run of spaces splits to an EMPTY token that occupies a position:
    // the index keeps it, so the (a,b) hit after the gap sits at pos 4
    // on both legs (dropping empties would misreport it as 3)
    val d3 = tmpDir()
    writeDocuments(d3,
      (8L, "a b  a b", "en", "s", 1L),  // tokens: a b '' a b → (a,b) at 1 and 4
      (9L, "a b x", "en", "s", 1L))
    val (scan3, idx3) = both(d3)
    assert(idx3 == scan3 && idx3 == Seq((8L, 2L, 1L), (9L, 1L, 1L)), (scan3, idx3))
  }

  test("q221b: post-staging, the executed plan reads ONLY the positional index — no document-text scan") {
    val sf = "/root/testdata/sf0.001"
    // force the staging build so the consumer plan is the steady state
    TextOps.stagedPositionalPostings(spark, sf).count()
    val df = TextOps.q221bPhraseMatchIndexed(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_stage_pos_postings"),
      "positional index scan expected:\n" + p)
    assert(!p.contains("documents.parquet"),
      "the corpus text scan must be gone from the indexed leg:\n" + p)
    // and the indexed leg answers exactly what the scan leg answers
    val scan = TextOps.q221PhraseMatch(spark, sf).collect().toSeq
    assert(df.collect().toSeq == scan)
  }

  test("q222: equal-length docs rank by query mass; an unmatched doc still scores (background cost) with n_matched 0") {
    val dir = tmpDir()
    writeDocuments(dir,
      (1L, "k k k k p p r r", "en", "s", 1L),            // dl 8, heavy query mass
      (2L, "k p r f1 f2 f3 f4 f5", "en", "s", 1L),        // dl 8, one of each
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "s", 1L))     // dl 8, no query term
    // df: k=p=r=2 > fillers at 1 → query {k, p, r}
    val out = TextOps.q222QueryLikelihood(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), out.toSeq)
    assert(out.map(_._2).toSeq == Seq(3L, 3L, 0L), out.toSeq)
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq, out.toSeq) // ascending nll
    assert(out.forall(_._3 > 0.0), out.toSeq) // contributions provably ≥ 0
  }

  test("empty corpus: q192/q193/q198/q213/q221/q222/q226 return 0 rows, not crashes") {
    val dir = tmpDir()
    writeDocuments(dir)
    assert(TextOps.q192PostingBlocks(spark, dir).count() == 0)
    assert(TextOps.q193Bm25(spark, dir).count() == 0)
    assert(TextOps.q198BooleanAnd(spark, dir).count() == 0)
    assert(TextOps.q213BlockMaxWand(spark, dir).count() == 0)
    assert(TextOps.q221PhraseMatch(spark, dir).count() == 0)
    assert(TextOps.q221bPhraseMatchIndexed(spark, dir).count() == 0)
    assert(TextOps.q222QueryLikelihood(spark, dir).count() == 0)
    assert(TextOps.q226QueryExpansion(spark, dir).count() == 0)
  }

  test("q226: a doc with ZERO base-query terms enters via the expansion vocabulary") {
    val dir = tmpDir()
    // df(a)=df(b)=df(c)=11 (docs 1-10 + 12), df(e)=11 (docs 1-10 + 11):
    // the four-way df tie breaks lexicographically → base query {a,b,c},
    // e stays OUT of the base query by one tie-break step — the
    // tightest fixture for the exclusion + promotion path
    val rows = (1L to 10L).map(i => (i, "a b c e", "en", "s", 1L)) ++ Seq(
      (11L, "e zz", "en", "s", 1L),   // no base term at all
      (12L, "a b c", "en", "s", 1L))  // shortest base match → tops pass 1
    writeDocuments(dir, rows: _*)
    val out = TextOps.q226QueryExpansion(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // pass 1 feedback = doc 12 (dl 3, highest) + docs 1..9; their only
    // non-base vocabulary is e (n_fb 9) → expanded query {a,b,c,e}
    // doc 11 ("e zz") matched NOTHING in pass 1; now it scores on e
    assert(out.contains(11L), out)
    assert(out(11L)._1 == 1L, out) // n_matched counts expanded terms
    assert(out(11L)._2 > 0.0, out)
    // full-match docs count all 4 expanded terms; doc 12 only the base 3
    assert(out(1L)._1 == 4L, out)
    assert(out(12L)._1 == 3L, out)
    assert(out.size == 12, out)
  }

  test("q213: fewer than 20 seed docs disarms θ — a small partial top block must not prune the winners") {
    val dir = tmpDir()
    // each term's top-ub block is the PARTIAL LAST block (5 postings):
    // the 3 monster docs (tf 50) sit at the highest doc ids, so
    // df = 133 puts them in block 1 with only docs 129-130 — 5 seed
    // docs < 20. A min-over-5 θ would be a monster-level score and
    // (pre-fix) prune every tf-1 block, returning 5 rows vs brute's 20.
    val tail = (1L to 130L).map(i =>
      (i, "t1 t2 t3 " + (1 to 20).map(k => s"f${i}x$k").mkString(" "), "en", "s", 1L))
    val monsters = (9001L to 9003L).map(i =>
      (i, Seq.fill(50)("t1 t2 t3").mkString(" "), "en", "s", 1L))
    writeDocuments(dir, (tail ++ monsters): _*)
    val brute = TextOps.q193Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val wand = TextOps.q213BlockMaxWand(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(brute.size == 20, s"fixture must fill the top-20: ${brute.size}")
    assert(wand == brute, s"under-seeded θ pruned winners:\n$wand\nvs\n$brute")
    // θ disarmed ⇒ every block survives
    val surv = TextOps.wandBlockSurvival(spark, dir).collect().map(_.getBoolean(6))
    assert(surv.forall(identity), "no block may be skipped when θ is disarmed")
  }

  test("q221b ≡ q221 on randomized corpora (seeded): the positional index answers exactly what the scan answers") {
    // deterministic PRNG — index/scan equivalence must hold on EVERY
    // corpus, so sample shapes the fixed fixtures don't: tiny vocab
    // (dense bigram ties exercising the lexicographic tie-break),
    // self-bigrams from repeated tokens, and raw double spaces (empty
    // split tokens occupying positions)
    val rnd = new scala.util.Random(20260815L)
    (1 to 4).foreach { trial =>
      val dir = tmpDir()
      val nDocs = 40 + rnd.nextInt(60)
      val vocab = (1 to 6).map(i => s"t$i")
      val rows = (1L to nDocs.toLong).map { i =>
        val len = 1 + rnd.nextInt(15)
        val toks = (1 to len).map(_ => vocab(rnd.nextInt(vocab.size)))
        // seeded double spaces: ~1 in 5 docs carries an empty token
        val text = if (rnd.nextInt(5) == 0 && len > 2)
          toks.take(len / 2).mkString(" ") + "  " + toks.drop(len / 2).mkString(" ")
        else toks.mkString(" ")
        (i, text, "en", "s", 1L)
      }
      writeDocuments(dir, rows: _*)
      val scan = TextOps.q221PhraseMatch(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val idx = TextOps.q221bPhraseMatchIndexed(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(idx == scan, s"trial $trial (nDocs=$nDocs): index diverged\n$idx\nvs\n$scan")
      assert(scan.nonEmpty, s"trial $trial: degenerate fixture — no phrase matched")
    }
  }

  test("q213 ≡ q193 on randomized corpora (seeded): pruning is exact under skew, uniformity, and tiny-df tails") {
    // deterministic PRNG — the WAND/brute-force equivalence must hold
    // on EVERY corpus, so sample shapes the fixed fixture doesn't:
    // uniform tf, near-tie scores, sub-128-posting terms (single
    // block, nothing skippable), dl extremes
    val rnd = new scala.util.Random(20260815L)
    (1 to 4).foreach { trial =>
      val dir = tmpDir()
      val nDocs = 150 + rnd.nextInt(150)
      val vocab = Seq("qa", "qb", "qc") ++ (1 to 20).map(i => s"w$i")
      val rows = (1L to nDocs.toLong).map { i =>
        val len = 3 + rnd.nextInt(40)
        val toks = (1 to len).map(_ => vocab(rnd.nextInt(vocab.size)))
        (i, toks.mkString(" "), "en", "s", 1L)
      }
      writeDocuments(dir, rows: _*)
      val brute = TextOps.q193Bm25(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val wand = TextOps.q213BlockMaxWand(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(wand == brute, s"trial $trial (nDocs=$nDocs): WAND diverged\n$wand\nvs\n$brute")
    }
  }

  test("q213: block-max WAND skips the low-impact blocks and still returns q193's exact top-20") {
    val dir = tmpDir()
    // 30 high-impact docs (tf 8 per query term, dl 24) at LOW doc ids —
    // posting lists are doc-sorted, so they all land in block 0 — plus
    // 330 tf-1 long-tail docs spilling into blocks 1-2 per term, plus
    // 200 no-query-term docs so the query terms' idf is materially > 0
    // (df 360 of 560; without them idf ≈ ln(1.0015) and every score
    // collapses toward the µ-nat floor).
    val high = (1L to 30L).map(i =>
      (i, Seq.fill(8)("t1 t2 t3").mkString(" "), "en", "s", 1L))
    val tail = (1001L to 1330L).map(i =>
      (i, "t1 t2 t3 " + (1 to 45).map(k => s"f${i}x$k").mkString(" "), "en", "s", 1L))
    val inert = (2001L to 2200L).map(i => (i, s"g${i}a g${i}b", "en", "s", 1L))
    writeDocuments(dir, (high ++ tail ++ inert): _*)
    // exact equality with the brute-force scorer — WAND prunes, never
    // approximates (same ORDER BY score DESC, doc_id tie-break)
    val brute = TextOps.q193Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val wand = TextOps.q213BlockMaxWand(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(wand == brute, s"WAND diverged from brute force:\n$wand\nvs\n$brute")
    assert(brute.map(_._1).toSet == (1L to 20L).toSet, brute)
    // the pruning actually happened: each term's 360 postings cut into
    // 3 blocks; block 0 (the high-tf seeds) must survive, the tf-1
    // tail blocks must be provably un-competitive
    val surv = TextOps.wandBlockSurvival(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(6)).toMap
    assert(surv.size == 9, surv)
    assert(Seq("t1", "t2", "t3").forall(t => surv((t, 0L))), surv)
    val skipped = surv.count(!_._2)
    assert(skipped == 6, s"expected all 6 tail blocks skipped: $surv")
  }
}
