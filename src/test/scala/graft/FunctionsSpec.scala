package graft

import graft.functions.GraftFunctions

/** Native expression specs: SQL surface, codegen path (DataFrame eval),
  * and edge cases for sorted_intersect_count.
  */
class FunctionsSpec extends SparkSpecBase {

  test("top_k_struct: k smallest by lexicographic struct order; ties break on later fields; partial/final merge across partitions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 1000 rows over 3 groups, REPARTITIONED so every group spans
    // partitions and the map-side partial heaps must MERGE correctly
    val df = (1 to 1000).map { i =>
      (i % 3, (i % 7).toDouble, i.toLong) // (g, key with heavy ties, id)
    }.toDF("g", "key", "id").repartition(8)
    val out = df
      .selectExpr("g", "struct(key, id) AS s")
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.call_function("top_k_struct",
        org.apache.spark.sql.functions.col("s"),
        org.apache.spark.sql.functions.lit(4)).as("top"))
      .selectExpr("g", "explode(top) AS t")
      .select("g", "t.key", "t.id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    // brute-force reference: 4 smallest (key, id) per group, ASC
    val exp = (1 to 1000).map(i => (i % 3, ((i % 7).toDouble, i.toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(4).toSeq).toMap
    assert(out == exp, s"$out vs $exp")
  }

  test("top_k_struct: k larger than the group returns the whole group sorted; NULL structs are skipped") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT top_k_struct(s, 10) FROM (SELECT IF(v IS NULL, NULL, struct(v)) AS s " +
        "FROM VALUES (3), (1), (NULL), (2) AS t(v))").collect().head
    val got = r.getSeq[org.apache.spark.sql.Row](0).map(_.getInt(0))
    assert(got == Seq(1, 2, 3), got)
  }

  test("top_k_struct: a NULL sort key orders GREATEST (DESC NULLS LAST parity), never displacing a real candidate") {
    GraftFunctions.register(spark)
    // negative keys present: a NULL unboxed-as-0.0 would beat them and
    // steal a top-2 slot; NULLS-GREATEST keeps it out
    val r = spark.sql(
      "SELECT top_k_struct(struct(v, id), 2) FROM VALUES " +
        "(CAST(NULL AS DOUBLE), 1L), (-0.5D, 2L), (-0.2D, 3L), (0.1D, 4L) AS t(v, id)"
    ).collect().head
    val got = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getDouble(0), x.getLong(1)))
    assert(got == Seq((-0.5, 2L), (-0.2, 3L)), got)
    // but like the window it replaced, a NULL key still surfaces when
    // the group runs out of non-null candidates
    val r2 = spark.sql(
      "SELECT top_k_struct(struct(v, id), 2) FROM VALUES " +
        "(CAST(NULL AS DOUBLE), 1L), (0.3D, 2L) AS t(v, id)").collect().head
    val got2 = r2.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (if (x.isNullAt(0)) None else Some(x.getDouble(0)), x.getLong(1)))
    assert(got2 == Seq((Some(0.3), 2L), (None, 1L)), got2)
  }

  test("topKPerQuery ≡ the row_number window it replaced, on randomized candidates (seeded, with ties and NULL sims)") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    (1 to 3).foreach { trial =>
      val rows = (1 to 800).map { i =>
        val qid = rnd.nextInt(12).toLong
        // coarse 1-dp grid forces heavy sim ties; ~5% NULL sims
        val sim = if (rnd.nextInt(20) == 0) None
        else Some(math.floor(rnd.nextDouble() * 20 - 10) / 10.0)
        (qid, i.toLong, sim)
      }
      val df = rows.toDF("qid", "tid", "sim")
      val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("tid"))
      val windowed = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 7)
        .select("qid", "rk", "tid", "sim")
        .orderBy("qid", "rk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
      val heaped = graft.ops.Similarity.topKPerQuery(df, 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
      assert(heaped == windowed, s"trial $trial: heap diverged from window\n" +
        s"${heaped.diff(windowed).take(5)} vs ${windowed.diff(heaped).take(5)}")
    }
  }

  test("top_k_struct: k must be a positive int literal — analysis error, not a mid-task crash") {
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT top_k_struct(struct(v), 0) FROM VALUES (1) AS t(v)").collect()
    }
    assert(e.getMessage.contains("positive int k"), e.getMessage)
  }

  test("top_k_struct: a NaN double/float sort field fails LOUDLY at update (out of contract — rank would flip vs a DESC window under negation)") {
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.SparkException] {
      spark.sql("SELECT top_k_struct(struct(v, id), 2) FROM VALUES " +
        "(CAST('NaN' AS DOUBLE), 1L), (0.5D, 2L) AS t(v, id)").collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("NaN"), s"want the named NaN rejection, got: $msg")
    val ef = intercept[org.apache.spark.SparkException] {
      spark.sql("SELECT top_k_struct(struct(v), 1) FROM VALUES " +
        "(CAST('NaN' AS FLOAT)) AS t(v)").collect()
    }
    val msgF = Option(ef.getCause).map(_.getMessage).getOrElse(ef.getMessage)
    assert(msgF != null && msgF.contains("NaN"), s"float field too: $msgF")
    // and a NULL key (the documented escape hatch for possibly-NaN
    // inputs, `nullif`-style) still aggregates fine, ordering greatest
    val ok = spark.sql("SELECT top_k_struct(struct(v, id), 2) AS a FROM VALUES " +
      "(CAST(NULL AS DOUBLE), 1L), (0.5D, 2L) AS t(v, id)").collect().head
    assert(ok.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)) == Seq(2L, 1L))
  }

  test("sorted_intersect_count via SQL: overlap, disjoint, empty, null") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1,2,3,5), array(2,3,4,5)) AS a, " +
        "sorted_intersect_count(array(1,2), array(3,4)) AS b, " +
        "sorted_intersect_count(CAST(array() AS ARRAY<INT>), array(1)) AS c, " +
        "sorted_intersect_count(CAST(NULL AS ARRAY<INT>), array(1)) AS d").collect().head
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 0)
    assert(r.getInt(2) == 0)
    assert(r.isNullAt(3))
  }

  test("matches size(array_intersect) over generated sorted sets (codegen path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      rnd.shuffle(0 to 60).take(rnd.nextInt(30) + 1).sorted,
      rnd.shuffle(0 to 60).take(rnd.nextInt(30) + 1).sorted))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      call_function("sorted_intersect_count", col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0L)
  }

  test("gram_hashes via SQL: positional (unsorted, dups kept), n=1 = unigram ids, nulls skipped") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT gram_hashes(array('a','b','a','b'), 2) AS g2, " +
        "gram_hashes(array('a','b'), 3) AS short, " +
        "gram_hashes(array('a', CAST(NULL AS STRING), 'b'), 1) AS g1, " +
        "shingle_hashes(array('a','b'), 1) AS ref1").collect().head
    val g2 = r.getSeq[Long](0)
    assert(g2.size == 3 && g2(0) == g2(2), "repeated window must repeat its hash positionally")
    assert(r.getSeq[Long](1).isEmpty)
    assert(r.getSeq[Long](2).toSet == r.getSeq[Long](3).toSet,
      "n=1 must yield the same word ids as the unigram shingle build")
  }

  test("shingle_hashes: sorted distinct ids, short arrays empty, dups collapse") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT shingle_hashes(array('a','b','c','d'), 3) AS s3, " +
        "shingle_hashes(array('a','b'), 3) AS short, " +
        "shingle_hashes(array('a','b','a','b','a','b'), 2) AS dups").collect().head
    assert(r.getSeq[Long](0).length == 2) // (a,b,c), (b,c,d)
    assert(r.getSeq[Long](0) == r.getSeq[Long](0).sorted)
    assert(r.getSeq[Long](1).isEmpty)
    assert(r.getSeq[Long](2).length == 2) // {ab, ba}
  }

  test("word_ngrams: position order, multiplicity kept, HOF-equivalent, null/short edges") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT word_ngrams(array('a','b','c','d'), 3) AS g3, " +
        "word_ngrams(array('a','b'), 3) AS short, " +
        "word_ngrams(array('x','y','x','y'), 2) AS dups, " +
        "word_ngrams(array('a', CAST(NULL AS STRING), 'b'), 2) AS withnull").collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d")) // position order
    assert(r.getSeq[String](1).isEmpty)
    assert(r.getSeq[String](2) == Seq("x y", "y x", "x y")) // multiplicity kept
    assert(r.getSeq[String](3) == Seq("a b")) // nulls skipped, not NPE'd
    // value-identical to the interpreted HOF formulation it replaces
    val eq = spark.sql(
      "SELECT word_ngrams(w, 5) = transform(sequence(0, greatest(size(w) - 5, -1)), " +
        "i -> array_join(slice(w, i + 1, 5), ' ')) AS same " +
        "FROM (SELECT split(text, ' ') AS w FROM parquet.`/root/testdata/sf0.001/documents.parquet` " +
        "WHERE size(split(text, ' ')) >= 5)")
      .collect()
    assert(eq.nonEmpty && eq.forall(_.getBoolean(0)))
  }

  test("shingle_hashes: null elements are skipped, not NPEs (ADVICE r2)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT shingle_hashes(array('a', CAST(NULL AS STRING), 'b'), 1) AS s1, " +
        "shingle_hashes(array('a', 'b', 'c'), 1) AS ref, " +
        "shingle_hashes(array('a', CAST(NULL AS STRING), 'b'), 3) AS s3").collect().head
    // nulls shingle as if absent: ('a', NULL, 'b') @ n=1 == tokens {a, b}
    assert(r.getSeq[Long](0).length == 2)
    assert(r.getSeq[Long](0).toSet.subsetOf(r.getSeq[Long](1).toSet))
    // only 2 non-null words < n=3 -> no shingles
    assert(r.getSeq[Long](2).isEmpty)
  }

  test("shingle_hashes: non-literal or non-integral n fails with a clear error (ADVICE r2)") {
    GraftFunctions.register(spark)
    val nonLiteral = intercept[Exception] {
      // rand() is non-foldable; foldable EXPRESSIONS like length('xy')
      // are fine — the gate is constant-ness, not literal syntax
      spark.sql("SELECT shingle_hashes(array('a','b'), CAST(rand()*2 AS INT)) AS s").collect()
    }
    assert(nonLiteral.getMessage.contains("literal constant"),
      s"wanted the registration-time message, got: ${nonLiteral.getMessage}")
    // BIGINT literals within Int range are accepted (auto-widened ints)
    val ok = spark.sql("SELECT shingle_hashes(array('a','b'), CAST(2 AS BIGINT)) AS s")
      .collect().head
    assert(ok.getSeq[Long](0).length == 1)
    val nullN = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(array('a','b'), CAST(NULL AS INT)) AS s").collect()
    }
    assert(nullN.getMessage.contains("positive integer literal"),
      s"wanted the registration-time message, got: ${nullN.getMessage}")
  }

  test("shingle_stats: multiset n-gram counts match a brute-force build") {
    GraftFunctions.register(spark)
    // "a b a b c a b" 2-grams: [ab, ba, ab, bc, ca, ab] -> total 6,
    // distinct 4, max count 3 (ab); 3-grams: [aba, bab, abc, bca, cab]
    // -> total 5, distinct 5, max 1
    val r = spark.sql(
      "SELECT shingle_stats(array('a','b','a','b','c','a','b'), 2) AS s2, " +
        "shingle_stats(array('a','b','a','b','c','a','b'), 3) AS s3, " +
        "shingle_stats(array('a'), 2) AS short, " +
        "shingle_stats(array('a', CAST(NULL AS STRING), 'b'), 2) AS withnull").collect().head
    assert(r.getStruct(0).toSeq == Seq(6L, 4L, 3L))
    assert(r.getStruct(1).toSeq == Seq(5L, 5L, 1L))
    assert(r.getStruct(2).toSeq == Seq(0L, 0L, 0L))
    // null word skipped -> ('a','b') -> one 2-gram
    assert(r.getStruct(3).toSeq == Seq(1L, 1L, 1L))
  }

  test("shingle_stats: n_grams/n_distinct agree with shingle_hashes' deduped output") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT shingle_stats(w, 3) AS st, size(shingle_hashes(w, 3)) AS nh FROM (" +
        "SELECT split('the quick brown fox the quick brown dog the quick', ' ') AS w)").collect()
    val st = rows.head.getStruct(0)
    assert(st.getLong(1) == rows.head.getInt(1).toLong,
      "n_distinct must equal the deduped kernel's array size")
    assert(st.getLong(0) >= st.getLong(1) && st.getLong(2) >= 1L)
  }

  test("shingle_hashes: zero/negative n fails for EVERY integral type (ADVICE r3)") {
    GraftFunctions.register(spark)
    // the INT branch used to skip the >= 1 guard the BIGINT branch had,
    // so shingle_hashes(arr, 0) silently returned a bogus 1-element array
    for (lit <- Seq("0", "-1", "CAST(0 AS BIGINT)", "CAST(0 AS SMALLINT)", "CAST(-2 AS TINYINT)")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT shingle_hashes(array('a','b'), $lit) AS s").collect()
      }
      assert(e.getMessage.contains("positive integer literal"),
        s"n=$lit must be rejected with the standard message, got: ${e.getMessage}")
    }
  }

  test("shingle_hashes(words, 1) is value-identical to the xxhash64 HOF token build") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val texts = Seq.fill(200)(Seq.fill(rnd.nextInt(15) + 1)(s"t${rnd.nextInt(9)}").mkString(" ")) :+ ""
    val diff = texts.toDF("text").select(
      call_function("shingle_hashes", split(col("text"), " "), lit(1)).as("fast"),
      sort_array(array_distinct(transform(split(col("text"), " "), t => xxhash64(t)))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0L) // token ids must not change — sketch outputs depend on them
  }

  test("shingle_hashes set sizes match the string-shingle formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val texts = Seq.fill(100)(Seq.fill(rnd.nextInt(12) + 1)(s"w${rnd.nextInt(6)}").mkString(" "))
    val diff = texts.toDF("text").select(
      size(call_function("shingle_hashes", split(col("text"), " "), lit(3))).as("fast"),
      size(array_distinct(expr(
        "CASE WHEN size(split(text, ' ')) >= 3 THEN transform(sequence(1, size(split(text, ' ')) - 2), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) ELSE array() END"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0L)
  }

  test("prefix_intersect_count matches the slice + sorted_intersect_count form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300) {
      val a = rnd.shuffle((0L to 50L).toVector).take(rnd.nextInt(20) + 1).sorted
      val b = rnd.shuffle((0L to 50L).toVector).take(rnd.nextInt(20) + 1).sorted
      (a, rnd.nextInt(a.length + 2), b, rnd.nextInt(b.length + 2)) // lens may exceed size
    }
    val diff = rows.toDF("a", "alen", "b", "blen").select(
      call_function("prefix_intersect_count", col("a"), col("alen"), col("b"), col("blen")).as("fast"),
      call_function("sorted_intersect_count",
        slice(col("a"), lit(1), col("alen")), slice(col("b"), lit(1), col("blen"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0L)
  }

  test("morton_interleave: matches the 32-term expression-tree reference; masks beyond 16 bits") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // kernel unit cases
    assert(graft.functions.MortonInterleave.compute(0L, 0L) == 0L)
    assert(graft.functions.MortonInterleave.compute(0xFFFFL, 0L) == 0x55555555L)
    assert(graft.functions.MortonInterleave.compute(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(graft.functions.MortonInterleave.compute(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // x bit0 -> position 0 (1), y bit1 -> position 3 (8)
    assert(graft.functions.MortonInterleave.compute(1L, 2L) == 9L)
    // codegen path vs the independent expression tree, high bits masked
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    val diff = rows.toDF("gx", "gy").select(
      expr("morton_interleave(gx & 65535, gy & 65535)").as("fast"),
      graft.ops.Storage.interleave16Ref(col("gx"), col("gy")).as("ref"),
      expr("morton_interleave(gx, gy)").as("masked"))
      .filter(col("fast") =!= col("ref") || col("masked") =!= col("ref")).count()
    assert(diff == 0L)
  }

  test("GraftExtensions injects the function at session build time") {
    // the running shared session wasn't built with the extension; verify
    // the injector wires the same builder without error
    val e = new graft.functions.GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    e.apply(exts) // no exception = registration contract holds
  }
}
