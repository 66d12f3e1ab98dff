package graft

import java.sql.Timestamp
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, sha2, sum}

/** Real streaming-execution specs: MemoryStream micro-batches through
  * the session-window and stateful forward-fill ops, and a file-source
  * AvailableNow drain with checkpoint.
  */
class StreamingSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("drainToParquet: AvailableNow drains everything then stops") {
    val src = tmpDir(); val out = tmpDir(); val cp = tmpDir()
    writeEvents(src,
      (1L, 1704067200L * Ns, 1L, "click", 1.0, "{}"),
      (2L, 1704067201L * Ns, 2L, "view", 2.0, "{}"))
    val q = StreamingOps.drainToParquet(spark, s"$src/events.parquet",
      Tables.eventsRawSchema, s"$out/bronze", s"$cp/cp")
    q.awaitTermination(60000)
    assert(!q.isActive) // AvailableNow terminates after the drain
    assert(spark.read.parquet(s"$out/bronze").count() == 2)
  }

  test("streaming sessionize: gap windows close and emit past the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.sessionize(ms.toDF(), "30 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    // user 1: two events 10 min apart (one session), then 2h later another
    ms.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0),
      Ev(3, ts("2024-01-01 12:00:00"), 1, "click", 3.0))
    q.processAllAvailable()
    // sentinel far in the future pushes the watermark past every session
    ms.addData(Ev(99, ts("2024-02-01 00:00:00"), 2, "click", 0.0))
    q.processAllAvailable()
    val got = spark.table("sessions")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((1L, 2L), (1L, 1L)))
  }

  test("prepStream: stateless corpus prep emits chunks identical to the batch path") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, (0 until 20).map(i => s"w$i").mkString(" ")),
      (2L, "short doc"), // < 10 tokens -> gated in both paths
      (3L, "email user@x.com then " + (0 until 12).map(i => s"z$i").mkString(" ")))
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.prepStream(ms.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("prep").outputMode("append").start()
    ms.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("prep").collect().map(_.toString).sorted.toSeq
    q.stop()
    val batch = StreamingOps.prepStream(rows.toDF("doc_id", "text"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch divergence:\n$streamed\nvs\n$batch")
    assert(streamed.exists(_.contains("<EMAIL>")), "scrub must run in the stream")
    assert(!streamed.exists(_.contains("short doc")), "length gate must run in the stream")
  }

  test("prepStreamV2: scrub → gate → dedup → chunk + BPE price matches the batch stages on the drain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 00:0$m:00")
    val long1 = (0 until 20).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, long1, t0),
      (2L, "short doc", t0), // < 10 tokens -> gated in both paths
      (3L, "email a@b.com " + (0 until 12).map(i => s"z$i").mkString(" "), ts(1)),
      (4L, long1, ts(2))) // exact dup of doc 1 -> dedup drops it in-stream
    // frozen batch-trained merge table (the production shape: the
    // tokenizer model is fit offline on a corpus snapshot, then every
    // streamed doc is priced with it on ingest)
    val merges = graft.ops.TrainingData.trainedBpeMerges(spark, "/root/testdata/sf0.001")
    assert(merges.size == graft.ops.TrainingData.BpeMergeCount)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.prepStreamV2(
        ms.toDS().toDF("doc_id", "text", "ts"), "10 minutes", merges)
      .writeStream.format("memory").queryName("prep2").outputMode("append").start()
    ms.addData(rows.take(3): _*)
    q.processAllAvailable()
    ms.addData(rows.drop(3): _*) // dup arrives in a LATER micro-batch
    q.processAllAvailable()
    val streamed = spark.table("prep2").collect().map(_.toString).sorted.toSeq
    q.stop()
    // batch leg: the same stage objects minus the streaming dedup —
    // first-wins on the digest replaces the state store
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("clean_text"), 256)).orderBy("doc_id")
    val batch = graft.ops.TrainingData.chunkTokens(
        graft.ops.CorpusPrep.scrubAndGate(rows.toDF("doc_id", "text", "ts"))
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rn") === 1),
        graft.ops.CorpusPrep.ChunkWindow, graft.ops.CorpusPrep.ChunkStride)
      .withColumn("bpe_tokens", graft.ops.TrainingData.bpeTokenCount(col("chunk_text"), merges))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch divergence:\n$streamed\nvs\n$batch")
    assert(streamed.exists(_.contains("<EMAIL>")), "scrub must run in the stream")
    assert(!streamed.exists(_.contains("w19 w19")), "sanity")
    assert(!spark.table("prep2").collect().map(_.getLong(0)).contains(4L),
      "the cross-micro-batch exact dup must be dropped by the stream state")
  }

  test("dsirScoreStream: frozen batch model scores the stream bit-identical to q114") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val model = graft.ops.TrainingData.dsirBucketLogRatios(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.dsirScoreStream(ms.toDS().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("dsir").outputMode("append").start()
    ms.addData(rows.take(250).toSeq: _*)
    q.processAllAvailable()
    ms.addData(rows.drop(250).toSeq: _*) // second micro-batch, same frozen model
    q.processAllAvailable()
    val streamed = spark.table("dsir").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    val batch = graft.ops.TrainingData.q114DsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "stream weights diverge from batch q114")
  }

  test("dsirScoreStream: uncovered model buckets drop out — no NULL-poisoned weights") {
    // the frozen model is fit on a SNAPSHOT: a stream doc can hit a
    // bucket the snapshot never populated. Such bigrams must drop out
    // (batch q114's inner-join semantics: excluded from the mean AND
    // from n_bigrams), not NULL-poison the whole doc's weight.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // md5("xx yy").take(2) = "6e", md5("yy zz").take(2) = "01" — the
    // model below covers ONLY "yy zz"'s bucket
    val model = Map("01" -> 0.5)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.dsirScoreStream(ms.toDS().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("dsir_part").outputMode("append").start()
    ms.addData((1L, "xx yy zz"), (2L, "xx yy"))
    q.processAllAvailable()
    val out = spark.table("dsir_part").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    // doc 1: bigram "xx yy" uncovered → only "yy zz" scores (n=1, 0.5);
    // doc 2: its ONLY bigram is uncovered → no covered bigrams → absent
    assert(out == Set((1L, 1L, 0.5)), s"got $out")
  }

  test("nearDupAdmitStream: index near-dups rejected across micro-batches, q100-parity on the drain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val idxText1 = (0 until 10).map(i => s"a$i").mkString(" ")
    val idxText2 = (0 until 10).map(i => s"p$i").mkString(" ")
    val batchDocs = Seq(
      10L -> idxText1, // exact dup of the 2-doc index group -> 2 partners
      11L -> (idxText2 + " extra"), // J = 10/11 vs idxText2 -> 1 partner
      12L -> (0 until 10).map(i => s"z$i").mkString(" "), // clean -> admitted
      13L -> idxText1) // second micro-batch: still rejected vs the static index
    // the fixture dir holds index AND batch docs so the batch q100 can
    // run the exact cascade over the same input the stream drains
    writeDocuments(dir,
      Seq((1L, idxText1, "en", "src0", 1L), (2L, idxText1, "en", "src1", 1L),
        (3L, idxText2, "en", "src0", 1L)) ++
        batchDocs.map { case (d, t) => (d, t, "en", "new0", 1L) }: _*)
    val sigs = graft.ops.Sketches.indexSignatures(spark, dir)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.nearDupAdmitStream(ms.toDS().toDF("doc_id", "text"), sigs)
      .writeStream.format("memory").queryName("admit").outputMode("append").start()
    ms.addData(batchDocs.take(3): _*)
    q.processAllAvailable()
    val afterBatch1 = spark.table("admit").select("doc_id").collect().map(_.getLong(0)).toSet
    ms.addData(batchDocs.drop(3): _*)
    q.processAllAvailable()
    val evidence = spark.table("admit").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq // (doc_id, idx_docs)
    q.stop()
    assert(afterBatch1 == Set(10L, 11L), "doc 13 must not be rejected before its batch arrives")
    val streamPartners = evidence.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val q100 = graft.ops.Similarity.q100IncrementalNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // exact parity on this fixture: every qualifying pair collides in
    // some band (exact dups always do; the J=10/11 pair measurably
    // does) — in general LSH recall < 1 is the documented trade
    assert(streamPartners == q100, s"stream $streamPartners vs batch $q100")
    assert(q100 == Map(10L -> 2L, 11L -> 1L, 13L -> 2L))
    // the scaladoc's persistence claim, checked: the index is all longs
    // and long arrays, so probing a parquet round trip of it is
    // row-identical to probing the in-memory build
    val sigsDir = tmpDir()
    sigs.write.mode("overwrite").parquet(s"$sigsDir/sigs.parquet")
    val sigsBack = spark.read.parquet(s"$sigsDir/sigs.parquet")
    val viaParquet = StreamingOps
      .nearDupAdmitStream(batchDocs.toDF("doc_id", "text"), sigsBack)
      .collect().map(_.toString).sorted.toSeq
    val viaMemory = StreamingOps
      .nearDupAdmitStream(batchDocs.toDF("doc_id", "text"), sigs)
      .collect().map(_.toString).sorted.toSeq
    assert(viaParquet.nonEmpty && viaParquet == viaMemory)
  }

  test("streamToJdbc: micro-batched idempotent upsert into Derby, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val url = s"jdbc:derby:${tmpDir()}/streamdb;create=true"
    val ddl = java.sql.DriverManager.getConnection(url)
    ddl.createStatement().execute("CREATE TABLE sink_t (user_id BIGINT, name VARCHAR(50))")
    ddl.close()
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "a"), (2L, "b"))
    val cp = tmpDir()
    val q1 = StreamingOps.streamToJdbc(ms.toDF().toDF("user_id", "name"), url, "sink_t", "user_id", s"$cp/cp")
    q1.awaitTermination(60000)
    // second drain: one overlapping key (replay analogue) + one new
    ms.addData((2L, "b-replayed"), (3L, "c"))
    val q2 = StreamingOps.streamToJdbc(ms.toDF().toDF("user_id", "name"), url, "sink_t", "user_id", s"$cp/cp")
    q2.awaitTermination(60000)
    val back = spark.read.jdbc(url, "sink_t", new java.util.Properties)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(1L -> "a", 2L -> "b", 3L -> "c"), s"got $back")
  }

  test("streaming dedup: duplicate content collapses within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    case class Doc(ts: Timestamp, doc_id: Long, text: String)
    val ms = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingOps.dedupStream(
        ms.toDF().toDF("ts", "doc_id", "text"), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    ms.addData(
      (ts("2024-01-01 10:00:00"), 1L, "same text"),
      (ts("2024-01-01 10:05:00"), 2L, "same text"), // dup within batch
      (ts("2024-01-01 10:10:00"), 3L, "other text"))
    q.processAllAvailable()
    ms.addData((ts("2024-01-01 10:20:00"), 4L, "same text")) // redelivery, later batch
    q.processAllAvailable()
    val got = spark.table("dedup").select("doc_id").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(1L, 3L), s"got $got")
  }

  test("streaming funnel: stages advance across micro-batches, within 1h steps only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.funnelStream(ms.toDS())
      .toDF("user_id", "t_view", "t_click", "t_purchase", "stage")
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    // batch 1: user 1 views; user 2 views then clicks 2h later (too late)
    ms.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, ts("2024-01-01 10:00:00"), 2, "view", 0.0),
      Ev(3, ts("2024-01-01 12:30:00"), 2, "click", 0.0))
    q.processAllAvailable()
    // batch 2: user 1 clicks in-window, then purchases in-window
    ms.addData(
      Ev(4, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
      Ev(5, ts("2024-01-01 10:45:00"), 1, "purchase", 0.0))
    q.processAllAvailable()
    val rows = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getInt(4))).toSeq
    q.stop()
    // user 1: stage-1 emit (batch 1), stage-3 emit (batch 2 — click and
    // purchase fold in one batch); user 2: stage-1 only, late click ignored
    assert(rows.count(_ == (1L, 1)) == 1 && rows.count(_ == (1L, 3)) == 1,
      s"user 1 emissions wrong: ${rows.filter(_._1 == 1L)}")
    assert(rows.filter(_._1 == 2L) == Seq((2L, 1)), s"user 2: ${rows.filter(_._1 == 2L)}")
  }

  test("streaming forward-fill: state carries across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.forwardFillStream(ms.toDS())
      .toDF("event_id", "user_id", "value_ff")
      .writeStream.format("memory").queryName("ff").outputMode("append").start()
    ms.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 9.0), // before any purchase
      Ev(2, ts("2024-01-01 10:01:00"), 1, "purchase", 5.0),
      Ev(3, ts("2024-01-01 10:02:00"), 1, "click", 9.0))
    q.processAllAvailable()
    ms.addData( // second batch: state must remember 5.0
      Ev(4, ts("2024-01-01 10:03:00"), 1, "view", 9.0),
      Ev(5, ts("2024-01-01 10:04:00"), 1, "purchase", 7.0),
      Ev(6, ts("2024-01-01 10:05:00"), 1, "view", 9.0))
    q.processAllAvailable()
    val got = spark.table("ff").collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    q.stop()
    assert(got(1L).isEmpty)
    assert(got(3L).contains(5.0))
    assert(got(4L).contains(5.0)) // carried across the batch boundary
    assert(got(6L).contains(7.0))
  }

  test("stream-stream interval join: purchases match clicks within the window only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingOps.intervalJoinStream(
        clicks.toDF(), purchases.toDF(), "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    clicks.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
      Ev(2, ts("2024-01-01 10:00:00"), 2, "click", 0.0))
    purchases.addData(
      Ev(10, ts("2024-01-01 10:05:00"), 1, "purchase", 5.0), // in window, user 1
      Ev(11, ts("2024-01-01 10:20:00"), 1, "purchase", 7.0), // outside window
      Ev(12, ts("2024-01-01 10:03:00"), 3, "purchase", 9.0)) // other user
    q.processAllAvailable()
    val got = spark.table("ssjoin").select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((1L, 10L)), s"got $got")
  }

  test("stream-static join: events enrich from the dim table, no state store") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamingOps.streamStaticJoin(ms.toDF(), dim, "user_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("ssdim").outputMode("append").start()
    ms.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
      Ev(2, ts("2024-01-01 10:00:01"), 2, "click", 0.0),
      Ev(3, ts("2024-01-01 10:00:02"), 9, "click", 0.0)) // no dim row → dropped
    q.processAllAvailable()
    val got = spark.table("ssdim").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "gold"), (2L, "basic")), s"got $got")
    // inner stream-static join keeps no watermark state: progress
    // reports zero state rows
    val state = q.lastProgress.stateOperators
    assert(state == null || state.isEmpty || state.forall(_.numRowsTotal == 0),
      s"unexpected state store rows: $state")
    q.stop()
  }

  test("streaming tumbling agg: windows emit past the watermark, state dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.tumblingAgg(ms.toDF(), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("tumbling").outputMode("append").start()
    ms.addData(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:55:00"), 2, "click", 2.0),
      Ev(3, ts("2024-01-01 11:05:00"), 1, "view", 4.0))
    q.processAllAvailable()
    ms.addData(Ev(99, ts("2024-02-01 00:00:00"), 3, "click", 0.0)) // watermark push
    q.processAllAvailable()
    val got = spark.table("tumbling")
      .select("window_start", "event_type", "n_events", "sum_value").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    assert(got.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(got.contains(("2024-01-01 11:00:00.0", "view", 1L, 4.0)))
  }

  test("qualityGateStream: lang-ID, entropy gate, calibrated keep are bit-identical to batch q119/q127/q128") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // frozen batch-fit calibration snapshot (the dsir model discipline)
    val thresholds = graft.ops.TrainingData.sourceKeepThresholds(spark, sf)
    assert(thresholds.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingOps.qualityGateStream(
        ms.toDS().toDF("doc_id", "text", "source"), thresholds)
      .writeStream.format("memory").queryName("qgate").outputMode("append").start()
    ms.addData(docs: _*)
    q.processAllAvailable()
    val streamed = spark.table("qgate")
      .select("doc_id", "lang_pred", "token_entropy", "low_entropy", "cal_keep", "calibrated")
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    q.stop()
    // every source was in the snapshot, so every doc is calibrated
    assert(streamed.size == docs.size && streamed.values.forall(_._5 == 1L))
    val q119 = graft.ops.TrainingData.q119LangTrigram(spark, sf)
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q127 = graft.ops.TrainingData.q127EntropyGate(spark, sf)
      .select("doc_id", "token_entropy", "low_entropy").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val q128 = graft.ops.TrainingData.q128SourceCalibration(spark, sf)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diverging = streamed.collect {
      case (id, (lang, ent, low, keep, _))
          if lang != q119(id) || (ent, low) != q127(id) || keep != q128(id) =>
        (id, (lang, ent, low, keep), (q119(id), q127(id), q128(id)))
    }
    assert(diverging.isEmpty, s"stream/batch gate divergence: ${diverging.take(5)}")
  }

  test("attributionStream: touch state carries across micro-batches; aggregate equals batch q181") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // split on global time order: purchases in batch 2 whose last touch
    // landed in batch 1 attribute correctly ONLY if state carries
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.attributionStream(ms.toDS())
      .toDF("user_id", "purchase_event_id", "attributed_type", "value")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("attr").groupBy("attributed_type")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        graft.ops.Det.dsum4(col("value")).as("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    q.stop()
    val batch = graft.ops.Events.q181PurchaseAttribution(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed == batch, s"stream/batch attribution divergence: $streamed vs $batch")
  }

  test("cooccurrenceStream: each (user, pair) discovered once across batches; counts equal batch q186") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.cooccurrenceStream(ms.toDS())
      .toDF("user_id", "type_a", "type_b")
      .writeStream.format("memory").queryName("cooc").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("cooc").groupBy("type_a", "type_b").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()
    val batch = graft.ops.Events.q186CooccurrenceLift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(streamed == batch, s"stream/batch co-occurrence divergence: " +
      s"${(streamed.toSet diff batch.toSet).take(5)} / ${(batch.toSet diff streamed.toSet).take(5)}")
  }

  test("merkleStream: incremental bucket manifest converges to batch q178 across a two-batch drain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect()
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.merkleStream(ms.toDS())
      .toDF("bucket", "n_rows", "checksum")
      .writeStream.format("memory").queryName("merkle").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    // n_rows grows monotonically per bucket, so the max-n row IS the
    // final state of each bucket
    val streamed = spark.table("merkle").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (b, rows) => b -> rows.map(_._2).maxBy(_._1) }
    q.stop()
    val batch = graft.ops.Audit.q178MerkleManifest(spark, sf).collect()
      .filter(_.getString(0) == "events")
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(streamed == batch,
      s"stream/batch merkle divergence: ${(streamed.toSet diff batch.toSet).take(5)}")
  }

  test("disorderStream: running max carries across micro-batches; aggregate equals batch q179") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val S = Ns
    val T0 = 1704067200L * Ns
    // disordered type-a sequence; the seam after id 3 forces the
    // running max (200s, set in batch 1) to survive into batch 2
    writeEvents(dir,
      (1L, T0 + 100 * S, 1L, "a", 0.0, "{}"),
      (2L, T0 + 50 * S, 1L, "a", 0.0, "{}"),
      (3L, T0 + 200 * S, 1L, "a", 0.0, "{}"),
      (4L, T0 + 190 * S, 1L, "a", 0.0, "{}"),
      (5L, T0 + 300 * S, 1L, "a", 0.0, "{}"),
      (6L, T0 + 20 * S, 1L, "a", 0.0, "{}"),
      (7L, T0, 2L, "b", 0.0, "{}"))
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(_.event_id)
    val (b1, b2) = evs.splitAt(3)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.disorderStream(ms.toDS())
      .toDF("event_type", "event_id", "late_us")
      .writeStream.format("memory").queryName("disorder").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("disorder")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum((col("late_us") > 0L).cast("long")).as("n_late"),
        max("late_us").as("max_late_us"),
        sum((col("late_us") > 60000000L).cast("long")).as("n_late_over_1m"),
        sum((col("late_us") > 3600000000L).cast("long")).as("n_late_over_1h"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    q.stop()
    // the seam case directly: id 4 is 10s behind batch-1's max
    val perEvent = spark.table("disorder").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(perEvent(4L) == 10L * 1000000, perEvent)
    assert(perEvent(6L) == 280L * 1000000, perEvent)
    val batch = graft.ops.Events.q179DisorderAudit(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(streamed == batch, s"stream/batch disorder divergence: $streamed vs $batch")
  }

  test("cascadeIngestStream: a 3-batch drain ends at the batch cascade; a replayed batch folds in empty; state resumes from disk") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val bytes = graft.ops.Similarity.documentsSizeBytes(spark, sf)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val stateDir = tmpDir()
    val state = new StreamingOps.CascadeIngestState(spark, stateDir, 4, 5, bytes)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.cascadeIngestStream(
      ms.toDS().toDF("doc_id", "text"), state, tmpDir())
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    def labelRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val drained = labelRows(state.labels.get)
    // merged-from-empty streaming state ≡ the cold batch cascade
    assert(drained.nonEmpty &&
      drained == labelRows(graft.ops.Similarity.q62DedupClusters(spark, sf)))
    def pairRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.select("ga", "gb", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val streamedPairs = pairRows(state.pairs.get)
    val coldPairs = pairRows(graft.ops.Similarity.setPairsAbove(
      graft.ops.Similarity.tokenSetGroupsBy(
        graft.ops.Similarity.docTokenSets(spark, sf)), 4, 5, bytes))
    assert(streamedPairs.nonEmpty && streamedPairs == coldPairs)
    // at-least-once delivery: replay a whole earlier batch — the
    // anti-join guard folds it in as an empty delta
    ms.addData(batches(1): _*); q.processAllAvailable()
    q.stop()
    assert(labelRows(state.labels.get) == drained)
    // restart: a fresh state over the same dir resumes the newest epoch
    val resumed = new StreamingOps.CascadeIngestState(spark, stateDir, 4, 5, bytes)
    assert(labelRows(resumed.labels.get) == drained)
  }

  test("postingStream: open-block state carries across the seam; last emission per block equals batch q192") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    // 130 docs sharing term x (doc 1: tf 2 + term y): block 0 fills
    // across the seam, block 1 opens in batch 2
    val rows = (1L to 130L).map(i => (i, if (i == 1L) "x x y" else "x"))
    writeDocuments(dir, rows.map { case (i, t) => (i, t, "en", "s", 1L) }: _*)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.postingStream(StreamingOps.postingFeed(
        ms.toDS().toDF("doc_id", "text")))
      .toDF("term", "block_id", "n_postings", "min_doc_id", "max_doc_id", "sum_tf")
      .writeStream.format("memory").queryName("postings").outputMode("append").start()
    val (b1, b2) = rows.splitAt(100)
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    val emissions = spark.table("postings").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    q.stop()
    // the seam case directly: x/block-0 emitted partial (100 postings,
    // batch 1) then final (128, batch 2) — the state genuinely carried
    val xb0 = emissions.filter(_._1 == (("x", 0L))).map(_._2._1).sorted.toSeq
    assert(xb0 == Seq(100L, 128L), emissions.toSeq)
    // n_postings grows monotonically per block: max-n emission is final
    val streamed = emissions.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    val batch = graft.ops.TextOps.q192PostingBlocks(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(streamed == batch,
      s"stream/batch posting divergence: ${(streamed.toSet diff batch.toSet).take(5)}")
    // df is derivable from the newest block alone: 1*128 + 2 = 130
    val (maxBlock, (bn, _, _, _)) = streamed.filter(_._1._1 == "x").maxBy(_._1._2)
    assert(maxBlock._2 * 128 + bn == 130L)
  }

  test("rollingActivesStream: grid days close on later arrival across a mid-day seam; rows equal batch q239 minus the open tail") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    val Day = 24 * Hour
    // users 1-3 on day 0; user 1 repeats twice on day 1 (distinct per
    // day); days 2-3 SILENT (grid zero-fill: dau 0, wau carries the
    // earlier days); user 4 on day 4; day 8 far enough that days 5-7
    // zero-fill and day 4 leaves the window reach mid-gap; day 9 only
    // closes day 8 (and stays open itself)
    val rows = Seq(
      (1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 3L),
      (4L, 1L, 1L), (5L, 1L, 1L), (6L, 1L, 2L),
      (7L, 4L, 4L),
      (8L, 8L, 5L), (9L, 8L, 1L),
      (10L, 9L, 6L)
    ).map { case (id, day, uid) => (id, T0 + day * Day + id * Hour % Day, uid, "click", 1.0, "{}") }
    writeEvents(dir, rows: _*)
    val all = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.event_id)
    // seam splits day 1 mid-day (ids 1-4 | 5-10): day 1's dau must
    // still read 2 when it closes in batch 2
    val (b1, b2) = all.partition(_.event_id <= 4L)
    val ms = MemoryStream[Ev]
    val q = StreamingOps.rollingActivesStream(ms.toDS())
      .toDF("day", "dau", "wau_7d")
      .writeStream.format("memory").queryName("ractives").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("ractives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val batch = graft.ops.Events.q239RollingActives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lastDay = batch.map(_._1).max
    val expected = batch.filter(_._1 < lastDay).toSet
    assert(streamed == expected, s"stream/batch rolling-actives divergence: $streamed vs $expected")
    // the zero-fill rows really carry window mass: day 2 has dau 0 yet
    // wau 3 (users 1-3 from days 0-1 are within [d-6, d])
    val d0 = T0 / Ns / 86400
    assert(streamed.contains((d0 + 2, 0L, 3L)), s"silent grid day must zero-fill dau and keep wau: $streamed")
    // day 8's window reaches back only to day 2: users 5 and 1 (day 8)
    assert(streamed.contains((d0 + 8, 2L, 3L)), s"window must include day 4's user while in reach: $streamed")
  }

  test("rollingActivesStream ≡ batch q239 on randomized streams with randomized seams (seeded)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic PRNG — parity must hold for EVERY in-contract
    // arrival order: events sorted by ts split at RANDOM seam points
    // (a ts-sorted split is always in contract: no later day precedes
    // a still-open one), random gaps, random repeat activity
    val rnd = new scala.util.Random(20260815L)
    val T0 = 1704067200L * Ns
    val Day = 24 * Hour
    (1 to 3).foreach { trial =>
      val dir = tmpDir()
      val nEvents = 25 + rnd.nextInt(40)
      val rows = (1 to nEvents).map { i =>
        val day = rnd.nextInt(15).toLong
        val user = (1 + rnd.nextInt(12)).toLong
        (i.toLong, T0 + day * Day + i * Ns, user, "click", 1.0, "{}")
      }
      writeEvents(dir, rows: _*)
      val all = Tables.events(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
      // 1-3 random seam points → 2-4 contiguous ts-ordered batches
      val cuts = (1 to 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(all.length)).sorted.distinct
      val batches = (Seq(0) ++ cuts ++ Seq(all.length)).sliding(2)
        .map { case Seq(a, b) => all.slice(a, b) }.filter(_.nonEmpty).toSeq
      val ms = MemoryStream[Ev]
      val q = StreamingOps.rollingActivesStream(ms.toDS())
        .toDF("day", "dau", "wau_7d")
        .writeStream.format("memory").queryName(s"ractrnd$trial").outputMode("append").start()
      batches.foreach { b => ms.addData(b.toSeq: _*); q.processAllAvailable() }
      val streamed = spark.table(s"ractrnd$trial").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      q.stop()
      val batch = graft.ops.Events.q239RollingActives(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val lastDay = batch.map(_._1).max
      val expected = batch.filter(_._1 < lastDay).toSet
      assert(streamed == expected,
        s"trial $trial (n=$nEvents, seams=${cuts.mkString(",")}): $streamed vs $expected")
    }
  }

  test("cusumStream: days close on successor arrival across a mid-day seam; rows equal batch q196 minus each type's open tail") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    val Day = 24 * Hour
    // type a: 7 baseline days of 2 events (S0=14), then 4 days of 6
    // (t_up = 84-42 = 42 per day → cUp 42,84,126,168; alarm > 112 from
    // day 9). type b: only 3 active days → no baseline, no emission.
    // One NULL-user/NULL-value event on (still-open) day 8 — batch
    // q196 counts it (groups on type+day alone), so the stream must
    // too: that's why the carrier is (type, ts), not Ev. Day 8 then
    // carries 7 events → cUp 42, 98, 140 with the alarm at day 9.
    var id = 0L
    def evs(day: Long, n: Int, tpe: String): Seq[Row] =
      (0 until n).map { k => id += 1; Row(id, T0 + day * Day + k * Hour, 1L, tpe, 0.0, "{}") }
    val rows = (0L to 6L).flatMap(evs(_, 2, "a")) ++ (7L to 10L).flatMap(evs(_, 6, "a")) ++
      (0L to 2L).flatMap(evs(_, 1, "b")) :+
      Row(999L, T0 + 8 * Day + 23 * Hour, null, "a", null, "{}")
    write(dir, "events", df(Tables.eventsRawSchema, rows: _*))
    val all = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)].collect().sortBy(_._1)
    // seam splits day 8 (ids 21-26 + the null event) down the middle:
    // its count must still close as 7 when day 9 arrives in batch 2
    val (b1r, b2r) = all.partition(e => e._1 <= 23 || e._1 == 999L)
    val (b1, b2) = (b1r.map(e => (e._2, e._3)), b2r.map(e => (e._2, e._3)))
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingOps.cusumStream(ms.toDS())
      .toDF("event_type", "day", "n", "cusum_up", "cusum_dn", "shift_up", "shift_dn")
      .writeStream.format("memory").queryName("cusum").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("cusum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6))).toSet
    q.stop()
    val batch = graft.ops.Events.q196LevelShift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    // each type's LAST active day stays open on a bounded drain
    val lastDay = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filter(r => r._2 < lastDay(r._1)).toSet
    assert(streamed == expected, s"stream/batch CUSUM divergence: $streamed vs $expected")
    assert(streamed.exists(r => r._1 == "a" && r._2 == (T0 / Ns / 86400) + 9 && r._6),
      s"day-9 up-shift alarm missing: $streamed")
    assert(!streamed.exists(_._1 == "b"), "type b has no complete baseline")
  }

  test("spikeStream: trailing-24h baseline carries in state across a mid-hour seam; rows equal batch q183 minus each type's open tail") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    val Min = 60 * Ns
    // type a: 8 quiet hours of 2, a 30-event hour 8 (spike: 30·8 > 3·16),
    // then 2 quiet hours; type c: 7 hours then a 33h calendar gap — the
    // RANGE baseline must come back EMPTY at hour 40, not reach back
    var id = 0L
    def evs(hr: Long, n: Int, tpe: String): Seq[(Long, Long, Long, String, Double, String)] =
      (0 until n).map { k => id += 1; (id, T0 + hr * Hour + k * Min, 1L, tpe, 0.0, "{}") }
    // hour 41 exists so hour 40 CLOSES and its post-gap row is emitted
    val rows = (0L to 7L).flatMap(evs(_, 2, "a")) ++ evs(8L, 30, "a") ++
      (9L to 10L).flatMap(evs(_, 2, "a")) ++
      (0L to 6L).flatMap(evs(_, 1, "c")) ++ evs(40L, 3, "c") ++ evs(41L, 1, "c")
    writeEvents(dir, rows: _*)
    val all = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)].collect().sortBy(_._1)
    // seam splits hour 8 (ids 17-46) down the middle
    val (b1r, b2r) = all.partition(_._1 <= 30)
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingOps.spikeStream(ms.toDS())
      .toDF("event_type", "hr", "n", "baseline_sum", "baseline_hours", "spike")
      .writeStream.format("memory").queryName("spikes").outputMode("append").start()
    ms.addData(b1r.map(e => (e._2, e._3)).toSeq: _*); q.processAllAvailable()
    ms.addData(b2r.map(e => (e._2, e._3)).toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("spikes").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    q.stop()
    val batch = graft.ops.Events.q183TrafficSpikes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val lastHr = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filter(r => r._2 < lastHr(r._1)).toSet
    assert(streamed == expected, s"stream/batch spike divergence: $streamed vs $expected")
    val h0 = 1704067200L / 3600
    assert(streamed.exists(r => r._1 == "a" && r._2 == h0 + 8 && r._6),
      s"hour-8 spike missing: $streamed")
    assert(!streamed.exists(r => r._1 == "a" && r._2 != h0 + 8 && r._6),
      "no other hour may flag")
    // the 33h calendar gap: hour 40 closed with an EMPTY baseline (the
    // 24h trim dropped all of hours 0-6), so n=3 cannot flag
    assert(streamed(("c", h0 + 40, 3L, 0L, 0L, false)),
      s"post-gap hour must read an empty baseline: $streamed")
  }

  test("freshnessStream: final snapshot equals batch q171 EXACTLY under a seam with late cross-seam arrivals") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    // anchor = id3 at T0+26h. type a: fresh (lag 0), one event EXACTLY
    // at anchor−24h (boundary is inclusive in both engines); type b:
    // 2h lag → stale, and an event 25h old that must stay OUT of the
    // trailing window; a null-type event is its own audit row.
    val rows = Seq(
      (1L, T0, 1L, "a", 1.0, "{}"),
      (2L, T0 + 10 * Hour, 1L, "a", 1.0, "{}"),
      (3L, T0 + 26 * Hour, 1L, "a", 1.0, "{}"),
      (4L, T0 + 1 * Hour, 2L, "b", 1.0, "{}"),
      (5L, T0 + 24 * Hour, 2L, "b", 1.0, "{}"),
      (6L, T0 + 3 * Hour, 3L, null, 1.0, "{}"),
      (7L, T0 + 2 * Hour, 1L, "a", 1.0, "{}"))
    writeEvents(dir, rows: _*)
    val all = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)].collect().sortBy(_._1)
    // seam: ids 6 and 7 arrive in batch 2 BEHIND the anchor (id 3) —
    // late arrivals the commutative folds must absorb; the batch-2
    // anchor jump T0+10h → T0+26h also forces the window prune of
    // ids 1 and 4 out of state.
    val (b1r, b2r) = all.partition(e => e._1 <= 2 || e._1 == 4L)
    val ms = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingOps.freshnessStream(ms.toDS())
      .toDF("event_type", "n_events", "max_us", "lag_sec", "n_last_24h", "stale", "anchor_us")
      .writeStream.format("memory").queryName("fresh").outputMode("append").start()
    ms.addData(b1r.map(e => (e._2, e._3)).toSeq: _*); q.processAllAvailable()
    ms.addData(b2r.map(e => (e._2, e._3)).toSeq: _*); q.processAllAvailable()
    val drained = spark.table("fresh").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6)))
    q.stop()
    // both snapshots present with their own anchors (last-wins readout)
    assert(drained.map(_._7).distinct.sorted.toSeq ==
      Seq(T0 / 1000 + 10 * Hour / 1000, T0 / 1000 + 26 * Hour / 1000),
      s"expected one snapshot per micro-batch anchor: ${drained.toSeq}")
    val anchor = drained.map(_._7).max
    val streamed = drained.filter(_._7 == anchor).map(t => (t._1, t._2, t._3, t._4, t._5, t._6)).toSet
    val batch = graft.ops.Events.q171FreshnessAudit(spark, dir)
      .select(col("event_type"), col("n_events"), expr("unix_micros(max_ts)"),
        col("lag_sec"), col("n_last_24h"), col("stale")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(streamed == batch, s"stream/batch freshness divergence: $streamed vs $batch")
    // pinned semantics: boundary event counts (a: 3 of 4 in-window),
    // the 25h-old b event does not, b is stale, null type audited
    assert(streamed.exists(r => r._1 == "a" && r._2 == 4L && r._5 == 3L && !r._6))
    assert(streamed.exists(r => r._1 == "b" && r._2 == 2L && r._4 == 7200L && r._5 == 1L && r._6))
    assert(streamed.exists(r => r._1 == null && r._2 == 1L && r._5 == 1L && r._6))
  }

  test("keyCountStream: one maintained count feed reproduces batch q174 AND q182 exactly across a seam") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    // dup parent (c_custkey 1 twice) → orders→customer explodes;
    // orphan lineitem (l_orderkey 999) → lineitem→orders drops;
    // null o_custkey → null-key accounting on both audits;
    // events: user 1 ×20 vs four singletons → salt_recommended flips
    // (20·5 ≥ 4·24) on exactly one audited relation.
    writeWarehouse(dir, custKeys = Seq(1L, 1L, 2L))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    write(dir, "orders", df(Tables.ordersSchema,
      Row(100L, 1L, "O", 10.0, t0, "1-URGENT"),
      Row(101L, null, "O", 11.0, t0, "2-HIGH"),
      Row(102L, 2L, "F", 12.0, t0, "3-MEDIUM")))
    write(dir, "lineitem", df(Tables.lineitemSchema,
      Row(100L, 9L, 7L, 1, 1.0, 2.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      Row(999L, 9L, 7L, 1, 1.0, 2.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))))
    writeEvents(dir, ((1 to 20).map(i => (i.toLong, 1704067200L * Ns + i * Ns, 1L, "click", 1.0, "{}")) ++
      (2 to 5).map(u => (20L + u, 1704067200L * Ns + u * Hour, u.toLong, "view", 1.0, "{}"))): _*)
    def colTicks(t: String, c: String, grp: String, side: Int): Seq[(String, Int, String)] =
      Tables.all(t)(spark, dir).select(col(c).cast("string")).collect()
        .map(r => (grp, side, if (r.isNullAt(0)) null else r.getString(0))).toSeq
    val ticks = graft.ops.Audit.SkewKeys.flatMap { case (t, cols) =>
      cols.flatMap(c => colTicks(t, c, s"$t.$c", 0)) } ++
      graft.ops.Audit.FkEdges.flatMap { case (ct, ck, pt, pk) =>
        val edge = s"$ct.$ck -> $pt.$pk"
        colTicks(ct, ck, edge, 0) ++ colTicks(pt, pk, edge, 1) }
    // seam: alternate ticks across two micro-batches so nearly every
    // key's count ACCUMULATES across the state boundary
    val (b1, b2) = ticks.zipWithIndex.partition(_._2 % 2 == 0)
    val ms = MemoryStream[(String, Int, String)]
    val q = StreamingOps.keyCountStream(ms.toDS())
      .toDF("grp", "k", "n0", "n1")
      .writeStream.format("memory").queryName("keycounts").outputMode("append").start()
    ms.addData(b1.map(_._1): _*); q.processAllAvailable()
    ms.addData(b2.map(_._1): _*); q.processAllAvailable()
    val feed = spark.table("keycounts").groupBy("grp", "k")
      .agg(max("n0").as("n0"), max("n1").as("n1")) // counts are monotone: max ≡ last
    val got174 = graft.ops.Audit.skewReadout(
      feed.filter(!col("grp").contains("->"))
        .select(col("grp").as("rel"), col("k"), col("n0").as("cnt")))
      .collect().map(_.toSeq).toSeq
    val got182 = graft.ops.Audit.cardinalityReadout(
      feed.filter(col("grp").contains("->"))
        .select(col("grp").as("edge"), col("k"), col("n0").as("cc"), col("n1").as("pc")))
      .collect().map(_.toSeq).toSeq
    q.stop()
    val batch174 = graft.ops.Audit.q174JoinSkewAudit(spark, dir).collect().map(_.toSeq).toSeq
    val batch182 = graft.ops.Audit.q182JoinCardinality(spark, dir).collect().map(_.toSeq).toSeq
    assert(got174 == batch174, s"stream/batch q174 divergence:\n$got174\nvs\n$batch174")
    assert(got182 == batch182, s"stream/batch q182 divergence:\n$got182\nvs\n$batch182")
    // the fixture actually exercised the interesting verdicts
    assert(batch174.exists(r => r.head == "events.user_id" && r.last == true),
      "hot-user salt flag must flip")
    assert(batch182.exists(r => r.head.toString.startsWith("orders.o_custkey") && r(5) == true),
      "dup-parent edge must explode")
    assert(batch182.exists(r => r.head.toString.startsWith("lineitem.l_orderkey") && r(6) == true),
      "orphan edge must drop children")
  }

  test("interArrivalStream: last-ts state carries across the seam; readout equals batch q189") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val S = Ns
    val T0 = 1704067200L * Ns
    // user 1 type a: gaps 10s/15s/75s (the 10s gap crosses the seam);
    // user 2 type a: 7s; user 1 type b: 1s — per-(user,type) isolation
    writeEvents(dir,
      (1L, T0, 1L, "a", 0.0, "{}"),
      (2L, T0, 2L, "a", 0.0, "{}"),
      (3L, T0 + 5 * S, 1L, "b", 0.0, "{}"),
      (4L, T0 + 6 * S, 1L, "b", 0.0, "{}"),
      (5L, T0 + 7 * S, 2L, "a", 0.0, "{}"),
      (6L, T0 + 10 * S, 1L, "a", 0.0, "{}"),
      (7L, T0 + 25 * S, 1L, "a", 0.0, "{}"),
      (8L, T0 + 100 * S, 1L, "a", 0.0, "{}"))
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(_.event_id)
    val (b1, b2) = evs.splitAt(5)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.interArrivalStream(ms.toDS())
      .toDF("event_type", "event_id", "gap_us")
      .writeStream.format("memory").queryName("gaps").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val perEvent = spark.table("gaps").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // the seam case directly: id 6 gaps against batch-1's id-1 state
    assert(perEvent == Map(4L -> 1000000L, 5L -> 7000000L,
      6L -> 10000000L, 7L -> 15000000L, 8L -> 75000000L), perEvent)
    val streamed = spark.table("gaps")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), min("gap_us").as("min_gap_us"),
        graft.ops.Det.roundD4(expr("percentile(gap_us, 0.5)")).as("med_gap_us"),
        graft.ops.Det.roundD4(expr("percentile(gap_us, 0.9)")).as("p90_gap_us"),
        max("gap_us").as("max_gap_us"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    q.stop()
    val batch = graft.ops.Events.q189InterArrival(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(streamed == batch, s"stream/batch inter-arrival divergence: $streamed vs $batch")
  }

  test("userGrowthStream: out-of-order first sighting emits a correction; min-fold equals batch q187") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val D = 86400L * Ns
    val D0 = 19723L // 2024-01-01 in epoch days
    // user 1: day 10 then a LATE day-5 arrival in batch 2 (correction);
    // user 2: days 10, 12 (no correction); user 3: batch-2 only
    writeEvents(dir,
      (1L, (D0 + 10) * D, 1L, "a", 0.0, "{}"),
      (2L, (D0 + 10) * D, 2L, "a", 0.0, "{}"),
      (3L, (D0 + 5) * D, 1L, "a", 0.0, "{}"),
      (4L, (D0 + 12) * D, 2L, "a", 0.0, "{}"),
      (5L, (D0 + 11) * D, 3L, "a", 0.0, "{}"))
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(_.event_id)
    val (b1, b2) = evs.splitAt(2)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.userGrowthStream(ms.toDS())
      .toDF("user_id", "day")
      .writeStream.format("memory").queryName("growth").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val emitted = spark.table("growth").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    // user 1 emitted twice (first sighting + correction), strictly decreasing
    assert(emitted.filter(_._1 == 1L).map(_._2).toSeq == Seq(D0 + 10, D0 + 5), emitted.toSeq)
    assert(emitted.filter(_._1 == 2L).map(_._2).toSeq == Seq(D0 + 10), emitted.toSeq)
    assert(emitted.filter(_._1 == 3L).map(_._2).toSeq == Seq(D0 + 11), emitted.toSeq)
    // last-wins-by-minimum readout reproduces the batch growth curve
    val curve = emitted.groupBy(_._1).map(_._2.map(_._2).min).toSeq
      .groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val running = curve.toSeq.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (d, n)) => (d, acc + n) }.drop(1)
    val streamedCurve = curve.toSeq.sortBy(_._1).zip(running)
      .map { case ((d, n), (_, tot)) => (d, n, tot) }
    val batch = graft.ops.Events.q187UserGrowth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamedCurve == batch, s"stream/batch growth divergence: $streamedCurve vs $batch")
  }

  test("transitionStream: last-type state carries across micro-batches; counts equal batch q150") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // split on global time order, so every user's batch-1 events
    // precede their batch-2 events — the pairing at the seam exists
    // ONLY if the state genuinely carries across micro-batches
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.transitionStream(ms.toDS())
      .toDF("user_id", "from_type", "to_type")
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("trans").groupBy("from_type", "to_type")
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()
    val batch = graft.ops.Events.q150EventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"stream/batch transition divergence: " +
      s"${(streamed.toSet diff batch.toSet).take(5)} / ${(batch.toSet diff streamed.toSet).take(5)}")
  }

  test("transitionStream: idle-TTL mode (production state bound) matches the unbounded run when no user idles past it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[StreamingOps.Ev]
    // a drain shorter than the TTL: no state ages out, so the TTL path
    // must be bit-identical to the unbounded path (and exercises the
    // ProcessingTimeTimeout registration end-to-end). With a
    // processing-time timeout registered Spark schedules NO-DATA
    // micro-batches to evaluate timeouts — at the default 0-ms trigger
    // that busy-spins the state store forever and the suite never
    // finishes. The TTL never needs to FIRE here (that's exactly what
    // this test asserts), so disable no-data batches for the query;
    // see transitionStream's scaladoc for the production-side rule.
    val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val streamed = try {
      val q = StreamingOps.transitionStream(ms.toDS(), Some(java.time.Duration.ofHours(1)))
        .toDF("user_id", "from_type", "to_type")
        .writeStream.format("memory").queryName("trans_ttl").outputMode("append").start()
      try {
        ms.addData(b1.toSeq: _*); q.processAllAvailable()
        ms.addData(b2.toSeq: _*); q.processAllAvailable()
        spark.table("trans_ttl").groupBy("from_type", "to_type")
          .count().collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      } finally q.stop() // a failed drain must not leak a running query
    } finally spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
    val batch = graft.ops.Events.q150EventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"TTL-mode transition divergence: " +
      s"${(streamed.toSet diff batch.toSet).take(5)} / ${(batch.toSet diff streamed.toSet).take(5)}")
  }

  test("normGateStream: frozen per-label thresholds replay batch q145's outlier flag bit-exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val thresholds = graft.ops.Similarity.labelNormThresholds(spark, sf)
    assert(thresholds.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    val q = StreamingOps.normGateStream(
        ms.toDS().toDF("vec_id", "embedding", "label"), thresholds)
      .writeStream.format("memory").queryName("ngate").outputMode("append").start()
    ms.addData(vecs: _*)
    q.processAllAvailable()
    val streamed = spark.table("ngate").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3), r.getLong(4))).toMap
    q.stop()
    // every label was in the snapshot → all calibrated
    assert(streamed.size == vecs.size && streamed.values.forall(_._3 == 1L))
    val batch = graft.ops.Similarity.q145NormOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(4))).toMap
    val diverging = streamed.collect {
      case (id, (n4, flag, _)) if (n4, flag) != batch(id) =>
        (id, (n4, flag), batch(id))
    }
    assert(diverging.isEmpty, s"stream/batch norm-gate divergence: ${diverging.take(5)}")
  }

  test("dqGateStream: per-constraint violation totals on the drain equal batch q169's events rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // inject known violations beside the clean corpus: a NULL type and
    // a negative value (Ev cannot carry a NULL type — gate the raw DF)
    val dir = tmpDir()
    writeWarehouse(dir) // q169 audits the whole warehouse graph
    val clean = Tables.events(spark, sf).limit(50).collect()
    val extra = Seq(
      org.apache.spark.sql.Row(900001L, new java.sql.Timestamp(1704067200000L), 1L, null,
        1.0, "{}"),
      org.apache.spark.sql.Row(900002L, new java.sql.Timestamp(1704067200000L), 1L, "click",
        -9.0, "{}"))
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize(clean.toSeq ++ extra, 2), Tables.eventsSchema)
    all.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = all.collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ms = MemoryStream(org.apache.spark.sql.Encoders.row(Tables.eventsSchema), spark)
    val q = StreamingOps.dqGateStream(ms.toDF())
      .selectExpr("event_id", "explode_outer(violated) AS violated", "dq_pass")
      .writeStream.format("memory").queryName("dqgate").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("dqgate").where("violated IS NOT NULL")
      .groupBy("violated").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val passCount = spark.table("dqgate").where("dq_pass").count()
    q.stop()
    val batch = graft.ops.Audit.q169DqAudit(spark, dir).collect()
      .filter(r => r.getString(0) == "events" && r.getString(1) != "pk_unique")
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(streamed == batch.filter(_._2 > 0L),
      s"stream/batch DQ divergence: $streamed vs $batch")
    assert(streamed.values.sum == 2L && passCount == rows.length - 2L)
  }

  test("scd2Stream: closed versions across micro-batches equal batch q163's non-null-valid_to rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // global time-order split: versions closing at the seam exist only
    // if the open interval genuinely carries in state
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[StreamingOps.Ev]
    val q = StreamingOps.scd2Stream(ms.toDS())
      .toDF("user_id", "version", "event_type", "valid_from_us", "valid_to_us")
      .writeStream.format("memory").queryName("scd2").outputMode("append").start()
    ms.addData(b1.toSeq: _*); q.processAllAvailable()
    ms.addData(b2.toSeq: _*); q.processAllAvailable()
    val streamed = spark.table("scd2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    q.stop()
    import org.apache.spark.sql.functions.{col, unix_micros}
    val batch = graft.ops.Events.q163Scd2History(spark, sf)
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("version"), col("event_type"),
        unix_micros(col("valid_from")), unix_micros(col("valid_to")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch, s"stream/batch SCD2 divergence: " +
      s"${(streamed diff batch).take(5)} / ${(batch diff streamed).take(5)}")
  }

  test("lastStateStream: two independent snapshot drains classify exactly as batch q162, NULL value included") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // fixture = the sf corpus + a user whose value goes 1.0 → NULL
    // across the cut at the same type: the null-faithful stream must
    // classify it changed, exactly as batch q162's <=> does. The
    // injected rows sit AT the existing span extremes so the midpoint
    // cut is unchanged.
    val dir = tmpDir()
    val base = Tables.events(spark, sf)
    val (mnTs, mxTs) = base.agg(
      org.apache.spark.sql.functions.min(col("ts")),
      org.apache.spark.sql.functions.max(col("ts"))).as[(Timestamp, Timestamp)].head()
    val extra = Seq(
      org.apache.spark.sql.Row(900001L, mnTs, 999999L, "x", 1.0, "{}"),
      org.apache.spark.sql.Row(900002L, mxTs, 999999L, "x", null, "{}"))
    val all = spark.createDataFrame(
      spark.sparkContext.parallelize(base.collect().toSeq ++ extra, 2), Tables.eventsSchema)
    all.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val evs = StreamingOps.toEvN(Tables.events(spark, dir))
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    def us(e: StreamingOps.EvN): Long =
      math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    // the same data-anchored cut as batch q162: midpoint of the span
    val cut = (evs.map(us).min + evs.map(us).max) / 2
    val (sideA, sideB) = evs.partition(e => us(e) < cut)
    // each side drains through its OWN run in two micro-batches; the
    // snapshot is each user's LAST emission (update-mode consumption)
    def snapshot(side: Seq[StreamingOps.EvN], name: String): Map[Long, (String, Option[Double])] = {
      val ms = MemoryStream[StreamingOps.EvN]
      val q = StreamingOps.lastStateStream(ms.toDS())
        .toDF("user_id", "event_type", "value", "value_is_null", "us", "event_id")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        val (h1, h2) = side.splitAt(side.length / 2)
        if (h1.nonEmpty) { ms.addData(h1: _*); q.processAllAvailable() }
        if (h2.nonEmpty) { ms.addData(h2: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1),
            if (r.getBoolean(3)) None else Some(r.getDouble(2)), r.getLong(4), r.getLong(5)))
          .groupBy(_._1).map { case (uid, rows) =>
            val w = rows.maxBy(r => (r._4, r._5)) // argmax (us, event_id)
            uid -> ((w._2, w._3))
          }
      } finally q.stop()
    }
    val a = snapshot(sideA, "snap_a")
    val b = snapshot(sideB, "snap_b")
    val streamed = (a.keySet ++ b.keySet).toSeq.map { uid =>
      (a.get(uid), b.get(uid)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(x), Some(y)) if x != y => "changed"
        case _ => "unchanged"
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // the NULL-valued user must be visible in snapshot B as (x, None)
    assert(b(999999L) == (("x", None)), b.get(999999L))
    val batch = graft.ops.Events.q162SnapshotDiff(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream/batch snapshot-diff divergence: $streamed vs $batch")
  }

  test("growthAccountingStream: first-month state carries across the seam; feed readout equals batch q191") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    // customer 1: two orders in Jan (both NEW — first-month cohort
    // convention), one in Feb (returning); customer 2 first orders in
    // Feb (new there)
    write(dir, "orders", df(Tables.ordersSchema,
      Row(1L, 1L, "O", 100.0, ts("2024-01-05 00:00:00"), "1-URGENT"),
      Row(2L, 1L, "O", 50.0, ts("2024-01-20 00:00:00"), "1-URGENT"),
      Row(3L, 1L, "O", 70.0, ts("2024-02-10 00:00:00"), "1-URGENT"),
      Row(4L, 2L, "O", 30.0, ts("2024-02-15 00:00:00"), "1-URGENT")))
    val feed = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        (org.apache.spark.sql.functions.year(col("o_orderdate")) * 12 +
          org.apache.spark.sql.functions.month(col("o_orderdate"))).cast("long"),
        col("o_totalprice"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ms = MemoryStream[(Long, Long, Double)]
    val q = StreamingOps.growthAccountingStream(ms.toDS())
      .toDF("c", "mo", "is_new", "price")
      .writeStream.format("memory").queryName("growth").outputMode("append").start()
    // seam splits customer 1's first month (orders 1 | 2..4): order 2
    // must still classify NEW off the carried state
    ms.addData(feed.take(1).toIndexedSeq: _*); q.processAllAvailable()
    ms.addData(feed.drop(1).toIndexedSeq: _*); q.processAllAvailable()
    val records = spark.table("growth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3))).toSet
    q.stop()
    assert(records(((1L, 24289L, true, 50.0))), s"seam order must classify new: $records")
    // the month readout over the feed IS batch q191 (same aggregate)
    val got = spark.table("growth").groupBy("mo")
      .agg(count(lit(1)).as("n_orders"),
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.when(col("is_new"), col("c"))).as("n_new"),
        graft.ops.Det.dsum4(org.apache.spark.sql.functions.when(col("is_new"), col("price"))).as("rev_new"),
        graft.ops.Det.dsum4(org.apache.spark.sql.functions.when(!col("is_new"), col("price"))).as("rev_ret"))
      .orderBy("mo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
    val batch = graft.ops.Relational.q191GrowthAccounting(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
    assert(got == batch, s"stream/batch growth divergence: $got vs $batch")
  }

  test("twapStream: holding intervals close across the seam; pooled readout equals batch q232") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    write(dir, "events", df(graft.Tables.eventsRawSchema,
      Row(1L, T0, 1L, "m", 10.0, "{}"),
      Row(2L, T0 + Ns, 1L, "m", 20.0, "{}"),
      Row(3L, T0 + 3 * Ns, 1L, "m", 7.0, "{}"),
      // null reading: excluded by BOTH sides' up-front contract
      Row(4L, T0 + Ns / 2, 1L, "m", null, "{}"),
      Row(5L, T0, 2L, "m", 0.0, "{}"),
      Row(6L, T0 + Ns, 2L, "m", 9.0, "{}"),
      Row(7L, T0, 3L, "n", -5.0, "{}"),
      Row(8L, T0 + 2 * Ns, 3L, "n", 1.0, "{}")))
    val evs = graft.Tables.events(spark, dir)
      .filter(col("value").isNotNull) // the input contract
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.event_id)
    val ms = MemoryStream[Ev]
    val q = StreamingOps.twapStream(ms.toDS())
      .toDF("event_type", "dt", "vq")
      .writeStream.format("memory").queryName("twap").outputMode("append").start()
    // seam after event 1: u1/m's 10.0@t0 sits OPEN in state; batch 2's
    // 20.0@+1s must close it from the carried reading
    val (b1, b2) = evs.splitAt(1)
    ms.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    ms.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    val seam = spark.table("twap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(seam(("m", 1000000L, 10.0)), s"seam interval missing: $seam")
    // the pooled per-type readout IS batch q232 (same decimal fold)
    val got = spark.table("twap").groupBy("event_type")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).cast("long").as("total_us"),
        sum(col("vq").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * col("dt")).as("swx"))
      .select(col("event_type"), col("n_intervals"), col("total_us"),
        graft.ops.Det.roundD4(col("swx").cast("double") / col("total_us").cast("double")).as("twap"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    q.stop()
    val batch = graft.ops.Events.q232TimeWeightedValue(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == batch, s"stream/batch twap divergence: $got vs $batch")
  }

  test("dwellStream: last-event state carries across the seam; per-edge readout equals batch q215") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    writeEvents(dir,
      (1L, T0, 1L, "a", 0.0, "{}"),
      (2L, T0 + 10 * Ns, 1L, "b", 0.0, "{}"),
      (3L, T0 + 30 * Ns, 1L, "a", 0.0, "{}"),
      (4L, T0, 2L, "a", 0.0, "{}"),
      (5L, T0 + 100 * Ns, 2L, "b", 0.0, "{}"))
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.event_id)
    val ms = MemoryStream[Ev]
    val q = StreamingOps.dwellStream(ms.toDS())
      .toDF("from_type", "to_type", "dwell")
      .writeStream.format("memory").queryName("dwell").outputMode("append").start()
    // seam after event 2: user 1's b@+10s sits in state, so the
    // (b, a, 20s) hop must emit from the carried tuple in batch 2
    val (b1, b2) = evs.splitAt(2)
    ms.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    ms.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    val hops = spark.table("dwell").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(hops(("b", "a", 20000000L)), s"seam hop missing: $hops")
    // the per-edge order-statistics readout IS batch q215
    val got = spark.table("dwell").groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"),
        min(col("dwell")).as("mn"),
        graft.ops.Det.roundD4(expr("percentile(dwell, 0.5)")).as("p50"),
        graft.ops.Det.roundD4(expr("percentile(dwell, 0.9)")).as("p90"),
        max(col("dwell")).as("mx"))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    q.stop()
    val batch = graft.ops.Events.q215TransitionDwell(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(got == batch, s"stream/batch dwell divergence: $got vs $batch")
  }

  test("dwellStream: a cross-batch ts tie emits its hop in the batch (ts, event_id) direction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val T0us = 1704067200L * 1000000L
    def ev(id: Long, us: Long, tpe: String) =
      Ev(id, new java.sql.Timestamp(us / 1000L), 1L, tpe, 0.0)
    val ms = MemoryStream[Ev]
    val q = StreamingOps.dwellStream(ms.toDS())
      .toDF("from_type", "to_type", "dwell")
      .writeStream.format("memory").queryName("dwell_tie").outputMode("append").start()
    ms.addData(ev(1L, T0us, "a"), ev(2L, T0us + 10000000L, "b"))
    q.processAllAvailable()
    // event 0 TIES the carried (b, +10s, id 2) on ts with a SMALLER id:
    // the batch userWindow orders it BEFORE b, so the zero-dwell hop is
    // x→b, never b→x — the carried id must participate in the sort
    ms.addData(ev(0L, T0us + 10000000L, "x"), ev(3L, T0us + 30000000L, "a"))
    q.processAllAvailable()
    val hops = spark.table("dwell_tie").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(hops(("x", "b", 0L)), s"tie hop direction wrong: $hops")
    assert(!hops(("b", "x", 0L)), s"reversed tie hop emitted: $hops")
    assert(hops(("b", "a", 20000000L)), s"post-tie chain must leave from b: $hops")
  }

  test("jsonProfileStream: distinct-value state carries across the seam; last emission per key equals batch q211") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    // color: 5 profiled rows, distinct {red, blue} (the JSON-null value
    // counts a row but never the set); size: {1,2,3}; the single-quote,
    // NaN (allowNonNumericNumbers=false — the DuckDB-parity stance),
    // malformed, array, and NULL-props rows contribute NOTHING
    writeEvents(dir,
      (1L, T0 + 0 * Ns, 1L, "a", 0.0, """{"color":"red","size":"1"}"""),
      (2L, T0 + 1 * Ns, 1L, "a", 0.0, """{"color":"red","size":"2"}"""),
      (3L, T0 + 2 * Ns, 1L, "a", 0.0, """{"color":"blue"}"""),
      (4L, T0 + 3 * Ns, 1L, "a", 0.0, """{"color":null}"""),
      (5L, T0 + 4 * Ns, 1L, "a", 0.0, """{'color':'green'}"""),
      (6L, T0 + 5 * Ns, 1L, "a", 0.0, """{"ratio":NaN}"""),
      (7L, T0 + 6 * Ns, 1L, "a", 0.0, "not json"),
      (8L, T0 + 7 * Ns, 1L, "a", 0.0, "[1,2]"),
      (9L, T0 + 8 * Ns, 1L, "a", 0.0, null),
      (10L, T0 + 9 * Ns, 1L, "a", 0.0, """{"color":"red","size":"3"}"""))
    val props = Tables.events(spark, dir).select("event_id", "props")
      .collect().sortBy(_.getLong(0)).map(r => r.getString(1))
    val ms = MemoryStream[String]
    val q = StreamingOps.jsonProfileStream(
      StreamingOps.jsonKvFeed(ms.toDF().withColumnRenamed("value", "props")))
      .toDF("key", "n_rows", "n_distinct_values")
      .writeStream.format("memory").queryName("jsonprof").outputMode("append").start()
    // seam splits color's accumulation: ids 1-4 then 5-10 — if the
    // hash-set state were lost, batch 2's red would re-count distinct=1
    ms.addData(props.take(4).toIndexedSeq: _*); q.processAllAvailable()
    ms.addData(props.drop(4).toIndexedSeq: _*); q.processAllAvailable()
    val emissions = spark.table("jsonprof").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    q.stop()
    // batch 1 snapshot emitted mid-stream: color had 4 rows, 2 distinct
    assert(emissions.contains(("color", 4L, 2L)), emissions.toSeq)
    // n_rows grows monotonically per key: max-n emission is the final
    val streamed = emissions.groupBy(_._1)
      .map { case (k, vs) => k -> { val f = vs.maxBy(_._2); (f._2, f._3) } }
    val batch = graft.ops.Events.q211JsonProfile(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed == batch, s"stream/batch JSON profile divergence: $streamed vs $batch")
    assert(!streamed.contains("ratio"), "NaN payload must be rejected by both engines")
  }

  test("concurrencyStream: open-session state carries across the seam; closed spans equal batch q13 and the sweep readout equals batch q200") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val T0 = 1704067200L * Ns
    val Day = 24 * Hour
    // user 1: a 3-event session on day 0, a 2-event session on day 2
    // (25h gap), a 1-event session on day 5; user 2: day 0 then day 3.
    // Overlap structure exercises the sweep: day-0 has both users open.
    writeEvents(dir,
      (1L, T0 + 10 * Hour, 1L, "a", 0.0, "{}"),
      (2L, T0 + 10 * Hour + 30 * 60 * Ns, 1L, "a", 0.0, "{}"),
      (3L, T0 + 11 * Hour, 1L, "a", 0.0, "{}"),
      (4L, T0 + 2 * Day + 12 * Hour, 1L, "a", 0.0, "{}"),
      (5L, T0 + 2 * Day + 13 * Hour, 1L, "a", 0.0, "{}"),
      (6L, T0 + 5 * Day, 1L, "a", 0.0, "{}"),
      (7L, T0 + 10 * Hour + 45 * 60 * Ns, 2L, "a", 0.0, "{}"),
      (8L, T0 + 3 * Day, 2L, "a", 0.0, "{}"))
    val evs = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getTimestamp(2)))
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingOps.concurrencyStream(ms.toDS())
      .toDF("user_id", "start_us", "end_us", "n_events")
      .writeStream.format("memory").queryName("spans").outputMode("append").start()
    // seam splits user 1's first session (events 1-2 | 3-...)
    ms.addData(evs.take(2).toIndexedSeq: _*); q.processAllAvailable()
    ms.addData(evs.drop(2).toIndexedSeq: _*); q.processAllAvailable()
    def spans() = spark.table("spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = graft.ops.Events.q13Sessionize(spark, dir)
      .select(col("user_id"), expr("unix_micros(session_start)"),
        expr("unix_micros(session_end)"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bounded-drain parity: everything but each user's final session —
    // and the mid-session seam must NOT have split session A
    val lastStart = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(spans() == batch.filter(s => s._2 < lastStart(s._1)).toSet,
      s"stream/batch span divergence: ${spans()} vs ${batch.toSet}")
    // stream-only sentinels (NOT in the parquet) close each final
    // session the way a production event-time timeout would
    ms.addData((1L, new java.sql.Timestamp((T0 + 100 * Day) / 1000000L)),
      (2L, new java.sql.Timestamp((T0 + 100 * Day) / 1000000L)))
    q.processAllAvailable()
    val all = spans()
    q.stop()
    assert(all == batch.toSet, s"post-close span divergence: $all vs ${batch.toSet}")
    // the q200 readout over the drained feed IS batch q200
    val sweep = graft.ops.Events.concurrencySweep(
        all.toSeq.toDF("user_id", "sus", "eus", "n_events").select("sus", "eus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q200 = graft.ops.Events.q200PeakConcurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sweep.toSeq == q200.toSeq,
      s"sweep/batch q200 divergence: ${sweep.toSeq} vs ${q200.toSeq}")
    // the overlap fact itself: day 0 peaks at 2 concurrent sessions
    assert(q200.head._4 == 2L, q200.toSeq)
  }
}
