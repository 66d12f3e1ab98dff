package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming layer (SURVEY.md §2.8): the reference's
  * Lambda-drains-Kafka-then-exits ingest (reference main.py:45-66,
  * 200-209) and its session/state semantics, as checkpointed streaming
  * jobs.
  *
  *  - bounded drain  → `Trigger.AvailableNow` + checkpoint (exactly the
  *    reference's "consume everything then stop", but restartable and
  *    effectively-once instead of at-least-once)
  *  - ride sessions  → `session_window` gap sessions (the streaming
  *    dual of the batch q13 window)
  *  - mutable per-user state (main.py:77-94) → `flatMapGroupsWithState`
  *
  * Watermarks bound state: at 100 TB/day the session store only holds
  * windows newer than the watermark delay; everything older is emitted
  * and dropped.
  */
object StreamingOps {

  /** One event row in the streaming-typed API. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)

  /** A frozen batch-fit model/threshold map as a sorted literal map
    * column — the one carrier every stateless gate shares
    * (qualityGateStream / normGateStream / dsirScoreStream): retrain
    * in batch, redeploy the query; key order is pinned so the literal
    * (and thus the plan) is deterministic for a given snapshot.
    */
  private def frozenModelMap[K: Ordering](m: Map[K, Double]): org.apache.spark.sql.Column =
    map(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Bounded drain (S1/S2): stream a file-backed source into a parquet
    * "bronze" table, processing all available input then stopping —
    * the reference's poll-until-idle loop with a checkpoint instead of
    * a manual offset commit. For a real Kafka topic, swap the source for
    * `readStream.format("kafka")` — the sink/trigger/checkpoint are
    * identical.
    */
  def drainToParquet(spark: SparkSession, srcDir: String, schema: StructType,
                     outDir: String, checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append)
      .start()

  /** Streaming gap sessionization (q13's dual): per-user session
    * windows closed `gap` after the last event, emitted once the
    * watermark passes the session end. State per user is bounded by the
    * watermark delay.
    */
  def sessionize(events: DataFrame, gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Watermarked tumbling-window aggregation (q41's streaming dual):
    * event count and sum per fixed epoch-aligned window per type,
    * emitted once the watermark passes the window end and then dropped
    * from the state store — the canonical
    * readStream → watermark → window → agg shape. Aggregation state is
    * bounded by (watermark delay / window width) windows per group key
    * regardless of input volume.
    */
  def tumblingAgg(events: DataFrame, width: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** The reference's whole lambda in one job (main.py:45-66 drain +
    * sql_wrapper.py ON CONFLICT upsert): stream → micro-batches →
    * idempotent JDBC append. Each batch runs the batch-level
    * conflict-skip sink ([[graft.etl.DelotonPipeline.writeJdbcIdempotent]]);
    * with the checkpoint tracking source offsets, a crash between the
    * anti-join read and the append replays the batch and the conflict
    * skip de-duplicates it — effectively-once into the DB, which is
    * strictly stronger than the reference's at-least-once consumer +
    * per-row ON CONFLICT.
    */
  def streamToJdbc(src: DataFrame, url: String, table: String, key: String,
                   checkpointDir: String): StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.etl.DelotonPipeline.writeJdbcIdempotent(batch.toDF(), url, table, key)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup (q20's streaming dual, and the ingest face
    * of the near-dup cascade): one survivor per content hash within the
    * watermark horizon. `dropDuplicatesWithinWatermark` expires each
    * key's state once the watermark passes it, so the dedup store is
    * bounded by delay × ingest rate — a plain streaming dropDuplicates
    * would grow without bound at 100 TB/day. The key is the sha2 digest
    * (32 bytes), never the document body, mirroring the batch q20.
    * Re-deliveries of the same content inside the horizon (the
    * at-least-once case the reference's ON CONFLICT guarded) collapse
    * to the first arrival.
    */
  def dedupStream(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming corpus prep: the scrub (q63) → length-gate → chunk (q64)
    * stages applied to a document STREAM. These are stateless row-local
    * transforms, so THE SAME stage implementation and constants the
    * batch q67 pipeline uses ([[graft.ops.CorpusPrep.scrubAndGate]],
    * MinTokens/ChunkWindow/ChunkStride) run under Structured Streaming
    * with no state store, no watermark, and per-micro-batch output —
    * tuning the batch pipeline cannot silently diverge from the stream
    * (StreamingSpec proves batch/stream output parity on identical
    * input). Stateful stages (exact dedup) chain in front via
    * [[dedupStream]].
    */
  def prepStream(docs: DataFrame): DataFrame =
    graft.ops.TrainingData.chunkTokens(
      graft.ops.CorpusPrep.scrubAndGate(docs.select("doc_id", "text")),
      graft.ops.CorpusPrep.ChunkWindow, graft.ops.CorpusPrep.ChunkStride)

  /** Streaming corpus prep v2 — q112's stage list under Structured
    * Streaming, minus the one stage that CANNOT stream: scrub (q63) →
    * length gate → exact dedup (watermark-bounded state on the content
    * digest, [[dedupStream]]'s construction over the CLEANED text, so a
    * re-crawled page whose raw bytes differ only in scrubbed PII still
    * collapses) → chunk (q64's windows) → BPE pricing (q105's replay)
    * per chunk. Every stage reuses the batch implementation object and
    * constants verbatim — the q67/prepStream discipline — so
    * batch/stream outputs are identical on identical input
    * (StreamingSpec drains a corpus through both legs).
    *
    * The ExactSubstr span cut (q112's stage 4) stays batch BY DESIGN:
    * a span is cut when its L-gram repeats ANYWHERE in the corpus —
    * a corpus-GLOBAL aggregate over all gram positions, where a gram
    * arriving now can retroactively make a span in a long-committed
    * document a duplicate. Streaming it would need either unbounded
    * gram state AND retraction of already-emitted output (append mode
    * cannot retract), or a frozen gram index like [[dsirScoreStream]]'s
    * model — which is exactly the batch q104 artifact, refreshed
    * offline. A production deployment runs the cut as the periodic
    * batch compaction between streaming ingest epochs (q109's
    * clean-then-repack), not in the ingest path.
    */
  def prepStreamV2(docs: DataFrame, watermarkDelay: String,
      bpeMerges: Seq[(String, String)]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val cleaned = graft.ops.CorpusPrep.scrubAndGate(docs)
    val deduped = cleaned
      .withColumn("content_hash", sha2(col("clean_text"), 256))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
    // the merge table is a FROZEN batch-trained artifact (the
    // dsirScoreStream model discipline): train offline with
    // TrainingData.trainedBpeMerges, replay per row on ingest
    graft.ops.TrainingData.chunkTokens(deduped,
        graft.ops.CorpusPrep.ChunkWindow, graft.ops.CorpusPrep.ChunkStride)
      .withColumn("bpe_tokens",
        graft.ops.TrainingData.bpeTokenCount(col("chunk_text"), bpeMerges))
  }

  /** The dedup cascade's STREAMING INGEST LOOP state (q21/q62's ingest
    * face — the loop [[graft.ops.Similarity.cascadeMerge]]'s scaladoc
    * describes, actually wired to a stream): the three staged relations
    * a production dedup pipeline maintains — exact-dup groups,
    * qualifying set pairs (J ≥ p/q), doc-level component labels — held
    * as parquet state under `stateDir` and folded forward one
    * micro-batch at a time. Each ingest pays the DELTA cost only (one
    * tagged collapse merge + one asymmetric delta-vs-(base ∪ delta)
    * prefix join — base×base is never re-joined; tools.DeltaProbe
    * measured the merge scale-flat at 3×/10×/30× for a fixed delta),
    * which is the whole point of the delta-merge machinery: the
    * streaming twin of a rebuild would re-pair the corpus per batch.
    *
    * Correctness under streaming delivery semantics:
    *
    *  - **At-least-once → effectively-once.** foreachBatch can replay
    *    a batch after a crash; the merge's append-only contract (delta
    *    doc_ids are NEW) is enforced by one left_anti join of the
    *    incoming batch against the doc-level label relation, so a
    *    replayed (or overlapping) batch folds in as an empty delta —
    *    merge ≡ base, spec-pinned.
    *  - **Cold start is the merge from empty state**: the first batch
    *    folds into schema-correct empty relations, and merge ≡
    *    recompute makes that the cold build exactly (StreamingSpec pins
    *    the drained end state row-identical to the batch cascade over
    *    the same corpus).
    *  - **Restart**: state is plain parquet, epoch-suffixed; the
    *    constructor resumes from the newest complete epoch and the next
    *    ingest sweeps older ones. A crash between the epoch write and
    *    the sweep leaves only stale files, never torn state.
    *  - **No block-manager accretion**: the merge's shared
    *    intermediates use an epoch-scoped parquet materializer instead
    *    of [[graft.ops.Similarity.cascadeMerge]]'s default eager
    *    localCheckpoint, so a long-running stream holds no per-batch
    *    checkpoint RDDs — everything lives under `stateDir` and is
    *    deleted with its epoch.
    */
  final class CascadeIngestState(spark: SparkSession, stateDir: String,
      p: Int, q: Int, docBytes: BigInt) {
    import graft.ops.Similarity

    private val Relations = Seq("groups", "pairs", "labels")
    private def epochDir(epoch: Long) = s"$stateDir/epoch_$epoch"

    // resume from the newest epoch whose directory write completed
    // (parquet's _SUCCESS marker on every relation)
    @volatile private var currentEpoch: Option[Long] = {
      val root = new java.io.File(stateDir)
      val done = Option(root.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(f => scala.util.Try(f.getName.stripPrefix("epoch_").toLong).toOption
          .filter(_ => f.getName.startsWith("epoch_")))
        .filter(e => Relations.forall(r =>
          new java.io.File(s"${epochDir(e)}/$r/_SUCCESS").isFile))
      done.sorted.lastOption
    }

    private def read(epoch: Long, rel: String): DataFrame =
      spark.read.parquet(s"${epochDir(epoch)}/$rel")

    /** The current doc-level (doc_id, cluster_id) relation — q62's
      * shape, kept current by the ingest loop; None before any batch.
      */
    def labels: Option[DataFrame] = currentEpoch.map(read(_, "labels"))

    /** The current qualifying (ga, gb, jaccard, ma, mb) pair relation —
      * the staged `set_pairs_45` shape.
      */
    def pairs: Option[DataFrame] = currentEpoch.map(read(_, "pairs"))

    /** The current exact-dup collapse (gid, toks, sz, members). */
    def groups: Option[DataFrame] = currentEpoch.map(read(_, "groups"))

    private def deleteRecursively(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      f.delete(): Unit
    }

    /** Fold one (doc_id, text) batch into the state — the micro-batch
      * body of [[cascadeIngestStream]], public so a scheduled BATCH
      * ingest (the daily-fold deployment q244/q245 demonstrate) can
      * drive the same state without a stream.
      */
    def ingestBatch(batchDocs: DataFrame): Unit = synchronized {
      graft.functions.GraftFunctions.register(spark)
      val toks = Similarity.docTokenSetsOf(batchDocs)
      val next = currentEpoch.map(_ + 1L).getOrElse(0L)
      // shared-intermediate materializer: epoch-scoped parquet (swept
      // with the epoch) instead of localCheckpoint — see class doc
      var tmpN = 0
      val stage: DataFrame => DataFrame = { df =>
        tmpN += 1
        val path = s"${epochDir(next)}/tmp_$tmpN"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
      val (bg, bp, bl) = currentEpoch match {
        case Some(e) => (read(e, "groups"), read(e, "pairs"), read(e, "labels"))
        case None =>
          val zg = Similarity.tokenSetGroupsBy(toks.limit(0))
          (zg, Similarity.setPairsAbove(zg, p, q, docBytes),
            toks.limit(0).select(col("doc_id"), col("doc_id").as("cluster_id")))
      }
      // replay/overlap guard: only genuinely new doc_ids are a delta
      val delta = toks.join(bl.select("doc_id"), Seq("doc_id"), "left_anti")
      val (g, pr, lb) =
        Similarity.cascadeMerge(bg, bp, bl, delta, p, q, docBytes, stage)
      Seq("groups" -> g, "pairs" -> pr, "labels" -> lb).foreach { case (rel, df) =>
        df.write.mode("overwrite").parquet(s"${epochDir(next)}/$rel")
      }
      currentEpoch = Some(next)
      // sweep superseded epochs (incl. any stale ones a crash left) and
      // this epoch's merge intermediates
      val root = new java.io.File(stateDir)
      Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.getName.startsWith("epoch_") && f.getName != s"epoch_$next")
          deleteRecursively(f)
      }
      (1 to tmpN).foreach(i =>
        deleteRecursively(new java.io.File(s"${epochDir(next)}/tmp_$i")))
    }
  }

  /** The streaming ingest loop itself: drain a (doc_id, text) document
    * stream through [[CascadeIngestState.ingest]] micro-batch by
    * micro-batch — the production deployment of the delta-merge
    * machinery (a Kafka-fed dedup service maintaining its staged
    * cascade continuously, where the batch q244/q245 keys demonstrate
    * one day's fold). The checkpoint makes the drain restartable;
    * replays are absorbed by the state's anti-join guard.
    */
  def cascadeIngestStream(docs: DataFrame, state: CascadeIngestState,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        state.ingestBatch(batch.toDF())
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming quality gate (the round-6 row-local gates' ingest face,
    * composing q119 + q127 + q128 on a document stream): per incoming
    * doc, the trigram language ID, the row-local token-entropy gate,
    * the q28 composite quality score, and the CALIBRATED keep flag
    * against a FROZEN per-source threshold snapshot
    * ([[graft.ops.TrainingData.sourceKeepThresholds]] — the
    * [[dsirScoreStream]] model discipline: percent_rank is corpus-
    * global, so the stream replays a batch-fit cut instead of
    * re-ranking). Every stage reuses the batch implementation object
    * (withLangTrigramPred / withTokenEntropy / qualityScored), so
    * batch and ingest gates are bit-identical on identical input
    * (StreamingSpec parity case). Entirely row-local + a literal map
    * lookup — zero state, no watermark, no shuffle; a source absent
    * from the snapshot (a domain first seen after the calibration fit)
    * passes through with `calibrated = 0` rather than being cut by an
    * unfitted threshold.
    */
  def qualityGateStream(docs: DataFrame, thresholds: Map[String, Double]): DataFrame = {
    import graft.ops.TrainingData
    val thr = element_at(frozenModelMap(thresholds), col("source"))
    TrainingData.withTokenEntropy(
        TrainingData.withLangTrigramPred(TrainingData.qualityScored(docs)))
      .withColumn("cal_keep",
        when(thr.isNull, lit(1L)).otherwise((col("score") >= thr).cast("long")))
      .withColumn("calibrated", thr.isNotNull.cast("long"))
      .select("doc_id", "source", "lang_pred", "n_tokens", "token_entropy",
        "low_entropy", "score", "cal_keep", "calibrated")
  }

  /** Streaming EMBEDDING-NORM gate (q145's streaming twin): flag each
    * incoming vector against the FROZEN per-label norm thresholds
    * fitted in batch ([[graft.ops.Similarity.labelNormThresholds]]) —
    * the vector-hygiene admission check an indexing pipeline runs on
    * ingest, before a degenerate vector ever reaches the ANN build.
    * Entirely row-local (one fused-kernel norm + a literal map
    * lookup): zero state, no watermark, no shuffle. A label absent
    * from the snapshot passes through with `calibrated = 0` rather
    * than being cut by an unfitted threshold (qualityGateStream's
    * unknown-source rule). Because q145's flag is a pure monotone
    * function of the rounded norm, `norm4 >= threshold` replays the
    * batch percent_rank cut bit-exactly (StreamingSpec parity case).
    */
  def normGateStream(vectors: DataFrame, thresholds: Map[Int, Double]): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val thr = element_at(frozenModelMap(thresholds), col("label"))
    vectors
      .withColumn("norm4", graft.ops.Det.roundD4(
        sqrt(call_function("float_vec_dot", col("embedding"), col("embedding")))))
      .withColumn("is_outlier",
        when(thr.isNull, lit(false)).otherwise(col("norm4") >= thr))
      .withColumn("calibrated", thr.isNotNull.cast("long"))
      .select("vec_id", "label", "norm4", "is_outlier", "calibrated")
  }

  /** Streaming DSIR scoring (q114's streaming twin): score each
    * incoming document against a FROZEN bucket model trained in batch
    * ([[graft.ops.TrainingData.dsirBucketLogRatios]]) — the production
    * DSIR shape: the importance model is fit offline on a snapshot,
    * then every new crawl doc gets its weight on ingest. The ≤256-entry
    * model folds into a literal map column (the q32b model exception:
    * only the model crosses the driver), so scoring is ENTIRELY
    * row-local — zero state, no watermark, no shuffle; the per-doc
    * mean accumulates in exact integer micro-nats inside one
    * `aggregate` HOF, so batch/stream weights are bit-identical
    * (StreamingSpec asserts exact q114 parity on the drained corpus).
    * Docs under 2 tokens have no bigrams and drop out, as in batch.
    */
  def dsirScoreStream(docs: DataFrame, model: Map[String, Double]): DataFrame = {
    import graft.ops.TrainingData.{dsirBigrams, dsirBucket}
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val m = frozenModelMap(model)
    // a bigram whose md5 bucket is ABSENT from the frozen model (the
    // snapshot corpus never populated it) drops out, and n_bigrams
    // counts only covered bigrams — exactly the batch q114's inner-join
    // semantics. Without the filter, element_at's NULL poisons the
    // aggregate and the whole doc scores a silent NULL weight (the
    // frozen model makes uncovered buckets plausible on real ingest,
    // unlike the batch path where model and corpus coincide).
    val lrs = filter(
      transform(dsirBigrams(col("text")), g => element_at(m, dsirBucket(g))),
      x => x.isNotNull)
    // lr values are 6-dp-floored, so lr·10⁶ is integer-valued: the sum
    // accumulates exactly in longs and the final decimal division is
    // the same rational Det.davg4 rounds half-up at 4 dp
    val micro = aggregate(lrs, lit(0L),
      (acc, x) => acc + (x.cast(DecimalType(20, 6)) * lit(1000000)).cast(LongType))
    docs
      .withColumn("n_bigrams", size(lrs).cast(LongType))
      .filter(col("n_bigrams") > 0)
      .withColumn("dsir_weight",
        round(micro.cast(DecimalType(26, 6)) / (col("n_bigrams") * lit(1000000L)), 4)
          .cast(DoubleType))
      .select("doc_id", "n_bigrams", "dsir_weight")
  }

  /** Streaming near-dup ADMISSION (q100's streaming twin): probe each
    * incoming document against the PERSISTED index signature table
    * ([[graft.ops.Sketches.indexSignatures]] — LSH band postings of the
    * indexed corpus) and emit one evidence row per (doc, index group)
    * near-dup hit. This is the LSH swap-in q100's scaladoc names: where
    * the batch q100 runs the exact prefix cascade over index ∪ batch,
    * the stream probes an index that never re-shuffles —
    *
    *  - stream side: row-local token-set + banded-signature build (the
    *    SAME kernels and band layout as the index builder, so both
    *    sides band identically by construction);
    *  - a STATELESS stream-static equi-join on (band_id, band_hash) —
    *    no watermark, no state store; the static side re-resolves per
    *    micro-batch, so index updates between batches are picked up;
    *  - first-collision predicate ([[graft.ops.Sketches
    *    .earlierBandCollision]]) emits each (doc, group) pair from its
    *    lowest colliding band only — pairs exit the join distinct;
    *  - exact-Jaccard verification INSIDE the join (native merge-scan,
    *    integer threshold arithmetic — no false positives).
    *
    * Output: (doc_id, partner_gid, idx_docs, jaccard). A doc is
    * REJECTED iff it has any evidence row; Σ idx_docs per doc is its
    * q100 partner count. Recall vs the exact cascade is the standard
    * LSH trade (SketchRecallSpec measures it); StreamingSpec asserts
    * exact parity with q100 on a drained fixture whose pairs collide.
    */
  def nearDupAdmitStream(docs: DataFrame, sigs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import graft.ops.Sketches
    val stream = docs.select(col("doc_id"),
        call_function("shingle_hashes", split(col("text"), " "), lit(1)).as("toks"))
      .withColumn("sz", size(col("toks")))
      .filter(col("sz") > 0)
    val nBands = Sketches.Bands
    val banded = Sketches.withBandHashes(stream, "toks", Seq("doc_id", "toks", "sz"))
      .select(col("doc_id") +: col("toks") +: col("sz") +:
        (0 until nBands).map(j => col(s"h$j")) :+
        posexplode(array((0 until nBands).map(j => col(s"h$j")): _*))
          .as(Seq("band_id", "band_hash")): _*)
    val inter = call_function("sorted_intersect_count", col("a.toks"), col("b.toks"))
    banded.as("a").join(broadcast(sigs.as("b")),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          !Sketches.earlierBandCollision(nBands) &&
          // exact J >= 4/5 in integer arithmetic (q21's threshold)
          lit(5) * inter >= lit(4) * (col("a.sz") + col("b.sz") - inter))
      .select(col("a.doc_id").as("doc_id"), col("b.gid").as("partner_gid"),
        col("b.idx_docs").as("idx_docs"),
        graft.ops.Det.roundD4(inter.cast("double") /
          (col("a.sz") + col("b.sz") - inter)).as("jaccard"))
  }

  /** Stream-stream interval join: each click joined to the same user's
    * purchases within the following `window` — both sides watermarked,
    * so the join state store only retains rows until the other side's
    * watermark passes their join-window end (bounded by delay + window,
    * regardless of stream length). This is the streaming dual of the
    * batch interval join (q43): the range condition rides ON TOP of the
    * user_id equi-key, so state is partitioned per user and never
    * degenerates to a cross-stream scan.
    */
  def intervalJoinStream(clicks: DataFrame, purchases: DataFrame,
                         window: String, watermarkDelay: String): DataFrame =
    clicks.withWatermark("ts", watermarkDelay).as("c")
      .join(purchases.withWatermark("ts", watermarkDelay).as("p"),
        expr("c.user_id = p.user_id" +
          s" AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL $window"))
      .select(col("c.event_id").as("click_id"), col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("p.event_id").as("purchase_id"),
        col("p.ts").as("purchase_ts"))

  /** Stream-static join: each streaming event enriched with its user's
    * dimension row (the kappa-architecture staple — telemetry joined to
    * a slowly-changing dim table). The static side is a plain batch
    * DataFrame: Spark broadcasts or hash-joins it per micro-batch with
    * NO state store at all (nothing to watermark — the static side is
    * re-resolvable every batch, so dim updates between batches are
    * picked up). Inner semantics drop events with no dim row; callers
    * wanting them use "left_outer" the same way.
    */
  def streamStaticJoin(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key))

  /** State for [[funnelStream]] — epoch-µs stage timestamps, 0 = not
    * reached (primitive fields for the state encoder, as FillState).
    */
  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)

  /** Streaming funnel (q89's dual): tracks each user's earliest
    * view → click → purchase chain (each step within one hour of the
    * previous — q89's constants) across micro-batches via explicit
    * group state, emitting one row per user whenever their furthest
    * stage ADVANCES. State is three longs per user — fixed-size, no
    * event buffering, so a 100 TB-rate stream carries a users-sized
    * state store. Events inside a batch are folded in (ts, event_id)
    * order; the batch q89 is the replay/backfill twin over the same
    * thresholds.
    */
  def funnelStream(events: Dataset[Ev]): Dataset[(Long, Long, Long, Long, Int)] = {
    import events.sparkSession.implicits._
    val HourUs = 3600L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, (Long, Long, Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
          val before = s
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val us = e.ts.getTime * 1000L
            e.event_type match {
              case "view" if s.tView == 0L => s = s.copy(tView = us)
              case "click" if s.tView > 0L && s.tClick == 0L &&
                us > s.tView && us <= s.tView + HourUs => s = s.copy(tClick = us)
              case "purchase" if s.tClick > 0L && s.tPurchase == 0L &&
                us > s.tClick && us <= s.tClick + HourUs => s = s.copy(tPurchase = us)
              case _ => ()
            }
          }
          state.update(s)
          val stage = Seq(s.tView, s.tClick, s.tPurchase).count(_ > 0L)
          if (s != before) Iterator((uid, s.tView, s.tClick, s.tPurchase, stage))
          else Iterator.empty
      }
  }

  /** Full-microsecond sort key for a Timestamp — `getTime` alone is
    * millisecond-truncated, and events.parquet carries microsecond
    * precision, so two same-millisecond events would fall back to the
    * event_id tie-break in a DIFFERENT order than the batch
    * userWindow's full-precision (ts, event_id).
    */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** State for [[forwardFillStream]] — primitive fields (an
    * Option-typed private class breaks the state encoder's codegen).
    */
  case class FillState(hasValue: Boolean, lastPurchase: Double)

  /** Streaming forward-fill (q14's dual): carries the last purchase
    * value per user across micro-batches via explicit group state —
    * the reference's mutable `duration/resistance/...` locals
    * (main.py:140-153) made durable and partitioned. Events inside a
    * batch are ordered by (ts, event_id) before folding; cross-batch
    * order is the source's delivery order, as in the reference.
    */
  def forwardFillStream(events: Dataset[Ev]): Dataset[(Long, Long, Option[Double])] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FillState, (Long, Long, Option[Double])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FillState]) =>
          val evs = it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          var last = state.getOption.filter(_.hasValue).map(_.lastPurchase)
          val out = evs.map { e =>
            if (e.event_type == "purchase") last = Some(e.value)
            (e.event_id, uid, last)
          }
          state.update(FillState(last.isDefined, last.getOrElse(0.0)))
          out.iterator
      }
  }

  /** State for [[transitionStream]]: the last event type seen per user
    * — one string, the smallest state any sequence analysis can carry.
    */
  case class TransState(hasLast: Boolean, lastType: String)

  /** Streaming transition extraction (q150's stateful dual): one
    * (user, from_type, to_type) record per consecutive per-user event
    * pair, the last type carried across micro-batches via explicit
    * group state. The transition MATRIX is a downstream aggregate of
    * these records (batch q150's groupBy, or a windowed streaming agg)
    * — the stream's job is only the stateful pairing, which no
    * stateless view can do once a user's events span micro-batches.
    * Events inside a batch fold in (ts, event_id) order
    * ([[forwardFillStream]]'s discipline); cross-batch order is the
    * source's delivery order. StreamingSpec drains the events table
    * through this in two batches and pins the aggregated counts equal
    * to batch q150's matrix.
    *
    * State lifetime: with `idleTtl = None` one TransState (a single
    * string) lives per user FOREVER — fine for a bounded drain, but on
    * an unbounded stream state grows with user cardinality without
    * bound. A production deployment passes an `idleTtl`: a user idle
    * longer than the TTL has its state dropped (processing-time
    * timeout), so its NEXT event starts a fresh sequence and the
    * (idle-gap-spanning) transition is not emitted — the same trade a
    * session gap timeout makes, and the right one when per-user idle
    * gaps beyond the TTL carry no signal.
    *
    * DEPLOYMENT RULE (TTL mode only): run the query with a NON-ZERO
    * processing-time trigger (e.g. `Trigger.ProcessingTime("30 seconds")`).
    * Registering a processing-time timeout makes Spark schedule NO-DATA
    * micro-batches so idle state can age out; at the default 0-ms
    * trigger those no-data batches busy-spin — each one commits a
    * state-store delta, so an idle stream burns a CPU and floods the
    * checkpoint with empty versions. (Alternatively disable
    * `spark.sql.streaming.noDataMicroBatches.enabled` and accept that
    * TTLs then fire only when data arrives.) The `idleTtl = None` path
    * registers no timeout and has no such constraint.
    */
  def transitionStream(events: Dataset[Ev],
                       idleTtl: Option[java.time.Duration] = None): Dataset[(Long, String, String)] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, (Long, String, String)](
        OutputMode.Append, timeoutConf) {
        (uid: Long, it: Iterator[Ev], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            var last = state.getOption.filter(_.hasLast).map(_.lastType)
            val out = Seq.newBuilder[(Long, String, String)]
            evs.foreach { e =>
              last.foreach(f => out += ((uid, f, e.event_type)))
              last = Some(e.event_type)
            }
            state.update(TransState(last.isDefined, last.getOrElse("")))
            idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.result().iterator
          }
      }
  }

  case class RunMaxState(hasMax: Boolean, maxUs: Long)

  /** Streaming disorder monitor (batch q179's stateful dual): one
    * (event_type, event_id, late_us) record per event, lateness
    * measured against the running max EVENT time carried across
    * micro-batches in group state — the live view of the same signal
    * q179 audits offline, and the input to a watermark-health alert
    * (late_us climbing toward the configured watermark = data about to
    * be dropped). Events inside a batch fold in ingest-id order
    * (q179's arrival proxy); the audit readout is a downstream
    * aggregate of these records, per [[transitionStream]]'s
    * stream-does-the-stateful-part discipline. State is ONE Long per
    * event type — bounded by type cardinality, no TTL needed; the
    * coarse grouping key serializes each type's fold only WITHIN a
    * micro-batch (bounded work), not across the corpus like a batch
    * per-type window would.
    */
  def disorderStream(events: Dataset[Ev]): Dataset[(String, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[RunMaxState, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Ev], state: GroupState[RunMaxState]) =>
          val evs = it.toSeq.sortBy(_.event_id)
          var mx = state.getOption.filter(_.hasMax).map(_.maxUs).getOrElse(Long.MinValue)
          val out = evs.map { e =>
            val us = tsMicros(e.ts)
            val late = if (mx != Long.MinValue && us < mx) mx - us else 0L
            if (us > mx) mx = us
            (tpe, e.event_id, late)
          }
          state.update(RunMaxState(mx != Long.MinValue, mx))
          out.iterator
      }
  }

  case class TouchState(hasTouch: Boolean, packed: Long)

  /** Streaming last-touch attribution (batch q181's stateful dual):
    * each user's latest click/view packs (µs·8 + channel code) into
    * ONE Long of group state — q181's exact packed-argmax value,
    * carried across micro-batches instead of recomputed by a window —
    * and every purchase emits an attribution record at ingest time
    * (the live feed a spend dashboard consumes; batch q181 is the
    * end-of-day reconciliation). Events inside a batch fold in
    * (ts, event_id) order ([[forwardFillStream]]'s discipline);
    * decode is floor-div/pmod exactly like the batch side. State is
    * one Long per user; an idle-TTL variant would follow
    * [[transitionStream]]'s pattern when user cardinality is
    * unbounded.
    *
    * INPUT CONTRACT ([[scd2Stream]]'s discipline): `user_id` must be
    * non-null — [[Ev]]'s primitive decode rejects NULLs before this
    * operator runs, so pre-filter the source (e.g. downstream of
    * [[dqGateStream]]). Batch q181 RETAINS null-user purchases (they
    * form their own window partition); a stream keyed by user cannot
    * represent them, so reconcile the null-user remainder batch-side.
    */
  def attributionStream(events: Dataset[Ev],
                        lookback: java.time.Duration = java.time.Duration.ofDays(7))
      : Dataset[(Long, Long, String, Double)] = {
    import events.sparkSession.implicits._
    val lookbackUs = lookback.toMillis * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, (Long, Long, String, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[TouchState]) =>
          var packed = state.getOption.filter(_.hasTouch).map(_.packed)
          val out = Seq.newBuilder[(Long, Long, String, Double)]
          it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
            val us = tsMicros(e.ts)
            e.event_type match {
              case "click" => packed = Some(math.max(packed.getOrElse(Long.MinValue), us * 8 + 1))
              case "view"  => packed = Some(math.max(packed.getOrElse(Long.MinValue), us * 8 + 2))
              case "purchase" =>
                val attributed = packed match {
                  case Some(p) if us - Math.floorDiv(p, 8) <= lookbackUs =>
                    if (Math.floorMod(p, 8) == 1) "click" else "view"
                  case _ => "none"
                }
                out += ((uid, e.event_id, attributed, e.value))
              case _ => ()
            }
          }
          packed.foreach(p => state.update(TouchState(hasTouch = true, p)))
          out.result().iterator
      }
  }

  case class SeenTypes(types: Seq[String])

  /** Streaming co-occurrence discovery (batch q186's stateful dual):
    * per user, the set of event types seen so far lives in group state
    * (bounded by the TYPE VOCABULARY — a handful of strings, not event
    * volume), and the arrival of a NEW type emits one (user, a, b)
    * pair-discovery record against each previously seen type. Each
    * (user, unordered pair) emits exactly once over the stream's
    * lifetime, so the downstream pair count IS batch q186's `n_ab` —
    * the association matrix updates live instead of by rescan.
    * Marginals (n_a, n_users) are stateless distinct aggregates
    * downstream of the same feed.
    *
    * INPUT CONTRACT: `user_id` must be non-null ([[Ev]]'s primitive
    * decode rejects NULLs — pre-filter the source). Batch q186 drops
    * null users too (basketless), so the parity contract is exact on
    * filtered input.
    */
  def cooccurrenceStream(events: Dataset[Ev]): Dataset[(Long, String, String)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SeenTypes, (Long, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SeenTypes]) =>
          var seen = state.getOption.map(_.types.toSet).getOrElse(Set.empty[String])
          val out = Seq.newBuilder[(Long, String, String)]
          it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
            if (!seen.contains(e.event_type)) {
              seen.foreach { t =>
                val (a, b) = if (t < e.event_type) (t, e.event_type) else (e.event_type, t)
                out += ((uid, a, b))
              }
              seen += e.event_type
            }
          }
          state.update(SeenTypes(seen.toSeq.sorted))
          out.result().iterator
      }
  }

  case class BucketState(n: Long, sumModP: Long)

  /** Streaming Merkle-manifest maintenance (batch q178's incremental
    * dual, and the PROOF of its additive-maintenance claim): each
    * micro-batch folds its events' checksum terms into per-bucket
    * group state (count + mod-p sum — addition commutes and survives
    * the mod, so arrival order and batch boundaries cannot change the
    * result) and emits the bucket's updated manifest row. The LAST
    * emitted row per bucket after a drain is bit-identical to batch
    * q178 over the same rows — an ingest pipeline keeps the repair
    * manifest current without ever rescanning the table. State is
    * bounded at 256 buckets regardless of corpus size.
    */
  def merkleStream(events: Dataset[Ev]): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    val P = graft.ops.Audit.ChecksumMod
    events.groupByKey(e => graft.ops.Audit.checksumTermLong(e.event_id) % 256)
      .flatMapGroupsWithState[BucketState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, it: Iterator[Ev], state: GroupState[BucketState]) =>
          var s = state.getOption.getOrElse(BucketState(0L, 0L))
          it.foreach { e =>
            val term = graft.ops.Audit.checksumTermLong(e.event_id)
            s = BucketState(s.n + 1, (s.sumModP + term) % P)
          }
          state.update(s)
          Iterator.single((bucket, s.n, s.sumModP))
      }
  }

  /** State for [[postingStream]]: postings seen so far for the term,
    * plus the OPEN block's running stats.
    */
  case class BlockState(nPostings: Long, blockN: Long, blockMin: Long,
                        blockMax: Long, blockTf: Long)

  /** The stateless tokenize→tf front of [[postingStream]]: one
    * (term, doc_id, tf) row per distinct term of each incoming doc,
    * computed ROW-LOCALLY (distinct-explode + a higher-order filter
    * count — no streaming aggregation, so no watermark needed).
    * Batch q192's tf relation built at the ingest edge.
    */
  def postingFeed(docs: DataFrame): Dataset[(String, Long, Long)] = {
    import docs.sparkSession.implicits._
    val toks = filter(split(col("text"), " "), t => t =!= "")
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(array_distinct(col("toks"))).as("term"))
      .select(col("term"), col("doc_id"),
        size(filter(col("toks"), t => t === col("term"))).cast("long").as("tf"))
      .as[(String, Long, Long)]
  }

  /** Streaming inverted-index maintenance (batch q192's stateful
    * dual): per term, the posting count and the OPEN 128-posting
    * block's running stats live in group state; each micro-batch
    * emits the updated manifest row of every block it touched —
    * (term, block_id, n_postings, min_doc_id, max_doc_id, sum_tf),
    * batch q192's columns minus df. Closed blocks are immutable
    * (positions only grow), so the LAST emission per (term, block)
    * after a drain is bit-identical to batch q192 over the same docs
    * — the index segment stays current at ingest instead of by
    * rebuild. The term's df never re-states closed blocks: it is
    * derivable from the newest block alone (block_id·128 +
    * n_postings), which is why the dual drops the column instead of
    * violating append-mode immutability.
    *
    * INPUT CONTRACT: doc_ids must arrive in nondecreasing order per
    * term and never re-ingest (the append-only-corpus condition a
    * segment build runs under — monotone ids make arrival order =
    * doc order, so posting lists stay doc-sorted). Out-of-order
    * backfills go through the batch rebuild, exactly like
    * [[prepStreamV2]]'s ExactSubstr stage.
    */
  def postingStream(postings: Dataset[(String, Long, Long)])
      : Dataset[(String, Long, Long, Long, Long, Long)] = {
    import postings.sparkSession.implicits._
    val B = graft.ops.TextOps.PostingBlockSize
    postings.groupByKey(_._1)
      .flatMapGroupsWithState[BlockState, (String, Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (term: String, it: Iterator[(String, Long, Long)], state: GroupState[BlockState]) =>
          var n = state.getOption.map(_.nPostings).getOrElse(0L)
          var open = state.getOption.filter(_.nPostings > 0L)
            .map(s => (s.blockN, s.blockMin, s.blockMax, s.blockTf))
          val emitted = scala.collection.mutable.LinkedHashMap[Long, (Long, Long, Long, Long)]()
          it.toSeq.sortBy(_._2).foreach { case (_, docId, tf) =>
            val block = n / B
            val cur = if (n % B == 0L) (0L, docId, docId, 0L) else open.get
            val upd = (cur._1 + 1L, math.min(cur._2, docId), math.max(cur._3, docId),
              cur._4 + tf)
            open = Some(upd)
            emitted(block) = upd
            n += 1L
          }
          open.foreach(o => state.update(BlockState(n, o._1, o._2, o._3, o._4)))
          emitted.iterator.map { case (b, (bn, mn, mx, tf)) => (term, b, bn, mn, mx, tf) }
      }
  }

  /** State for [[interArrivalStream]]: the last event-time (µs) seen
    * per (user, type) — ONE Long.
    */
  case class LastTsState(hasPrev: Boolean, lastUs: Long)

  /** Streaming inter-arrival feed (batch q189's stateful dual): per
    * (user, event_type), the previous event-time lives in group state
    * (one Long) and every subsequent event emits its gap record at
    * ingest — the live cadence feed whose downstream order-statistics
    * readout (min/median/p90/max per type) is batch q189's table,
    * kept current without rescanning history. Events inside a batch
    * fold in (ts, event_id) order ([[forwardFillStream]]'s
    * discipline); parity with the batch lag-window holds on a
    * time-ordered drain (StreamingSpec pins it) — late arrivals
    * produce arrival-order gaps, which [[disorderStream]] upstream
    * exists to measure and bound.
    *
    * INPUT CONTRACT: `user_id` must be non-null ([[Ev]]'s primitive
    * decode rejects NULLs — pre-filter the source). Batch q189 drops
    * null users too, so the parity contract is exact on filtered
    * input.
    */
  def interArrivalStream(events: Dataset[Ev]): Dataset[(String, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LastTsState, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((_, tpe), it: Iterator[Ev], state: GroupState[LastTsState]) =>
          var prev = state.getOption.filter(_.hasPrev).map(_.lastUs)
          val out = Seq.newBuilder[(String, Long, Long)]
          it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
            val us = tsMicros(e.ts)
            prev.foreach(p => out += ((tpe, e.event_id, us - p)))
            prev = Some(us)
          }
          prev.foreach(p => state.update(LastTsState(hasPrev = true, p)))
          out.result().iterator
      }
  }

  /** State for [[userGrowthStream]]: the earliest event-day seen per
    * user — ONE Long.
    */
  case class FirstDayState(hasDay: Boolean, day: Long)

  /** Streaming user-growth maintenance (batch q187's stateful dual):
    * per user, the running MINIMUM event-day lives in group state and
    * a (user, day) record is emitted only when it decreases — the
    * first sighting emits immediately, and a late-arriving EARLIER
    * event emits a correction (append mode cannot retract, so the
    * downstream contract is last-wins-by-minimum: `min(day) per user`
    * over the emitted feed IS batch q187's first-occurrence relation,
    * and the growth curve is its per-day count + prefix sum).
    * Min-folding is order-independent, so no intra-batch sort is
    * needed and batch seams cannot change the result — only WHEN
    * corrections surface. State is one Long per user; emissions per
    * user are strictly decreasing and in practice 1 + (#out-of-order
    * first sightings), not event volume.
    *
    * INPUT CONTRACT: `user_id` must be non-null ([[Ev]]'s primitive
    * decode rejects NULLs — pre-filter the source). Batch q187
    * excludes null users too (q186's basketless stance).
    */
  def userGrowthStream(events: Dataset[Ev]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FirstDayState, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FirstDayState]) =>
          var cur = state.getOption.filter(_.hasDay).map(_.day)
          val out = Seq.newBuilder[(Long, Long)]
          it.foreach { e =>
            val day = Math.floorDiv(tsMicros(e.ts), 86400000000L)
            if (cur.forall(day < _)) { cur = Some(day); out += ((uid, day)) }
          }
          cur.foreach(d => state.update(FirstDayState(hasDay = true, d)))
          out.result().iterator
      }
  }

  /** State for [[rollingActivesStream]]: the last emitted grid day
    * (valid when hasEmitted) plus the retained per-day distinct-user
    * sets as parallel seqs — open days and the ≤6 closed days a
    * future window can still reach back to.
    */
  case class RollingActivesState(hasEmitted: Boolean, lastEmitted: Long,
                                 days: Seq[Long], users: Seq[Seq[Long]])

  /** Streaming DAU/WAU maintenance (batch q239's stateful dual — the
    * growth/stickiness monitor is most valuable LIVE): per-day
    * distinct-user sets accumulate in group state; a grid day CLOSES
    * when a strictly later event-day arrives, emitting
    * (day, dau, wau_7d) with wau the exact distinct-user union over
    * [d−6, d] — including zero-fill rows for silent grid days between
    * arrivals (a dead week must read 0, q239's discipline; its window
    * can still be non-zero from retained earlier days). Retention is
    * exactly the window's reach: after emitting day e, sets for days
    * < e−5 drop, so state is ≤ 7 in-reach days × their distinct users
    * plus the open-day buffer, never history.
    *
    * ONE global group — the readout is corpus-level by definition. At
    * production scale the exact per-day set state is the bound to
    * watch (state ~ DAU): the documented swap-ins are (a) key by a
    * user-hash shard and re-merge shard emissions per day downstream
    * (set unions are associative), or (b) q239b's HLL register as the
    * state (fixed-size, same merge) — this dual keeps exact sets, the
    * q239 EXACT contract. Parity on a bounded drain: emitted rows ≡
    * batch q239 minus the final (still-open) grid day, cusumStream's
    * open-tail bound. Disorder contract: once any grid day has been
    * emitted, an arriving event whose day is ≤ the LAST EMITTED day is
    * out of contract — whether that day itself was emitted (a late
    * event for a closed day) or lies BELOW the first emitted day (a
    * late-discovered earlier dmin: grid rows before it can no longer
    * appear, and already-emitted windows reaching back to it were
    * sealed without its users). Both are scd2Stream's disorder class —
    * size the upstream watermark from q179 so day-level disorder stays
    * inside the open horizon. INPUT: user_id/ts non-null ([[Ev]]'s
    * primitive decode; the driver corpus has no null users).
    */
  def rollingActivesStream(events: Dataset[Ev]): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState[RollingActivesState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[Ev], state: GroupState[RollingActivesState]) =>
          val s0 = state.getOption.getOrElse(RollingActivesState(false, 0L, Nil, Nil))
          val buf = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
          s0.days.zip(s0.users).foreach { case (d, us) =>
            buf(d) = scala.collection.mutable.Set.from(us)
          }
          it.foreach { e =>
            val day = Math.floorDiv(tsMicros(e.ts), 86400000000L)
            buf.getOrElseUpdate(day, scala.collection.mutable.Set.empty) += e.user_id
          }
          val out = Seq.newBuilder[(Long, Long, Long)]
          var hasEm = s0.hasEmitted
          var last = s0.lastEmitted
          if (buf.nonEmpty) {
            val mx = buf.keys.max
            val start = if (hasEm) last + 1L else buf.keys.min
            var d = start
            while (d < mx) { // every grid day strictly before the max closes
              val dau = buf.get(d).map(_.size.toLong).getOrElse(0L)
              val wau = (d - 6L to d).iterator.flatMap(buf.get).flatten.toSet.size.toLong
              out += ((d, dau, wau))
              hasEm = true; last = d; d += 1L
            }
            if (hasEm) buf.keys.filter(_ < last - 5L).toSeq.foreach(buf.remove)
          }
          val days = buf.keys.toSeq.sorted
          state.update(RollingActivesState(hasEm, last, days, days.map(d => buf(d).toSeq.sorted)))
          out.result().iterator
      }
  }

  /** State for [[cusumStream]]: baseline progress (active days closed
    * so far and their count sum), the carried C⁺/C⁻ in 2·n₀-scaled
    * units, and the OPEN day buffer (days not yet closed by a later
    * arrival) as parallel seqs.
    */
  case class CusumState(nBase: Long, sBase: Long, cUp: Long, cDn: Long,
                        openDays: Seq[Long], openCounts: Seq[Long])

  /** Streaming CUSUM level-shift maintenance (batch q196's stateful
    * dual): per event type, daily counts accumulate in an OPEN-day
    * buffer; a day CLOSES when a strictly later day arrives for the
    * type, folds into the first-7-active-days baseline, and then runs
    * the classic Page recurrences C⁺ = max(0, C⁺ + (2n₀x − 3S₀)),
    * C⁻ = max(0, C⁻ + (S₀ − 2n₀x)) in the same exact 2·n₀-scaled
    * integers as the batch (the batch's prefix-sum identity is just
    * the window-friendly form of this recurrence — streaming replays
    * it directly because days arrive in order once closed). Emits one
    * row per closed post-baseline day, bit-identical to q196's.
    *
    * INPUT: (event_type, ts) ticks only — deliberately NOT [[Ev]],
    * whose primitive user_id/value decode rejects the NULLs that batch
    * q196 happily counts (it groups on (type, day) alone); the narrow
    * carrier keeps parity total over the real corpus, null users and
    * all. A null event_type is its own group, like the batch groupBy;
    * ts must be non-null (an event with no event time has no day).
    * Day-level disorder is tolerated only within the open horizon —
    * events for a day that already closed (a later day had arrived
    * before them) are out of contract, the same class of bound as
    * [[scd2Stream]]'s; size the upstream watermark from q179 so the
    * horizon holds. Each type's LAST active day never closes on a
    * bounded drain (nothing arrives after it): parity vs batch q196
    * is all rows except each type's final active day, and production
    * closes the tail with an event-time timeout at the watermark.
    * State is four longs + the open buffer (one entry per in-flight
    * day — O(disorder horizon), not history).
    */
  def cusumStream(events: Dataset[(String, java.sql.Timestamp)])
      : Dataset[(String, Long, Long, Long, Long, Boolean, Boolean)] = {
    import events.sparkSession.implicits._
    val b = graft.ops.Events.CusumBaselineDays
    events.groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, (String, Long, Long, Long, Long, Boolean, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[(String, java.sql.Timestamp)], state: GroupState[CusumState]) =>
          val s0 = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L, Nil, Nil))
          val buf = scala.collection.mutable.Map.from(s0.openDays.zip(s0.openCounts))
          it.foreach { e =>
            val day = Math.floorDiv(tsMicros(e._2), 86400000000L)
            buf.update(day, buf.getOrElse(day, 0L) + 1L)
          }
          var (nb, sb, cUp, cDn) = (s0.nBase, s0.sBase, s0.cUp, s0.cDn)
          val out = Seq.newBuilder[(String, Long, Long, Long, Long, Boolean, Boolean)]
          if (buf.nonEmpty) {
            val mx = buf.keys.max
            buf.keys.filter(_ < mx).toSeq.sorted.foreach { d =>
              val n = buf.remove(d).get
              if (nb < b) { nb += 1; sb += n }
              else {
                cUp = math.max(0L, cUp + (2L * b * n - 3L * sb))
                cDn = math.max(0L, cDn + (sb - 2L * b * n))
                out += ((tpe, d, n, cUp, cDn, cUp > 8L * sb, cDn > 8L * sb))
              }
            }
          }
          val open = buf.toSeq.sortBy(_._1)
          state.update(CusumState(nb, sb, cUp, cDn, open.map(_._1), open.map(_._2)))
          out.result().iterator
      }
  }

  /** State for [[spikeStream]]: the open-hour buffer plus the closed
    * trailing baseline hours, both as parallel seqs (≤ 25 baseline
    * entries: the ≤24-entry RANGE window plus the just-closed hour,
    * which the NEXT close trims back into the window).
    */
  case class SpikeState(openHrs: Seq[Long], openNs: Seq[Long],
                        baseHrs: Seq[Long], baseNs: Seq[Long])

  /** Streaming traffic-spike maintenance (batch q183's stateful dual,
    * [[cusumStream]]'s sibling at hour grain): per event type, hourly
    * counts accumulate in an open-hour buffer; an hour CLOSES when a
    * strictly later hour arrives, reads its trailing-24-HOUR baseline
    * from the ≤24 closed hours carried in state (calendar gaps count
    * as silence — the RANGE-frame semantics, not a 24-row frame), and
    * emits the same cross-multiplied verdict as the batch
    * (`n·hours > 3·Σbaseline`, armed at ≥ 6 baseline hours). Same
    * (type, ts) carrier, close-on-successor contract, and
    * open-tail parity bound as [[cusumStream]] (emitted rows ≡ batch
    * q183 minus each type's final active hour). State per type:
    * the open buffer + at most 24 (hour, count) baseline pairs.
    */
  def spikeStream(events: Dataset[(String, java.sql.Timestamp)])
      : Dataset[(String, Long, Long, Long, Long, Boolean)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SpikeState, (String, Long, Long, Long, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[(String, java.sql.Timestamp)], state: GroupState[SpikeState]) =>
          val s0 = state.getOption.getOrElse(SpikeState(Nil, Nil, Nil, Nil))
          val buf = scala.collection.mutable.Map.from(s0.openHrs.zip(s0.openNs))
          it.foreach { e =>
            val hr = Math.floorDiv(tsMicros(e._2), 3600000000L)
            buf.update(hr, buf.getOrElse(hr, 0L) + 1L)
          }
          var base = s0.baseHrs.zip(s0.baseNs).toVector
          val out = Seq.newBuilder[(String, Long, Long, Long, Long, Boolean)]
          if (buf.nonEmpty) {
            val mx = buf.keys.max
            buf.keys.filter(_ < mx).toSeq.sorted.foreach { h =>
              val n = buf.remove(h).get
              base = base.filter(_._1 >= h - 24) // all entries are < h already
              val bSum = base.map(_._2).sum
              val bHrs = base.size.toLong
              out += ((tpe, h, n, bSum, bHrs, bHrs >= 6L && n * bHrs > bSum * 3L))
              base = base :+ ((h, n))
            }
          }
          val open = buf.toSeq.sortBy(_._1)
          state.update(SpikeState(open.map(_._1), open.map(_._2),
            base.map(_._1), base.map(_._2)))
          out.result().iterator
      }
  }

  /** State for [[freshnessStream]]: the running GLOBAL max event
    * micros (the data anchor) plus, per event type (parallel seqs),
    * the running event count, running max micros, and the retained
    * event micros inside the trailing 24 h of the anchor.
    */
  case class FreshState(anchorUs: Long, types: Seq[String], counts: Seq[Long],
                        maxes: Seq[Long], recents: Seq[Seq[Long]])

  /** Streaming freshness maintenance (batch q171's stateful dual —
    * ingestion health is the monitor you most want LIVE): after every
    * micro-batch, emits the full per-type audit snapshot — n_events,
    * max event micros, lag vs the corpus anchor (the running GLOBAL
    * max event time, q17/q171's data-anchored "now" — never the wall
    * clock), the µs-exact trailing-24h arrival count, and the strict
    * 1h stale flag — each row tagged with its anchor so the sink's
    * last-wins readout is `rows with max(anchor_us)`.
    *
    * Unlike the close-on-successor duals ([[cusumStream]],
    * [[spikeStream]], [[rollingActivesStream]]), freshness has NO
    * open-tail parity bound and NO disorder contract: every fold is
    * commutative (count, max, and window membership vs an anchor that
    * only grows — a retained µs can never re-enter a window it left,
    * and a late event older than anchor−24h never enters it), so the
    * final drained snapshot equals batch q171 EXACTLY under any
    * micro-batch seam or arrival order (StreamingSpec pins a late
    * cross-seam arrival). A NULL event_type is its own group, like the
    * batch groupBy; the (type, ts) carrier keeps NULL-user/value rows
    * counted, cusumStream's reasoning.
    *
    * ONE global group — the anchor is corpus-level by definition, so
    * per-type maxes and the global max live in one state row. At
    * production scale the swap-ins (rollingActivesStream's
    * discipline) are: (a) key by event_type and resolve the anchor at
    * the SINK (max over the per-type snapshot rows — the same
    * one-row-broadcast join shape as the batch, moved downstream), or
    * (b) key by (type, user-hash shard) and re-merge shard snapshots
    * (all folds are associative). State per type is two longs + the
    * trailing-24h micros — the µs-exactness price (state ~ 24 h of
    * arrivals); the documented approximations are hour-bucket counts
    * (spikeStream's grain, boundary-hour inexact) or a q239b-class
    * sketch when ±few-% arrival counts suffice.
    */
  def freshnessStream(events: Dataset[(String, java.sql.Timestamp)])
      : Dataset[(String, Long, Long, Long, Long, Boolean, Long)] = {
    import events.sparkSession.implicits._
    val day = graft.ops.Events.MicrosPerDay
    events.groupByKey(_ => 0)
      .flatMapGroupsWithState[FreshState, (String, Long, Long, Long, Long, Boolean, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[(String, java.sql.Timestamp)], state: GroupState[FreshState]) =>
          val s0 = state.getOption.getOrElse(FreshState(Long.MinValue, Nil, Nil, Nil, Nil))
          val m = scala.collection.mutable.HashMap
            .empty[Option[String], (Long, Long, Vector[Long])]
          s0.types.indices.foreach { i =>
            m(Option(s0.types(i))) = (s0.counts(i), s0.maxes(i), s0.recents(i).toVector)
          }
          var anchor = s0.anchorUs
          it.foreach { e =>
            val us = tsMicros(e._2)
            anchor = math.max(anchor, us)
            val (c, mx, rec) = m.getOrElse(Option(e._1), (0L, Long.MinValue, Vector.empty[Long]))
            m(Option(e._1)) = (c + 1L, math.max(mx, us), rec :+ us)
          }
          // prune to the exact window floor — safe because the anchor
          // only grows, so a dropped µs can never re-qualify
          val pruned = m.view.map { case (t, (c, mx, rec)) =>
            (t, (c, mx, rec.filter(_ >= anchor - day))) }.toMap
          val keys = pruned.keys.toSeq.sorted
          state.update(FreshState(anchor, keys.map(_.orNull), keys.map(pruned(_)._1),
            keys.map(pruned(_)._2), keys.map(pruned(_)._3.sorted)))
          keys.iterator.map { t =>
            val (c, mx, rec) = pruned(t)
            val lagSec = Math.floorDiv(anchor - mx, 1000000L)
            (t.orNull, c, mx, lagSec, rec.size.toLong, lagSec > 3600L, anchor)
          }
      }
  }

  /** State for [[keyCountStream]]: the two side counters of one
    * (group, key) — e.g. child and parent row counts of an FK edge.
    */
  case class SideCounts(n0: Long, n1: Long)

  /** Streaming join-preflight maintenance — the SHARED stateful dual
    * of batch q174 (join-skew audit) and q182 (join-cardinality
    * audit): both verdicts are pure functions of per-key row counts,
    * so ONE stream maintains the counts and each audit is a sink-side
    * readout over the drained last-wins feed. Input ticks are
    * (group, side, key) — group = the audited relation.column (q174)
    * or FK edge name (q182), side = 0 (q174's only side; q182's
    * child) or 1 (q182's parent), key = the join key cast to string
    * (injective on the integer warehouse keys; NULL keys flow — the
    * batch audits count them separately). Emits one updated
    * (group, key, n0, n1) snapshot per touched key per micro-batch;
    * the sink keeps the last (counts are monotone, so max ≡ last).
    *
    * Readouts — one definition, two runtimes (dqGateStream's
    * discipline): [[graft.ops.Audit.skewReadout]] over the feed
    * renamed (rel, k, cnt = n0) ≡ batch q174;
    * [[graft.ops.Audit.cardinalityReadout]] over (edge, k, cc = n0,
    * pc = n1) ≡ batch q182. Like [[freshnessStream]], counting is
    * commutative: NO disorder contract, NO open-tail bound — the
    * final feed equals the batch counts exactly under any seam or
    * arrival order.
    *
    * Scale: state is two longs per distinct (group, key) — the same
    * key-cardinality-sized relation the batch audits shuffle, held
    * incrementally instead of rebuilt per run (the q210 IVM argument:
    * a 100 TB preflight you re-scan nightly vs counts you maintain).
    * The documented swap-in when even distinct keys overflow state is
    * the batch scaladoc's Misra-Gries/count-min heavy-hitter pass,
    * which q174's contract (top key + threshold flag) is shaped to
    * accept.
    */
  def keyCountStream(ticks: Dataset[(String, Int, String)])
      : Dataset[(String, String, Long, Long)] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(t => (t._1, t._3))
      .flatMapGroupsWithState[SideCounts, (String, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((grp, key), it: Iterator[(String, Int, String)], state: GroupState[SideCounts]) =>
          var s = state.getOption.getOrElse(SideCounts(0L, 0L))
          it.foreach { t =>
            s = if (t._2 == 0) s.copy(n0 = s.n0 + 1L) else s.copy(n1 = s.n1 + 1L)
          }
          state.update(s)
          Iterator.single((grp, key, s.n0, s.n1))
      }
  }

  /** Streaming DQ admission gate (batch q169's row-local constraints
    * at the ingest edge): tags every incoming event row with the list
    * of violated constraint names and a pass flag, evaluated from the
    * SAME SQL predicate strings as the batch audit
    * ([[graft.ops.Audit.RowConstraints]] — one definition, two
    * runtimes). Stateless and row-local: no watermark, no state store,
    * survives any micro-batch split, and the downstream split is
    * `filter(dq_pass)` to the main sink vs its negation to the
    * quarantine sink. A NULL predicate result is not a violation
    * (batch CHECK semantics). Parity contract (StreamingSpec): the
    * drained per-constraint violation totals equal batch q169's
    * events rows.
    */
  def dqGateStream(events: DataFrame): DataFrame = {
    val cs = graft.ops.Audit.RowConstraints.toMap.apply("events")
    events
      .withColumn("violated", filter(
        array(cs.map { case (n, p) => when(expr(p), lit(n)) }: _*), _.isNotNull))
      .withColumn("dq_pass", size(col("violated")) === 0)
  }

  /** State for [[scd2Stream]]: the OPEN version per user — number,
    * type and start of the interval that has not closed yet.
    */
  case class Scd2State(hasOpen: Boolean, version: Long, curType: String, validFromUs: Long)

  /** Streaming SCD type-2 build (batch q163's stateful dual): one
    * (user_id, version, event_type, valid_from_us, valid_to_us) row per
    * CLOSED version — emitted at the moment the type CHANGES, with the
    * new event's timestamp closing the interval. The open current
    * version lives only in group state: append mode cannot retract, so
    * it is published on the NEXT change (batch q163's null-valid_to
    * row is exactly this state, snapshot at drain end). Events inside
    * a batch fold in (ts, event_id) order ([[forwardFillStream]]'s
    * discipline); no-change events touch neither state nor output.
    *
    * Parity contract (StreamingSpec): the emitted rows equal batch
    * q163's rows WHERE valid_to IS NOT NULL, bit-for-bit.
    *
    * Input contract: `event_type` must be non-null — feed the
    * [[dqGateStream]]-passed stream (its `event_type_not_null`
    * constraint quarantines the rest). A NULL type would read as a
    * change here but as no-change in batch q163's `=!=` filter.
    */
  def scd2Stream(events: Dataset[Ev]): Dataset[(Long, Long, String, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, (Long, Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Scd2State]) =>
          val evs = it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(Scd2State(hasOpen = false, 0L, "", 0L))
          val out = Seq.newBuilder[(Long, Long, String, Long, Long)]
          evs.foreach { e =>
            val us = tsMicros(e.ts)
            if (!st.hasOpen) st = Scd2State(hasOpen = true, 1L, e.event_type, us)
            else if (e.event_type != st.curType) {
              out += ((uid, st.version, st.curType, st.validFromUs, us))
              st = Scd2State(hasOpen = true, st.version + 1, e.event_type, us)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Event row for streams that must carry a NULLABLE value
    * faithfully: `events.value` is nullable and batch q162 null-safes
    * its change test, so the streaming dual cannot decode into [[Ev]]'s
    * primitive Double (a NULL kills the query). Flag + primitive, never
    * Option — [[FillState]]'s encoder discipline. Build with [[toEvN]].
    */
  case class EvN(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double, valueIsNull: Boolean)

  /** Adapt the raw events frame (nullable value) to [[EvN]]. */
  def toEvN(events: DataFrame): Dataset[EvN] = {
    import events.sparkSession.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
      coalesce(col("value"), lit(0.0)).as("value"),
      col("value").isNull.as("valueIsNull")).as[EvN]
  }

  /** State for [[lastStateStream]]: the (ts, event_id)-max event's
    * (type, value, null flag) per user — q162's per-side argmax kept
    * incrementally.
    */
  case class LastSeen(hasV: Boolean, us: Long, eventId: Long, lastType: String,
                      value: Double, valueIsNull: Boolean)

  /** Streaming last-state maintenance (batch q162's per-snapshot
    * argmax as an incremental stream): after each micro-batch that
    * touches a user, emits that user's current
    * (user_id, event_type, value, valueIsNull, us, event_id) — the
    * max-struct winner over everything delivered so far, out-of-order
    * safe (a late event older than the state's (us, event_id) leaves
    * it unchanged), and NULL-value faithful via [[EvN]]'s flag (batch
    * q162 null-safes its change test; the stream must carry the same
    * distinction). Update-mode semantics via flatMapGroups +
    * downstream last-emission-wins: a CDC consumer materializes the
    * snapshot by keeping each user's latest emission, and q162's diff
    * is then a BATCH compare of two such snapshots (StreamingSpec
    * drains the two cut sides through two independent runs, NULL
    * value included, and pins the classification counts to batch
    * q162).
    */
  def lastStateStream(events: Dataset[EvN]): Dataset[(Long, String, Double, Boolean, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, (Long, String, Double, Boolean, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EvN], state: GroupState[LastSeen]) =>
          val batchMax = it.maxBy(e => (tsMicros(e.ts), e.event_id))
          val bUs = tsMicros(batchMax.ts)
          val prev = state.getOption.filter(_.hasV)
          val keepPrev = prev.exists(p =>
            p.us > bUs || (p.us == bUs && p.eventId > batchMax.event_id))
          val st =
            if (keepPrev) prev.get
            else LastSeen(hasV = true, bUs, batchMax.event_id,
              batchMax.event_type, batchMax.value, batchMax.valueIsNull)
          state.update(st)
          Iterator.single((uid, st.lastType, st.value, st.valueIsNull, st.us, st.eventId))
      }
  }

  /** The stateless parse front of [[jsonProfileStream]]: one
    * (key, value) row per entry of each valid-JSON-OBJECT payload,
    * under EXACTLY batch q211's parse contract
    * (`allowSingleQuotes=false`, `allowNonNumericNumbers=false` —
    * malformed rows, scalars, arrays, NULLs contribute nothing).
    * Row-local, so no watermark and no state.
    */
  def jsonKvFeed(rows: DataFrame): Dataset[(String, String)] = {
    import rows.sparkSession.implicits._
    rows.filter(col("props").isNotNull)
      .select(explode(expr("from_json(props, 'map<string,string>', " +
        "map('allowSingleQuotes', 'false', 'allowNonNumericNumbers', 'false'))"))
        .as(Seq("key", "value")))
      .as[(String, String)]
  }

  /** State for [[jsonProfileStream]]: the row count plus the 64-bit
    * value-hash set backing the exact distinct count.
    */
  case class JsonKeyState(nRows: Long, valueHashes: Seq[Long])

  /** Streaming JSON payload profiling (batch q211's stateful dual —
    * the schema-on-read drift monitor run where it matters most, at
    * the ingest edge: a new key or a cardinality explosion surfaces in
    * the NEXT micro-batch, not the next nightly profile). Per payload
    * key, group state carries the row count and the distinct-value
    * set as 64-bit hashes (two-seed murmur over the value string —
    * 16 B/value instead of the value body; exact up to 64-bit
    * collisions, i.e. ~n²/2⁶⁵); each micro-batch emits the updated
    * (key, n_rows, n_distinct_values) row of every key it touched
    * ([[merkleStream]]'s emission contract), so the LAST emission per
    * key after a drain matches batch q211's per-key columns
    * bit-for-bit (StreamingSpec pins it; the batch's n_total /
    * `ubiquitous` columns are a corpus-global readout, derivable
    * downstream from the total ingested count, not per-key state).
    * A NULL map value counts toward n_rows but never the distinct set
    * (batch countDistinct semantics).
    *
    * STATE CONTRACT: O(distinct values) per key — right for the
    * profile's purpose (payload fields are enum-ish; that is what
    * makes them promotable to columns). A key whose value cardinality
    * is unbounded (an id field) is exactly what the monitor exists to
    * FLAG, and once flagged belongs in a q47-style HLL sketch state,
    * not an exact set — swap `valueHashes` for the sketch bytes at
    * that point.
    */
  def jsonProfileStream(kvs: Dataset[(String, String)])
      : Dataset[(String, Long, Long)] = {
    import kvs.sparkSession.implicits._
    kvs.groupByKey(_._1)
      .flatMapGroupsWithState[JsonKeyState, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, String)], state: GroupState[JsonKeyState]) =>
          val s0 = state.getOption.getOrElse(JsonKeyState(0L, Nil))
          var n = s0.nRows
          val hashes = scala.collection.mutable.Set.from(s0.valueHashes)
          it.foreach { case (_, v) =>
            n += 1L
            if (v != null) {
              val h = (scala.util.hashing.MurmurHash3.stringHash(v, 0x9747b28c).toLong << 32) |
                (scala.util.hashing.MurmurHash3.stringHash(v, 0x5bd1e995).toLong & 0xffffffffL)
              hashes += h
            }
          }
          state.update(JsonKeyState(n, hashes.toSeq))
          Iterator.single((key, n, hashes.size.toLong))
      }
  }

  /** State for [[dwellStream]]: the user's last event — type + time
    * (µs) + id for the tie rule.
    */
  case class LastEvState(has: Boolean, lastType: String, lastUs: Long, lastId: Long)

  /** Streaming transition-dwell feed (batch q215's stateful dual, and
    * [[interArrivalStream]]'s sibling keyed per USER instead of
    * (user, type)): the user's previous event (type, time) lives in
    * group state and every subsequent event emits its hop record
    * (from_type, to_type, dwell_µs) at ingest — the live edge-latency
    * feed whose per-edge order-statistics readout (count, min/max,
    * p50/p90) is batch q215's table. The carried state joins the
    * incoming batch as an ELEMENT of the (ts, event_id) sort — the
    * batch userWindow's tie rule — so an event tying the carried one
    * on ts emits its hops in the batch direction regardless of which
    * micro-batch it arrived in. Parity with the batch lead-window
    * holds on a time-ordered drain; an event sorting BEFORE the
    * carried one (a cross-batch tie with a smaller id, or a late
    * arrival) gets ITS local hops right, but hops already emitted are
    * never retracted ([[interArrivalStream]]'s arrival-order bound,
    * measured upstream by [[disorderStream]]). NULL users form
    * their own batch partition but a degenerate stream group —
    * pre-filter, or accept the one synthetic group (batch q215 keeps
    * them; the parity test feeds them as one key).
    */
  def dwellStream(events: Dataset[Ev]): Dataset[(String, String, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvState, (String, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Ev], state: GroupState[LastEvState]) =>
          val carried = state.getOption.filter(_.has)
            .map(p => (p.lastUs, p.lastId, p.lastType)).toSeq
          val merged = (carried ++
            it.map(e => (tsMicros(e.ts), e.event_id, e.event_type)))
            .sortBy(t => (t._1, t._2))
          val out = merged.iterator.sliding(2).withPartial(false)
            .map { case Seq(a, b) => (a._3, b._3, b._1 - a._1) }
          val res = out.toVector
          val last = merged.last
          state.update(LastEvState(has = true, last._3, last._1, last._2))
          res.iterator
      }
  }

  /** State for [[twapStream]]: the (user, type) key's latest reading —
    * time (µs), id for the tie rule, and the 6-dp-quantized value it
    * holds until the next reading closes the interval.
    */
  case class LastReading(has: Boolean, lastUs: Long, lastId: Long, lastVq: Double)

  /** Streaming holding-interval feed (batch q232's stateful dual,
    * [[dwellStream]]'s shape keyed per (user, type) and carrying the
    * VALUE): each new reading closes its predecessor's interval and
    * emits (event_type, Δt_µs, held_vq) at ingest — the live TWAP feed
    * whose pooled per-type readout (exact decimal Σ(vq·Δt) / ΣΔt, the
    * batch fold verbatim) is batch q232's table minus each key's final
    * OPEN interval (the batch also holds nothing after the last
    * reading, so parity is total on a drained stream). Values quantize
    * to 6 dp INSIDE the stream — the same exactly-representable grid
    * as the batch, so the downstream decimal fold cannot drift. The
    * carried reading joins the incoming batch as an element of the
    * (ts, event_id) sort (the batch window's tie rule); same
    * arrival-order bound as [[dwellStream]] for late events. Input
    * contract: callers pre-filter NULL values (batch q232 excludes
    * them up front; [[Ev]]'s primitive decode would reject them —
    * [[EvN]]'s scaladoc discipline).
    */
  def twapStream(events: Dataset[Ev]): Dataset[(String, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LastReading, (String, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), it: Iterator[Ev], state: GroupState[LastReading]) =>
          val carried = state.getOption.filter(_.has)
            .map(p => (p.lastUs, p.lastId, p.lastVq)).toSeq
          val merged = (carried ++
            it.map(e => (tsMicros(e.ts), e.event_id,
              math.floor(e.value * 1000000.0 + 0.5) / 1000000.0)))
            .sortBy(t => (t._1, t._2))
          val res = merged.iterator.sliding(2).withPartial(false)
            .map { case Seq(a, b) => (key._2, b._1 - a._1, a._3) }
            .toVector
          val last = merged.last
          state.update(LastReading(has = true, last._1, last._2, last._3))
          res.iterator
      }
  }

  /** State for [[growthAccountingStream]]: the customer's first order
    * month — ONE Long.
    */
  case class FirstMoState(has: Boolean, firstMo: Long)

  /** Streaming growth accounting (batch q191's stateful dual): per
    * customer, the FIRST order month lives in group state (one Long)
    * and every order emits its classified record
    * (custkey, month, is_new, price) at ingest — `is_new` is the
    * standard cohort convention (every order in the customer's first
    * month counts new). The month-level readout — order counts,
    * new-customer counts, new/returning revenue — is a plain batch
    * aggregate over the feed and equals q191's table on a drain
    * (StreamingSpec pins it), kept current per micro-batch instead of
    * by monthly rescan.
    *
    * INPUT CONTRACT: per customer, order months must arrive
    * nondecreasing ACROSS micro-batches ([[postingStream]]'s monotone
    * contract — intra-batch disorder folds in month order); an
    * out-of-order EARLIER first month would re-classify already-
    * emitted orders, which append mode cannot retract — backfills go
    * through the batch rebuild. custkey must be non-null (TPC-H FK;
    * [[interArrivalStream]]'s stance).
    */
  def growthAccountingStream(orders: Dataset[(Long, Long, Double)])
      : Dataset[(Long, Long, Boolean, Double)] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_._1)
      .flatMapGroupsWithState[FirstMoState, (Long, Long, Boolean, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (c: Long, it: Iterator[(Long, Long, Double)], state: GroupState[FirstMoState]) =>
          var first = state.getOption.filter(_.has).map(_.firstMo)
          val out = Seq.newBuilder[(Long, Long, Boolean, Double)]
          it.toSeq.sortBy(_._2).foreach { case (_, mo, price) =>
            if (first.isEmpty) first = Some(mo)
            out += ((c, mo, mo == first.get, price))
          }
          first.foreach(f => state.update(FirstMoState(has = true, f)))
          out.result().iterator
      }
  }

  /** State for [[concurrencyStream]]: the user's OPEN session —
    * start/last event-time (µs) and its event count.
    */
  case class OpenSession(hasOpen: Boolean, startUs: Long, lastUs: Long, n: Long)

  /** Streaming gap-session spans (batch q13's EXACT-span dual and the
    * feed under q200's capacity sweep): per user, the open session
    * lives in group state — start, last-seen event time, event count,
    * three longs, precisely the "one state entry per OPEN session"
    * story q200's scaladoc tells, which makes the store's size AT any
    * instant the concurrency q200 reports — and a session CLOSES when
    * an event arrives more than the 24 h gap
    * ([[graft.ops.Events.MicrosPerDay]]) after it, emitting the
    * finished (user, start_us, end_us, n_events) span. Unlike
    * [[sessionize]] (the `session_window` form, which emits on
    * WATERMARK passage and returns gap-padded window bounds), the
    * close-on-successor form emits exact event-time spans, so closed
    * spans are bit-identical to batch [[graft.ops.Events.q13Sessionize]]
    * rows and running [[graft.ops.Events.concurrencySweep]] over the
    * drained feed plus the still-open tails reproduces batch q200
    * exactly (StreamingSpec pins both). Events inside a batch fold in
    * ts order; each user's final session never closes on a bounded
    * drain ([[cusumStream]]'s open-tail parity bound — production
    * closes it with an event-time timeout at the watermark).
    *
    * INPUT CONTRACT: (user_id, ts), both non-null (batch q13 windows
    * partition on user_id; a null user is its own batch partition but
    * a degenerate singleton stream group — pre-filter, like
    * [[interArrivalStream]]). Within-user disorder beyond the open
    * horizon is out of contract ([[scd2Stream]]'s bound).
    */
  def concurrencyStream(events: Dataset[(Long, java.sql.Timestamp)])
      : Dataset[(Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    val gap = graft.ops.Events.MicrosPerDay
    events.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)], state: GroupState[OpenSession]) =>
          var cur = state.getOption.filter(_.hasOpen)
          val out = Seq.newBuilder[(Long, Long, Long, Long)]
          it.toSeq.map(e => tsMicros(e._2)).sorted.foreach { us =>
            cur match {
              case Some(s) if us - s.lastUs > gap =>
                out += ((uid, s.startUs, s.lastUs, s.n))
                cur = Some(OpenSession(hasOpen = true, us, us, 1L))
              case Some(s) =>
                cur = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1L))
              case None =>
                cur = Some(OpenSession(hasOpen = true, us, us, 1L))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
