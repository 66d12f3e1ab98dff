package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftlog` — a DataSource V2 batch source for the reference's
  * Kafka-drained log-message files (one JSON message `{"log": "..."}`
  * per line, one file per stream/partition — the on-disk shape of
  * reference main.py:44-58's consumer drain). Usage:
  *
  * {{{
  *   spark.read.format("graftlog").load("/data/logs")   // dir of *.jsonl
  * }}}
  *
  * Schema: `stream` (file basename — the Kafka partition key),
  * `offset` (0-based line number — the Kafka offset), `value` (the raw
  * message). Exactly `DelotonPipeline.rawSchema`, so the ETL runs
  * unchanged on top.
  *
  * The point of doing this at the DSv2 layer (vs `spark.read.text` +
  * projections) is what the connector API lets the source do BEFORE
  * rows exist:
  *
  *  - '''Column pruning''' ([[SupportsPushDownRequiredColumns]]): a
  *    query touching only `value` never materializes `stream`/`offset`
  *    strings per row; the reader emits exactly the pruned schema.
  *  - '''Partition pruning via filter pushdown'''
  *    ([[SupportsPushDownFilters]]): `stream = 'x'` equality filters
  *    are consumed by the source, which then SKIPS THE WHOLE FILE for
  *    non-matching streams — the Kafka-partition analogue of parquet
  *    partition pruning; unhandled filters stay in the plan (the
  *    source only accepts what it fully enforces, so residual
  *    evaluation is never lost).
  *  - '''Parallelism = files''': one [[InputPartition]] per file, the
  *    natural Kafka-partition granularity; no global state.
  *
  * LogSourceSpec drives all three through the public read API and
  * asserts pruning/pushdown from the executed plan + reader behavior.
  */
class LogSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = LogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LogTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object LogSource {
  import scala.jdk.CollectionConverters._

  // field-for-field DelotonPipeline.rawSchema (nullability included, so
  // schema-equality checks and unions of the two paths line up); the
  // source never actually emits null stream/offset
  val Schema: StructType = StructType(Seq(
    StructField("stream", StringType),
    StructField("offset", LongType),
    StructField("value", StringType)))

  /** stream id of a log file = basename without extension. */
  def streamOf(path: java.nio.file.Path): String = {
    val n = path.getFileName.toString
    val dot = n.lastIndexOf('.')
    if (dot > 0) n.substring(0, dot) else n
  }

  /** Driver-side file listing (java.nio — this demonstration source
    * targets local/NFS paths; a cluster deployment swaps in the Hadoop
    * FileSystem API here and nothing else changes).
    *
    * Rejects directories where two files map to the same stream id
    * (e.g. `bike-1.jsonl` + `bike-1.log`): both would emit
    * independently 0-based offsets under one stream, so
    * `(stream, offset)` would stop being a unique key and a pushed
    * stream-equality filter would silently read both files.
    */
  private[sources] def listLogFiles(dir: String): Seq[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(dir)
    val files =
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toSeq.sortBy(_.toString)
        finally s.close()
      } else Seq(p)
    files.groupBy(streamOf).find(_._2.size > 1).foreach { case (id, dup) =>
      throw new IllegalArgumentException(
        s"graftlog: files ${dup.map(_.getFileName).mkString(", ")} all map to stream '$id'; " +
          "(stream, offset) must be unique — rename so basenames-without-extension are distinct")
    }
    files
  }
}

private class LogTable(path: String) extends Table with SupportsRead {
  require(path != null, "graftlog requires a path: spark.read.format(\"graftlog\").load(dir)")
  override def name(): String = s"graftlog($path)"
  override def schema(): StructType = LogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogScanBuilder(path)
}

private class LogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = LogSource.Schema
  private var streamEq: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept only what the source fully enforces: `stream = <literal>`
    * (file skip). Everything else is returned as residual for Spark to
    * evaluate — correctness never depends on the source's cleverness.
    * Only equalities AGREEING with the first accepted value are
    * consumed: accepting two conflicting `stream = x` filters while
    * enforcing one would return x's rows where the correct answer is
    * empty — the disagreeing filter stays residual and kills every row.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    streamEq = filters.collectFirst { case EqualTo("stream", v: String) => v }
    val (accepted, residual) = filters.partition {
      case EqualTo("stream", v: String) => streamEq.contains(v)
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new LogScan(path, required, streamEq)
}

private class LogScan(path: String, required: StructType, streamEq: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(path, required, streamEq)
  override def description(): String =
    s"graftlog path=$path, columns=${required.fieldNames.mkString(",")}" +
      streamEq.map(s => s", pushed stream=$s").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val files = LogSource.listLogFiles(path)
    // partition pruning: a pushed stream-equality filter drops whole
    // files here, on the driver, before any executor touches them
    val kept = streamEq match {
      case Some(s) => files.filter(f => LogSource.streamOf(f) == s)
      case None => files
    }
    kept.map(f => LogRangePartition(f.toString, 0L, Long.MaxValue): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LogRangeReaderFactory(required)
}

/** Streaming offset: committed line count per file — exactly a Kafka
  * consumer's (partition → offset) map with files standing in for
  * partitions. Serialized as plain JSON so checkpoints are
  * human-readable and survive engine upgrades.
  */
private[sources] case class LogOffset(counts: Map[String, Long]) extends Offset {
  override def json(): String = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization.write(counts)
  }
}

private[sources] object LogOffset {
  def fromJson(s: String): LogOffset = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    LogOffset(org.json4s.jackson.JsonMethods.parse(s).extract[Map[String, Long]])
  }
}

/** The streaming side of `graftlog`: each micro-batch covers the lines
  * appended (and files created) since the last committed offset — the
  * reference's Kafka drain (`main.py:44-58` poll loop) as a real
  * Structured Streaming source with resumable checkpoints. Under
  * `Trigger.AvailableNow` the end offset is pinned once at query start
  * (SupportsTriggerAvailableNow), giving the reference's
  * drain-then-stop semantics with exactly-once file/line accounting;
  * a restart with the same checkpoint reads ONLY what arrived since.
  * The batch-side pushdown still applies: a pushed stream filter
  * excludes non-matching files from offsets entirely.
  */
private class LogMicroBatchStream(path: String, required: StructType, streamEq: Option[String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def countLines(f: java.nio.file.Path): Long = {
    val r = java.nio.file.Files.newBufferedReader(f)
    try Iterator.continually(r.readLine()).takeWhile(_ != null).size.toLong
    finally r.close()
  }

  // (byte size, mtime) → line count per file: a long-running stream
  // polls latestOffset() every trigger, and re-counting lines of every
  // unchanged file each poll is O(corpus) per trigger — size+mtime are
  // metadata reads and change whenever lines are appended. Size alone
  // is not enough: an in-place same-length rewrite (rotation recreating
  // a file of identical size) would serve a stale count. (Readers still
  // line-skip to their start offset; the production upgrade is a
  // per-commit line→byte index so they seek instead.)
  private val sizeCache = scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]

  private def snapshot(): LogOffset = {
    val files = LogSource.listLogFiles(path)
      .filter(f => streamEq.forall(LogSource.streamOf(f) == _))
    LogOffset(files.map { f =>
      val bytes = java.nio.file.Files.size(f)
      val mtime = java.nio.file.Files.getLastModifiedTime(f).toMillis
      val lines = sizeCache.get(f.toString) match {
        case Some((b, m, n)) if b == bytes && m == mtime => n
        case _ =>
          val n = countLines(f)
          sizeCache.update(f.toString, (bytes, mtime, n))
          n
      }
      f.toString -> lines
    }.toMap)
  }

  private var availableNowEnd: Option[LogOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = availableNowEnd = Some(snapshot())

  override def initialOffset(): Offset = LogOffset(Map.empty)
  override def latestOffset(): Offset = availableNowEnd.getOrElse(snapshot())
  // SupportsAdmissionControl variant (via SupportsTriggerAvailableNow):
  // this source applies no rate limit — every batch reads to the end
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = latestOffset()
  override def deserializeOffset(json: String): Offset = LogOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].counts
    val e = end.asInstanceOf[LogOffset].counts
    e.toSeq.sortBy(_._1).flatMap { case (f, to) =>
      val from = s.getOrElse(f, 0L)
      // append-only is an ENFORCED invariant, not an assumption: a file
      // whose current line count dropped below its committed offset was
      // truncated/rotated, and silently planning nothing would lose the
      // new content below the old offset forever
      if (to < from) throw new IllegalStateException(
        s"graftlog: file $f has $to lines but offset $from is already committed — " +
          "the file shrank (truncation/rotation?); graftlog streams require append-only files. " +
          "Rotate into NEW files (new stream ids) instead of rewriting in place.")
      if (to > from) Some(LogRangePartition(f, from, to): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new LogRangeReaderFactory(required)
  override def commit(end: Offset): Unit = () // files are the log; nothing to ack
  override def stop(): Unit = ()
}

private case class LogRangePartition(file: String, from: Long, to: Long) extends InputPartition

private class LogRangeReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LogRangePartition]
    new LogReader(p.file, required, p.from, p.to)
  }
}

/** Streams one file line-by-line within [from, to); emits exactly the
  * pruned columns. The batch path reads [0, ∞); micro-batches read the
  * offset range their batch covers.
  */
private class LogReader(file: String, required: StructType, from: Long, to: Long)
    extends PartitionReader[InternalRow] {
  private val path = java.nio.file.Paths.get(file)
  private val stream = UTF8String.fromString(LogSource.streamOf(path))
  private val lines = java.nio.file.Files.newBufferedReader(path)
  private var line: String = _
  private var offset: Long = -1L
  // column emitters bound once per reader, not per row
  private val emitters: Array[() => Any] = required.fieldNames.map {
    case "stream" => () => stream
    case "offset" => () => offset
    case "value" => () => UTF8String.fromString(line)
    case other => throw new IllegalArgumentException(s"graftlog has no column $other")
  }

  override def next(): Boolean = {
    line = lines.readLine()
    offset += 1
    while (line != null && offset < from) { // skip to the range start
      line = lines.readLine()
      offset += 1
    }
    line != null && offset < to
  }
  override def get(): InternalRow = InternalRow.fromSeq(emitters.map(_()).toIndexedSeq)
  override def close(): Unit = lines.close()
}
