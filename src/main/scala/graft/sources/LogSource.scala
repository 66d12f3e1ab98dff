package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  val Schema: StructType = StructType(Seq(
    StructField("stream", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** stream id of a log file = basename without extension. */
  def streamOf(path: java.nio.file.Path): String = {
    val n = path.getFileName.toString
    val dot = n.lastIndexOf('.')
    if (dot > 0) n.substring(0, dot) else n
  }

  /** Driver-side file listing (java.nio — this demonstration source
    * targets local/NFS paths; a cluster deployment swaps in the Hadoop
    * FileSystem API here and nothing else changes).
    */
  private[sources] def listLogFiles(dir: String): Seq[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toSeq.sortBy(_.toString)
      finally s.close()
    } else Seq(p)
  }
}

private class LogTable(path: String) extends Table with SupportsRead {
  require(path != null, "graftlog requires a path: spark.read.format(\"graftlog\").load(dir)")
  override def name(): String = s"graftlog($path)"
  override def schema(): StructType = LogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
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
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("stream", _: String) => true
      case _ => false
    }
    streamEq = accepted.collectFirst { case EqualTo(_, v: String) => v }
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
    kept.map(f => LogPartition(f.toString): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory(required)
}

private case class LogPartition(file: String) extends InputPartition

private class LogReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LogReader(partition.asInstanceOf[LogPartition].file, required)
}

/** Streams one file line-by-line; emits exactly the pruned columns. */
private class LogReader(file: String, required: StructType)
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
    line != null
  }
  override def get(): InternalRow = InternalRow.fromSeq(emitters.map(_()).toIndexedSeq)
  override def close(): Unit = lines.close()
}
