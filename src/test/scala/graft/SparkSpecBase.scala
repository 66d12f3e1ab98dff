package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + tiny-fixture helpers for operator specs.
  *
  * Fixtures are written as parquet into a temp dir shaped like the driver
  * testdata (`<dir>/<table>.parquet`), then queried through the real
  * `SparkEntry.queries` functions — so specs cover the loaders (explicit
  * schemas, raw-ns events timestamps) as well as the operator logic.
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.debug.maxToStringFields", "200") // plan-shape asserts need untruncated strings
    .config("spark.sql.maxMetadataStringLength", "2000") // PushedFilters lists truncate at 100 chars otherwise
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()

  override def afterAll(): Unit = () // one JVM for all suites; let it die with the fork

  def tmpDir(): String = Files.createTempDirectory("graft-spec").toString

  def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  /** Write a fixture table as `<dir>/<name>.parquet`. */
  def write(dir: String, name: String, data: DataFrame): Unit =
    data.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

  /** events fixture with ts given in raw nanoseconds (like the driver's
    * TIMESTAMP(NANOS) files read under nanosAsLong).
    */
  def writeEvents(dir: String, rows: (Long, Long, Long, String, Double, String)*): Unit = {
    val schema = Tables.eventsRawSchema
    write(dir, "events", df(schema, rows.map(r => Row(r._1, r._2, r._3, r._4, r._5, r._6)): _*))
  }

  def writeDocuments(dir: String, rows: (Long, String, String, String, Long)*): Unit =
    write(dir, "documents", df(Tables.documentsSchema,
      rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)): _*))

  def writeEmbeddings(dir: String, rows: (Long, Seq[Float], Int)*): Unit =
    write(dir, "embeddings", df(Tables.embeddingsSchema,
      rows.map(r => Row(r._1, r._2, r._3)): _*))

  val Ns: Long = 1000000000L // one second in nanos
  val Hour: Long = 3600L * Ns
}
