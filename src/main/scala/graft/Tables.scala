package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Explicit-schema loaders for the driver's read-only testdata
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md §2).
  *
  * Schema discipline (SURVEY.md §1.3): every source is declared with an
  * explicit StructType — never `inferSchema`. The reference is dynamically
  * typed end-to-end (pandas inference, `ast.literal_eval` at
  * reference main.py:129); at 100 TB an accidental type drift silently
  * corrupts joins, so this engine fails fast at load time instead.
  *
  * All loaders return plain column-pruned-able parquet scans; Catalyst
  * pushes projections and predicates into the scan (verify via
  * `df.explain` → `PushedFilters`/`ReadSchema`).
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Legacy layout: events.ts as parquet TIMESTAMP(NANOS) — Spark's
    * reader rejects it natively, so it is read as raw nanos (LongType,
    * under `spark.sql.legacy.parquet.nanosAsLong`) and truncated in
    * [[events]] to the engine's native microsecond TimestampType.
    * DuckDB's CAST(ts AS TIMESTAMP) truncates the same way, so oracle SQL
    * over `events` stays value-identical.
    */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw nanoseconds since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Current layout: events.ts as parquet TIMESTAMP(MICROS) — Spark's
    * native timestamp encoding, read directly (same pattern as
    * orders.o_orderdate / lineitem.l_shipdate).
    */
  val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def load(spark: SparkSession, dir: String, name: String,
                   schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region", regionSchema)
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation", nationSchema)
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer", customerSchema)
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier", supplierSchema)
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part", partSchema)
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders", ordersSchema)
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem", lineitemSchema)
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings", embeddingsSchema)

  /** Declared column layout per table — the schema-drift audit's
    * reference (q185). For events the NAME set is layout-invariant
    * (the micros and raw-nanos layouts differ only in ts's physical
    * type), which is exactly what a name-level drift compare wants.
    */
  val declaredSchemas: Map[String, StructType] = Map(
    "region" -> regionSchema, "nation" -> nationSchema,
    "customer" -> customerSchema, "supplier" -> supplierSchema,
    "part" -> partSchema, "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema, "events" -> eventsSchema,
    "documents" -> documentsSchema, "embeddings" -> embeddingsSchema)

  /** All table loaders by name (catalog registration, generic tools). */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> (region _), "nation" -> (nation _), "customer" -> (customer _),
    "supplier" -> (supplier _), "part" -> (part _), "orders" -> (orders _),
    "lineitem" -> (lineitem _), "events" -> (events _),
    "documents" -> (documents _), "embeddings" -> (embeddings _))

  /** `events` with `ts` as microsecond TimestampType, adaptive to the
    * file's physical layout (the driver has shipped BOTH across rounds):
    *
    *  - TIMESTAMP(MICROS) (current testdata): read directly through
    *    [[eventsSchema]], like every other timestamp column.
    *  - TIMESTAMP(NANOS) read as raw longs under
    *    `spark.sql.legacy.parquet.nanosAsLong` (legacy testdata, and the
    *    spec fixtures' raw-long encoding): truncate nanos → micros here.
    *    `ts div 1000` (integer division on longs) is deliberate: routing
    *    the ~1.7e18 nano value through a double (`col / 1000`) loses
    *    sub-µs bits (doubles carry 53 mantissa bits) and can shift the
    *    truncated µs by 1. DuckDB's CAST truncates the same way.
    *
    * Detection is one footer-schema probe per distinct (file state,
    * session conf) — the cache is keyed by (path, `nanosAsLong` conf)
    * and its entry carries the file's mtime+length: the test corpus
    * is regenerated between rounds and its ts layout has already
    * flipped once (NANOS→MICROS), so a path-keyed cache in a JVM that
    * spans a regeneration would replay the stale layout (treating a
    * MICROS file as raw nanos shifts every event to 1970); and a NANOS
    * probe result is conf-dependent (LongType under the legacy conf, a
    * failure without it), so sessions with different conf must not
    * share entries. A TIMESTAMP(NANOS) file with the legacy conf OFF
    * fails the probe inside Spark; that error is rethrown with the
    * session-build fix because a loader that silently flips session
    * conf would leak the change to every other query on a shared
    * session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val cacheKey = (path, nanosConf(spark))
    val state = fileState(path)
    // keyed by (path, conf) with the file state in the VALUE: sessions
    // with different nanosAsLong confs keep separate entries (a NANOS
    // probe is conf-dependent, and a shared path-keyed entry would make
    // two concurrent confs evict each other and re-probe the footer on
    // every call), while a regenerated file replaces its entry instead
    // of accumulating beside it. Bounded by distinct paths × the two
    // conf values — the staging registry's leak-guard discipline.
    val tsType = eventsTsTypeCache.get(cacheKey) match {
      case Some((`state`, t)) => t
      case _ =>
        val t =
          try spark.read.parquet(path).schema("ts").dataType
          catch {
            case e: Exception if isNanosRejection(e) =>
              throw new IllegalArgumentException(
                "events.parquet carries TIMESTAMP(NANOS): build the SparkSession with " +
                  """.config("spark.sql.legacy.parquet.nanosAsLong", "true") """ +
                  "(as graft.Verify/graft.Bench do); Tables.events does not set it implicitly", e)
          }
        eventsTsTypeCache.put(cacheKey, (state, t))
        t
    }
    tsType match {
      case LongType =>
        load(spark, dir, "events", eventsRawSchema)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        load(spark, dir, "events", eventsSchema)
    }
  }

  /** Spark rejects parquet TIMESTAMP(NANOS) without the legacy conf via
    * the `ILLEGAL_PARQUET_TYPE`/`PARQUET_TYPE_ILLEGAL` error condition
    * (`QueryCompilationErrors.illegalParquetTypeError`), with the
    * parquet type embedded verbatim as a message parameter (not
    * localized prose) — so "NANOS" in a message along the cause chain
    * is the nanos-specific signal. The error may surface wrapped (e.g.
    * a FAILED_READ_FILE SparkException whose own condition says nothing
    * about parquet types but whose message carries the inner one), so
    * the message test applies uniformly to every element of the chain
    * rather than being gated on a PARQUET_TYPE condition: an unrelated
    * illegal parquet type (message without NANOS) still keeps its real
    * Spark error, and a false positive only adds a hint wrapper whose
    * cause preserves the original.
    */
  private def isNanosRejection(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => String.valueOf(t.getMessage).contains("NANOS"))

  private def nanosConf(spark: SparkSession): String =
    spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")

  /** (mtime, length) fingerprint of a parquet path — a file's own
    * stats, or for a directory the max child mtime + summed child
    * length (parquet dirs mutate by part-file rewrite).
    */
  private def fileState(path: String): (Long, Long) = {
    val f = new java.io.File(path)
    if (f.isDirectory) {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
      (kids.map(_.lastModified).foldLeft(f.lastModified)(math.max),
        kids.map(_.length).sum)
    } else (f.lastModified, f.length)
  }

  private val eventsTsTypeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), ((Long, Long), DataType)]
}
