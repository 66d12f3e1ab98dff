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

  /** events.ts is parquet TIMESTAMP(NANOS) — Spark's reader rejects it
    * natively, so it is read as raw nanos (LongType, legacy conf below)
    * and truncated here to the engine's native microsecond TimestampType.
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

  /** All table loaders by name (catalog registration, generic tools). */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> (region _), "nation" -> (nation _), "customer" -> (customer _),
    "supplier" -> (supplier _), "part" -> (part _), "orders" -> (orders _),
    "lineitem" -> (lineitem _), "events" -> (events _),
    "documents" -> (documents _), "embeddings" -> (embeddings _))

  /** `events` with `ts` converted to microsecond TimestampType.
    *
    * `ts div 1000` (integer division on longs) is deliberate: routing the
    * ~1.7e18 nano value through a double (`col / 1000`) loses sub-µs bits
    * (doubles carry 53 mantissa bits) and can shift the truncated µs by 1.
    *
    * The nanos legacy conf is REQUIRED at session build time, not set
    * here: a loader that silently flips session state leaks the change
    * to every other query on a shared session (and races across
    * threads). Fail fast with the fix instead.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet carries TIMESTAMP(NANOS): build the SparkSession with " +
        """.config("spark.sql.legacy.parquet.nanosAsLong", "true") """ +
        "(as graft.Verify/graft.Bench do); Tables.events does not set it implicitly")
    load(spark, dir, "events", eventsRawSchema)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
