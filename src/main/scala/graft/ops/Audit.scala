package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Data-governance audits: the cross-replica integrity manifest and the
  * right-to-be-forgotten purge cascade. The reference has no governance
  * layer at all (its pipeline truncates-and-reloads a single Postgres,
  * reference `sql_wrapper.py`); at 100 TB both of these are standing
  * jobs — every replication/backfill ends with a manifest compare, and
  * every deletion request fans out across the foreign-key graph.
  */
object Audit {
  import Det._

  /** Order-independent per-row checksum term for an integer key:
    * `(key mod p) * KnuthMultiplier mod p` with p = 1e9+7. Reducing the
    * key BEFORE the multiply keeps every intermediate under 2^62 for
    * any Long key, so the arithmetic is exact in both engines; the SUM
    * of terms accumulates in DECIMAL(38,0) (exact, associative —
    * order-independent under any partitioning, and with 10^29 headroom
    * over the 10^9-bounded terms it cannot overflow below ~10^29 rows).
    * The PUBLISHED checksum is that sum reduced mod p again — a Long in
    * [0, 1e9+7): additivity survives the mod (incremental loads still
    * maintain it additively, mod p), and the emitted value is integer-
    * exact in BIGINT for both engines at any corpus size (a DOUBLE or
    * raw-DECIMAL output would go engine-ambiguous past 2^53 / rely on
    * pandas decimal semantics). Oracle mirror:
    * `CAST(sum(CAST((k % 1000000007) * 2654435761 % 1000000007 AS
    * DECIMAL(38,0))) % 1000000007 AS BIGINT)`.
    */
  private[graft] val ChecksumMod = 1000000007L
  private[graft] val KnuthMult = 2654435761L

  private def checksumTerm(key: Column): Column =
    ((key % ChecksumMod) * KnuthMult % ChecksumMod).cast(DecimalType(38, 0))

  /** Primary-key expression per table — lineitem's composite key packs
    * as orderkey·10+linenumber (TPC-H linenumber ∈ 1..7).
    */
  private[graft] val TablePk: Seq[(String, String)] = Seq(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey * 10 + l_linenumber",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** q167 — INTEGRITY MANIFEST: one row per source table with its row
    * count and an order-independent key checksum — the artifact a
    * replication/backfill job publishes so the receiving side can
    * verify "same rows arrived" without re-reading the sender
    * (compare two 10-row manifests, not two 100 TB scans). The
    * checksum is a SUM of per-row hash terms: commutative, so any
    * partitioning/ordering of either side produces the same value,
    * and incremental loads can maintain it additively.
    *
    * Scale: ten independent scan→agg pipelines (each a one-pass
    * partial-aggregated count+sum reading ONLY the key columns —
    * column pruning leaves >99% of a wide table unread), unioned at
    * one row each.
    */
  def q167IntegrityManifest(spark: SparkSession, dir: String): DataFrame =
    TablePk.map { case (table, pkExpr) =>
      Tables.all(table)(spark, dir)
        .select(expr(pkExpr).cast(LongType).as("pk"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(checksumTerm(col("pk"))) % ChecksumMod).cast(LongType).as("pk_checksum"))
        .select(lit(table).as("table_name"), col("n_rows"), col("pk_checksum"))
    }.reduce(_ unionByName _).orderBy("table_name")

  /** q168 — PURGE CASCADE (right-to-be-forgotten audit): the deletion
    * set is every closed account (negative balance); the cascade
    * follows the FK graph customer → orders → lineitem and reports,
    * per entity, how many rows the purge removes and how many remain —
    * the audit record a deletion job must emit before the actual
    * delete runs. Spark-shaped as two LEFT SEMI joins: the customer
    * key set is dimension-sized (broadcast), the orders key set
    * shuffles once and the lineitem probe is the only big-table pass.
    * The complement (what a `q16`-style anti-join would keep) is
    * `n_total - n_purged` — counted, not re-scanned.
    */
  def q168PurgeCascade(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val delCust = cust.filter(col("c_acctbal") < 0).select("c_custkey")
    val delOrders = orders.join(broadcast(delCust),
      orders("o_custkey") === delCust("c_custkey"), "left_semi").select("o_orderkey")
    val delLi = li.join(delOrders,
      li("l_orderkey") === delOrders("o_orderkey"), "left_semi")
    def row(entity: String, purged: DataFrame, total: DataFrame): DataFrame =
      purged.agg(count(lit(1)).as("n_purged"))
        .crossJoin(total.agg(count(lit(1)).as("n_total")))
        .select(lit(entity).as("entity"), col("n_purged"), col("n_total"),
          (col("n_total") - col("n_purged")).as("n_remaining"))
    row("customer", delCust, cust)
      .unionByName(row("orders", delOrders, orders))
      .unionByName(row("lineitem", delLi, li))
      .orderBy("entity")
  }
}
