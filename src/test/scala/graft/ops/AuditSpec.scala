package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.Row

/** Semantic specs for the governance audits (q167 integrity manifest,
  * q168 purge cascade): hand-computed checksum values, row-order /
  * partitioning invariance, the FK cascade on a hand-checkable graph,
  * and the empty-warehouse degenerate (first run of a new replica).
  */
class AuditSpec extends SparkSpecBase {

  private val P = Audit.ChecksumMod
  private val K = Audit.KnuthMult

  /** Independent BigInt reimplementation of the manifest checksum. */
  private def expectedChecksum(keys: Seq[Long]): Long =
    if (keys.isEmpty) -1L
    else (keys.map(k => BigInt(k % P) * K % P).sum % P).toLong

  private def writeAllTables(dir: String, custKeys: Seq[Long] = Seq(1L, 2L, 3L)): Unit =
    writeWarehouse(dir, custKeys)

  test("q167 manifest: counts match the tables; checksums match an independent BigInt computation") {
    val dir = tmpDir()
    writeAllTables(dir)
    val m = Audit.q167IntegrityManifest(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("region") == ((2L, expectedChecksum(Seq(0L, 1L)))))
    assert(m("customer") == ((3L, expectedChecksum(Seq(1L, 2L, 3L)))))
    // lineitem's composite key packs as orderkey*10 + linenumber
    assert(m("lineitem") == ((1L, expectedChecksum(Seq(100L * 10 + 1)))))
    assert(m.keySet == Audit.TablePk.map(_._1).toSet)
  }

  test("q167 manifest: checksum is row-order and partitioning independent") {
    val d1 = tmpDir(); val d2 = tmpDir()
    val keys = Seq(101L, 7L, 999999999999L, 42L)
    writeAllTables(d1, custKeys = keys)
    writeAllTables(d2, custKeys = keys.reverse)
    // d2 also re-partitions the reversed rows differently
    val shuffled = df(Tables.customerSchema,
      keys.reverse.map(k => Row(k, s"c$k", 0, 1.0, "SEG")): _*).repartition(3)
    shuffled.write.mode("overwrite").parquet(s"$d2/customer.parquet")
    def cust(d: String) = Audit.q167IntegrityManifest(spark, d).collect()
      .find(_.getString(0) == "customer").get
    assert(cust(d1).getLong(2) == cust(d2).getLong(2))
    assert(cust(d1).getLong(2) == expectedChecksum(keys))
  }

  test("q168 cascade: FK graph customer→orders→lineitem, counts per entity") {
    val dir = tmpDir()
    write(dir, "customer", df(Tables.customerSchema,
      Row(1L, "c1", 0, -5.0, "SEG"), // closed → purged
      Row(2L, "c2", 0, 10.0, "SEG"),
      Row(3L, "c3", 0, -1.0, "SEG"))) // closed → purged
    write(dir, "orders", df(Tables.ordersSchema,
      Seq((100L, 1L), (101L, 2L), (102L, 3L), (103L, 1L)).map { case (o, c) =>
        Row(o, c, "O", 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT")
      }: _*))
    write(dir, "lineitem", df(Tables.lineitemSchema,
      Seq((100L, 1), (100L, 2), (101L, 1), (102L, 1)).map { case (o, ln) =>
        Row(o, 9L, 7L, ln, 1.0, 2.0, 0.0, 0.0, "N", "O",
          java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
      }: _*))
    val out = Audit.q168PurgeCascade(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "customer" -> ((2L, 3L, 1L)),
      "orders" -> ((3L, 4L, 1L)),
      "lineitem" -> ((3L, 4L, 1L))), out)
  }

  test("empty warehouse: manifest rows carry n_rows=0 with NULL checksum; cascade reports zeros") {
    val dir = tmpDir()
    write(dir, "region", df(Tables.regionSchema))
    write(dir, "nation", df(Tables.nationSchema))
    write(dir, "customer", df(Tables.customerSchema))
    write(dir, "supplier", df(Tables.supplierSchema))
    write(dir, "part", df(Tables.partSchema))
    write(dir, "orders", df(Tables.ordersSchema))
    write(dir, "lineitem", df(Tables.lineitemSchema))
    writeEvents(dir)
    writeDocuments(dir)
    writeEmbeddings(dir)
    val m = Audit.q167IntegrityManifest(spark, dir).collect()
    assert(m.length == Audit.TablePk.length)
    assert(m.forall(r => r.getLong(1) == 0L && r.isNullAt(2)), m.toSeq)
    val c = Audit.q168PurgeCascade(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(c.toSeq == Seq(("customer", 0L, 0L, 0L), ("lineitem", 0L, 0L, 0L),
      ("orders", 0L, 0L, 0L)), c.toSeq)
  }
}
