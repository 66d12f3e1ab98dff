package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.Row

/** Semantic specs for the storage-maintenance family (q164 inventory,
  * q165 clustering audit, q166 compaction plan) on controlled
  * multi-file fixtures — these keys are oracle-free (the DuckDB views
  * cannot observe file layout), so the exact semantics are pinned here.
  */
class StorageSpec extends SparkSpecBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Append one more parquet part file with the given order keys. */
  private def appendOrders(dir: String, keys: Seq[Long]): Unit =
    df(Tables.ordersSchema, keys.map(k =>
      Row(k, 1L, "O", 1.0, ts("2024-01-01 00:00:00"), "1-URGENT")): _*)
      .coalesce(1).write.mode("append").parquet(s"$dir/orders.parquet")

  test("q164 inventory: file/row/byte stats agree with the on-disk layout; every tiny file counts small") {
    val dir = tmpDir()
    writeWarehouse(dir, custKeys = 1L to 30L)
    // customer as three part files
    df(Tables.customerSchema, (1L to 30L).map(k => Row(k, s"c$k", 0, 1.0, "SEG")): _*)
      .repartition(3).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val onDisk = new java.io.File(s"$dir/customer.parquet").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val out = Storage.q164StorageStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val c = out("customer")
    assert(c.getLong(1) == onDisk.length, s"n_files vs disk: $c")
    assert(c.getLong(2) == 30L, s"n_rows: $c")
    assert(c.getLong(3) == onDisk.map(_.length).sum, s"total_bytes: $c")
    assert(c.getLong(4) == onDisk.map(_.length).min && c.getLong(5) == onDisk.map(_.length).max)
    // every fixture file is far under 32 MiB, and one 128 MiB target bin
    assert(c.getLong(6) == onDisk.length && c.getLong(7) == 1L)
    assert(out.keySet == Audit.TablePk.map(_._1).toSet)
  }

  test("q164 inventory: a zero-row file is still inventoried (n_files counts it, n_rows stays 0)") {
    val dir = tmpDir()
    writeWarehouse(dir)
    write(dir, "documents", df(Tables.documentsSchema)) // zero rows, real file
    val d = Storage.q164StorageStats(spark, dir).collect()
      .find(_.getString(0) == "documents").get
    assert(d.getLong(1) >= 1L && d.getLong(2) == 0L, d)
  }

  test("q165 clustering: disjoint key ranges audit clustered; an overlapping append flips the flag") {
    val dir = tmpDir()
    writeWarehouse(dir)
    // file A keys 1-10, file B keys 11-20 → disjoint
    appendOrders(dir, 1L to 10L)
    appendOrders(dir, 11L to 20L)
    // the base writeWarehouse orders file holds key 100 — also disjoint
    val before = Storage.q165ClusteringAudit(spark, dir).collect()
      .find(_.getString(0) == "orders").get
    assert(before.getLong(1) == 3L && before.getLong(2) == 0L && before.getBoolean(3), before)
    // file C keys 5-15 straddles A and B → two overlapping pairs
    appendOrders(dir, Seq(5L, 15L))
    val after = Storage.q165ClusteringAudit(spark, dir).collect()
      .find(_.getString(0) == "orders").get
    assert(after.getLong(1) == 4L && after.getLong(2) == 2L && !after.getBoolean(3), after)
  }

  test("q166 plan: fixed-capacity prefix-sum bins in file order; n_rows carried per file") {
    val dir = tmpDir()
    writeWarehouse(dir)
    // exactly three 3-row files: overwrite the base single-row orders,
    // then append twice. Target 5 → cumulative-before 0,3,6 → bins
    // 0,0,1 (equal file sizes make the bin multiset independent of
    // which uuid name sorts first)
    df(Tables.ordersSchema, (1L to 3L).map(k =>
      Row(k, 1L, "O", 1.0, ts("2024-01-01 00:00:00"), "1-URGENT")): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    appendOrders(dir, 4L to 6L)
    appendOrders(dir, 7L to 9L)
    val plan = Storage.q166CompactionPlan(spark, dir, targetRows = 5L).collect()
      .filter(_.getString(0) == "orders")
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(plan.forall(_._2 == 3L) && plan.length == 3, plan.toSeq)
    assert(plan.map(_._3).sorted.toSeq == Seq(0L, 0L, 1L), plan.toSeq)
  }

  test("q166 plan: default target at fixture scale packs each table into bin 0") {
    val dir = tmpDir()
    writeWarehouse(dir)
    val plan = Storage.q166CompactionPlan(spark, dir).collect()
    assert(plan.nonEmpty && plan.forall(_.getLong(3) == 0L))
  }

  test("overlapPairCounts matches the brute-force pair count on deterministic random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def brute(ranges: Seq[(Long, Long)]): Long = (for {
      i <- ranges.indices; j <- (i + 1) until ranges.length
      if ranges(i)._1 <= ranges(j)._2 && ranges(j)._1 <= ranges(i)._2
    } yield 1).size.toLong
    val tables = Seq(1, 2, 7, 40, 200).map { n =>
      s"t$n" -> Seq.fill(n) {
        val a = rnd.nextLong() % 1000; val b = a + math.abs(rnd.nextLong() % 50)
        (a, b)
      }
    }
    // duplicate endpoints / identical / touching intervals: (0,10) twice
    // overlaps each other and the touching (10,20); (21,30) is disjoint
    val dup = "dup" -> Seq((0L, 10L), (0L, 10L), (10L, 20L), (21L, 30L))
    val all = tables :+ dup
    val in = all.flatMap { case (t, rs) => rs.map(r => (t, r._1, r._2)) }
      .toDF("table_name", "mn", "mx")
    val out = Storage.overlapPairCounts(in).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, rs) <- all)
      assert(out(t) == brute(rs), s"$t: got ${out(t)}, want ${brute(rs)}")
    assert(out("dup") == 3L)
  }

  /** Append one events part file with rows at the given epoch-second
    * offsets (raw-nanos fixture layout, [[graft.SparkSpecBase.Ns]]).
    */
  private def appendEvents(dir: String, idsAndSec: Seq[(Long, Long)]): Unit =
    df(Tables.eventsRawSchema, idsAndSec.map { case (id, sec) =>
      Row(id, sec * Ns, 1L, "click", 1.0, "{}")
    }: _*).coalesce(1).write.mode("append").parquet(s"$dir/events.parquet")

  test("q184 retention: whole-old files drop, in-window keep, straddlers rewrite; cutoff row kept") {
    val dir = tmpDir()
    val day = 86400L
    val anchor = 1704067200L // corpus max lands in file C
    new java.io.File(s"$dir").mkdirs()
    // A: entirely older than anchor-30d → drop
    appendEvents(dir, Seq((1L, anchor - 40 * day), (2L, anchor - 35 * day)))
    // B: straddles the cutoff → rewrite (one row exactly AT the cutoff
    // is retained: strict < expires)
    appendEvents(dir, Seq((3L, anchor - 31 * day), (4L, anchor - 30 * day)))
    // C: inside the window (and sets the anchor) → keep
    appendEvents(dir, Seq((5L, anchor - day), (6L, anchor)))
    val out = Storage.q184RetentionPlan(spark, dir).collect()
    assert(out.length == 3)
    val byAction = out.groupBy(_.getString(4)).view.mapValues(_.toSeq).toMap
    assert(byAction("drop").size == 1 && byAction("drop").head.getLong(5) == 2L)
    assert(byAction("rewrite").size == 1 && byAction("rewrite").head.isNullAt(5))
    assert(byAction("keep").size == 1)
    // ranges are exact microseconds
    assert(byAction("keep").head.getLong(3) == anchor * 1000000L)
  }

  test("q184 retention: single fresh file keeps everything") {
    val dir = tmpDir()
    appendEvents(dir, Seq((1L, 1704067200L), (2L, 1704067100L)))
    val out = Storage.q184RetentionPlan(spark, dir).collect()
    assert(out.length == 1 && out.head.getString(4) == "keep")
  }

  /** Write `data` as a single parquet part file and move it into the
    * table's directory under `name` — a producer with a different
    * schema version appending to a live table.
    */
  private def smuggleFile(dir: String, table: String, name: String,
                          data: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = tmpDir()
    data.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/$table.parquet/$name"))
  }

  test("q185 schema drift: missing and extra columns flagged per file; clean files pass") {
    import org.apache.spark.sql.types._
    val dir = tmpDir()
    writeWarehouse(dir)
    appendEvents(dir, Seq((1L, 1000L)))
    // an old producer: no props column
    smuggleFile(dir, "events", "drift-old.parquet", df(
      StructType(Tables.eventsRawSchema.fields.filterNot(_.name == "props")),
      Row(2L, 1000L * Ns, 1L, "click", 1.0)))
    // a newer producer: adds a column the declared schema lacks
    smuggleFile(dir, "events", "drift-new.parquet", df(
      StructType(Tables.eventsRawSchema.fields :+ StructField("extra_col", LongType)),
      Row(3L, 1000L * Ns, 1L, "click", 1.0, "{}", 9L)))
    val out = Storage.q185SchemaDrift(spark, dir).collect()
      .filter(_.getString(0) == "events")
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out("drift-old.parquet") == ((5L, 1L, 0L, true)), out)
    assert(out("drift-new.parquet") == ((7L, 0L, 1L, true)), out)
    val clean = out.view.filterKeys(k => !k.startsWith("drift-")).values
    assert(clean.nonEmpty && clean.forall(v => v._2 == 0L && v._3 == 0L && !v._4))
    // every inventoried file of every table gets a row
    val all = Storage.q185SchemaDrift(spark, dir).collect()
    assert(all.map(_.getString(0)).toSet == Audit.TablePk.map(_._1).toSet)
  }

  test("q175 zorder: grid corners land in the 2x2 quadrant bins with per-bin bounding boxes") {
    val dir = tmpDir()
    val d0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val d1 = java.sql.Timestamp.valueOf("1995-01-02 00:00:00")
    // four corners of the (custkey, day) square: grid coords are 0 or
    // 65535, so z is 0 / 0x55555555 / 0xAAAAAAAA / 0xFFFFFFFF and the
    // top-4-bit bins are exactly the quadrants 0 / 5 / 10 / 15
    write(dir, "orders", df(Tables.ordersSchema,
      Row(1L, 0L, "O", 1.0, d0, "1-URGENT"),
      Row(2L, 100L, "O", 1.0, d0, "1-URGENT"),
      Row(3L, 0L, "O", 1.0, d1, "1-URGENT"),
      Row(4L, 100L, "O", 1.0, d1, "1-URGENT")))
    val out = Storage.q175ZorderPlan(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6)))).toMap
    assert(out.keySet == Set(0L, 5L, 10L, 15L))
    // (bin -> (n_rows, z_lo, x_lo, y_lo)); y checked relatively
    assert(out(0L)._1 == 1L && out(0L)._2 == 0L && out(0L)._3 == 0L)
    assert(out(5L)._1 == 1L && out(5L)._2 == 0x55555555L && out(5L)._3 == 100L)
    assert(out(10L)._1 == 1L && out(10L)._2 == 0xAAAAAAAAL && out(10L)._3 == 0L)
    assert(out(15L)._1 == 1L && out(15L)._2 == 0xFFFFFFFFL && out(15L)._3 == 100L)
    assert(out(10L)._4 == out(0L)._4 + 1) // day dimension advanced one
  }

  test("q175 zorder: degenerate single-value dimensions collapse to bin 0") {
    val dir = tmpDir()
    val d0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    write(dir, "orders", df(Tables.ordersSchema,
      Row(1L, 7L, "O", 1.0, d0, "1-URGENT"),
      Row(2L, 7L, "O", 1.0, d0, "1-URGENT")))
    val out = Storage.q175ZorderPlan(spark, dir).collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L && out.head.getLong(1) == 2L)
  }

  test("empty warehouse: inventory rows exist with zero rows; audit reports clustered; plan is all bin 0") {
    val dir = tmpDir()
    writeEmptyWarehouse(dir)
    val inv = Storage.q164StorageStats(spark, dir).collect()
    assert(inv.length == Audit.TablePk.length && inv.forall(_.getLong(2) == 0L))
    val audit = Storage.q165ClusteringAudit(spark, dir).collect()
    assert(audit.length == Audit.TablePk.length, audit.toSeq) // empty tables still report
    assert(audit.forall(r => r.getLong(1) >= 1L && r.getLong(2) == 0L && r.getBoolean(3)))
    val plan = Storage.q166CompactionPlan(spark, dir).collect()
    assert(plan.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    // zorder plan over zero orders: no bins, not a crash
    assert(Storage.q175ZorderPlan(spark, dir).count() == 0L)
    // retention plan over zero events: no files to classify
    assert(Storage.q184RetentionPlan(spark, dir).count() == 0L)
    // schema drift: every zero-row file still audits, none drifted
    val drift = Storage.q185SchemaDrift(spark, dir).collect()
    assert(drift.map(_.getString(0)).toSet == Audit.TablePk.map(_._1).toSet)
    assert(drift.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L && !r.getBoolean(5)))
  }
}
