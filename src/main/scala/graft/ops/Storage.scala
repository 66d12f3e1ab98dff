package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Storage-maintenance audits: the small-file/compaction inventory, the
  * file-level clustering audit, and the compaction bin-packing plan.
  * The reference has no storage layer at all (a single Postgres it
  * truncates and reloads, reference `main.py:200-209`); at 100 TB these
  * are standing jobs — every table's file layout degrades under
  * incremental ingest (small files from frequent micro-batch commits,
  * clustering destroyed by appends), and a maintenance pass reads the
  * LAYOUT, decides, then rewrites only what the plan names.
  *
  * Scale shape shared by all three:
  *  - the FILE INVENTORY (names + byte sizes) comes from a driver-side
  *    filesystem listing — catalog-metadata-sized, the same listing
  *    Spark's own `InMemoryFileIndex` performs for every read; it is
  *    bounded by file count, never row count, and becomes a broadcast
  *    local relation;
  *  - per-file ROW facts come from declarative scans grouped by
  *    `input_file_name()` — a zero-column projection for counts (the
  *    vectorized reader serves batch sizes from row-group metadata
  *    without decoding any column) or a single pruned key column for
  *    min/max, partially aggregated map-side to one row per file;
  *  - everything downstream of the per-file aggregate operates on
  *    file-count-sized relations (broadcast joins, single-partition
  *    windows) — at 100 TB the only big-table touch is the one
  *    metadata-light scan.
  *
  * These keys are declared `no_oracle` (EngineSmokeSpec.OracleFree):
  * the DuckDB oracle runs over registered row VIEWS and cannot observe
  * file layout. StorageSpec pins exact outputs on controlled multi-file
  * fixtures instead (the sketch-family discipline).
  */
object Storage {

  /** Files smaller than this are "small" in q164's inventory — the
    * standard 32 MiB cutoff below which per-file open/seek overhead
    * dominates scan time on object stores.
    */
  val SmallFileBytes: Long = 32L * 1024 * 1024

  /** Compaction target size: bins aim at 128 MiB outputs (the parquet
    * row-group/HDFS-block sweet spot Spark's `maxPartitionBytes`
    * defaults to).
    */
  val TargetFileBytes: Long = 128L * 1024 * 1024

  /** Driver-side file inventory of one table: (file basename, bytes).
    * Handles both layouts the engine reads: a bare `<table>.parquet`
    * file and a `<table>.parquet/` directory of part files (hidden and
    * `_SUCCESS` entries skipped). Catalog-bounded — this is the same
    * listing every Spark read performs.
    */
  private[ops] def listFiles(spark: SparkSession, dir: String, table: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isFile) Seq(st)
      else fs.listStatus(p).toSeq.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    files.map(s => (s.getPath.getName, s.getLen)).sortBy(_._1)
  }

  private def basename(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "[^/]+$", 0)

  /** The full cross-table (table_name, file, bytes) inventory as ONE
    * broadcast-sized local relation — built once, so every consumer
    * joins/aggregates it in a single operator instead of ten.
    */
  private def inventory(spark: SparkSession, dir: String): DataFrame =
    spark.createDataFrame(Audit.TablePk.flatMap { case (table, _) =>
      listFiles(spark, dir, table).map { case (f, b) => (table, f, b) }
    }).toDF("table_name", "file", "bytes")

  /** Cross-table per-file row counts as ONE DataFrame(table_name,
    * file, n_rows) — a zero-column `input_file_name()` scan per table
    * (one per table is unavoidable: different schemas), unioned BEFORE
    * aggregation so everything downstream is a single operator over
    * the file-count-sized relation. Inventory-driven via LEFT join: a
    * zero-row file has no `input_file_name()` group but is exactly
    * what a compaction sweep must still see.
    */
  private def rowsPerFile(spark: SparkSession, dir: String): DataFrame = {
    val counts = Audit.TablePk.map { case (table, _) =>
      Tables.all(table)(spark, dir)
        .select(lit(table).as("table_name"), basename(input_file_name()).as("file"))
    }.reduce(_ unionByName _)
      .groupBy("table_name", "file").agg(count(lit(1)).as("n_rows"))
    inventory(spark, dir)
      .join(counts, Seq("table_name", "file"), "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
  }

  /** q164 — STORAGE STATS: one row per table with its file count, row
    * count, byte totals/extremes, small-file count, and the file count
    * a compaction to [[TargetFileBytes]] would produce — the inventory
    * a maintenance scheduler reads to decide WHICH tables need
    * compaction before touching any data. One groupBy over the unioned
    * [[rowsPerFile]] relation — a single aggregate over file-count-
    * sized input, not ten pipelines.
    */
  def q164StorageStats(spark: SparkSession, dir: String): DataFrame =
    rowsPerFile(spark, dir)
      .groupBy("table_name")
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("bytes")).as("total_bytes"),
        min(col("bytes")).as("min_file_bytes"),
        max(col("bytes")).as("max_file_bytes"),
        sum(when(col("bytes") < SmallFileBytes, 1L).otherwise(0L)).as("n_small_files"))
      .select(col("table_name"), col("n_files"), col("n_rows"),
        col("total_bytes"), col("min_file_bytes"), col("max_file_bytes"),
        col("n_small_files"),
        greatest(lit(1L), ceil(col("total_bytes").cast("double") / TargetFileBytes).cast(LongType))
          .as("target_files"))
      .orderBy("table_name")

  /** q165 — CLUSTERING AUDIT: per table, how badly file-level key
    * clustering has degraded — the number of file PAIRS whose primary-
    * key [min, max] ranges overlap (0 = perfectly clustered: every
    * file prunes independently on a key predicate; rising pair counts
    * mean a key lookup must open ever more files). This is the signal
    * a sort/Z-order compaction decision reads. One pruned-key-column
    * scan per table → ONE unioned file-count-sized range relation →
    * ONE self EQUI-join on table_name with the interval overlap as a
    * residual predicate (no nested loop: the join key is the table,
    * and per-table file counts bound the residual's work) → one
    * groupBy. Per-table n_files LEFT-joins the pair counts so
    * overlap-free tables still report.
    */
  def q165ClusteringAudit(spark: SparkSession, dir: String): DataFrame = {
    val ranges = Audit.TablePk.map { case (table, pkExpr) =>
      Tables.all(table)(spark, dir)
        .select(lit(table).as("table_name"), basename(input_file_name()).as("file"),
          expr(pkExpr).cast(LongType).as("pk"))
    }.reduce(_ unionByName _)
      .groupBy("table_name", "file")
      .agg(min(col("pk")).as("mn"), max(col("pk")).as("mx"))
    val a = ranges.select(col("table_name"), col("file").as("fa"),
      col("mn").as("mna"), col("mx").as("mxa"))
    val b = ranges.select(col("table_name"), col("file").as("fb"),
      col("mn").as("mnb"), col("mx").as("mxb"))
    val pairs = a.join(b, Seq("table_name"))
      .filter(col("fa") < col("fb") && col("mna") <= col("mxb") && col("mnb") <= col("mxa"))
      .groupBy("table_name").agg(count(lit(1)).as("n_overlap_pairs"))
    // n_files counts the INVENTORY (zero-row files and all-empty tables
    // included — q164's discipline); ranges exist only for row-bearing
    // files, which is exactly what the overlap join should see
    inventory(spark, dir).groupBy("table_name").agg(count(lit(1)).as("n_files"))
      .join(pairs, Seq("table_name"), "left")
      .withColumn("n_overlap_pairs", coalesce(col("n_overlap_pairs"), lit(0L)))
      .select(col("table_name"), col("n_files"), col("n_overlap_pairs"),
        (col("n_overlap_pairs") === 0L).as("clustered"))
      .orderBy("table_name")
  }

  /** q166 — COMPACTION PLAN: the file → output-bin assignment a
    * compaction job executes: files in deterministic name order pack
    * greedily into bins of `targetRows` (a file whose rows straddle a
    * boundary goes to the bin its FIRST row lands in — fixed-capacity
    * bins, overflow allowed, so the plan is a pure prefix-sum and two
    * files never swap bins under re-planning). Emits one row per file;
    * executing the plan is then `read(files where bin = b).coalesce(1)`
    * per bin. The prefix sum runs over the file-count-sized inventory —
    * a single-partition window is correct HERE because its input is
    * catalog-sized, never row-sized (q118's shard-manifest discipline).
    */
  def q166CompactionPlan(spark: SparkSession, dir: String,
                         targetRows: Long = 4L * 1024 * 1024): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("table_name").orderBy("file")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    rowsPerFile(spark, dir)
      .select(col("table_name"), col("file"), col("n_rows"))
      .withColumn("rows_before", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .select(col("table_name"), col("file"), col("n_rows"),
        // integer div, never double `/`: a prefix sum past 2^52 would
        // round to the wrong bin under double division
        expr(s"rows_before div ${targetRows}L").as("bin_id"))
      .orderBy("table_name", "file")
  }
}
