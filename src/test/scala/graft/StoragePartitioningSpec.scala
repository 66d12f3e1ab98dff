package graft

import org.apache.spark.sql.functions._

/** The partitioned-staging pattern beside BucketingSpec's co-located
  * joins: a corpus written `partitionBy(source)` must serve
  * source-filtered queries by DIRECTORY pruning — the filter becomes a
  * PartitionFilter evaluated against paths on the driver, and executors
  * only ever open matching files. At 100 TB this is the difference
  * between scanning one source and scanning the corpus; every staging
  * table in the pipeline (collapsedCorpus, per-source mixes) is written
  * this way.
  */
class StoragePartitioningSpec extends SparkSpecBase {

  test("partitionBy(source) staging: source filter prunes directories, not rows") {
    val staged = tmpDir() + "/docs_by_source"
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.partitionBy("source").parquet(staged)

    val filtered = spark.read.parquet(staged).filter(col("source") === "src1")
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("src1"),
      "source filter must prune at the partition level:\n" + plan)

    // ground truth at the file level: every file the query touches lives
    // under the matching partition directory
    val files = filtered.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("source=src1")),
      s"only source=src1 files may be opened: ${files.mkString(", ")}")

    // values survive the partition-column round trip
    val direct = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("source") === "src1").count()
    assert(filtered.count() == direct && direct > 0)
  }
}
