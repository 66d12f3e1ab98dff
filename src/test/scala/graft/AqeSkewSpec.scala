package graft

import org.apache.spark.sql.functions._

/** The third leg of the engine's skew vocabulary, demonstrated live:
  * q37 salts skewed AGGREGATIONS, q61 salts a KNOWN-skewed join ahead
  * of time, and this spec shows Adaptive Query Execution splitting an
  * UNANTICIPATED skewed partition at runtime — the mitigation that
  * needs no code change at all. A 50k-row hot key against a uniform
  * tail goes through a shuffle sort-merge join with thresholds scaled
  * to fixture size; the final adaptive plan must carry the skew=true
  * marker, proving the hot partition was split instead of stalling one
  * reducer (at 100 TB: the difference between a straggler-bound stage
  * and an even one).
  */
class AqeSkewSpec extends SparkSpecBase {

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the skew detector to fixture size: the hot partition
      // (~50k rows) must exceed both the absolute threshold and
      // factor × median partition size
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 holds 50k of 60k rows — a textbook power-law hot key
      val fact = spark.range(0, 60000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") % 10 + 1).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 11).select(col("id").as("k"), (col("id") * 100).as("w"))
      val joined = fact.join(dim, "k").agg(sum(col("v") + col("w")).as("s"))
      val Array(row) = joined.collect()
      // ground truth: join adds w(k) to every row; exact long arithmetic
      val expected = (0L until 60000L).map { id =>
        val k = if (id < 50000) 0L else id % 10 + 1
        id + k * 100
      }.sum
      assert(row.getLong(0) == expected, "skew handling must not change the result")
      val finalPlan = joined.queryExecution.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        "AQE must mark the skewed join side as split:\n" + finalPlan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
