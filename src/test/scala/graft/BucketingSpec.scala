package graft

import org.apache.spark.sql.functions.col

/** Scale-design evidence: co-located joins via bucketing. Two tables
  * bucketed on the join key by the same bucket count join with ZERO
  * exchanges — the pattern that turns the 100 TB fact⋈fact join from a
  * full shuffle into a local merge per bucket.
  */
class BucketingSpec extends SparkSpecBase {

  test("bucketed tables join without any shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_bucketed")
    Tables.customer(spark, sf).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle path
      val joined = spark.table("customer_bucketed")
        .join(spark.table("orders_bucketed"), col("c_custkey") === col("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1500L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
