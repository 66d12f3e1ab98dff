package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Temporal join operators over the event stream — the two join shapes
  * Spark has no built-in operator for (SURVEY.md §2.3 lists them absent
  * in the reference too; they are table stakes for telemetry/training
  * pipelines, so the engine provides them as first-class composites).
  *
  *  - As-of join (q42): union-sentinel + running `last(...ignoreNulls)`
  *    — ONE shuffle on the join key, no range candidate blow-up, works
  *    for any key cardinality. This beats the join-then-rank
  *    formulation (which materializes every (probe, earlier-build) pair
  *    before keeping rank 1 — quadratic per key on dense streams).
  *  - Interval/range join (q43): bucketized equi-join — each probe row
  *    is exploded to the fixed-width time buckets its search interval
  *    overlaps, the join runs on (key, bucket) through the ordinary
  *    hash-shuffle machinery, and the exact range predicate filters
  *    residuals map-side. Candidate volume is |pairs within bucket
  *    width|, not |cross product|, and AQE sees a plain equi-join it
  *    can re-plan (vs a theta join, which Spark executes as
  *    BroadcastNestedLoopJoin — a non-starter at scale).
  */
object Temporal {

  /** q42 — as-of join: each 'click' event picks up the same user's most
    * recent 'purchase' at-or-before the click (left semantics: clicks
    * with no prior purchase keep nulls). Build side sorts before probe
    * side at equal timestamps (`side` 0 < 1), matching ASOF's
    * `probe.ts >= build.ts` inclusive bound.
    */
  def q42AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        lit(1).as("side"),
        lit(null).cast(LongType).as("p_event_id"),
        lit(null).cast(TimestampType).as("p_ts"),
        lit(null).cast(DoubleType).as("p_value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), lit(null).cast(LongType).as("event_id"),
        col("ts"), lit(null).cast(DoubleType).as("value"),
        lit(0).as("side"),
        col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("p_event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("side"),
        last(col("p_event_id"), ignoreNulls = true).over(w).as("p_event_id"),
        last(col("p_ts"), ignoreNulls = true).over(w).as("p_ts"),
        last(col("p_value"), ignoreNulls = true).over(w).as("p_value"))
      .filter(col("side") === 1)
      .select("user_id", "event_id", "ts", "value", "p_event_id", "p_ts", "p_value")
      .orderBy("event_id")
  }

  private val BucketUs = 86400000000L // 1-day buckets = the search width

  /** q43 — interval join: all ordered same-user event pairs at most one
    * day apart (follower strictly later; inclusive upper bound). Each
    * left row covers buckets `day(ts)` and `day(ts)+1`, which together
    * contain every candidate in `(ts, ts+1d]`, so the bucket equi-join
    * is exact (zero false negatives) and duplicate-free (a right row
    * lives in exactly one bucket).
    */
  def q43RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("user_id", "event_id", "ts")
    val bucketOf = (t: String) => expr(s"unix_micros($t) div $BucketUs")
    val left = e.withColumn("bucket", explode(array(bucketOf("ts"), bucketOf("ts") + 1)))
    val right = e.select(col("user_id"), col("event_id").as("b_event_id"), col("ts").as("b_ts"))
      .withColumn("bucket", bucketOf("b_ts"))
    left.join(right, Seq("user_id", "bucket"))
      .filter(col("b_ts") > col("ts") &&
        unix_micros(col("b_ts")) <= unix_micros(col("ts")) + BucketUs)
      .select(col("user_id"), col("event_id"), col("b_event_id"),
        expr("(unix_micros(b_ts) - unix_micros(ts)) div 1000000").as("gap_s"))
      .orderBy("event_id", "b_event_id")
  }
}
