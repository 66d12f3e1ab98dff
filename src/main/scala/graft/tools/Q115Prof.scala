package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-JVM cost breakdown of q115 (the slowest bench entry, the exact
  * all-pairs kNN twin): how much of its wall time is (a) the n²
  * sim-kernel scan, (b) the top-k window exchange over the n² rows,
  * (c) the vote tail. Decides whether a bounded per-group top-k
  * aggregate (heap) is worth replacing the row_number window.
  *
  * Usage: runMain graft.tools.Q115Prof [sfDir] [reps]
  */
object Q115Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    val e = graft.Tables.embeddings(spark, sfDir)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("float_vec_dot", a, b)
    def nrm(a: org.apache.spark.sql.Column) = sqrt(call_function("float_vec_dot", a, a))
    val q = e.select(col("vec_id").as("qid"), col("label").as("qlbl"), col("embedding").as("qe"))
      .withColumn("qn", nrm(col("qe")))
    val seeds = e.select(col("vec_id").as("tid"), col("label").as("tlbl"), col("embedding").as("te"))
      .withColumn("tn", nrm(col("te")))
    val sim = graft.ops.Det.roundD4(dot(col("qe"), col("te")) / (col("qn") * col("tn")))
    val joined = q.join(broadcast(seeds), col("qid") =!= col("tid"))
      .select(col("qid"), col("qlbl"), col("tid"), col("tlbl"), sim.as("sim"))

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[q115prof] $label%-22s min ${ts.map(_._1).min}%.2f s  " +
        f"reps ${ts.map(t => f"${t._1}%.2f").mkString(", ")}  rows ${ts.head._2}")
    }
    // count(1) lets Catalyst PRUNE the sim column (the kernel never
    // runs); sum(sim) forces every dot product — the honest kernel floor
    time("join-rows-only")(joined.agg(count(lit(1))).collect()(0).getLong(0))
    time("kernel-forced")(
      joined.agg(sum(col("sim"))).collect()(0).getDouble(0).toLong)
    val wK = Window.partitionBy("qid").orderBy(desc("sim"), asc("tid"))
    time("kernel+window-topk")(
      joined.withColumn("rk", row_number().over(wK)).filter(col("rk") <= 5)
        .agg(count(lit(1))).collect()(0).getLong(0))
    // aggregate-based top-k: per group, sort the collected (sim desc,
    // tid asc) structs and slice — no global sort, one shuffle
    time("kernel+agg-topk")(
      joined.groupBy("qid")
        .agg(expr("slice(array_sort(collect_list(struct(-sim AS ns, tid, tlbl))), 1, 5)").as("top"))
        .select(col("qid"), explode(col("top")))
        .agg(count(lit(1))).collect()(0).getLong(0))
    // bounded-heap aggregate: map-side combinable, ships <= k rows per
    // (group, partition) instead of the full candidate set
    time("kernel+heap-topk")(
      joined.groupBy("qid")
        .agg(call_function("top_k_struct",
          struct((-col("sim")).as("ns"), col("tid"), col("tlbl")), lit(5)).as("top"))
        .select(col("qid"), explode(col("top")))
        .agg(count(lit(1))).collect()(0).getLong(0))
    // same heap, but the struct is PROJECTED inside the codegen'd join
    // stage, so the aggregate's child.eval is a bound reference instead
    // of an interpreted struct build per row
    time("kernel+heap-preproj")(
      joined.select(col("qid"),
          struct((-col("sim")).as("ns"), col("tid"), col("tlbl")).as("s"))
        .groupBy("qid")
        .agg(call_function("top_k_struct", col("s"), lit(5)).as("top"))
        .select(col("qid"), explode(col("top")))
        .agg(count(lit(1))).collect()(0).getLong(0))
    // ObjectHashAggregateExec falls back to SORT-BASED aggregation past
    // 128 distinct keys by default — with 2,000 groups that reintroduces
    // the 4M-row sort the heap exists to avoid. Raise it and re-measure.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
    time("heap-hifallback")(
      joined.groupBy("qid")
        .agg(call_function("top_k_struct",
          struct((-col("sim")).as("ns"), col("tid"), col("tlbl")), lit(5)).as("top"))
        .select(col("qid"), explode(col("top")))
        .agg(count(lit(1))).collect()(0).getLong(0))
    spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    time("full-q115")(graft.ops.Similarity.q115KnnLabel(spark, sfDir).count())
    spark.stop()
  }
}
