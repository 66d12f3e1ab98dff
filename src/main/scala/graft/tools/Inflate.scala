package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpus inflator for the SCALING.md sweep:
  * clone every testdata table K× with id offsets and seeded
  * structure-preserving perturbation, so the top bench families can be
  * measured at 1× vs 10× and the growth ratio committed as evidence
  * (VERDICT r10 Next #1 — turn the 100 TB plan-shape argument into
  * measured data).
  *
  * Design constraints, in order:
  *  - DETERMINISTIC: all perturbation is xxhash64-seeded by (value,
  *    copy) — two runs produce byte-identical relations (FIXTURES.md
  *    discipline; no RNG, no wall clock).
  *  - STRUCTURE-PRESERVING within a copy: documents perturb by an
  *    INJECTIVE per-copy token remap (token t keeps or gains the
  *    copy-tagged suffix `·k` by hash parity; `·` = · appears
  *    nowhere in the corpus, so remapped tokens cannot collide with
  *    real ones). Injective remaps preserve every set-Jaccard
  *    EXACTLY, so each copy's near-dup/group graph is an isomorphic
  *    clone of the original — iterative families (CC, coreness,
  *    PageRank) must scale by component count, not blow up.
  *  - NO cross-copy edges: two copies share only the hash-kept ~half
  *    of each doc's tokens, capping cross-copy Jaccard near 1/3 —
  *    far under every dedup threshold (0.8, 4/5, 0.45). Cloned text
  *    verbatim would instead weld every doc into a K-clique and
  *    measure an artifact, not scaling.
  *  - FK-CONSISTENT: every key column (and nothing else) offsets by
  *    copy · 10¹⁰ (int nation/region keys by copy · 1000), so join
  *    fan-outs and group cardinalities per copy match the original.
  *  - Embeddings jitter each float by a seeded ±0.001 so clones are
  *    not exact duplicates (cosine structure ~unchanged — IVF/kNN
  *    cost shapes stay honest); events keep their time window (10×
  *    density = the realistic growth mode for a busier service).
  *
  * Usage: runMain graft.tools.Inflate <srcDir> <outDir> <copies>
  */
object Inflate {
  private val LongStride = 10000000000L // 10^10 between copies
  private val IntStride = 1000

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, copiesStr.toInt)
    spark.stop()
  }

  /** The inflation body, callable from an existing session
    * ([[Canary]] builds its 3× corpus through this).
    */
  def run(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    // one scan per table: the copy axis is an exploded sequence, so the
    // inflator itself is shuffle-free (scan → explode → project → write)
    def cloned(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
        .withColumn("k", explode(sequence(lit(0), lit(copies - 1))))
    def offL(c: String): Column = col(c) + col("k").cast("long") * LongStride
    def offI(c: String): Column = (col(c) + col("k") * IntStride).cast("int")
    def write(df: DataFrame, name: String): Unit =
      df.drop("k").write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(cloned("region").withColumn("r_regionkey", offI("r_regionkey")), "region")
    write(cloned("nation")
      .withColumn("n_nationkey", offI("n_nationkey"))
      .withColumn("n_regionkey", offI("n_regionkey")), "nation")
    write(cloned("customer")
      .withColumn("c_custkey", offL("c_custkey"))
      .withColumn("c_nationkey", offI("c_nationkey")), "customer")
    write(cloned("supplier")
      .withColumn("s_suppkey", offL("s_suppkey"))
      .withColumn("s_nationkey", offI("s_nationkey")), "supplier")
    write(cloned("part").withColumn("p_partkey", offL("p_partkey")), "part")
    write(cloned("orders")
      .withColumn("o_orderkey", offL("o_orderkey"))
      .withColumn("o_custkey", offL("o_custkey")), "orders")
    write(cloned("lineitem")
      .withColumn("l_orderkey", offL("l_orderkey"))
      .withColumn("l_partkey", offL("l_partkey"))
      .withColumn("l_suppkey", offL("l_suppkey")), "lineitem")
    write(cloned("events")
      .withColumn("event_id", offL("event_id"))
      .withColumn("user_id", offL("user_id")), "events")

    // documents: injective per-copy token remap (empty tokens pass
    // through untouched — they are split artifacts, not vocabulary);
    // n_chars re-tracks the perturbed text (source invariant:
    // n_chars = length(text) holds on every driver sf)
    write(cloned("documents")
      .withColumn("text", when(col("k") === 0, col("text")).otherwise(
        array_join(expr(
          "transform(split(text, ' '), t -> CASE WHEN t = '' THEN t " +
            "WHEN pmod(xxhash64(t, k), 2) = 0 THEN t " +
            "ELSE concat(t, '·', CAST(k AS STRING)) END)"), " ")))
      .withColumn("doc_id", offL("doc_id"))
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")

    // embeddings: seeded ±0.001 jitter per (vector, dim, copy)
    write(cloned("embeddings")
      .withColumn("embedding", when(col("k") === 0, col("embedding")).otherwise(
        expr("transform(embedding, (x, i) -> CAST(x + " +
          "(pmod(xxhash64(vec_id, i, k), 2001) - 1000) / 1000000.0D AS FLOAT))")))
      .withColumn("vec_id", offL("vec_id")), "embeddings")

    println(s"[inflate] wrote ${copies}x clone of $src to $out")
  }
}
