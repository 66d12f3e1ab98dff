package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Sketch-based near-duplicate detection: MinHash+LSH banding and
  * SimHash — the sublinear scale paths beside the exact q21 join. Both
  * are hash-function-dependent (Spark's xxhash64), so they are declared
  * WITHOUT a DuckDB oracle (driver records a rows-only check); their
  * correctness guard is the exact-Jaccard verification pass at the end
  * (output ⊆ q21's output by construction) plus the recall specs.
  *
  * Everything is built from codegen-friendly higher-order expressions —
  * signatures are computed in one pass over each doc, and the LSH join
  * shuffles only (band, hash, doc_id) ints.
  */
object Sketches {

  private val NumPerm = 32 // minhash permutations
  private val Bands = 8 // 8 bands × 4 rows: P(collide) ≈ 1-(1-j⁴)⁸, ~0.97 at j=0.8

  /** q25 — MinHash+LSH near-dup: per-doc signature = min of xxhash64
    * seeded per permutation over the token set; docs sharing any banded
    * signature slice become candidates; candidates are verified with the
    * exact Jaccard (≥ 0.8). At 100 TB only the banding join shuffles,
    * on (band_id, band_hash) keys — never token sets.
    */
  def q25MinhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val threshold = 0.8
    graft.functions.GraftFunctions.register(spark)
    val nDocs = graft.Tables.documents(spark, dir).count()
    val toks = Similarity.docTokenSets(spark, dir)
    // one codegen'd loop per doc (graft.functions.MinHashSignature) —
    // the nested-HOF formulation evaluates 32·|toks| interpreted lambdas
    val sig = call_function("minhash_signature", col("toks"))
    val bands = transform(sequence(lit(0), lit(Bands - 1)),
      b => xxhash64(slice(col("sig"), b * lit(NumPerm / Bands) + 1, lit(NumPerm / Bands))))
    val banded = toks
      .withColumn("sig", sig)
      .select(col("doc_id"), posexplode(bands).as(Seq("band_id", "band_hash")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    Similarity.verifyJaccard(cands, toks, threshold, nDocs).orderBy("doc_a", "doc_b")
  }

  /** q47 — HLL++ approximate count-distinct per event_type, beside the
    * exact count (q04c is the exact operator; here the exact value is
    * carried only to expose the sketch error). At 100 TB this is THE
    * count-distinct: the HLL sketch is fixed-size and mergeable, so the
    * aggregation stays map-side-partial + one shuffle of ~1.5 KB
    * sketches per group, where exact distinct must shuffle every
    * distinct (type, user) pair. Sketch-based (engine-specific register
    * layout) → declared without a DuckDB oracle, like q25/q26.
    */
  def q47ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  /** q26 — SimHash near-dup: 64-bit signature (sign of per-bit vote sums
    * over token hashes); candidate pairs share at least one of four
    * 16-bit signature chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk is
    * identical), verified by exact hamming distance ≤ 3. Output is the
    * candidate pairs with their hamming distance.
    */
  def q26SimhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val maxHamming = 3
    val chunks = 4
    graft.functions.GraftFunctions.register(spark)
    val toks = Similarity.docTokenSets(spark, dir)
    // bit j of the simhash = sign of Σ_tokens (±1 by bit j of the token
    // hash) — one fused codegen loop (graft.functions.SimHash64)
    val sigs = toks.select(col("doc_id"),
      call_function("simhash64", col("toks")).as("simhash"))
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("simhash"), c * lit(64 / chunks)).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("chunk_id", "chunk")))
    val cands = chunked.as("a").join(chunked.as("b"),
        col("a.chunk_id") === col("b.chunk_id") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
