package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *
    * First-collision emission (the round-1 bench fix): a near-dup pair
    * collides in ~all 8 bands, so the naive banding join emitted every
    * pair up to 8× and needed a quadratic-sized dropDuplicates exchange
    * to repair it (44.9 s at sf0.1 — slower than the exact q21 it
    * approximates). Instead the banding join is unrolled into one join
    * PER BAND, where band i keeps a pair only if no earlier band also
    * collided (`hash_a[j] ≠ hash_b[j] ∀ j < i`): pairs exit the unioned
    * joins already distinct — no fan-out, no dedup exchange, and the
    * candidate stream flows map-side straight into the broadcast verify
    * join. The unrolling matters as much as the dedup it removes: with
    * array-typed rows the first-collision predicate needs
    * slice/zip_with/exists, which are CodegenFallback expressions — they
    * evict the join's O(bucket²) inner loop from whole-stage codegen
    * into interpreted eval with per-pair array allocation (measured:
    * identical 44.9 s). Static per-band columns keep every predicate a
    * scalar long comparison inside the generated loop.
    */
  def q25MinhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val threshold = 0.8
    graft.functions.GraftFunctions.register(spark)
    val docBytes = Similarity.documentsSizeBytes(spark, dir)
    // exact-dup collapse first (same cascade as q21): signatures,
    // banding and verification all run over DISTINCT token sets;
    // qualifying set pairs expand back to doc pairs at the end
    val groups = Similarity.tokenSetGroups(spark, dir)
    // one codegen'd loop per set (graft.functions.MinHashSignature) —
    // the nested-HOF formulation evaluates 32·|toks| interpreted lambdas
    val sig = call_function("minhash_signature", col("toks"))
    val bandArr = transform(sequence(lit(0), lit(Bands - 1)),
      b => xxhash64(slice(col("sig"), b * lit(NumPerm / Bands) + 1, lit(NumPerm / Bands))))
    val withBands = groups
      .withColumn("sig", sig)
      .withColumn("bands", bandArr)
      .select(col("gid"), col("bands"))
    val perBand = (0 until Bands).map { i =>
      // band i's join side carries scalar hash columns h0..hi only —
      // the equi key hi plus the earlier bands needed for the predicate
      val side = withBands.select(
        col("gid") +: (0 to i).map(j => col("bands")(j).as(s"h$j")): _*)
      val noEarlier = (0 until i)
        .map(j => col(s"a.h$j") =!= col(s"b.h$j"))
        .foldLeft(lit(true))(_ && _)
      side.as("a").join(side.as("b"),
          col(s"a.h$i") === col(s"b.h$i") && col("a.gid") < col("b.gid") && noEarlier)
        .select(col("a.gid").as("ga"), col("b.gid").as("gb"))
    }
    val cands = perBand.reduce(_ union _)
    val setPairs = Similarity.verifySetJaccard(cands, groups, threshold, docBytes)
    Similarity.expandNearDupPairs(setPairs, groups, docBytes, "jaccard", lit(1.0))
      .orderBy("doc_a", "doc_b")
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

  /** q57 — re-aggregatable sketch rollup: per-(event_type, day) HLL
    * sketches of distinct users, MERGED up to per-type totals via
    * `hll_union_agg`. This is the 100 TB pre-aggregation pattern q47
    * only hints at: daily sketch tables are tiny, mergeable state that
    * can be rolled up to ANY coarser grain after the fact — where
    * naive daily distinct counts cannot be summed (users recur across
    * days). The exact count is carried beside the estimate to expose
    * the sketch error. Sketch registers are engine-specific → rows-only
    * like q47, with the error-bound spec as the guard.
    */
  def q57SketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily
      .groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
        count(lit(1)).as("n_days"))
      .join(graft.Tables.events(spark, dir).groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_users")), "event_type")
      .select("event_type", "n_days", "approx_users", "exact_users")
      .orderBy("event_type")
  }

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
    val docBytes = Similarity.documentsSizeBytes(spark, dir)
    // same cascade as q21/q25: the simhash is a pure function of the
    // token set, so signatures/joins run over DISTINCT sets (exact dups
    // otherwise fill each chunk bucket with identical signatures — a
    // quadratic blowup on duplicate-heavy corpora) and qualifying set
    // pairs expand back to doc pairs (within-group hamming = 0)
    val groups = Similarity.tokenSetGroups(spark, dir)
    // bit j of the simhash = sign of Σ_tokens (±1 by bit j of the token
    // hash) — one fused codegen loop (graft.functions.SimHash64)
    val sigs = groups.select(col("gid"),
      call_function("simhash64", col("toks")).as("simhash"))
    // same first-collision emission as q25, unrolled per chunk so every
    // predicate is a codegen'd scalar compare: chunk i's join keeps a
    // pair only if no earlier chunk also matched, so pairs exit the
    // unioned joins already distinct (near-identical sets collide in
    // all 4 chunks — the naive join emitted them 4× and repaired the
    // fan-out with a dropDuplicates exchange)
    def chunk(sh: Column, j: Int): Column =
      shiftright(sh, j * (64 / chunks)).bitwiseAND(lit(0xFFFFL))
    val perChunk = (0 until chunks).map { i =>
      val side = sigs.select(
        col("gid") +: col("simhash") +: (0 to i).map(j => chunk(col("simhash"), j).as(s"c$j")): _*)
      val noEarlier = (0 until i)
        .map(j => col(s"a.c$j") =!= col(s"b.c$j"))
        .foldLeft(lit(true))(_ && _)
      side.as("a").join(side.as("b"),
          col(s"a.c$i") === col(s"b.c$i") && col("a.gid") < col("b.gid") && noEarlier)
        .select(col("a.gid").as("ga"), col("b.gid").as("gb"),
          col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
    }
    val setPairs = perChunk.reduce(_ union _)
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select("ga", "gb", "hamming")
    Similarity.expandNearDupPairs(setPairs, groups, docBytes, "hamming", lit(0L))
      .orderBy("doc_a", "doc_b")
  }
}
