package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{BloomFilterLong, GraftFunctions}
import graft.ops.Analytics

/** Guards for the Bloom runtime-filter primitive (q95): kernel-level
  * no-false-negatives + bounded false positives, build determinism
  * under repartitioning, probe-expression parity between interpreted
  * and codegen paths, and the q95 equivalence that makes its oracle
  * sound (bloom + exact verify ≡ plain semi-join).
  */
class BloomFilterSpec extends SparkSpecBase {

  test("kernel: no false negatives, false positives below 1%") {
    val words = BloomFilterLong.emptyWords(1 << 17)
    val keys = (0L until 2000L).map(_ * 7919L + 3L)
    keys.foreach(BloomFilterLong.add(words, 5, _))
    val st = BloomFilterLong.deserialize(BloomFilterLong.serialize(5, words))
    keys.foreach(k => assert(BloomFilterLong.mightContain(st, k), s"false negative for $k"))
    // m/n = 131072/2000 ≈ 65 bits/key, k = 5 → theoretical fp ~3e-6;
    // 1% is a generous determinism-safe ceiling
    val probes = (1L to 20000L).map(_ * 104729L + 11L).filterNot(keys.toSet)
    val fps = probes.count(BloomFilterLong.mightContain(st, _))
    assert(fps.toDouble / probes.size < 0.01, s"$fps false positives of ${probes.size}")
  }

  test("build: byte-identical under different partitionings") {
    val dir = tmpDir()
    write(dir, "keys", spark.range(0, 5000).selectExpr("id * 13 AS k"))
    val df = spark.read.parquet(s"$dir/keys.parquet")
    val a = Analytics.bloomOf(df.repartition(1), "k", 1 << 14, 5)
    val b = Analytics.bloomOf(df.repartition(7), "k", 1 << 14, 5)
    assert(java.util.Arrays.equals(a, b), "bloom bytes differ across partitionings")
  }

  test("probe expression: codegen and interpreted agree with the kernel") {
    GraftFunctions.register(spark)
    val words = BloomFilterLong.emptyWords(1 << 10)
    (1L to 100L).foreach(BloomFilterLong.add(words, 5, _))
    val bytes = BloomFilterLong.serialize(5, words)
    val st = BloomFilterLong.deserialize(bytes)
    val out = spark.range(1, 301)
      .select(col("id"), call_function("bloom_might_contain", lit(bytes), col("id")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (1L to 300L).foreach { k =>
      assert(out(k) == BloomFilterLong.mightContain(st, k), s"expression/kernel disagree at $k")
    }
    (1L to 100L).foreach(k => assert(out(k), s"false negative for inserted $k"))
  }

  test("q95 ≡ plain semi-join, and the bloom actually prunes") {
    val sf = "/root/testdata/sf0.001"
    val viaBloom = Analytics.q95BloomSemiJoin(spark, sf).collect().map(_.getLong(0)).toSeq
    val plain = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey").orderBy("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(viaBloom == plain, "bloom-prefiltered semi-join output differs from plain semi-join")
    // pruning: bloom pass rate on the probe side must be far below 1
    // (and at least the true match count — no false negatives)
    GraftFunctions.register(spark)
    val high = Tables.orders(spark, sf).filter(col("o_totalprice") > 450000.0).select("o_custkey")
    val bloom = Analytics.bloomOf(high, "o_custkey", 1 << 17, 5)
    val total = Tables.customer(spark, sf).count()
    val pass = Tables.customer(spark, sf)
      .filter(call_function("bloom_might_contain", lit(bloom), col("c_custkey"))).count()
    assert(pass >= plain.size.toLong && pass < total,
      s"bloom pass $pass not in [${plain.size}, $total)")
  }
}
