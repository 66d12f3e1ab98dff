package graft

import graft.ops.Similarity

/** MEASURED recall@10 for the IVF family against the exact q22 (VERDICT
  * r2 #5: q32b was bit-deterministic but its accuracy was unmeasured).
  * The whole IVF pipeline is hash-/decimal-deterministic, so these are
  * exact pins, with floors slightly under the measured values to keep
  * the spec robust to benign replanning.
  *
  * Measured on sf0.001 (64-dim synthetic embeddings, k = 8, 3 k-means
  * iterations): q32 fixed-vector centroids 0.88; q32b trained nprobe=1
  * 0.26; q32c trained nprobe=2 0.38. The synthetic embeddings are near-
  * isotropic (max pairwise cosine ≈ 0.5), so k-means partitions them
  * nearly arbitrarily and single-probe recall is intrinsically modest —
  * the point is that the trade is MEASURED, and that nprobe (the
  * standard production knob) buys recall monotonically: each query
  * scores ~nprobe/k of the corpus and its candidate set grows by
  * containment, so recall cannot decrease.
  */
class IvfRecallSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("recall@10 measured: trained IVF nprobe=1 ≥ 0.25, nprobe=2 strictly better") {
    val exact = Similarity.q22TopkCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val r1 = recall(Similarity.q32bIvfTrained(spark, sf))
    val r2 = recall(Similarity.q32cIvfMultiprobe(spark, sf))
    assert(r1 >= 0.25, s"nprobe=1 recall@10 regressed: $r1 (measured 0.26)")
    assert(r2 >= 0.35, s"nprobe=2 recall@10 regressed: $r2 (measured 0.38)")
    assert(r2 > r1, s"multi-probe must improve recall: nprobe=2 $r2 vs nprobe=1 $r1")
  }

  test("IVF model lifecycle: a parquet round-tripped model searches bit-identically") {
    val model = Similarity.trainIvfModel(spark, sf)
    val path = tmpDir() + "/ivf_model.parquet"
    model.write.parquet(path)
    val direct = Similarity.ivfSearch(spark, sf, model, nprobe = 1)
      .collect().map(_.toString).toSeq
    val viaDisk = Similarity.ivfSearch(spark, sf, spark.read.parquet(path), nprobe = 1)
      .collect().map(_.toString).toSeq
    assert(direct.nonEmpty && direct == viaDisk,
      "float centroids must round-trip parquet exactly")
    // and q32b IS train + search composed
    val q32b = Similarity.q32bIvfTrained(spark, sf).collect().map(_.toString).toSeq
    assert(direct == q32b)
  }

  test("recall@10 measured: fixed-vector IVF (q32) ≥ 0.85 on sf0.001") {
    val exact = Similarity.q22TopkCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.q32IvfAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"q32 recall@10 regressed: $recall (measured 0.88)")
  }
}
