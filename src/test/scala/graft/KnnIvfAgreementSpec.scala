package graft

import graft.ops.Similarity

/** MEASURED prediction agreement for q120 (IVF-bucketed kNN label
  * propagation) against the exact q115 — the IvfRecallSpec discipline
  * applied to the label-propagation swap-in: the bucketed variant's
  * accuracy is a measured trade, never an assertion.
  *
  * Measured on sf0.001 (near-isotropic synthetic embeddings, k = 8
  * trained centroids, 2 probes): label agreement 0.418 — in line with
  * q32c's 0.38 neighbor recall at the same probe budget, because
  * k-means partitions isotropic vectors nearly arbitrarily
  * (IvfRecallSpec's scaladoc documents the regime). The floor sits
  * slightly under the measured value to stay robust to benign
  * replanning. On a separable fixture — the regime the operator
  * actually targets — the bucket gate loses nothing and the vote is
  * exact.
  */
class KnnIvfAgreementSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q120 vs exact q115: coverage and label agreement measured on sf0.001") {
    val exact = Similarity.q115KnnLabel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val ivf = Similarity.q120KnnLabelIvf(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    // every query probes 2 clusters of a 500-vector corpus — no bucket
    // is ever empty of seeds, so coverage must be total
    assert(ivf.keySet == exact.keySet,
      s"q120 must classify every vector: missing ${exact.keySet -- ivf.keySet}")
    val agree = exact.count { case (id, p) => ivf(id) == p }.toDouble / exact.size
    assert(agree >= 0.40, s"q120/q115 label agreement regressed: $agree (measured 0.418)")
  }

  test("q120 on separable clusters: bucketed vote = exact vote = truth") {
    // SimilaritySpec's q115 fixture: 3 labels × 6 tight cluster
    // members. k-means with k = 3 on this data puts each cluster in
    // its own bucket, so the bucket gate loses NOTHING and the
    // leave-one-out vote is unanimous — the production regime (clustered
    // embeddings) where the swap-in is loss-free.
    val rows = for (c <- 0 until 3; m <- 0 until 6) yield {
      val v = Array.fill(64)(0.0f)
      v(c * 8) = 1.0f
      v(c * 8 + 1) = 0.01f * m
      org.apache.spark.sql.Row((c * 6 + m).toLong, v.toSeq, c)
    }
    val e = df(Tables.embeddingsSchema, rows: _*)
    // 3 deterministic seed centroids, one per axis cluster
    val cents = (0 until 3).map { c =>
      val v = Array.fill(64)(0.0f); v(c * 8) = 1.0f
      org.apache.spark.sql.Row(c, v.toSeq)
    }
    val trained = df(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("ce",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))),
      cents: _*)
    graft.functions.GraftFunctions.register(spark)
    val out = Similarity.knnLabelIvf(e, trained).collect()
    assert(out.length == 18)
    out.foreach { r =>
      assert(r.getInt(2) == r.getInt(1), s"vec ${r.getLong(0)} mispredicted")
      assert(r.getLong(3) == 5L && r.getBoolean(4))
    }
  }
}
