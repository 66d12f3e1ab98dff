package graft.ops

import graft.SparkSpecBase
import graft.functions.GraftFunctions

/** q123's accuracy trade, measured: asymmetric int8 scalar quantization
  * (corpus 4×-compressed, queries exact) against the exact float search
  * (q22) on the same testdata. The floors are measured values minus
  * slack, not aspirations — 8-bit codes on 64-dim near-isotropic
  * vectors should barely move the ranking.
  */
class Int8AnnSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("recall@10 vs exact q22 and bounded similarity distortion") {
    GraftFunctions.register(spark)
    val exact = Similarity.q22TopkCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val quant = Similarity.q123Int8Ann(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(quant.nonEmpty, "quantized search returned nothing")
    val qids = exact.keys.map(_._1).toSet
    assert(qids == quant.keys.map(_._1).toSet)

    val recalls = qids.toSeq.map { q =>
      val e = exact.keys.filter(_._1 == q).map(_._2).toSet
      val s = quant.keys.filter(_._1 == q).map(_._2).toSet
      e.intersect(s).size.toDouble / e.size
    }
    val recall = recalls.sum / recalls.size
    info(f"mean recall@10 = $recall%.3f")
    assert(recall >= 0.85, f"int8 recall collapsed: $recall%.3f")

    // distortion: where both rankings agree on a (qid, tid), the 4-dp
    // sims must be close — int8 over [-1,1]-ish floats moves a 64-dim
    // cosine by O(1/255) per dim pair, far under 0.02 after averaging
    val overlap = exact.keySet.intersect(quant.keySet)
    val maxErr = overlap.map(k => math.abs(exact(k) - quant(k))).max
    info(f"max |sim_exact - sim_int8| on shared pairs = $maxErr%.5f")
    assert(maxErr <= 0.02, f"quantization distortion too large: $maxErr%.5f")
  }

  test("the quantization model is exactly the per-dim min/max affine map") {
    GraftFunctions.register(spark)
    // a constant dimension must dequantize to itself (mn = mx branch)
    // and an endpoint value must be a fixed point of quantize∘dequantize
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sf)
    val bounds = e.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .collect()
    assert(bounds.nonEmpty)
    bounds.foreach { r =>
      val (mn, mx) = (r.getDouble(1), r.getDouble(2))
      def deq(x: Double): Double =
        if (mx == mn) mn
        else mn + math.floor((x - mn) * 255.0 / (mx - mn) + 0.5) * (mx - mn) / 255.0
      assert(deq(mn) == mn, s"lower endpoint must be a fixed point: $mn -> ${deq(mn)}")
      assert(math.abs(deq(mx) - mx) < 1e-12, s"upper endpoint must survive: $mx -> ${deq(mx)}")
    }
  }
}
