package graft.ops

import graft.SparkSpecBase

/** q33's multimodal plumbing after the round-7 de-stub: the declared
  * operator computes the stand-in features with pure Catalyst
  * expressions (no custom iterator code in any declared query), while
  * the real-codec per-partition iterator shape survives as the
  * non-declared [[TrainingData.multimodalDecodeShape]] reference —
  * these tests pin the two output-identical and the declared plan
  * object-free, so neither can silently drift.
  */
class MultimodalSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q33 expression features are output-identical to the codec-shape iterator") {
    val viaExpr = TrainingData.q33MultimodalStub(spark, sf)
      .collect().map(_.toString).toSeq
    val viaIter = TrainingData.multimodalDecodeShape(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaExpr.nonEmpty && viaExpr == viaIter)
  }

  test("declared q33 plan stays inside codegen: no object serialization, no mapPartitions") {
    val p = TrainingData.q33MultimodalStub(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("MapPartitions") && !p.contains("DeserializeToObject"),
      s"q33 must be expression-only after the de-stub:\n$p")
  }

  test("q132 modality agreement: flags are consistent with its own scores") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Similarity.q132ModalityAgreement(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 must contain text near-dup pairs to score")
    rows.foreach { r =>
      val jac = r.getDouble(2); val cos = r.getDouble(3); val agree = r.getLong(4)
      assert(jac >= 0.8, s"pair must come from the J >= 4/5 cascade: $r")
      assert(agree == (if (cos >= 0.9) 1L else 0L), s"flag must match cosine: $r")
    }
  }
}
