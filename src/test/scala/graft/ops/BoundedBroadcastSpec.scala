package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The bounded-broadcast invariant on the exact similarity twins
  * (q115/q31): their seed/pair-side broadcast is gated on the side's
  * plan statistic — an oversized side fails LOUDLY at plan-build time
  * with the scale swap-in named, instead of OOMing a cluster with a
  * corpus-sized broadcast. The CartesianGuardRule philosophy one level
  * up (fail the misuse fast; the declared production paths are
  * q120/q94/q25).
  */
class BoundedBroadcastSpec extends SparkSpecBase {

  /** A relation whose plan statistic is far over the 32 MB gate —
    * `spark.range` carries exact size statistics, so no job ever runs
    * (the gate check happens before any action).
    */
  private def oversized = {
    graft.functions.GraftFunctions.register(spark)
    spark.range(20L * 1000 * 1000)
    .select(col("id").as("vec_id"),
      array(lit(0.1f), lit(0.2f)).as("embedding"),
      lit(1).as("label"))
  }

  test("q115 core: an over-gate seed side fails at build time, naming q120 as the swap-in") {
    val e = intercept[IllegalStateException] { Similarity.knnLabelFrom(oversized) }
    assert(e.getMessage.contains("q115_knn_label"), e.getMessage)
    assert(e.getMessage.contains("q120_knn_label_ivf"), e.getMessage)
    assert(e.getMessage.contains("broadcast"), e.getMessage)
  }

  test("q31 core: an over-gate pair side fails at build time, naming q94/q25 as swap-ins") {
    val e = intercept[IllegalStateException] {
      Similarity.embedNeardupFrom(oversized.drop("label"))
    }
    assert(e.getMessage.contains("q31_embed_neardup"), e.getMessage)
    assert(e.getMessage.contains("q94_semdedup"), e.getMessage)
    assert(e.getMessage.contains("q25_minhash_neardup"), e.getMessage)
  }

  test("under the gate, both twins build and run unchanged (testdata passes the gate)") {
    val sf = "/root/testdata/sf0.001"
    assert(Similarity.q115KnnLabel(spark, sf).limit(3).count() == 3)
    assert(Similarity.q31EmbedNeardup(spark, sf).limit(3).count() == 3)
  }
}
