package graft.ops

import graft.SparkSpecBase
import graft.functions.GraftFunctions

/** q131's composition claim, measured: IVF pruning × int8 quantization
  * must cost at most the sum of their individually-measured accuracy
  * trades — pruning's recall loss (IvfRecallSpec pins q32c's) plus
  * q123's sim distortion (Int8AnnSpec: ≤ 0.0022 at 4 dp).
  */
class IvfSq8Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def topSets(rows: Array[org.apache.spark.sql.Row]) =
    rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }

  test("IVF-SQ8 recall vs exact, and agreement with pure-float IVF at the same nprobe") {
    GraftFunctions.register(spark)
    val exact = topSets(Similarity.q22TopkCosine(spark, sf).collect())
    val ivf = topSets(Similarity.q32cIvfMultiprobe(spark, sf).collect())
    val sq8 = topSets(Similarity.q131IvfSq8(spark, sf).collect())
    assert(sq8.nonEmpty && sq8.keySet == exact.keySet)

    def recall(a: Map[Long, Set[Long]], b: Map[Long, Set[Long]]): Double = {
      val per = a.keys.toSeq.map(q => b(q).intersect(a(q)).size.toDouble / a(q).size)
      per.sum / per.size
    }
    val rIvf = recall(exact, ivf)
    val rSq8 = recall(exact, sq8)
    val agree = recall(ivf, sq8)
    info(f"recall@10 vs exact: float-IVF $rIvf%.3f, IVF-SQ8 $rSq8%.3f; sq8↔float agreement $agree%.3f")
    // quantization may cost a little recall on top of pruning, but the
    // bucket membership is identical (assignment on floats) so the two
    // IVF variants must agree almost everywhere
    assert(agree >= 0.9, f"quantization changed the pruned ranking too much: $agree%.3f")
    assert(rSq8 >= rIvf - 0.1, f"SQ8 recall collapsed below float IVF: $rSq8%.3f vs $rIvf%.3f")
  }
}
