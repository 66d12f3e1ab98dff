package graft.ops

import graft.SparkSpecBase

/** Large-star/small-star connected components vs hash-min: identical
  * labels, and the round-count collapse on a long chain that justifies
  * the variant's existence — hash-min needs O(diameter) rounds where
  * the star operations need O(log) (Kiveris et al.).
  */
class StarComponentsSpec extends SparkSpecBase {

  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)]) = pairs.toDF("ga", "gb")
  private def nodesDf(ids: Seq[Long]) = ids.toDF("gid")

  test("long chain: star labels = hash-min labels, in far fewer rounds") {
    val n = 40L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val (hmLabels, hmRounds) = Similarity.hashMinLabels(nodesDf(0L until n), edgesDf(chain))
    val (stLabels, stRounds) = Similarity.starLabels(edgesDf(chain))
    val hm = hmLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // star labels omit isolated nodes (none here except the component
    // min itself, which the star edges never point FROM)
    val st = stLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hm == (0L until n).map(_ -> 0L).toMap)
    assert((0L until n).forall(i => st.getOrElse(i, i) == 0L))
    // hash-min walks the minimum one hop per round: ~n rounds on an
    // n-chain; the star rounds collapse it logarithmically
    assert(hmRounds >= (n / 2).toInt, s"chain fixture too easy for hash-min ($hmRounds rounds)")
    assert(stRounds * 4 < hmRounds, s"star must need far fewer rounds: $stRounds vs $hmRounds")
  }

  test("multi-component graph with hubs and singleton: labels agree with brute force") {
    // components: {1,2,3,4,9} (hub 1), {5,6,7} (chain), {8} isolated
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 9L), (5L, 6L), (6L, 7L))
    val nodes = 1L to 9L
    val (hmLabels, _) = Similarity.hashMinLabels(nodesDf(nodes), edgesDf(edges))
    val (stLabels, _) = Similarity.starLabels(edgesDf(edges))
    val hm = hmLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val st = stLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L)
    assert(hm == want)
    assert(nodes.forall(i => st.getOrElse(i, i) == want(i)))
  }

  test("q62b = q62 row-for-row on driver testdata") {
    val dir = "/root/testdata/sf0.001"
    val a = Similarity.q62DedupClusters(spark, dir).collect().map(_.toString).toSeq
    val b = Similarity.q62bDedupClustersStar(spark, dir).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }
}
