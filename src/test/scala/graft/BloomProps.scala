package graft

import graft.functions.BloomFilterLong
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the Bloom kernel (q95): no false negatives
  * under ANY key set / k / size, serialization round-trips exactly, and
  * insertion order never changes the filter bytes (the property that
  * makes the treeAggregate build partition-order deterministic). Pure
  * kernel — no Spark session, hundreds of cases in milliseconds.
  */
object BloomProps extends Properties("BloomFilterLong") {

  private val keys: Gen[List[Long]] = Gen.listOf(Gen.long)
  private val kGen: Gen[Int] = Gen.choose(1, 8)
  private val bitsGen: Gen[Int] = Gen.oneOf(64, 1 << 10, 1 << 14)

  private def build(ks: Seq[Long], k: Int, bits: Int): Array[Byte] = {
    val w = BloomFilterLong.emptyWords(bits)
    ks.foreach(BloomFilterLong.add(w, k, _))
    BloomFilterLong.serialize(k, w)
  }

  property("no false negatives, post round-trip") = forAll(keys, kGen, bitsGen) { (ks, k, bits) =>
    val st = BloomFilterLong.deserialize(build(ks, k, bits))
    ks.forall(BloomFilterLong.mightContain(st, _))
  }

  property("insertion order does not change the bytes") = forAll(keys, kGen, bitsGen) { (ks, k, bits) =>
    java.util.Arrays.equals(build(ks, k, bits), build(ks.reverse, k, bits))
  }

  property("merge (bit-OR) equals single-pass build") = forAll(keys, keys, kGen) { (a, b, k) =>
    val bits = 1 << 10
    val wa = BloomFilterLong.emptyWords(bits)
    a.foreach(BloomFilterLong.add(wa, k, _))
    val wb = BloomFilterLong.emptyWords(bits)
    b.foreach(BloomFilterLong.add(wb, k, _))
    val merged = wa.zip(wb).map { case (x, y) => x | y }
    java.util.Arrays.equals(BloomFilterLong.serialize(k, merged), build(a ++ b, k, bits))
  }
}
