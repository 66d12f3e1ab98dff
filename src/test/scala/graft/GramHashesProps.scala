package graft

import graft.functions.{GramHashes, ShingleHashes}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Session-free properties of the positional gram kernel (q104's front
  * end) against its sorted-distinct sibling: the two expressions MUST
  * hash any window identically, or repeated-span detection and shingle
  * near-dup would silently disagree about what a gram is.
  */
object GramHashesProps extends Properties("GramHashes") {

  private val words: Gen[Seq[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e f", "")).map(_.take(40))
  private val n: Gen[Int] = Gen.choose(1, 5)

  private def arr(ws: Seq[String]): ArrayData =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  private def grams(ws: Seq[String], k: Int): Seq[Long] = {
    val e = GramHashes(Literal.create(arr(ws), ArrayType(StringType)), k)
    e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  private def shingles(ws: Seq[String], k: Int): Seq[Long] = {
    val e = ShingleHashes(Literal.create(arr(ws), ArrayType(StringType)), k)
    e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  property("sorted-distinct of positional grams = shingle_hashes") =
    forAll(words, n) { (ws, k) =>
      grams(ws, k).distinct.sorted == shingles(ws, k)
    }

  property("positional count = max(0, m - n + 1)") = forAll(words, n) { (ws, k) =>
    grams(ws, k).size == math.max(0, ws.size - k + 1)
  }

  property("gram at position i = hash of the window alone (position-independent hashing)") =
    forAll(words, n) { (ws, k) =>
      val g = grams(ws, k)
      g.zipWithIndex.forall { case (h, i) => grams(ws.slice(i, i + k), k) == Seq(h) }
    }

  property("equal windows collide wherever they occur") = forAll(words, n) { (ws, k) =>
    // duplicate the word list back to back: every window of the first
    // copy recurs in the second at offset ws.size
    val doubled = ws ++ ws
    val g = grams(doubled, k)
    ws.size < k || (0 to ws.size - k).forall(i => g(i) == g(i + ws.size))
  }
}
