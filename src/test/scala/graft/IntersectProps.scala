package graft

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks (SURVEY.md §5.2.3) of the native intersect
  * expression's interpreted eval against scala.collection Set semantics
  * — no Spark session needed, so hundreds of cases run in milliseconds.
  */
object IntersectProps extends Properties("SortedIntersectCount") {

  private val sortedSet: Gen[Seq[Int]] =
    Gen.listOf(Gen.choose(0, 120)).map(_.distinct.sorted)

  private def eval(a: Seq[Int], b: Seq[Int]): Int = {
    val expr = SortedIntersectCount(
      Literal.create(new GenericArrayData(a.toArray), ArrayType(IntegerType)),
      Literal.create(new GenericArrayData(b.toArray), ArrayType(IntegerType)))
    expr.eval(null).asInstanceOf[Int]
  }

  property("equals set-intersection cardinality") = forAll(sortedSet, sortedSet) { (a, b) =>
    eval(a, b) == a.toSet.intersect(b.toSet).size
  }

  property("commutative") = forAll(sortedSet, sortedSet) { (a, b) =>
    eval(a, b) == eval(b, a)
  }

  property("self-intersection is cardinality; empty is absorbing") = forAll(sortedSet) { a =>
    eval(a, a) == a.size && eval(a, Nil) == 0 && eval(Nil, a) == 0
  }

  property("bounded by min cardinality") = forAll(sortedSet, sortedSet) { (a, b) =>
    eval(a, b) <= math.min(a.size, b.size)
  }
}
