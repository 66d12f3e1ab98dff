package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `prefix_intersect_count(a, alen, b, blen)`: |a[0,alen) ∩ b[0,blen)|
  * for ASC-sorted distinct long arrays — the allocation-free form of
  * `sorted_intersect_count(slice(a, 1, alen), slice(b, 1, blen))`.
  *
  * This is the first-shared-token predicate of the prefix candidate
  * join (q21/q55/q56): it runs once per MATCHED PAIR inside the join's
  * generated loop, where the slice form materializes two fresh arrays
  * per evaluation (tens of millions of allocations per query at
  * sf0.1). Bounds are clamped to the actual array lengths; negative
  * lengths count as empty.
  *
  * Caller contract: arrays sorted ascending, no duplicates (as built by
  * [[ShingleHashes]]). Not enforced — violating it undercounts.
  */
case class PrefixIntersectCount(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), IntegerType, ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, int, array<long>, int), got $t")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "prefix_intersect_count"

  override def nullSafeEval(a: Any, alen: Any, b: Any, blen: Any): Any =
    PrefixIntersectCount.compute(a.asInstanceOf[ArrayData], alen.asInstanceOf[Int],
      b.asInstanceOf[ArrayData], blen.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, alen, b, blen) =>
      s"${ev.value} = graft.functions.PrefixIntersectCount.compute($a, $alen, $b, $blen);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

object PrefixIntersectCount {
  /** Merge scan over the two prefixes — called from generated code. */
  def compute(a: ArrayData, alen: Int, b: ArrayData, blen: Int): Int = {
    val n1 = math.min(math.max(alen, 0), a.numElements())
    val n2 = math.min(math.max(blen, 0), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < n1 && j < n2) {
      val v1 = a.getLong(i)
      val v2 = b.getLong(j)
      if (v1 < v2) i += 1
      else if (v1 > v2) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
