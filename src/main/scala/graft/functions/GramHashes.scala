package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `gram_hashes(words, n)`: the POSITIONAL xxhash64 ids of all n-word
  * grams of a string array — element i of the result is the hash of
  * the window starting at (0-based) word i. The positional sibling of
  * [[ShingleHashes]] (same word hashing, same XXH64 window fold, so a
  * gram here and a shingle there hash identically), WITHOUT the
  * sort+distinct: repeated-span detection (q104) needs to know WHERE a
  * gram occurs and how often, not just that it occurs.
  *
  * Arrays shorter than n yield an empty array. Null words are skipped
  * exactly like [[ShingleHashes]] — positions refer to the null-free
  * word sequence (documents split on single spaces never contain
  * nulls).
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(a: Any): Any =
    GramHashes.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.GramHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  private final val Seed = 42L // the builtin xxhash64 default seed

  /** Row kernel — also called from generated code (static forwarder). */
  def compute(x: ArrayData, n: Int): ArrayData = {
    val raw = x.numElements()
    val wh0 = new Array[Long](raw)
    var m = 0
    var i = 0
    while (i < raw) {
      if (!x.isNullAt(i)) {
        val s = x.getUTF8String(i)
        wh0(m) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        m += 1
      }
      i += 1
    }
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    // n = 1 short-circuits to the raw word hashes, exactly like
    // ShingleHashes — the two kernels must assign any window the same
    // id (GramHashesProps pins the invariant)
    if (n == 1) return new GenericArrayData(
      if (m == raw) wh0 else java.util.Arrays.copyOf(wh0, m))
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(wh0(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
