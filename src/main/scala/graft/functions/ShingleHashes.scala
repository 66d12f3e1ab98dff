package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `shingle_hashes(words, n)`: the sorted distinct xxhash64 ids of all
  * n-word shingles (sliding windows) of a string array — the row-local
  * front end of the n-gram near-dup join (q55).
  *
  * Word w hashes as the builtin `xxhash64(w)` (XXH64 over its UTF-8
  * bytes, seed 42); window (w_i..w_{i+n-1}) hashes by folding the word
  * hashes through XXH64.hashLong exactly like the builtin's multi-arg
  * seed chaining — deterministic and injective w.h.p., so shingle-set
  * Jaccard equals the oracle's string-shingle Jaccard (same relabeling
  * argument as the unigram token ids).
  *
  * The HOF formulation (`transform(sequence(...), i ->
  * xxhash64(concat_ws(' ', slice(words, i, n))))`) is CodegenFallback
  * all the way down: measured ~1 ms/row interpreted (per-window slice +
  * concat allocations), re-evaluated wherever the optimizer inlines the
  * projection — it made the shingle BUILD, not the join, q55's
  * bottleneck. This expression is one JIT'd loop per row and keeps the
  * enclosing stage inside whole-stage codegen.
  *
  * Arrays shorter than n yield an empty array (no shingles).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.ShingleHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Seed = 42L // the builtin xxhash64 default seed

  /** Row kernel — also called from generated code (static forwarder).
    *
    * n = 1 short-circuits to the raw word hashes, making
    * `shingle_hashes(words, 1)` value-identical to
    * `sort_array(array_distinct(transform(words, w -> xxhash64(w))))` —
    * the unigram token-set build (q21/q25/q26) rides the same kernel
    * without changing a single token id (so sketch outputs and oracle
    * hashes are untouched).
    */
  def compute(x: ArrayData, n: Int): ArrayData = {
    val raw = x.numElements()
    // null elements are skipped (the word list shingles as if the null
    // weren't there) — the input type allows containsNull=true and a
    // null word used to NPE inside getUTF8String
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
    val wh = if (m == raw) wh0 else java.util.Arrays.copyOf(wh0, m)
    val out = if (n == 1) wh else {
      val o = new Array[Long](m - n + 1)
      i = 0
      while (i <= m - n) {
        var h = Seed
        var j = 0
        while (j < n) { h = XXH64.hashLong(wh(i + j), h); j += 1 }
        o(i) = h
        i += 1
      }
      o
    }
    java.util.Arrays.sort(out)
    var k = 0
    i = 0
    while (i < out.length) {
      if (k == 0 || out(i) != out(k - 1)) { out(k) = out(i); k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
