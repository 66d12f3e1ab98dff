package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `shingle_stats(words, n)` →
  * `struct<n_grams: bigint, n_distinct: bigint, max_count: bigint>`:
  * one-pass MULTISET statistics of a document's n-word shingles — the
  * row-local kernel behind intra-document repetition signals (q79, the
  * Gopher/MassiveText repetition filters):
  *
  *  - `n_grams`    — total shingle count (`len(words) - n + 1`, after
  *    null-word skipping; 0 when too short);
  *  - `n_distinct` — distinct shingles, so
  *    `1 - n_distinct/n_grams` is the duplicate-n-gram fraction;
  *  - `max_count`  — the most frequent shingle's multiplicity, so
  *    `max_count/n_grams` is the top-n-gram coverage fraction.
  *
  * Same hashing scheme as [[ShingleHashes]] (builtin-xxhash64 word ids
  * chained through `XXH64.hashLong`), but where that kernel returns the
  * DEDUPLICATED id array for near-dup joins, this one keeps the
  * multiset and reduces it to the three counts in place — the array
  * never leaves the row, so the aggregate-side plan ships 24 bytes per
  * document regardless of document length. Like its sibling, the loop
  * is a static kernel call from generated code: the enclosing stage
  * stays inside whole-stage codegen (the HOF formulation of the same
  * stats is CodegenFallback and measured ~1 ms/row on shingle builds).
  */
case class ShingleStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))
  override def prettyName: String = "shingle_stats"

  override def nullSafeEval(a: Any): Any =
    ShingleStats.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.ShingleStats.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStats {
  private final val Seed = 42L // the builtin xxhash64 default seed

  /** Row kernel — also called from generated code (static forwarder).
    * Sort + run-length scan over the shingle-hash multiset; null words
    * are skipped exactly like [[ShingleHashes.compute]].
    */
  def compute(x: ArrayData, n: Int): InternalRow = {
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
    if (m < n) return InternalRow(0L, 0L, 0L)
    val total = m - n + 1
    val out = if (n == 1) java.util.Arrays.copyOf(wh0, m) else {
      val o = new Array[Long](total)
      i = 0
      while (i < total) {
        var h = Seed
        var j = 0
        while (j < n) { h = XXH64.hashLong(wh0(i + j), h); j += 1 }
        o(i) = h
        i += 1
      }
      o
    }
    java.util.Arrays.sort(out)
    var distinct = 0L
    var maxRun = 0L
    var run = 0L
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { distinct += 1; run = 1L }
      else run += 1
      if (run > maxRun) maxRun = run
      i += 1
    }
    InternalRow(total.toLong, distinct, maxRun)
  }
}
