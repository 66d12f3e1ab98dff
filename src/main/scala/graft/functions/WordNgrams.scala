package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(words, n)`: ALL n-word grams of a string array as
  * space-joined strings, in position order, multiplicity preserved —
  * the row-local gram builder of the boilerplate report (q124), where
  * the gram TEXT (not just a hash) is the output and per-position
  * occurrence counts are the statistic.
  *
  * [[ShingleHashes]]'s lesson applies verbatim: the HOF formulation
  * (`transform(sequence(...), i -> array_join(slice(words, i, n),
  * ' '))`) is CodegenFallback all the way down — measured ~9 s to build
  * 250k grams at sf0.1, the whole query's bottleneck — while this
  * expression is one JIT'd loop per row (UTF8String concat, no
  * per-window Column machinery) that keeps the enclosing stage inside
  * whole-stage codegen. Unlike `shingle_hashes` the output is neither
  * sorted nor distinct: q124's tf counts every occurrence.
  *
  * Null words are skipped (the list grams as if the null weren't
  * there, matching [[ShingleHashes]]); arrays with fewer than n
  * non-null words yield an empty array.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(a: Any): Any =
    WordNgrams.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.WordNgrams.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  /** Row kernel — also called from generated code (static forwarder). */
  def compute(x: ArrayData, n: Int): ArrayData = {
    val raw = x.numElements()
    val words = new Array[UTF8String](raw)
    var m = 0
    var i = 0
    while (i < raw) {
      if (!x.isNullAt(i)) { words(m) = x.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= m - n) {
      System.arraycopy(words, i, window, 0, n)
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
