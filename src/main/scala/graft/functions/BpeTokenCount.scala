package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_token_count(text, pats, reps)`: the document's token count in
  * BPE units under a ranked literal-replace merge table — ONE JIT'd
  * kernel per row replacing the interpreted 13-deep builtin chain
  * (`trim(array_join(split(translate(...))))` + one `replace` call per
  * merge rule), which was the q67/q105/q109/q112 cost center (the
  * q124/word_ngrams lesson applied to the tokenizer).
  *
  * The kernel replays EXACTLY the replay semantics both engines agree
  * on (and the DuckDB oracle mirrors): spell the document as
  * space-separated symbols with word gaps as `|` (merges never cross
  * words), apply each rule in rank order as a literal left-to-right
  * non-overlapping replace (`java.lang.String.replace` ≡ Spark's
  * `replace` ≡ DuckDB's `replace`), then count symbols:
  * tokens = fields(merged) − fields(text) + 1 where fields(s) =
  * spaces(s) + 1 (the `size(split(s, " "))` identity).
  * BpeTokenSpec pins this expression output-identical to the builtin
  * fold formulation on corpus data and edge fixtures.
  *
  * `pats`/`reps` arrive as foldable string-array literals (the trained
  * merge table collected to constants — model-sized, the IVF-centroid
  * pattern), so one expression instance serves any merge table.
  */
case class BpeTokenCount(child: Expression, pats: Seq[String], reps: Seq[String])
    extends UnaryExpression {

  require(pats.length == reps.length,
    s"merge pattern/replacement lists must align: ${pats.length} vs ${reps.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val patsArr: Array[String] = pats.toArray
  @transient private lazy val repsArr: Array[String] = reps.toArray

  override def nullSafeEval(t: Any): Any =
    BpeTokenCount.compute(t.asInstanceOf[UTF8String], patsArr, repsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("bpePats", patsArr, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeReps", repsArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev,
      t => s"${ev.value} = graft.functions.BpeTokenCount.compute($t, $p, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {

  /** Row kernel — also called from generated code (static forwarder). */
  def compute(textU: UTF8String, pats: Array[String], reps: Array[String]): Long = {
    val text = textU.toString
    // spell: each codepoint followed by ' ', word gaps as '|'; the
    // final trailing ' ' is dropped (the builtin chain's trailing empty
    // split element + trim produce the same string)
    val sb = new java.lang.StringBuilder(text.length * 2)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp == ' ') sb.append('|') else sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    if (sb.length > 0) sb.setLength(sb.length - 1)
    var merged = sb.toString
    var m = 0
    while (m < pats.length) {
      merged = merged.replace(pats(m), reps(m))
      m += 1
    }
    spaces(merged) - spaces(text) + 1L
  }

  private def spaces(s: String): Long = {
    var c = 0L
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') c += 1; i += 1 }
    c
  }
}
