package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `morton_interleave(gx, gy)`: the 32-bit Z-value (Morton code) of
  * two 16-bit grid coordinates — gx occupies the even bit positions,
  * gy the odd. The layout planner's hot row-local kernel (q175): the
  * composed-expression form is a 32-term shift/mask tree; this native
  * expression is the classic 4-step magic-number bit spread (8 ops per
  * coordinate, branch-free, constant-time) and participates in
  * whole-stage codegen via doGenCode, so the Z computation stays one
  * straight-line fragment of the generated scan loop. Inputs beyond 16
  * bits are masked (`& 0xFFFF`) — the grid normalization upstream
  * guarantees the range, the mask guarantees the contract.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.MortonInterleave.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {

  /** Spread the low 16 bits of x across the even bit positions of a
    * 32-bit value (the standard doubling mask cascade).
    */
  def spread16(x0: Long): Long = {
    var x = x0 & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Row kernel — also called from generated code (static forwarder). */
  def compute(gx: Long, gy: Long): Long =
    spread16(gx) | (spread16(gy) << 1)
}
