package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `float_vec_dot(a, b)`: Σᵢ (double)aᵢ · (double)bᵢ over two equal-length
  * float arrays, accumulated left-to-right in double — the exact fold
  * order of `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  * 0.0, +)`, so results are bit-identical to the higher-order-function
  * formulation (and to the DuckDB oracle's unnest+sum), while running as
  * one fused codegen loop instead of per-element interpreted lambdas.
  * This is the inner loop of every cosine-similarity operator
  * (q22/q31/q32); norms are `sqrt(float_vec_dot(a, a))`.
  *
  * Caller contract: equal lengths (extra elements of the longer array
  * are ignored).
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `minhash_signature(toks)`: the 32-permutation MinHash signature of an
  * int/long token-set array, one generated loop (32·|toks| splitmix64
  * mixes) instead of nested interpreted lambdas. Permutation p's hash of
  * token t is `mix(t·K1 + (p+1)·K2)` — an engine-defined family, stable
  * across Spark versions (unlike reusing xxhash64 internals). Int tokens
  * are sign-extended to long, so int inputs hash as before.
  */
case class MinHashSignature(child: Expression, numPerms: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<int> or array<long>, got $t")
  }
  private def isLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val long = isLong
    val n = x.numElements()
    val sig = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val t = if (long) x.getLong(i) else x.getInt(i).toLong
        val h = MinHashSignature.mix(
          t * MinHashSignature.K1 + (p + 1) * MinHashSignature.K2)
        if (h < best) best = h
        i += 1
      }
      sig(p) = best
      p += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isLong) "getLong" else "getInt"
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val best = ctx.freshName("best")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $a.numElements();
         |final long[] $sig = new long[$numPerms];
         |for (int $p = 0; $p < $numPerms; $p++) {
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = graft.functions.MinHashSignature.mix(
         |      ((long) $a.$get($i)) * ${MinHashSignature.K1}L + ($p + 1) * ${MinHashSignature.K2}L);
         |    if ($h < $best) $best = $h;
         |  }
         |  $sig[$p] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  final val K1: Long = 0x9E3779B97F4A7C15L
  final val K2: Long = 0xC2B2AE3D27D4EB4FL

  /** splitmix64 finalizer — callable from generated code. */
  def mix(x0: Long): Long = {
    var z = x0
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** `simhash64(toks)`: 64-bit SimHash of an int token-set array — per
  * token one splitmix64 hash, ±1 votes per bit, sign → bit; the whole
  * signature in one fused loop (the HOF formulation evaluates 64·|toks|
  * interpreted lambdas and hashes each token 64 times).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<int> or array<long>, got $t")
  }
  private def isLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val long = isLong
    val n = x.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = if (long) x.getLong(i) else x.getInt(i).toLong
      val h = MinHashSignature.mix(t * MinHashSignature.K1 + MinHashSignature.K2)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isLong) "getLong" else "getInt"
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = graft.functions.MinHashSignature.mix(
         |    ((long) $a.$get($i)) * ${MinHashSignature.K1}L + ${MinHashSignature.K2}L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
