package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `bloom_might_contain(filter, key)`: membership probe of a LONG key
  * against a serialized [[BloomFilterLong]] — the engine's runtime-
  * filter primitive (q95). `filter` must be a foldable BINARY (the
  * filter is built once on the dim side and inlined as a literal, the
  * same lifecycle as a broadcast variable); `key` is any BIGINT.
  *
  * No false negatives ever (a contained key always probes true), false
  * positives at the classic (1-e^{-kn/m})^k rate — callers re-verify
  * with an exact join (q95) or tolerate the rate (pre-filters).
  *
  * Codegen: the filter deserializes ONCE per executor into a long[]
  * referenced from the generated code; each probe is k dependent
  * xxhash64-derived bit tests — branch-only, no allocation, and the
  * enclosing stage stays inside whole-stage codegen (a UDF here would
  * evict the scan stage and serialize every row through a closure).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) if left.foldable => TypeCheckResult.TypeCheckSuccess
    case (BinaryType, LongType) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a foldable (literal) filter")
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires (binary, bigint), got ($l, $r)")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // deserialized once per task thanks to the lazy val riding the
  // serialized expression tree; generated code shares it via
  // addReferenceObj, so interpreted and codegen paths probe one array
  @transient private lazy val state: BloomFilterLong.State =
    BloomFilterLong.deserialize(left.eval(null).asInstanceOf[Array[Byte]])

  override def nullSafeEval(f: Any, key: Any): Any =
    BloomFilterLong.mightContain(state, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized state rides the generated class as a reference
    // object; the literal child's own codegen is just a byte[] ref that
    // the probe never touches
    val st = ctx.addReferenceObj("bloomState", state, classOf[BloomFilterLong.State].getName)
    nullSafeCodeGen(ctx, ev, (_, key) =>
      s"${ev.value} = graft.functions.BloomFilterLong.mightContain($st, $key);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Blocked-free classic Bloom filter over BIGINT keys with double
  * hashing (Kirsch–Mitzenmacher: bit_i = h1 + i·h2 over m = 2^b bits),
  * both hashes xxhash64 of the key at fixed seeds. Serialized layout:
  * [k: 1 byte][words: 8 bytes each, big-endian] — self-describing, so
  * the probe expression needs no side-channel config. Deterministic by
  * construction (bit-OR is commutative/associative), so a filter built
  * by `treeAggregate` under ANY partitioning is byte-identical.
  */
object BloomFilterLong {
  private final val Seed1 = 0x9E3779B97F4A7C15L
  private final val Seed2 = 42L

  /** Deserialized probe state: k plus the bit words (length 2^b). */
  final class State(val k: Int, val words: Array[Long]) extends Serializable {
    require(Integer.bitCount(words.length) == 1,
      s"bloom word count must be a power of two, got ${words.length}")
  }

  def emptyWords(numBits: Int): Array[Long] = {
    require(numBits >= 64 && Integer.bitCount(numBits) == 1,
      s"numBits must be a power of two >= 64, got $numBits")
    new Array[Long](numBits / 64)
  }

  /** Set key's k bits (build side — mutates `words`). */
  def add(words: Array[Long], k: Int, key: Long): Unit = {
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    val mask = words.length.toLong * 64 - 1
    var i = 0
    while (i < k) {
      val bit = (h1 + i * h2) & mask
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe (also called from generated code — static forwarder). */
  def mightContain(s: State, key: Long): Boolean = {
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    val mask = s.words.length.toLong * 64 - 1
    var i = 0
    while (i < s.k) {
      val bit = (h1 + i * h2) & mask
      if ((s.words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(k: Int, words: Array[Long]): Array[Byte] = {
    require(k >= 1 && k <= 255, s"k must be in [1, 255], got $k")
    val bb = java.nio.ByteBuffer.allocate(1 + words.length * 8)
    bb.put(k.toByte)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    require(bytes != null && bytes.length >= 9 && (bytes.length - 1) % 8 == 0,
      s"malformed bloom filter payload (${if (bytes == null) "null" else s"${bytes.length} bytes"})")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.get() & 0xFF
    val words = new Array[Long]((bytes.length - 1) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    new State(k, words)
  }
}
