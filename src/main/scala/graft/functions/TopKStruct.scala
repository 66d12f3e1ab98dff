package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `top_k_struct(s, k)`: the k SMALLEST struct values of a group under
  * the struct's lexicographic field ordering, returned as an ASC-sorted
  * array — a bounded per-group top-k AGGREGATE that replaces the
  * `row_number() OVER (PARTITION BY g ORDER BY …) <= k` window in the
  * kNN family's read path.
  *
  * Why an aggregate and not the window (measured, Q115Prof): q115's
  * n² sim kernel costs 0.31 s at sf0.1 — the 4 M-row window exchange
  * behind it costs ~3.2 s, 90 % of the operator. A window must SHIP
  * every candidate row to its group's sort; this aggregate is
  * map-side combinable (each partition folds its rows into a k-bounded
  * heap; merge folds heaps), so the exchange carries ≤ k rows per
  * (group, partition) — at q115's shape, 10 k rows instead of 4 M. At
  * 100 TB this is the difference between shuffling the candidate
  * universe and shuffling the answer.
  *
  * Ordering contract: lexicographic over the struct's fields via each
  * field's natural ordering (the caller encodes DESC by negating a
  * numeric key — exact for all non-NaN doubles); a NULL FIELD orders
  * GREATEST, so a NULL sort key can never displace a real candidate —
  * the `DESC NULLS LAST` window semantics the kNN callers replaced
  * (a NULL sim from a zero-norm or NULL embedding ranks behind every
  * finite one, though like the window it can still surface when a
  * group has fewer than k non-null candidates). A NULL struct input
  * is skipped (the usual aggregate null contract). k must be a
  * foldable positive int literal — enforced at analysis time. A NaN
  * double/float FIELD is rejected at UPDATE time with a named error
  * (negation would flip its rank vs a DESC window — Spark sorts NaN
  * greatest, so a DESC window ranks NaN FIRST while the negated heap
  * would rank it LAST): the function is registered for arbitrary
  * session SQL, so the out-of-contract input fails loudly instead of
  * silently diverging. q115-class callers produce 4-dp-rounded finite
  * sims by construction and never trip it; a caller with possibly-NaN
  * keys must pre-filter (or nullify — NULL orders greatest,
  * deterministically) before aggregating.
  *
  * Buffer = a k-bounded max-heap of copied rows (evict-largest on
  * insert), so update is O(log k) and memory is O(k) per group —
  * never the group's row count. Serialization is length-prefixed
  * UnsafeRow bytes (the collect_set/percentile discipline).
  */
case class TopKStruct(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[InternalRow]] {

  private lazy val structType: StructType = child.dataType.asInstanceOf[StructType]

  lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"top_k_struct: k must be an int literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty && kExpr.foldable &&
        kExpr.dataType == IntegerType =>
      if (!s.fields.forall(f => TopKStruct.orderable(f.dataType)))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires atomically-ordered struct fields, got $s")
      else kExpr.eval(InternalRow.empty) match {
        // enforce the documented contract at ANALYSIS time: k = 0 would
        // otherwise surface as a bare NoSuchElementException mid-task
        case i: Int if i > 0 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a positive int k literal, got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (struct, foldable int), got " +
        s"(${child.dataType}, ${kExpr.dataType})")
  }

  /** Field-by-field lexicographic ordering over struct VALUES with
    * NULL fields ordered GREATEST (so they can never displace a
    * non-null key from the kept-smallest set — the replaced
    * `ORDER BY key DESC NULLS LAST` window semantics under the
    * caller's key negation; a raw interpreted atomic ordering would
    * instead UNBOX a null double to 0.0 and rank a NULL key as if it
    * were zero, or NPE on strings). Max-heap (PriorityQueue dequeues
    * the LARGEST) so insert-then-evict keeps the k smallest.
    */
  private lazy val fieldOrderings: Array[Ordering[Any]] =
    structType.fields.map { f =>
      val base = TypeUtils.getInterpretedOrdering(f.dataType).asInstanceOf[Ordering[Any]]
      new Ordering[Any] {
        override def compare(a: Any, b: Any): Int =
          if (a == null && b == null) 0
          else if (a == null) 1
          else if (b == null) -1
          else base.compare(a, b)
      }
    }
  private lazy val rowOrdering: Ordering[InternalRow] = new Ordering[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = {
      var i = 0
      while (i < fieldOrderings.length) {
        val c = fieldOrderings(i).compare(
          a.get(i, structType(i).dataType), b.get(i, structType(i).dataType))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[InternalRow] =
    scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrdering)

  /** Top-level double/float field ordinals, checked for NaN on every
    * update — see the NaN paragraph in the class scaladoc. (Nested
    * orderable types can't carry a caller-negated sort key in any
    * current or sane call shape; the contract names top-level fields.)
    */
  private lazy val floatingOrdinals: Array[(Int, Boolean)] =
    structType.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == DoubleType => (i, true)
      case (f, i) if f.dataType == FloatType => (i, false)
    }

  private def rejectNaN(row: InternalRow): Unit = {
    var j = 0
    while (j < floatingOrdinals.length) {
      val (i, isDouble) = floatingOrdinals(j)
      if (!row.isNullAt(i)) {
        val nan = if (isDouble) row.getDouble(i).isNaN else row.getFloat(i).isNaN
        if (nan) throw new IllegalArgumentException(
          s"top_k_struct: NaN in sort field '${structType(i).name}' — NaN keys are " +
            "out of contract (rank flips vs a DESC window under negation); " +
            "pre-filter or nullify NaN keys before aggregating")
      }
      j += 1
    }
  }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[InternalRow],
      input: InternalRow): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      rejectNaN(row)
      // admit only rows that can enter the top k — below capacity, or
      // strictly smaller than the current worst (copy only then)
      if (buf.size < k) buf.enqueue(row.copy())
      else if (rowOrdering.compare(row, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(row.copy())
      }
    }
    buf
  }

  override def merge(
      b1: scala.collection.mutable.PriorityQueue[InternalRow],
      b2: scala.collection.mutable.PriorityQueue[InternalRow])
      : scala.collection.mutable.PriorityQueue[InternalRow] = {
    b2.foreach { row =>
      if (b1.size < k) b1.enqueue(row)
      else if (rowOrdering.compare(row, b1.head) < 0) { b1.dequeue(); b1.enqueue(row) }
    }
    b1
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(rowOrdering).map(_.asInstanceOf[Any]))

  private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: scala.collection.mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { row =>
      val u = proj(row)
      dos.writeInt(u.getSizeInBytes)
      dos.write(u.getBytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_struct"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStruct =
    copy(inputAggBufferOffset = newOffset)
}

object TopKStruct {
  private[functions] def orderable(t: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(t)
}
