package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded sorted collect over a STRUCT column: the first `maxLen` values
  * in ascending struct order. Semantically
  * `slice(sort_array(collect_list(e)), 1, maxLen)`, but the buffer NEVER
  * holds more than maxLen entries — a bounded max-heap at every stage,
  * including map-side partials and shuffle rows — so one pathological key
  * (a bot user, a template source) costs O(maxLen) executor memory and
  * shuffle bytes instead of OOMing the signal build. This enforces the
  * engine's per-key holistic-signal cap (SURVEY.md §7.3) INSIDE the
  * aggregation instead of after it.
  */
case class BoundedSortedCollect(
    child: Expression,
    maxLen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  require(maxLen > 0, "maxLen must be positive")

  @transient private lazy val structType: StructType = child.dataType match {
    case st: StructType => st
    case other => throw new IllegalArgumentException(
      s"graft_bounded_sorted_collect expects a struct child, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_bounded_sorted_collect"

  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]

  // max-heap: head is the LARGEST kept row, evicted when a smaller
  // candidate arrives at capacity
  private def newHeap(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.min(maxLen, 16),
      (a: InternalRow, b: InternalRow) => ordering.compare(b, a))

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    newHeap()

  private def insert(heap: java.util.PriorityQueue[InternalRow],
                     row: InternalRow, owned: Boolean): Unit = {
    if (heap.size < maxLen) {
      heap.add(if (owned) row else row.copy())
    } else if (ordering.compare(row, heap.peek()) < 0) {
      heap.poll()
      heap.add(if (owned) row else row.copy())
    }
  }

  override def update(heap: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(heap, v.asInstanceOf[InternalRow], owned = false)
    heap
  }

  override def merge(a: java.util.PriorityQueue[InternalRow],
                     b: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next(), owned = true)
    a
  }

  override def eval(heap: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr,
      (x: InternalRow, y: InternalRow) => ordering.compare(x, y))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  @transient private lazy val proj = UnsafeProjection.create(structType)
  @transient private lazy val writeBuffer = new Array[Byte](4096)

  override def serialize(heap: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val u = proj(it.next())
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, writeBuffer)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = newHeap()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(structType.length)
      row.pointTo(buf, len)
      heap.add(row)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedSortedCollect =
    copy(child = newChildren.head)
}

/** Mutable buffer for [[BoundedWeightedCollect]]: the kept rows plus their
  * cumulative weight (recomputed on deserialize — weights derive from the
  * rows themselves). */
final class WeightedHeap(val heap: java.util.PriorityQueue[InternalRow],
                         var totalWeight: Long)

/** Weight-bounded sorted collect over a STRUCT column whose field
  * `weightField` is an array: keeps, in ascending struct order, a superset
  * of the minimal order-prefix of rows whose cumulative array length
  * reaches `maxWeight` — i.e. exactly the rows a downstream
  * `slice(flatten(...), 1, maxWeight)` can use, with everything past the
  * weight horizon evicted EAGERLY at every stage (map-side partials and
  * shuffle rows included).
  *
  * Semantics: equivalent to `sort_array(collect_list(e))` as consumed by a
  * flatten+slice-to-maxWeight, but buffer memory is O(maxWeight) elements
  * plus one row instead of O(window size). Eviction rule: the largest kept
  * row is dropped whenever the strictly-smaller kept rows already weigh
  * >= maxWeight (it can then never contribute to the prefix). A row's
  * weight is its TRUE array length (ADVICE r3: padding it to 1 overstated
  * the prefix and could evict a row the slice still needed); zero-length
  * and null arrays are skipped outright — which is also what keeps the
  * buffer row-count bounded by maxWeight + 1.
  *
  * Null-array divergence (ADVICE r4): the unbounded
  * `flatten(sort_array(collect_list(...)))` formulation is NOT equivalent
  * on null-array inputs — Spark's flatten returns null when ANY element
  * array is null, so one null-token row would null the whole window's
  * signal there, while this aggregate skips the row and still computes
  * features from the remaining rows. The skip is the intended semantic
  * (a corrupt row must not erase its window at 10^12 scale); callers
  * comparing against the unbounded formulation must pre-filter null
  * arrays on that side (as HardeningSpec's equivalence gate does via
  * rows that carry non-null arrays).
  */
case class BoundedWeightedCollect(
    child: Expression,
    maxWeight: Long,
    weightField: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[WeightedHeap] {

  require(maxWeight > 0, "maxWeight must be positive")

  @transient private lazy val structType: StructType = child.dataType match {
    case st: StructType => st
    case other => throw new IllegalArgumentException(
      s"graft_bounded_weighted_collect expects a struct child, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_bounded_weighted_collect"

  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]

  private def weightOf(row: InternalRow): Long =
    if (row.isNullAt(weightField)) 0L
    else row.getArray(weightField).numElements().toLong

  private def newBuffer(): WeightedHeap =
    new WeightedHeap(new java.util.PriorityQueue[InternalRow](16,
      (a: InternalRow, b: InternalRow) => ordering.compare(b, a)), 0L)

  override def createAggregationBuffer(): WeightedHeap = newBuffer()

  private def insert(buf: WeightedHeap, row: InternalRow, owned: Boolean): Unit = {
    val w = weightOf(row)
    if (w == 0) return // contributes nothing to flatten+slice; see class doc
    buf.heap.add(if (owned) row else row.copy())
    buf.totalWeight += w
    var headW = weightOf(buf.heap.peek())
    while (buf.heap.size > 1 && buf.totalWeight - headW >= maxWeight) {
      buf.heap.poll()
      buf.totalWeight -= headW
      headW = weightOf(buf.heap.peek())
    }
  }

  override def update(buf: WeightedHeap, input: InternalRow): WeightedHeap = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow], owned = false)
    buf
  }

  override def merge(a: WeightedHeap, b: WeightedHeap): WeightedHeap = {
    val it = b.heap.iterator()
    while (it.hasNext) insert(a, it.next(), owned = true)
    a
  }

  override def eval(buf: WeightedHeap): Any = {
    val arr = new Array[InternalRow](buf.heap.size)
    val it = buf.heap.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr,
      (x: InternalRow, y: InternalRow) => ordering.compare(x, y))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  @transient private lazy val proj = UnsafeProjection.create(structType)
  @transient private lazy val writeBuffer = new Array[Byte](4096)

  override def serialize(buf: WeightedHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val u = proj(it.next())
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, writeBuffer)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): WeightedHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = newBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf.heap.add(row)
      buf.totalWeight += weightOf(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedWeightedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedWeightedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedWeightedCollect =
    copy(child = newChildren.head)
}
