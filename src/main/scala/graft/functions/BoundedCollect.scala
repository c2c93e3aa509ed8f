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
