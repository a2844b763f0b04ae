package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-K aggregate: keeps the K smallest rows of `child` (a struct —
  * put the ordering columns first) under the struct's natural ordering,
  * returning them as a sorted array. `reverse = true` keeps the K LARGEST,
  * returned largest-first — the DESC ranking without negating columns
  * (negation flips null placement and can overflow under ANSI; reversing
  * the comparator does neither: nulls-smallest under the base order makes
  * reverse mode rank them last, exactly desc-nulls-last).
  *
  * Why this exists: `row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * cannot combine map-side — every row of every group crosses the shuffle,
  * then sorts. This aggregate holds a K-bounded heap per group in the
  * aggregation buffer, so (a) map-side partials cap the shuffle at
  * K·groups·partitions rows regardless of input size, and (b) no sort ever
  * materializes. At 100 TB this is the difference between shuffling the
  * table and shuffling the answer.
  *
  * Used via [[TopKAgg.topK]]; `operators.Analytics.topKPerGroup` shows the
  * explode-to-ranks pattern that reproduces window semantics exactly.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val baseOrdering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
  // "better" = smaller under this ordering; reverse mode flips it so the
  // aggregate keeps the k LARGEST and emits them largest-first
  private lazy val ordering: Ordering[InternalRow] =
    if (reverse) baseOrdering.reverse else baseOrdering
  // max-heap of the kept set: the head is the *worst* kept row, evicted when
  // a better (smaller) row arrives
  private lazy val reverseOrdering = ordering.reverse
  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.max(k, 1), reverseOrdering)

  override def update(
      buffer: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[InternalRow])
    buffer
  }

  override def merge(
      buffer: java.util.PriorityQueue[InternalRow],
      other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  private def insert(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (heap.size() < k) {
      heap.offer(toUnsafe(row).copy())
    } else if (ordering.lt(row, heap.peek())) {
      heap.poll()
      heap.offer(toUnsafe(row).copy())
    }
  }

  override def eval(buffer: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, ordering)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = new Array[UnsafeRow](buffer.size())
    var total = 4
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      rows(i) = it.next().asInstanceOf[UnsafeRow]
      total += 4 + rows(i).getSizeInBytes
      i += 1
    }
    val out = java.nio.ByteBuffer.allocate(total)
    out.putInt(rows.length)
    rows.foreach { r =>
      out.putInt(r.getSizeInBytes)
      r.writeTo(out)
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = in.getInt
      val rowBytes = new Array[Byte](size)
      in.get(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, size)
      heap.offer(row)
      i += 1
    }
    heap
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** topK(struct(ordCols..., payloadCols...), k) → sorted array<struct> of
    * the k smallest by the struct's lexicographic order.
    */
  def topK(c: Column, k: Int): Column =
    GraftBridge.column(TopKAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** The k LARGEST, largest-first (see the reverse note above). */
  def bottomK(c: Column, k: Int): Column =
    GraftBridge.column(TopKAgg(GraftBridge.expression(c), k, reverse = true)
      .toAggregateExpression())
}
