package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable aggregate: at most
  * `m` (term, weight) counters survive in the buffer, and any term whose
  * true count exceeds N/(m+1) is GUARANTEED to be among them, with its
  * counter undercounting by at most N/(m+1) (N = stream length). Merge
  * follows Agarwal et al., "Mergeable Summaries" (PODS'12): sum counters
  * pairwise, then if more than m survive subtract the (m+1)-th largest
  * weight from all and drop the non-positive — the error bound is
  * preserved under ANY merge tree, which is exactly what map-side
  * partial aggregation needs: each partition sketches locally, partials
  * merge at the single reducer, and the shuffle carries ≤ m counters per
  * partition instead of the full term distribution.
  *
  * The surviving counter SET depends on merge order (ties break
  * differently), so this sketch is pass 1 of a two-pass exact protocol —
  * see [[graft.operators.HeavyHitters]]: candidates here, exact recount
  * there. Only the final recounted output is partition-invariant.
  *
  * Reference tie-in: the per-day stats views (DbMigrations/0.0.64.sql:
  * 1253) answer "what dominates" with full GROUP BYs; at 100 TB the
  * sketch answers the same question with a bounded shuffle.
  */
case class FreqSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]] {
  require(m > 0, "FreqSketch capacity must be positive")

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long](m * 2)

  override def update(
      buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String]
      // NOTE: buf.get on a java map with a scala.Long value type unboxes
      // null to 0L — presence must be containsKey, never a null compare
      if (buf.containsKey(term)) buf.put(term, buf.get(term) + 1L)
      else if (buf.size < m) buf.put(term.clone(), 1L)
      else decrementAll(buf) // the classic MG step: everyone pays 1
    }
    buf
  }

  // O(m), but amortized O(1) per input: each stored unit of weight is
  // removed at most once, and a decrement removes m+1 units (the m
  // counters plus the arriving term's implicit 1).
  private def decrementAll(buf: java.util.HashMap[UTF8String, Long]): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // the null-compare spelling silently skipped this clone branch (get
      // unboxes null to 0L), storing keys that alias the other buffer
      if (buf.containsKey(e.getKey)) buf.put(e.getKey, buf.get(e.getKey) + e.getValue)
      else buf.put(e.getKey.clone(), e.getValue)
    }
    if (buf.size > m) {
      // subtract the (m+1)-th largest weight, drop the non-positive:
      // exactly m or fewer survive, error stays ≤ N/(m+1) overall
      val weights = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { weights(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(weights)
      val cut = weights(weights.length - m - 1)
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  /** map<term, weight_lower_bound-ish>: weights are true count minus at
    * most N/(m+1); consumers treat them as candidate evidence only.
    */
  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    var total = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) { total += 4 + it0.next().getKey.numBytes() + 8 }
    val out = java.nio.ByteBuffer.allocate(total)
    out.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.putInt(bytes.length)
      out.put(bytes)
      out.putLong(e.getValue)
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      buf.put(UTF8String.fromBytes(b), in.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_freq_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** mgSketch(term, m) → map<term, weight> with ≤ m entries; any term
    * with true count > N/(m+1) is present.
    */
  def mgSketch(c: Column, m: Int): Column =
    GraftBridge.column(FreqSketch(GraftBridge.expression(c), m).toAggregateExpression())
}
