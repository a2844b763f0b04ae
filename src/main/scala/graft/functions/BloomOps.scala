package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Mergeable Bloom filter over 64-bit keys — the broadcastable membership
  * gate for cross-corpus checks: build one small binary artifact over the
  * eval/benchmark set's content hashes, then probe it MAP-ONLY at ingest
  * (`real decontamination stays a batch sweep` — the gate only routes
  * suspects, so false positives cost a recheck, never a wrong answer; no
  * false negatives by construction).
  *
  * Why not a broadcast join: a Bloom artifact is numBits/8 bytes regardless
  * of set size, serializes into the plan as ONE literal (or rides a scalar
  * subquery), and probing is k bit-reads per row inside whole-stage codegen
  * — the cheapest possible "might this row be in that other table" at
  * 100 TB. Double hashing (splitmix64 finalizers, odd step) gives the k
  * positions; the aggregate merges by OR, so partial aggregation works and
  * the build is one pass, any partitioning.
  */
object BloomImpl {
  /** splitmix64 finalizer — deterministic and dependency-free. */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Byte], value: Long, numHashes: Int): Unit = {
    val numBits = bits.length.toLong * 8
    val h1 = mix(value)
    val h2 = mix(value ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits).toInt
      bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  def mightContain(bloom: Array[Byte], value: Long, numHashes: Int): Boolean = {
    val numBits = bloom.length.toLong * 8
    val h1 = mix(value)
    val h2 = mix(value ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits).toInt
      if (((bloom(pos >>> 3) >> (pos & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** Aggregate building the filter: buffer IS the byte image, merge is OR —
  * map-side partials combine for free, and serialize/deserialize are
  * identity copies.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {
  require(numBits > 0 && numBits % 8 == 0, "numBits must be a positive multiple of 8")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomImpl.add(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bloom_agg"
  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c.head)
}

/** Membership probe — codegen'd static call, k bit-reads per row. The
  * filter size rides in the binary value, so the expression carries only
  * `numHashes` (must match the build).
  */
case class BloomMightContainExpr(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    BloomImpl.mightContain(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[Long], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BloomImpl.mightContain($a, $b, $numHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContainExpr =
    copy(left = l, right = r)
}

object BloomOps {
  /** ~1% FPR at one million keys: numBits ≈ 9.6 bits/key, k = 7. Size to
    * the EVAL set (small), never the corpus.
    */
  val DefaultNumBits: Int = 1 << 23
  val DefaultNumHashes: Int = 7

  def bloomAgg(c: Column, numBits: Int = DefaultNumBits,
               numHashes: Int = DefaultNumHashes): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(c), numBits, numHashes).toAggregateExpression())

  def mightContain(bloom: Column, v: Column,
                   numHashes: Int = DefaultNumHashes): Column =
    GraftBridge.column(BloomMightContainExpr(
      GraftBridge.expression(bloom), GraftBridge.expression(v), numHashes))
}
