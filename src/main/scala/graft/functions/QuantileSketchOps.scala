package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable bottom-k quantile sketch — the quantile twin of the HLL sketch
  * table (§2 row 37c): per-group value distributions pre-aggregated ONCE at
  * the finest grouping into fixed-size binary sketches, every coarser
  * rollup served by UNIONING sketches without rescanning the corpus.
  *
  * The sketch is a deterministic uniform value-sample: keep the k entries
  * whose key hash (splitmix64 over a caller-supplied UNIQUE key) is
  * smallest, each carrying its row's value. Bottom-k selection is an EXACT
  * semilattice — bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) — so
  * unlike HLL's approximate convergence, a rollup united from stored group
  * sketches is BYTE-IDENTICAL to the sketch built over the union in one
  * pass (spec-proven). That makes it safe for incremental maintenance
  * through the manifest view store: micro-batch slicing cannot change the
  * artifact. Quantile estimates interpolate the sorted sample; rank error
  * is the usual sampling bound O(1/√k) (k=512 → ~±4 centile points,
  * spec-measured tighter on testdata).
  *
  * Scale: the buffer is ≤ k (hash, value) pairs — map-side partials
  * combine, the shuffle carries ≤ 16k bytes per (group, partition), and
  * the artifact is 4+16k bytes regardless of group size.
  */
object QuantileSketchImpl {
  type Buf = mutable.PriorityQueue[(Long, Double)]
  // max-heap on (hash, value): the head is the entry bottom-k evicts first
  val ord: Ordering[(Long, Double)] = Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  def empty: Buf = mutable.PriorityQueue.empty[(Long, Double)](ord)

  def insert(buf: Buf, k: Int, h: Long, v: Double): Unit =
    if (buf.size < k) buf.enqueue((h, v))
    else if (ord.lt((h, v), buf.head)) { buf.dequeue(); buf.enqueue((h, v)) }

  def serialize(buf: Buf): Array[Byte] = {
    // sorted ascending → byte-deterministic regardless of heap layout
    val entries = buf.toArray.sorted(ord)
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  def deserializeInto(bytes: Array[Byte], buf: Buf, k: Int): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) { insert(buf, k, bb.getLong, bb.getDouble); i += 1 }
  }

  def values(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { bb.getLong; out(i) = bb.getDouble; i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Static pairwise union for codegen ([[SketchUnion2Expr]]). */
  def union2(a: Array[Byte], b: Array[Byte], k: Int): Array[Byte] = {
    val buf = empty
    deserializeInto(a, buf, k)
    deserializeInto(b, buf, k)
    serialize(buf)
  }

  /** quantile_cont-style linear interpolation over the sorted sample. */
  def quantile(bytes: Array[Byte], p: Double): Any = {
    val vs = values(bytes)
    if (vs.isEmpty) null
    else {
      val pos = p * (vs.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.min(lo + 1, vs.length - 1)
      val frac = pos - lo
      vs(lo) * (1.0 - frac) + vs(hi) * frac
    }
  }
}

/** Builds a sketch from (unique key, value) rows. The key is dispersed
  * through splitmix64 so sequential ids sample uniformly.
  */
case class BottomKSketchAgg(
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[QuantileSketchImpl.Buf] {
  require(k > 0, "sketch size must be positive")

  override def createAggregationBuffer(): QuantileSketchImpl.Buf = QuantileSketchImpl.empty

  override def update(buf: QuantileSketchImpl.Buf, input: InternalRow): QuantileSketchImpl.Buf = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null)
      QuantileSketchImpl.insert(buf, k,
        BloomImpl.mix(kv.asInstanceOf[Long]), vv.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QuantileSketchImpl.Buf, other: QuantileSketchImpl.Buf): QuantileSketchImpl.Buf = {
    other.foreach { case (h, v) => QuantileSketchImpl.insert(buf, k, h, v) }
    buf
  }

  override def eval(buf: QuantileSketchImpl.Buf): Any = QuantileSketchImpl.serialize(buf)
  override def serialize(buf: QuantileSketchImpl.Buf): Array[Byte] = QuantileSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSketchImpl.Buf = {
    val buf = QuantileSketchImpl.empty
    QuantileSketchImpl.deserializeInto(bytes, buf, k)
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, value)
  override def prettyName: String = "graft_bottomk_sketch_agg"
  override def withNewMutableAggBufferOffset(o: Int): BottomKSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKSketchAgg =
    copy(key = c(0), value = c(1))
}

/** Unions stored sketches (the rollup-from-sketch-table path). `k` must
  * match the build; the exact-semilattice property makes the union
  * byte-identical to a one-pass build over the union of the inputs.
  */
case class BottomKSketchMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[QuantileSketchImpl.Buf] {
  override def createAggregationBuffer(): QuantileSketchImpl.Buf = QuantileSketchImpl.empty

  override def update(buf: QuantileSketchImpl.Buf, input: InternalRow): QuantileSketchImpl.Buf = {
    val v = child.eval(input)
    if (v != null) QuantileSketchImpl.deserializeInto(v.asInstanceOf[Array[Byte]], buf, k)
    buf
  }

  override def merge(buf: QuantileSketchImpl.Buf, other: QuantileSketchImpl.Buf): QuantileSketchImpl.Buf = {
    other.foreach { case (h, v) => QuantileSketchImpl.insert(buf, k, h, v) }
    buf
  }

  override def eval(buf: QuantileSketchImpl.Buf): Any = QuantileSketchImpl.serialize(buf)
  override def serialize(buf: QuantileSketchImpl.Buf): Array[Byte] = QuantileSketchImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSketchImpl.Buf = {
    val buf = QuantileSketchImpl.empty
    QuantileSketchImpl.deserializeInto(bytes, buf, k)
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bottomk_sketch_union_agg"
  override def withNewMutableAggBufferOffset(o: Int): BottomKSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKSketchMergeAgg =
    copy(child = c.head)
}

/** Scalar estimate: p-quantile of the sketched distribution. Codegen'd as
  * a static call like BloomMightContainExpr; `quantile` may return null
  * (empty sketch) so nullable stays true even for non-null children.
  */
case class SketchQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sketch_quantile"
  override def nullable: Boolean = true
  override protected def nullSafeEval(sketch: Any, p: Any): Any =
    QuantileSketchImpl.quantile(sketch.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sketchQ")
      s"""
      Object $r = graft.functions.QuantileSketchImpl.quantile($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchQuantileExpr =
    copy(left = l, right = r)
}

/** Scalar union of two serialized sketches — the pairwise merge the view
  * store's full-outer merge path needs (the aggregate forms cover
  * group-bys; this covers column-vs-column). Exact-semilattice like the
  * aggregates: union-of-stored == one-pass build, byte-identical.
  */
case class SketchUnion2Expr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sketch_union2"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val buf = QuantileSketchImpl.empty
    QuantileSketchImpl.deserializeInto(a.asInstanceOf[Array[Byte]], buf, k)
    QuantileSketchImpl.deserializeInto(b.asInstanceOf[Array[Byte]], buf, k)
    QuantileSketchImpl.serialize(buf)
  }
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantileSketchImpl.union2($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchUnion2Expr =
    copy(left = l, right = r)
}

object QuantileSketchOps {
  val DefaultK: Int = 512

  /** Build a sketch of `value` keyed by unique `key` (pass the natural
    * unique id; it is hashed internally).
    */
  def sketchAgg(key: Column, value: Column, k: Int = DefaultK): Column =
    GraftBridge.column(BottomKSketchAgg(
      GraftBridge.expression(org.apache.spark.sql.functions.xxhash64(key)),
      GraftBridge.expression(value.cast("double")), k).toAggregateExpression())

  /** Union stored sketches into a coarser rollup. */
  def sketchUnionAgg(sketch: Column, k: Int = DefaultK): Column =
    GraftBridge.column(BottomKSketchMergeAgg(
      GraftBridge.expression(sketch), k).toAggregateExpression())

  def sketchQuantile(sketch: Column, p: Double): Column =
    GraftBridge.column(SketchQuantileExpr(
      GraftBridge.expression(sketch), GraftBridge.expression(org.apache.spark.sql.functions.lit(p))))

  /** Pairwise union of two sketch columns (view-store merge path). */
  def sketchUnion2(a: Column, b: Column, k: Int = DefaultK): Column =
    GraftBridge.column(SketchUnion2Expr(
      GraftBridge.expression(a), GraftBridge.expression(b), k))
}
