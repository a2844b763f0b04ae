package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable Count-Min frequency sketch — the per-key-COUNT member of the
  * engine's sketch-table family (HLL = distinct counts, bottom-k = value
  * quantiles, Misra–Gries = exact heavy hitters; CMS = point-lookup
  * frequency estimates for ARBITRARY probe keys, including keys far below
  * any heavy-hitter threshold).
  *
  * Layout: depth d rows × width w long counters. An item's 64-bit hash
  * (xxhash64, applied in the [[CmsOps]] wrapper so the aggregate sees a
  * long) derives d row positions by double hashing; add increments one
  * counter per row, estimate takes the MIN across rows. Guarantees (the
  * classic Cormode–Muthukrishnan bounds): never an underestimate, and
  * overestimate ≤ εN with probability ≥ 1−δ where ε = e/w, δ = e^−d
  * (defaults d=4, w=1024 → ε ≈ 0.27%, δ ≈ 1.8%).
  *
  * Mergeability is EXACT: the sketch of a union is the element-wise SUM of
  * the sketches — a commutative monoid, so any partitioning, batch
  * slicing, or merge order yields a BYTE-IDENTICAL artifact (stronger than
  * HLL's approximate convergence; spec-proven). That makes it safe for
  * incremental maintenance through the manifest view store exactly like
  * the HLL and bottom-k tables.
  *
  * Scale: the buffer is a fixed 16 + 8·d·w bytes regardless of group size
  * (32 KiB at the defaults) — map-side partials combine, the shuffle
  * carries one sketch per (group, partition), and serving a rollup unions
  * stored sketches without rescanning the corpus.
  */
object CmsImpl {

  final class Buf(val depth: Int, val width: Int) {
    var n: Long = 0L
    val counters: Array[Long] = new Array[Long](depth * width)
  }

  def empty(depth: Int, width: Int): Buf = new Buf(depth, width)

  /** Double-hashed row positions: h_i = h1 + i·h2 (mod w). h2 rides a
    * splitmix64 remix so the d probes are pairwise independent-ish even
    * for adversarial input hashes.
    */
  def add(buf: Buf, hash: Long, count: Long): Unit = {
    val h2 = BloomImpl.mix(hash)
    var i = 0
    while (i < buf.depth) {
      val idx = i * buf.width + java.lang.Math.floorMod(hash + i.toLong * h2, buf.width.toLong).toInt
      buf.counters(idx) += count
      i += 1
    }
    buf.n += count
  }

  def mergeInto(buf: Buf, other: Buf): Unit = {
    require(buf.depth == other.depth && buf.width == other.width,
      s"CMS shape mismatch: ${buf.depth}x${buf.width} vs ${other.depth}x${other.width}")
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) += other.counters(i); i += 1 }
    buf.n += other.n
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 8 * buf.counters.length)
    bb.putInt(buf.depth); bb.putInt(buf.width); bb.putLong(buf.n)
    var i = 0
    while (i < buf.counters.length) { bb.putLong(buf.counters(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buf(bb.getInt, bb.getInt)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong; i += 1 }
    buf
  }

  /** Point frequency estimate: min across the d row counters. */
  def estimate(bytes: Array[Byte], hash: Long): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt; bb.getLong // skip n
    val base = 16
    val h2 = BloomImpl.mix(hash)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val idx = i * width + java.lang.Math.floorMod(hash + i.toLong * h2, width.toLong).toInt
      val c = bb.getLong(base + 8 * idx)
      if (c < best) best = c
      i += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  /** Total items folded into the sketch (the N of the εN bound). */
  def total(bytes: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(bytes).getLong(8)

  /** Static pairwise union for codegen ([[CmsUnion2Expr]]) and the view
    * store's full-outer merge path.
    */
  def union2(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val buf = deserialize(a)
    mergeInto(buf, deserialize(b))
    serialize(buf)
  }
}

/** Builds a CMS from pre-hashed (long) items. Null items are skipped. */
case class CmsAgg(
    item: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CmsImpl.Buf] {
  require(depth > 0 && width > 0, "CMS shape must be positive")

  override def createAggregationBuffer(): CmsImpl.Buf = CmsImpl.empty(depth, width)

  override def update(buf: CmsImpl.Buf, input: InternalRow): CmsImpl.Buf = {
    val v = item.eval(input)
    if (v != null) CmsImpl.add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: CmsImpl.Buf, other: CmsImpl.Buf): CmsImpl.Buf = {
    CmsImpl.mergeInto(buf, other); buf
  }

  override def eval(buf: CmsImpl.Buf): Any = CmsImpl.serialize(buf)
  override def serialize(buf: CmsImpl.Buf): Array[Byte] = CmsImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): CmsImpl.Buf = CmsImpl.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override def prettyName: String = "graft_cms_agg"
  override def withNewMutableAggBufferOffset(o: Int): CmsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsAgg =
    copy(item = c.head)
}

/** Unions stored CMS sketches (the rollup-from-sketch-table path). All
  * inputs must share one (depth, width) shape; element-wise sum makes the
  * result byte-identical to a one-pass build over the union.
  */
case class CmsMergeAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CmsImpl.Buf] {
  override def createAggregationBuffer(): CmsImpl.Buf = CmsImpl.empty(depth, width)

  override def update(buf: CmsImpl.Buf, input: InternalRow): CmsImpl.Buf = {
    val v = child.eval(input)
    if (v != null) CmsImpl.mergeInto(buf, CmsImpl.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: CmsImpl.Buf, other: CmsImpl.Buf): CmsImpl.Buf = {
    CmsImpl.mergeInto(buf, other); buf
  }

  override def eval(buf: CmsImpl.Buf): Any = CmsImpl.serialize(buf)
  override def serialize(buf: CmsImpl.Buf): Array[Byte] = CmsImpl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): CmsImpl.Buf = CmsImpl.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cms_union_agg"
  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
}

/** Scalar estimate: frequency of a pre-hashed item in a serialized sketch.
  * Codegen'd as a static call; probes run against small rollup frames
  * (groups × probe terms), never the corpus.
  */
case class CmsEstimateExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"
  override protected def nullSafeEval(sketch: Any, hash: Any): Any =
    CmsImpl.estimate(sketch.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CmsImpl.estimate($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimateExpr =
    copy(left = l, right = r)
}

/** Scalar total-count accessor: the N of the εN bound, read straight off
  * the serialized header (no deserialization).
  */
case class CmsTotalExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_total"
  override protected def nullSafeEval(sketch: Any): Any =
    CmsImpl.total(sketch.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CmsImpl.total($a)")
  override protected def withNewChildInternal(c: Expression): CmsTotalExpr = copy(child = c)
}

/** Scalar pairwise union of two serialized sketches — the view store's
  * full-outer merge path (column-vs-column, where the aggregate forms
  * don't fit).
  */
case class CmsUnion2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_union2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsImpl.union2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CmsImpl.union2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsUnion2Expr =
    copy(left = l, right = r)
}

object CmsOps {
  val DefaultDepth: Int = 4
  val DefaultWidth: Int = 1024

  /** Null-skipping item hash: xxhash64(NULL) hashes just the seed (a
    * NON-null result), so the null gate must ride outside the hash for
    * the aggregate's null-skip contract to hold.
    */
  private def itemHash(item: Column): Column = {
    import org.apache.spark.sql.functions.{when, xxhash64}
    when(item.isNotNull, xxhash64(item))
  }

  /** Build a CMS over `item` values (hashed internally via xxhash64 so any
    * input type works and DuckDB-side reproduction is out of scope by
    * design — estimates are engine-specific, like the HLL sketches).
    */
  def cmsAgg(item: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    GraftBridge.column(CmsAgg(
      GraftBridge.expression(itemHash(item)),
      depth, width).toAggregateExpression())

  /** Union stored sketches into a coarser rollup. */
  def cmsUnionAgg(sketch: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    GraftBridge.column(CmsMergeAgg(
      GraftBridge.expression(sketch), depth, width).toAggregateExpression())

  /** Estimated frequency of `item` in `sketch` (same xxhash64 convention
    * as the build).
    */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftBridge.column(CmsEstimateExpr(
      GraftBridge.expression(sketch),
      GraftBridge.expression(itemHash(item))))

  /** Total stream length folded into the sketch (the N of the εN bound). */
  def cmsTotal(sketch: Column): Column =
    GraftBridge.column(CmsTotalExpr(GraftBridge.expression(sketch)))

  /** Pairwise union of two sketch columns (view-store merge path). */
  def cmsUnion2(a: Column, b: Column): Column =
    GraftBridge.column(CmsUnion2Expr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
