package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Set-similarity kernels over pre-hashed, pre-sorted shingle arrays.
  *
  * The generic `array_intersect`/`array_union` path hashes *strings* into a
  * set per pair — the inner loop of every dedup verification stage. Hashing
  * each document's shingles ONCE into a sorted long array (see
  * [[SetOps.sortedShingleHashes]]) turns per-pair Jaccard into a primitive
  * merge-intersect: no allocation, no string compares, codegen'd. Hash
  * collisions (2^-64 per pair) are the standard MinHash-verification
  * trade-off.
  */
object JaccardImpl {
  /** |A∩B| / |A∪B| for two sorted long arrays (duplicates allowed but
    * counted once; the producer emits distinct hashes).
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }
}

case class JaccardSortedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardImpl.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
    copy(left = l, right = r)
}

object SetOps {
  /** Distinct word-k-shingles → sorted array of xxhash64 values. Computed
    * once per document; every pair comparison afterwards is primitive.
    */
  def sortedShingleHashes(sh: Column): Column =
    sort_array(transform(array_distinct(sh), s => xxhash64(s)))

  /** Codegen'd upper-triangle (a, b) pair array of a sorted long array
    * (bit-identical to the nested-transform HOF spelling — see
    * [[PairsImpl.sortedPairs]]).
    */
  def sortedPairs(items: Column): Column =
    GraftBridge.column(SortedPairsExpr(GraftBridge.expression(items)))

  def jaccardSorted(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSortedExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Upper-triangle pair enumeration of a sorted long array — the basket
  * pair explosion ([[graft.operators.Analytics.basketAffinity]]): for
  * i < j emit (items[i], items[j]) in the exact order of the composed HOF
  * spelling `flatten(transform(items, (x, i) => transform(slice(items,
  * i+2, size), y => struct(x as a, y as b))))`, which is CodegenFallback —
  * interpreted with one lambda re-entry per ELEMENT PAIR and a slice copy
  * per element (measured under q_basket_affinity). One imperative pass,
  * codegen'd; SetOpsSpec pins row-for-row parity against the HOF.
  */
object PairsImpl {
  def sortedPairs(items: ArrayData,
                  elemType: org.apache.spark.sql.types.DataType): ArrayData = {
    val n = items.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val xi: Any = if (items.isNullAt(i)) null else items.get(i, elemType)
      var j = i + 1
      while (j < n) {
        val yj: Any = if (items.isNullAt(j)) null else items.get(j, elemType)
        out(k) = org.apache.spark.sql.catalyst.InternalRow(xi, yj)
        k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class SortedPairsExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType), StructField("b", elemType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_pairs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _)
          if !et.isInstanceOf[ArrayType] && !et.isInstanceOf[StructType] &&
            !et.isInstanceOf[MapType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array of an atomic type, got ${other.simpleString}")
    }
  override protected def nullSafeEval(input: Any): Any =
    PairsImpl.sortedPairs(input.asInstanceOf[ArrayData], elemType)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PairsImpl.sortedPairs($c, $et);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): SortedPairsExpr =
    copy(child = newChild)
}
