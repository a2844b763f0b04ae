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

  def jaccardSorted(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSortedExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
