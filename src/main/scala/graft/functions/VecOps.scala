package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels over `array<float>` embedding columns.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * CodegenFallback — interpreted per row, and the ANN paths evaluate it
  * numQueries× or numCentroids× per vector (measured: k-means training
  * through the HOF more than doubled q_ann_ivf). This kernel is the same
  * computation — products and sums applied left-to-right in IEEE double,
  * bit-identical to the fold (VecOpsSpec pins it) — inside whole-stage
  * codegen via a static call.
  */
object DotImpl {
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Float-array × int-array dot — the SQ8 ADC kernel: the int side holds
    * quantization codes, the float side the query pre-scaled by the
    * per-dimension quantization step (so dot(q, dequant(x)) folds to
    * q·min + this kernel — see [[graft.operators.Pq.sq8TopK]]). Same
    * left-to-right double accumulation discipline as [[dotFloat]].
    */
  def dotFloatInt(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getInt(i).toDouble
      i += 1
    }
    acc
  }
}

case class DotFloatExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_float"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotImpl.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotImpl.dotFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFloatExpr =
    copy(left = l, right = r)
}

case class DotFloatIntExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_float_int"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotImpl.dotFloatInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotImpl.dotFloatInt($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFloatIntExpr =
    copy(left = l, right = r)
}

object VecOps {
  /** Codegen'd float-array dot product (double accumulation, left-to-right).
    * Both arrays are expected same-length (fixed embedding dim); extra
    * elements on the longer side are ignored.
    */
  def dotFloat(a: Column, b: Column): Column =
    GraftBridge.column(DotFloatExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd float-array × int-array dot (the SQ8 scoring kernel). */
  def dotFloatInt(a: Column, b: Column): Column =
    GraftBridge.column(DotFloatIntExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
