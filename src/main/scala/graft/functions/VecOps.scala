package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType}

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

  /** EXACT-DECIMAL float-array dot — the oracle-checkable cosine kernel.
    * Bit-identical to the composed HOF spelling
    * `aggregate(zip_with(a, b, (x, y) => (x.double * y.double)
    * .cast(decimal(28,18))), 0.cast(decimal(28,18)),
    * (acc, x) => (acc + x).cast(decimal(28,18)))`
    * ([[graft.operators.Ann.dotDecimalHof]] — VecOpsSpec pins parity),
    * which is CodegenFallback: interpreted per evaluation, one lambda
    * re-entry + a scala BigDecimal allocation per ELEMENT, and the ANN
    * paths evaluate it numQueries×/numCandidates× per vector AND once
    * more per row for every norm() — the dominant per-task cost across
    * the similarity-search family. This kernel is the same computation —
    * IEEE double products (exact cross-engine), each rounded to
    * decimal(28,18) HALF_UP exactly as the non-ANSI double→decimal Cast
    * does, accumulated exactly with the HOF's per-step precision-28
    * re-check — inside whole-stage codegen.
    *
    * Totality mirrors the HOF under the engine's ambient ANSI mode
    * (Spark 4 default, no entry point overrides it): mismatched lengths
    * (zip_with pads the shorter side with null), a null element on either
    * side, and a NaN/Inf product (the cast's non-finite arm nulls in both
    * eval modes) yield whole-result NULL; a FINITE product / PREFIX SUM
    * overflowing precision 28 THROWS (the ANSI double→decimal Cast; the
    * HOF casts the accumulator back down every step, so a mid-sum
    * overflow fails even if later negative terms would return it to
    * range). Unreachable for real embedding columns (|x| < 10^5 keeps
    * every product inside decimal(28,18)); the loud arm exists so a
    * corrupt vector can never produce a silently different score than
    * the reference spelling.
    */
  def dotDecimalFloat(a: ArrayData, b: ArrayData): Decimal = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    var acc = java.math.BigDecimal.ZERO.setScale(18)
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      // NaN/Inf → null: Spark's double→decimal cast nulls non-finite
      // values in BOTH eval modes (the NumberFormatException arm), it
      // only throws on FINITE out-of-range values under ANSI —
      // VecOpsSpec's throw-shape test pins both arms against the HOF
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
      val pd = new java.math.BigDecimal(java.lang.Double.toString(p))
        .setScale(18, java.math.RoundingMode.HALF_UP)
      if (pd.precision > 28)
        throw new ArithmeticException(
          s"graft_dot_decimal_float: product $pd exceeds decimal(28,18) (ANSI)")
      acc = acc.add(pd)
      if (acc.precision > 28)
        throw new ArithmeticException(
          s"graft_dot_decimal_float: partial sum $acc exceeds decimal(28,18) (ANSI)")
      i += 1
    }
    Decimal(scala.math.BigDecimal(acc), 28, 18)
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

case class DotDecimalFloatExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DecimalType(28, 18)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_decimal_float"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotImpl.dotDecimalFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.DotImpl.dotDecimalFloat($a, $b);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotDecimalFloatExpr =
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

  /** Codegen'd EXACT-DECIMAL float-array dot (the oracle-parity cosine
    * kernel — bit-identical to [[graft.operators.Ann.dotDecimalHof]]'s
    * composed spelling, VecOpsSpec pins it).
    */
  def dotDecimalFloat(a: Column, b: Column): Column =
    GraftBridge.column(DotDecimalFloatExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
