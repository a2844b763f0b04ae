package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** The engine's cross-engine 56-bit hash convention — `md5(x)` hex, first
  * 14 hex digits parsed as a long — spelled in exactly ONE place. DuckDB
  * reproduces it as `('0x' || substring(md5(x), 1, 14))::BIGINT`, which
  * is what makes the shard writer, the group cap, and the dataset
  * checksum oracle-checkable. 56 bits keeps the value positive and
  * exactly representable everywhere; widening the convention means
  * changing THIS file and every stored artifact built on it.
  */
object HashConv {

  /** First 14 hex digits of an md5-hex column as a long. */
  def hexPrefixLong(hexCol: Column): Column =
    conv(substring(hexCol, 1, 14), 16, 10).cast("long")

  /** The full convention: md5 the (string) input, take the 56-bit prefix. */
  def md5Long56(c: Column): Column = hexPrefixLong(md5(c))

  /** `(g·a + b) mod (2⁶¹−1)` computed EXACTLY in long arithmetic — the
    * affine mix of the exact cross-engine minhash
    * ([[graft.operators.Dedup.minhashLshExact]]). The value is identical
    * to the decimal(38,0)/HUGEINT spelling both engines agree on (the
    * oracle keeps computing it that way); this is the Spark-side fast
    * path: one multiplyHigh + Mersenne folds per (gram, hash) instead of
    * a decimal multiply/mod chain. Requires 0 ≤ g < 2⁶¹ and
    * 0 ≤ a, b < 2³¹ (the [[graft.operators.Dedup.minhashExactCoeffs]]
    * bounds; md5Long56 keys are 56-bit). DedupSpec pins parity with the
    * decimal spelling on real gram keys and with BigInteger on the
    * operand envelope's edges.
    */
  def affineModP(g: Column, a: Long, b: Long): Column = {
    require(a >= 0 && a < (1L << 31) && b >= 0 && b < (1L << 31),
      s"coefficients out of the 31-bit envelope: a=$a b=$b")
    GraftBridge.column(AffineModPExpr(GraftBridge.expression(g), a, b))
  }
}

object AffineModPImpl {
  final val P: Long = (1L << 61) - 1

  /** Exact (g·a + b) mod P for 0 ≤ g < 2⁶¹, 0 ≤ a,b < 2³¹.
    * g·a < 2⁹² → 128-bit product (hi < 2²⁸); 2⁶⁴ ≡ 8 (mod P) folds the
    * high word, `lo` folds as unsigned (lo & P) + (lo >>> 61); the partial
    * sum stays < 2⁶¹ + 2³¹ + 8 ≪ 2⁶³, so one more fold + subtract
    * normalizes. Branch-light, no allocation.
    */
  def eval(g: Long, a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(g, a)
    val lo = g * a
    var r = (hi << 3) + (lo & P) + (lo >>> 61)
    r = (r & P) + (r >>> 61)
    if (r >= P) r -= P
    r += b
    if (r >= P) r -= P
    r
  }
}

/** Codegen'd scalar: see [[HashConv.affineModP]]. */
case class AffineModPExpr(child: Expression, a: Long, b: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_affine_mod_p"
  override protected def nullSafeEval(input: Any): Any =
    AffineModPImpl.eval(input.asInstanceOf[Long], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AffineModPImpl.eval($c, ${a}L, ${b}L);")
  override protected def withNewChildInternal(newChild: Expression): AffineModPExpr =
    copy(child = newChild)
}
