package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native random-hyperplane LSH keys (the sign-bit kernel behind
  * `operators.Ann.lshKey`).
  *
  * The Column formulation builds a numTables × bits × dim expression tree —
  * at 8×8×64 that is 4096 multiply nodes, past the point where whole-stage
  * codegen stays effective (measured: the multi-table near-dup scan went
  * from ~2.5s to 50s at sf0.1 when it grew from 1 to 8 tables). This
  * expression computes the same sign bits in one imperative loop per row
  * and stays inside codegen via a static call, the engine's standard
  * HOF→native hot-path move (see [[TextHashImpl]]).
  *
  * Key layout: one long per table, `(table << bits) | signBits`, sign bit i
  * of the string formulation at bit (bits−1−i). The table tag keeps
  * different tables' buckets disjoint under a single join key, replacing
  * the `concat_ws(":", table, bitstring)` string keys (longs shuffle and
  * compare cheaper than strings).
  */
object LshImpl {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** Plane component matrix, row (t·bits+i), column d — EXACTLY the Column
    * formulation's `xxhash64(lit("plane:t:i:d")).cast("double") /
    * Long.MaxValue / 2`, evaluated once per JVM so the native and HOF paths
    * bucket identically (LshKeysSpec pins this bit-for-bit).
    */
  def planes(dim: Int, bits: Int, numTables: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, bits, numTables), { _ =>
      Array.tabulate(numTables * bits) { row =>
        val t = row / bits
        val i = row % bits
        Array.tabulate(dim) { d =>
          val h = XxHash64Function.hash(
            UTF8String.fromString(s"plane:$t:$i:$d"), StringType, 42L)
          h.toDouble / Long.MaxValue.toDouble / 2.0d
        }
      }
    })

  def signKeys(e: ArrayData, dim: Int, bits: Int, numTables: Int): ArrayData = {
    val p = planes(dim, bits, numTables)
    val keys = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var key = 0L
      var i = 0
      while (i < bits) {
        val plane = p(t * bits + i)
        var dot = 0.0d
        var d = 0
        while (d < dim) {
          dot += e.getFloat(d).toDouble * plane(d)
          d += 1
        }
        key = (key << 1) | (if (dot >= 0.0d) 1L else 0L)
        i += 1
      }
      keys(t) = (t.toLong << bits) | key
      t += 1
    }
    new GenericArrayData(keys)
  }
}

case class LshSignKeysExpr(child: Expression, dim: Int, bits: Int, numTables: Int)
    extends UnaryExpression {
  require(bits < 56, "table tag must fit above the sign bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_sign_keys"
  override protected def nullSafeEval(input: Any): Any =
    LshImpl.signKeys(input.asInstanceOf[ArrayData], dim, bits, numTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshImpl.signKeys($c, $dim, $bits, $numTables)")
  override protected def withNewChildInternal(newChild: Expression): LshSignKeysExpr =
    copy(child = newChild)
}

object LshKeys {
  /** array<long> of table-tagged sign-bit bucket keys for an array<float>
    * embedding column.
    */
  def signKeys(e: Column, dim: Int, bits: Int, numTables: Int): Column =
    GraftBridge.column(LshSignKeysExpr(GraftBridge.expression(e), dim, bits, numTables))
}
