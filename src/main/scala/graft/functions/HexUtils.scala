package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hex/address decoding — the classifier's byte-level log parsing.
  *
  * The reference strips the 12 zero-bytes prefix from 32-byte log topics to
  * recover 20-byte addresses (`Settings.AddressEmptyBytesPrefix`,
  * `TransactionClassifier.cs` `.Replace(prefix, "0x")`) and parses hex
  * quantities into big integers (`HexBigInteger`). Pure codegen'd column
  * expressions — no UDFs.
  */
/** One-pass byte-level kernels behind the guarded hex decoders. The Column
  * formulation (`rlike` guard + `conv` + cast) is correct but pays several
  * regex executions per row — the classifier evaluates it on EVERY receipt
  * (isSafeEthTransfer + classifyThrows), so the regexes were the dominant
  * per-row cost of the safe-transfer path. Same semantics, null for the
  * same inputs (HexUtilsSpec pins parity against the Column forms).
  */
object HexWordImpl {

  private def hexVal(b: Byte): Int = b match {
    case c if c >= '0' && c <= '9' => c - '0'
    case c if c >= 'a' && c <= 'f' => c - 'a' + 10
    case c if c >= 'A' && c <= 'F' => c - 'A' + 10
    case _ => -1
  }

  /** Guarded hex→long: null unless `h` is 1..64 pure hex chars with ≤ 15
    * significant digits (< 2^60 — can never overflow a long, matching the
    * reference's BigInteger range-check-just-fails semantics).
    */
  def hexLong(h: UTF8String): java.lang.Long = {
    val bytes = h.getBytes
    val n = bytes.length
    if (n < 1 || n > 64) return null
    var i = 0
    while (i < n && bytes(i) == '0'.toByte) i += 1
    if (n - i > 15) return null
    var acc = 0L
    var j = 0
    while (j < n) {
      val v = hexVal(bytes(j))
      if (v < 0) return null
      if (j >= i) acc = (acc << 4) | v
      j += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Guarded 64-char uint word → decimal string: null unless the top 33
    * chars are zero (value < 16^31) and all 64 are hex — the documented
    * uint256 caveat of `ReceiptClassifier.hexDecimalString`.
    */
  def hexWordDecimal(w: UTF8String): UTF8String = {
    val bytes = w.getBytes
    if (bytes.length != 64) return null
    var i = 0
    while (i < 33) {
      if (bytes(i) != '0'.toByte) return null
      i += 1
    }
    while (i < 64) {
      if (hexVal(bytes(i)) < 0) return null
      i += 1
    }
    val big = new java.math.BigInteger(w.toString.substring(33), 16)
    UTF8String.fromString(big.toString)
  }
}

case class HexLongExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hex_long"
  override protected def nullSafeEval(input: Any): Any =
    HexWordImpl.hexLong(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_boxed = graft.functions.HexWordImpl.hexLong($c);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_boxed.longValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression): HexLongExpr =
    copy(child = newChild)
}

case class HexWordDecimalExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hex_word_decimal"
  override protected def nullSafeEval(input: Any): Any =
    HexWordImpl.hexWordDecimal(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HexWordImpl.hexWordDecimal($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): HexWordDecimalExpr =
    copy(child = newChild)
}

object HexUtils {

  /** Native guarded hex→long (see [[HexWordImpl.hexLong]]). */
  def hexLongGuarded(h: Column): Column =
    GraftBridge.column(HexLongExpr(GraftBridge.expression(h)))

  /** Native guarded 64-char word → decimal string
    * (see [[HexWordImpl.hexWordDecimal]]).
    */
  def hexWordDecimal(w: Column): Column =
    GraftBridge.column(HexWordDecimalExpr(GraftBridge.expression(w)))

  /** 0x-prefixed 64-hex-digit topic → 0x-prefixed 40-hex-digit address
    * (drop the 24 zero hex chars after "0x").
    */
  def topicToAddress(topic: Column): Column =
    concat(lit("0x"), substring(topic, 27, 40))

  /** 0x-prefixed hex quantity → bigint via conv (base 16 → base 10).
    * conv returns unsigned-64 semantics — fine for quantities < 2^63;
    * chain-scale uint256 amounts stay strings end-to-end in this engine
    * (same choice as the reference, which stores `value` as text).
    */
  def hexToLong(hexStr: Column): Column =
    conv(regexp_replace(hexStr, "^0x", ""), 16, 10).cast("long")

  /** Canonical lowercase 0x form (the reference lowercases all addresses). */
  def normalizeAddress(addr: Column): Column = lower(addr)

  /** Synthesize a 32-byte topic from a long id (test/demo helper — the
    * inverse of [[topicToAddress]]+[[hexToLong]]).
    */
  def longToTopic(id: Column): Column =
    concat(lit("0x"), lpad(lower(hex(id)), 64, "0"))
}
