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

/** One-pass ABI dynamic-array decode (r13): offset word at `headIdx` of
  * the words section (`prefix` = 2 when the payload is "0x"-prefixed),
  * length word + `len` element words at the offset, every element decoded
  * per `kind`. Bit-equal to the composable Column spelling
  * (`AbiDecode.dynWordArray`, kept as the parity reference and pinned by
  * AbiDecodeSpec) — same guards (strict 0x, off < 1e9, 32-aligned, past
  * the `nHeadWords` head, 0 ≤ len ≤ maxLen, tail fits), same per-element
  * arms (address/bytes32 lowercase pass-through, uint256 decimal via
  * [[HexWordImpl.hexWordDecimal]], small uint / bool via
  * [[HexWordImpl.hexLong]]). Why: the HOF spelling re-enters the
  * interpreter per element (~45µs/row measured on the sf0.1 demo); this
  * is one imperative pass inside whole-stage codegen. One DELIBERATE
  * divergence: a payload carrying non-ASCII bytes quarantines to null
  * (char-based substr and byte-based slicing disagree there; real ABI
  * payloads are pure-ASCII hex, so stricter is safer than junk-in-junk-out).
  */
object AbiWordArrayImpl {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  // kind codes (AbiDecode maps its AbiType arms onto these)
  final val KindAddress = 0
  final val KindUint256 = 1
  final val KindUintSmall = 2
  final val KindBool = 3
  final val KindBytes32 = 4
  /** r14: dynamic-ELEMENT arrays (`bytes[]`/`string[]`) — the tail is a
    * length word + per-element offset table + per-element bytes tails;
    * decodes to 0x-hex strings, whole-array null on any structural
    * violation (parity reference: `AbiDecode.dynBytesArrayRef`). */
  final val KindDynBytes = 5

  private def lowerHexWord(bytes: Array[Byte], from: Int, len: Int,
                           withPrefix: Boolean): UTF8String = {
    val head = if (withPrefix) 2 else 0
    val out = new Array[Byte](head + len)
    if (withPrefix) { out(0) = '0'; out(1) = 'x' }
    var i = 0
    while (i < len) {
      val b = bytes(from + i)
      out(head + i) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** `extraPrefixChars`: chars between the 0x and the words section — 0
    * for event data, 8 for a call input's selector. */
  def eval(data: UTF8String, extraPrefixChars: Int, headIdx: Int, nHeadWords: Int,
           kind: Int, maxLen: Long): ArrayData = {
    // ASCII gate: byte offsets == char offsets below
    if (data.numChars() != data.numBytes()) return null
    val bytes = data.getBytes
    val n = bytes.length
    val has0x = n >= 2 && bytes(0) == '0'.toByte && bytes(1) == 'x'.toByte
    // call payloads (extraPrefixChars > 0) address their words at FIXED
    // char positions after "0x" + selector in the Column parity reference;
    // a non-0x call payload would make kernel and reference disagree, so
    // quarantine it (r13 ADVICE — previously only the selector gate hid
    // the divergence)
    if (extraPrefixChars > 0 && !has0x) return null
    val prefix = (if (has0x) 2 else 0) + extraPrefixChars
    val headStart = prefix + headIdx * 64
    if (n < headStart + 64) return null
    val off = HexWordImpl.hexLong(UTF8String.fromBytes(bytes, headStart, 64))
    if (off == null) return null
    val offV = off.longValue()
    if (offV >= 1000000000L || offV % 32L != 0L || offV < 32L * nHeadWords) return null
    val start = prefix + offV.toInt * 2 // 0-based char of the length word
    if (start >= n) return null
    val lenWord = HexWordImpl.hexLong(
      UTF8String.fromBytes(bytes, start, math.min(64, n - start)))
    if (lenWord == null) return null
    val len = lenWord.longValue()
    if (len < 0L || len > maxLen) return null
    if (n.toLong < start.toLong + 64L + len * 64L) return null
    if (kind == KindDynBytes) {
      // dynamic elements: the len words after the length word are an
      // OFFSET TABLE (byte offsets relative to the area after the length
      // word); each element is a bytes tail (length word + padded data).
      // Whole-array null on any structural violation — never a wrong
      // partial array.
      val out = new Array[Any](len.toInt)
      var i = 0
      while (i < len) {
        val eoffWord = HexWordImpl.hexLong(
          UTF8String.fromBytes(bytes, start + 64 + i * 64, 64))
        if (eoffWord == null) return null
        val eoff = eoffWord.longValue()
        if (eoff >= 1000000000L || eoff % 32L != 0L || eoff < 32L * len) return null
        val estart = start + 64 + eoff.toInt * 2
        if (n < estart + 64) return null
        val elenWord = HexWordImpl.hexLong(UTF8String.fromBytes(bytes, estart, 64))
        if (elenWord == null) return null
        val elen = elenWord.longValue()
        if (elen < 0L || elen >= 500000000L) return null
        if (n.toLong < estart.toLong + 64L + elen * 2L) return null
        out(i) = lowerHexWord(bytes, estart + 64, (elen * 2L).toInt, withPrefix = true)
        i += 1
      }
      return new GenericArrayData(out)
    }
    val out = new Array[Any](len.toInt)
    var i = 0
    while (i < len) {
      out(i) = decodeKindAt(bytes, start + 64 + i * 64, kind)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One static word at char `ws` decoded per `kind` — shared by the
    * static-array loop and the tuple-array member loop. */
  private def decodeKindAt(bytes: Array[Byte], ws: Int, kind: Int): Any = kind match {
    case KindAddress => lowerHexWord(bytes, ws + 24, 40, withPrefix = true)
    case KindUint256 =>
      HexWordImpl.hexWordDecimal(UTF8String.fromBytes(bytes, ws, 64))
    case KindUintSmall =>
      HexWordImpl.hexLong(UTF8String.fromBytes(bytes, ws, 64))
    case KindBool =>
      val v = HexWordImpl.hexLong(UTF8String.fromBytes(bytes, ws, 64))
      if (v == null) null
      else if (v.longValue() == 0L) java.lang.Boolean.FALSE
      else if (v.longValue() == 1L) java.lang.Boolean.TRUE
      else null
    case _ => lowerHexWord(bytes, ws, 64, withPrefix = true) // bytes32
  }

  /** r14: dynamic array of DYNAMIC-member tuples — the Multicall3
    * `aggregate3((address,bool,bytes)[])` shape. A tuple carrying a
    * dynamic member is itself dynamic, so the array tail is a length
    * word + a per-element OFFSET TABLE (like `bytes[]`), and each
    * element is a tuple whose head holds static members inline and one
    * offset word per dynamic member (relative to the ELEMENT start),
    * each pointing at a `bytes` tail (length word + padded data).
    * Totality split: table/element-offset structure violations null the
    * WHOLE array (never a wrong partial array); a junk static member
    * word or a structurally-bad member tail nulls that MEMBER only (the
    * [[decodeKindAt]] / DynBytesT param conventions at member grain).
    * Parity reference: `AbiDecode.dynDynTupleArrayRef`.
    */
  def evalDynTuple(data: UTF8String, extraPrefixChars: Int, headIdx: Int,
                   nHeadWords: Int, kinds: Array[Int], maxLen: Long): ArrayData = {
    if (data.numChars() != data.numBytes()) return null
    val bytes = data.getBytes
    val n = bytes.length
    val has0x = n >= 2 && bytes(0) == '0'.toByte && bytes(1) == 'x'.toByte
    if (extraPrefixChars > 0 && !has0x) return null
    val prefix = (if (has0x) 2 else 0) + extraPrefixChars
    val headStart = prefix + headIdx * 64
    if (n < headStart + 64) return null
    val off = HexWordImpl.hexLong(UTF8String.fromBytes(bytes, headStart, 64))
    if (off == null) return null
    val offV = off.longValue()
    if (offV >= 1000000000L || offV % 32L != 0L || offV < 32L * nHeadWords) return null
    val start = prefix + offV.toInt * 2
    if (start >= n) return null
    val lenWord = HexWordImpl.hexLong(
      UTF8String.fromBytes(bytes, start, math.min(64, n - start)))
    if (lenWord == null) return null
    val len = lenWord.longValue()
    if (len < 0L || len > maxLen) return null
    if (n.toLong < start.toLong + 64L + len * 64L) return null // offset table fits
    val k = kinds.length
    val out = new Array[Any](len.toInt)
    var i = 0
    while (i < len) {
      val eoffWord = HexWordImpl.hexLong(
        UTF8String.fromBytes(bytes, start + 64 + i * 64, 64))
      if (eoffWord == null) return null
      val eoff = eoffWord.longValue()
      if (eoff >= 1000000000L || eoff % 32L != 0L || eoff < 32L * len) return null
      val estart = start + 64 + eoff.toInt * 2
      if (n < estart + 64 * k) return null // the tuple head must fit whole
      val row = new Array[Any](k)
      var m = 0
      while (m < k) {
        if (kinds(m) == KindDynBytes) {
          // member tail: offset word (relative to the ELEMENT start) →
          // length word → data; any guard failure nulls the MEMBER
          row(m) = {
            val moffWord = HexWordImpl.hexLong(
              UTF8String.fromBytes(bytes, estart + m * 64, 64))
            if (moffWord == null) null
            else {
              val moff = moffWord.longValue()
              if (moff >= 1000000000L || moff % 32L != 0L || moff < 32L * k) null
              else {
                val mstart = estart + moff.toInt * 2
                if (n < mstart + 64) null
                else {
                  val mlenWord = HexWordImpl.hexLong(
                    UTF8String.fromBytes(bytes, mstart, 64))
                  if (mlenWord == null) null
                  else {
                    val mlen = mlenWord.longValue()
                    if (mlen < 0L || mlen >= 500000000L ||
                        n.toLong < mstart.toLong + 64L + mlen * 2L) null
                    else lowerHexWord(bytes, mstart + 64, (mlen * 2L).toInt,
                      withPrefix = true)
                  }
                }
              }
            }
          }
        } else {
          row(m) = decodeKindAt(bytes, estart + m * 64, kinds(m))
        }
        m += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** r14: ONE-level nested arrays (`uint256[][]`-style — a dynamic array
    * of dynamic arrays of STATIC words). Outer tail = length word +
    * per-element offset table (a word-array is a dynamic type); element
    * j = inner length word + len_j static words. Structural violations
    * (table/element offsets, inner lengths, fits) null the WHOLE array;
    * junk inner words null the inner ELEMENT (the [[decodeKindAt]]
    * convention). Deeper nesting stays rejected at the registry. Parity
    * reference: `AbiDecode.dynNestedArrayRef`.
    */
  def evalNestedArray(data: UTF8String, extraPrefixChars: Int, headIdx: Int,
                      nHeadWords: Int, kind: Int, maxLen: Long): ArrayData = {
    if (data.numChars() != data.numBytes()) return null
    val bytes = data.getBytes
    val n = bytes.length
    val has0x = n >= 2 && bytes(0) == '0'.toByte && bytes(1) == 'x'.toByte
    if (extraPrefixChars > 0 && !has0x) return null
    val prefix = (if (has0x) 2 else 0) + extraPrefixChars
    val headStart = prefix + headIdx * 64
    if (n < headStart + 64) return null
    val off = HexWordImpl.hexLong(UTF8String.fromBytes(bytes, headStart, 64))
    if (off == null) return null
    val offV = off.longValue()
    if (offV >= 1000000000L || offV % 32L != 0L || offV < 32L * nHeadWords) return null
    val start = prefix + offV.toInt * 2
    if (start >= n) return null
    val lenWord = HexWordImpl.hexLong(
      UTF8String.fromBytes(bytes, start, math.min(64, n - start)))
    if (lenWord == null) return null
    val len = lenWord.longValue()
    if (len < 0L || len > maxLen) return null
    if (n.toLong < start.toLong + 64L + len * 64L) return null // offset table fits
    val out = new Array[Any](len.toInt)
    var i = 0
    while (i < len) {
      val eoffWord = HexWordImpl.hexLong(
        UTF8String.fromBytes(bytes, start + 64 + i * 64, 64))
      if (eoffWord == null) return null
      val eoff = eoffWord.longValue()
      if (eoff >= 1000000000L || eoff % 32L != 0L || eoff < 32L * len) return null
      val estart = start + 64 + eoff.toInt * 2
      if (n < estart + 64) return null
      val ilenWord = HexWordImpl.hexLong(UTF8String.fromBytes(bytes, estart, 64))
      if (ilenWord == null) return null
      val ilen = ilenWord.longValue()
      if (ilen < 0L || ilen > maxLen) return null
      if (n.toLong < estart.toLong + 64L + ilen * 64L) return null
      val inner = new Array[Any](ilen.toInt)
      var m = 0
      while (m < ilen) {
        inner(m) = decodeKindAt(bytes, estart + 64 + m * 64, kind)
        m += 1
      }
      out(i) = new GenericArrayData(inner)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** r14: dynamic array of STATIC TUPLES (`(address,uint256)[]`-style) —
    * a static tuple of k word-static members is itself a static type of
    * size k words, so the tail is a length word + len·k INLINE words (no
    * per-element offsets; the §"formal specification" static-type rule of
    * the public ABI spec). Same head-offset/length/fit guards as the
    * static-word arrays with the element width k; junk member words
    * decode to per-member nulls (the inline-tuple convention), structural
    * violations null the whole array. Parity reference:
    * `AbiDecode.dynTupleArrayRef`.
    */
  def evalTuple(data: UTF8String, extraPrefixChars: Int, headIdx: Int,
                nHeadWords: Int, kinds: Array[Int], maxLen: Long): ArrayData = {
    if (data.numChars() != data.numBytes()) return null
    val bytes = data.getBytes
    val n = bytes.length
    val has0x = n >= 2 && bytes(0) == '0'.toByte && bytes(1) == 'x'.toByte
    if (extraPrefixChars > 0 && !has0x) return null
    val prefix = (if (has0x) 2 else 0) + extraPrefixChars
    val headStart = prefix + headIdx * 64
    if (n < headStart + 64) return null
    val off = HexWordImpl.hexLong(UTF8String.fromBytes(bytes, headStart, 64))
    if (off == null) return null
    val offV = off.longValue()
    if (offV >= 1000000000L || offV % 32L != 0L || offV < 32L * nHeadWords) return null
    val start = prefix + offV.toInt * 2
    if (start >= n) return null
    val lenWord = HexWordImpl.hexLong(
      UTF8String.fromBytes(bytes, start, math.min(64, n - start)))
    if (lenWord == null) return null
    val len = lenWord.longValue()
    if (len < 0L || len > maxLen) return null
    val k = kinds.length
    if (n.toLong < start.toLong + 64L + len * 64L * k) return null
    val out = new Array[Any](len.toInt)
    var i = 0
    while (i < len) {
      val base = start + 64 + i * 64 * k
      val row = new Array[Any](k)
      var m = 0
      while (m < k) {
        row(m) = decodeKindAt(bytes, base + m * 64, kinds(m))
        m += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd ABI dynamic-array decode: see [[AbiWordArrayImpl]]. */
case class AbiWordArrayExpr(child: Expression, extraPrefixChars: Int, headIdx: Int,
                            nHeadWords: Int, kind: Int, maxLen: Long) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    kind match {
      case AbiWordArrayImpl.KindUintSmall => LongType
      case AbiWordArrayImpl.KindBool => org.apache.spark.sql.types.BooleanType
      case _ => StringType
    }, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_abi_word_array"
  override protected def nullSafeEval(input: Any): Any =
    AbiWordArrayImpl.eval(input.asInstanceOf[UTF8String], extraPrefixChars, headIdx,
      nHeadWords, kind, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AbiWordArrayImpl.eval($c, $extraPrefixChars, $headIdx, $nHeadWords, $kind, ${maxLen}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): AbiWordArrayExpr =
    copy(child = newChild)
}

/** Codegen'd TUPLE-array decode — `dynamicElems = false` runs the inline
  * static-tuple layout ([[AbiWordArrayImpl.evalTuple]]); `true` runs the
  * offset-table dynamic-member layout ([[AbiWordArrayImpl.evalDynTuple]],
  * the Multicall3 shape). */
case class AbiTupleArrayExpr(child: Expression, extraPrefixChars: Int, headIdx: Int,
                             nHeadWords: Int, kinds: Seq[Int], maxLen: Long,
                             dynamicElems: Boolean = false)
  extends UnaryExpression {
  private def memberType(kind: Int): DataType = kind match {
    case AbiWordArrayImpl.KindUintSmall => LongType
    case AbiWordArrayImpl.KindBool => org.apache.spark.sql.types.BooleanType
    case _ => StringType
  }
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(kinds.zipWithIndex.map { case (k, i) =>
      org.apache.spark.sql.types.StructField(s"_$i", memberType(k), nullable = true)
    }), containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_abi_tuple_array"
  override protected def nullSafeEval(input: Any): Any =
    if (dynamicElems)
      AbiWordArrayImpl.evalDynTuple(input.asInstanceOf[UTF8String], extraPrefixChars,
        headIdx, nHeadWords, kinds.toArray, maxLen)
    else
      AbiWordArrayImpl.evalTuple(input.asInstanceOf[UTF8String], extraPrefixChars,
        headIdx, nHeadWords, kinds.toArray, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kindsRef = ctx.addReferenceObj("kinds", kinds.toArray, "int[]")
    val method = if (dynamicElems) "evalDynTuple" else "evalTuple"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AbiWordArrayImpl.$method($c, $extraPrefixChars, $headIdx, $nHeadWords, $kindsRef, ${maxLen}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): AbiTupleArrayExpr =
    copy(child = newChild)
}

/** Codegen'd one-level NESTED-array decode: see
  * [[AbiWordArrayImpl.evalNestedArray]]. */
case class AbiNestedArrayExpr(child: Expression, extraPrefixChars: Int, headIdx: Int,
                              nHeadWords: Int, kind: Int, maxLen: Long)
  extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.ArrayType(kind match {
      case AbiWordArrayImpl.KindUintSmall => LongType
      case AbiWordArrayImpl.KindBool => org.apache.spark.sql.types.BooleanType
      case _ => StringType
    }, containsNull = true), containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_abi_nested_array"
  override protected def nullSafeEval(input: Any): Any =
    AbiWordArrayImpl.evalNestedArray(input.asInstanceOf[UTF8String], extraPrefixChars,
      headIdx, nHeadWords, kind, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AbiWordArrayImpl.evalNestedArray($c, $extraPrefixChars, $headIdx, $nHeadWords, $kind, ${maxLen}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): AbiNestedArrayExpr =
    copy(child = newChild)
}

/** One-pass synthesizer for the demo frames' hex spellings: the Column
  * chain `concat(lit("0x"), lpad(lower(hex(c)), width, "0"))` allocates
  * four intermediate strings per value, and demoReceipts evaluates ~8 of
  * those chains per row under dozens of benched keys. Same output byte
  * for byte (HexUtilsSpec pins parity, including lpad's keep-the-first-
  * `width`-chars truncation arm and hex()'s unsigned-64 rendering of
  * negative longs).
  */
object HexPadImpl {
  private val Digits = "0123456789abcdef".getBytes

  def eval(v: Long, width: Int, with0x: Boolean): UTF8String = {
    // lower(hex(v)): lowercase hex of the UNSIGNED 64-bit value, no
    // leading zeros ("0" for 0)
    var d = (67 - java.lang.Long.numberOfLeadingZeros(v)) >> 2
    if (d == 0) d = 1
    val head = if (with0x) 2 else 0
    val out = new Array[Byte](head + width)
    if (with0x) { out(0) = '0'; out(1) = 'x' }
    if (d >= width) {
      // lpad(s, width, "0") with len(s) ≥ width keeps the FIRST width
      // chars — unreachable for width ≥ 16 (a long is ≤ 16 hex digits)
      // but bit-parity includes the truncation arm
      var i = d - 1; var x = v
      val full = new Array[Byte](d)
      while (i >= 0) { full(i) = Digits((x & 0xfL).toInt); x = x >>> 4; i -= 1 }
      System.arraycopy(full, 0, out, head, width)
    } else {
      var i = head
      while (i < head + width - d) { out(i) = '0'; i += 1 }
      i = head + width - 1; var x = v
      while (i >= head + width - d) { out(i) = Digits((x & 0xfL).toInt); x = x >>> 4; i -= 1 }
    }
    UTF8String.fromBytes(out)
  }
}

case class HexPadExpr(child: Expression, width: Int, with0x: Boolean)
    extends UnaryExpression {
  require(width >= 1, s"width < 1: $width")
  // child must already be LongType — the Column helper casts
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hex_pad"
  override protected def nullSafeEval(input: Any): Any =
    HexPadImpl.eval(input.asInstanceOf[Long], width, with0x)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HexPadImpl.eval($c, $width, $with0x)")
  override protected def withNewChildInternal(newChild: Expression): HexPadExpr =
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

  /** Native ABI dynamic-array decode (see [[AbiWordArrayImpl]]). */
  def abiWordArray(data: Column, extraPrefixChars: Int, headIdx: Int,
                   nHeadWords: Int, kind: Int, maxLen: Long): Column =
    GraftBridge.column(AbiWordArrayExpr(
      GraftBridge.expression(data), extraPrefixChars, headIdx, nHeadWords, kind, maxLen))

  /** Native static-tuple-array decode (see [[AbiWordArrayImpl.evalTuple]]). */
  def abiTupleArray(data: Column, extraPrefixChars: Int, headIdx: Int,
                    nHeadWords: Int, kinds: Seq[Int], maxLen: Long): Column =
    GraftBridge.column(AbiTupleArrayExpr(
      GraftBridge.expression(data), extraPrefixChars, headIdx, nHeadWords, kinds, maxLen))

  /** Native one-level nested-array decode (see
    * [[AbiWordArrayImpl.evalNestedArray]]). */
  def abiNestedArray(data: Column, extraPrefixChars: Int, headIdx: Int,
                     nHeadWords: Int, kind: Int, maxLen: Long): Column =
    GraftBridge.column(AbiNestedArrayExpr(
      GraftBridge.expression(data), extraPrefixChars, headIdx, nHeadWords, kind, maxLen))

  /** Native dynamic-member-tuple-array decode (the Multicall3 shape; see
    * [[AbiWordArrayImpl.evalDynTuple]]). */
  def abiDynTupleArray(data: Column, extraPrefixChars: Int, headIdx: Int,
                       nHeadWords: Int, kinds: Seq[Int], maxLen: Long): Column =
    GraftBridge.column(AbiTupleArrayExpr(
      GraftBridge.expression(data), extraPrefixChars, headIdx, nHeadWords, kinds,
      maxLen, dynamicElems = true))

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
  def longToTopic(id: Column): Column = hexPadLower(id, 64)

  /** Fused `concat(lit("0x"), lpad(lower(hex(c)), width, "0"))` (or without
    * the 0x prefix) — see [[HexPadImpl]]. The demo-frame address/word
    * synthesizer shared by the circles and ABI families.
    */
  def hexPadLower(c: Column, width: Int, with0x: Boolean = true): Column =
    GraftBridge.column(HexPadExpr(GraftBridge.expression(c.cast("long")), width, with0x))
}
