package graft

import graft.operators.AbiDecode
import graft.operators.AbiDecode._
import graft.operators.ReceiptClassifier._
import org.apache.spark.sql.functions._

/** The generic topic0-keyed ABI decoder: typed decode correctness against
  * hand-built receipts, and TOTALITY under hostile on-chain words — every
  * malformed shape must yield null (or drop), never a wrong value and
  * never an ANSI raise.
  */
class AbiDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val hub = DefaultHubAddress
  private val user = "0xde374ece6fa50e781e81aac78e811b33d16912c4"
  private val other = "0xaaaa74ece6fa50e781e81aac78e811b33d1691aa"
  private val token = "0x1111111111111111111111111111111111111111"
  private def word(addr: String) = "0x" + "0" * 24 + addr.drop(2)
  private def uintHex(v: Long) = "0x" + f"$v%064x"

  private def txOf(logs: Log*) =
    Seq(Tx("0xabc", user, other, "0", "0x", logs)).toDS.toDF

  test("decodeEvent: typed wide decode of a Transfer log") {
    val t = txOf(
      Log(token, Seq(TransferTopic, word(user), word(other)), uintHex(1234)),
      // unregistered-shape log rides along and is ignored
      Log(hub, Seq(ExecutionSuccessTopic), "0x"))
    val r = AbiDecode.decodeEvent(t, Erc20Transfer).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("log_index") == 0L)
    assert(row.getAs[String]("emitter") == token)
    assert(row.getAs[String]("from") == user)
    assert(row.getAs[String]("to") == other)
    assert(row.getAs[String]("value") == "1234")
  }

  test("decodeEvent: small-uint, bool, bytes32 arms decode typed") {
    val ev = AbiEvent("Custom", "0x" + "ab" * 32, Seq(
      AbiParam("id", Bytes32T, indexed = true),
      AbiParam("n", UintSmallT, indexed = false),
      AbiParam("flag", BoolT, indexed = false)))
    val idWord = "11" * 32
    val t = txOf(Log(token, Seq("0x" + "ab" * 32, "0x" + idWord),
      uintHex(42) + f"${1L}%064x"))
    val row = AbiDecode.decodeEvent(t, ev).collect().head
    assert(row.getAs[String]("id") == "0x" + idWord)
    assert(row.getAs[Long]("n") == 42L)
    assert(row.getAs[Boolean]("flag"))
    // bool word 2 is NOT a bool (strict ABI): null, not true
    val t2 = txOf(Log(token, Seq("0x" + "ab" * 32, "0x" + idWord),
      uintHex(42) + f"${2L}%064x"))
    assert(AbiDecode.decodeEvent(t2, ev).select("flag").collect().head.isNullAt(0))
  }

  test("hostile words: every malformed shape nulls (or drops), never raises") {
    val hostile = Seq(
      // short data: value word truncated → value null
      Tx("0x1", user, other, "0", "0x",
        Seq(Log(token, Seq(TransferTopic, word(user), word(other)), "0xdeadbeef"))),
      // non-hex garbage in the data word → null (guarded kernels)
      Tx("0x2", user, other, "0", "0x",
        Seq(Log(token, Seq(TransferTopic, word(user), word(other)), "0x" + "zz" * 32))),
      // uint256 above the 16^31 decode guard → null, not a wrong number
      Tx("0x3", user, other, "0", "0x",
        Seq(Log(token, Seq(TransferTopic, word(user), word(other)), "0x" + "f" * 64))),
      // malformed topic word (wrong length) → that param null
      Tx("0x4", user, other, "0", "0x",
        Seq(Log(token, Seq(TransferTopic, "0x1234", word(other)), uintHex(5)))),
      // arity mismatch on a registered topic0 → the row DROPS
      Tx("0x5", user, other, "0", "0x",
        Seq(Log(token, Seq(TransferTopic, word(user)), uintHex(5)))),
      // empty logs array → nothing
      Tx("0x6", user, other, "0", "0x", Seq.empty),
      // EMPTY TOPICS (anonymous event) rides next to a decodable log: the
      // anonymous log drops silently, the good log still decodes — the
      // unconditional split-projection decode must not element_at-raise
      Tx("0x7", user, other, "0", "0x",
        Seq(Log(token, Seq.empty, uintHex(1)),
          Log(token, Seq(TransferTopic, word(user), word(other)), uintHex(8)))))
    val out = AbiDecode.decodeEvents(hostile.toDS.toDF, CirclesRegistry)
      .collect().map(r => (r.getAs[String]("hash"), r.getAs[String]("param"),
        Option(r.getAs[String]("value"))))
    val byHash = out.groupBy(_._1).view.mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    assert(byHash("0x1")("value").isEmpty, "short data → null value")
    assert(byHash("0x1")("from").contains(user), "good topics still decode")
    assert(byHash("0x2")("value").isEmpty, "non-hex data → null")
    assert(byHash("0x3")("value").isEmpty, "over-guard uint256 → null")
    assert(byHash("0x4")("from").isEmpty, "malformed topic → null param")
    assert(byHash("0x4")("to").contains(other))
    assert(!byHash.contains("0x5"), "arity-hostile log drops")
    assert(!byHash.contains("0x6"))
    assert(byHash("0x7")("value").contains("8"), "good log beside an anonymous one decodes")
  }

  test("decodeEvents long format agrees with the wide per-event decode") {
    val t = txOf(
      Log(hub, Seq(CrcTrustTopic, word(other), word(user)), uintHex(55)),
      Log(token, Seq(TransferTopic, word(user), word(other)), uintHex(9)))
    val long = AbiDecode.decodeEvents(t)
      .select("event", "param", "value").as[(String, String, String)].collect().toSet
    assert(long == Set(
      ("Trust", "can_send_to", other), ("Trust", "user", user),
      ("Trust", "limit", "55"),
      ("Transfer", "from", user), ("Transfer", "to", other),
      ("Transfer", "value", "9")))
    // log_index is the position in the receipt's array
    val idx = AbiDecode.decodeEvents(t).select("event", "log_index")
      .distinct().as[(String, Long)].collect().toMap
    assert(idx == Map("Trust" -> 0L, "Transfer" -> 1L))
  }

  test("decodeCoverage: decoded / arity-mismatch / unregistered accounting") {
    val t = Seq(
      Tx("0x1", user, other, "0", "0x", Seq(
        Log(token, Seq(TransferTopic, word(user), word(other)), uintHex(1)),
        Log(token, Seq(TransferTopic, word(user)), uintHex(2)), // arity-hostile
        Log(hub, Seq(ExecutionSuccessTopic), "0x")))            // unregistered
    ).toDS.toDF
    val r = AbiDecode.decodeCoverage(t, CirclesRegistry)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(TransferTopic) == ((2L, 1L, 1L)))
    assert(r(ExecutionSuccessTopic) == ((1L, 0L, 0L)))
  }

  test("registry validation: duplicate names and >3 indexed params reject") {
    intercept[IllegalArgumentException] {
      AbiEvent("Bad", "0x00", Seq(
        AbiParam("a", AddressT, indexed = true), AbiParam("a", AddressT, indexed = false)))
    }
    intercept[IllegalArgumentException] {
      AbiEvent("Bad", "0x00", (1 to 4).map(i => AbiParam(s"p$i", AddressT, indexed = true)))
    }
    intercept[IllegalArgumentException] {
      AbiDecode.decodeEvents(txOf(), Seq.empty)
    }
  }

  // --- function-CALL decoding ----------------------------------------------

  private def w64(v: Long) = f"$v%064x"
  private def wAddr(addr: String) = "0" * 24 + addr.drop(2)

  /** Well-formed execTransaction input: 10 head words + two tails. */
  private def execInput(to: String, value: Long, data: String = "",
                        operation: Long = 0L): String = {
    val dataLenWords = (data.length / 2 + 31) / 32
    "0x6a761202" + wAddr(to) + w64(value) +
      w64(320L) +            // data offset: past the 10 head words
      w64(operation) + w64(0L) * 3 + wAddr("0x" + "0" * 40) * 2 +
      w64(352L + dataLenWords * 32L) + // signatures offset: past data tail
      w64(data.length / 2L) + data.padTo(dataLenWords * 64, '0') +
      w64(0L)                // signatures: empty
  }

  private def callTx(hash: String, input: String) =
    Seq(Tx(hash, user, other, "0", input, Seq.empty)).toDS.toDF

  test("decodeCall: typed wide decode of execTransaction, empty tails") {
    val row = AbiDecode.decodeCall(callTx("0xc1", execInput(other, 777L)),
      ExecTransaction).collect().head
    assert(row.getAs[String]("caller") == user)
    assert(row.getAs[String]("callee") == other)
    assert(row.getAs[String]("to") == other)
    assert(row.getAs[String]("value") == "777")
    assert(row.getAs[String]("data") == "0x")
    assert(row.getAs[Long]("operation") == 0L)
    assert(row.getAs[String]("safe_tx_gas") == "0")
    assert(row.getAs[String]("gas_token") == "0x" + "0" * 40)
    assert(row.getAs[String]("signatures") == "0x")
  }

  test("decodeCall: non-empty dynamic tail decodes to its exact bytes") {
    val payload = "a9059cbb" + wAddr(user) + w64(5L) // 68-byte inner call
    val row = AbiDecode.decodeCall(
      callTx("0xc2", execInput(other, 1L, data = payload, operation = 1L)),
      ExecTransaction).collect().head
    assert(row.getAs[String]("data") == "0x" + payload)
    assert(row.getAs[Long]("operation") == 1L)
    assert(row.getAs[String]("signatures") == "0x")
  }

  test("hostile calls: truncation drops, garbage offsets/words null, never raise") {
    val good = execInput(other, 9L)
    val hostile = Seq(
      // truncated head: selector-prefixed but short → DROPS (quarantine)
      Tx("0xh1", user, other, "0", good.take(100), Seq.empty),
      // garbage data-offset word → data null, static params still decode
      Tx("0xh2", user, other, "0",
        "0x6a761202" + wAddr(other) + w64(3L) + "zz" * 32 +
          w64(0L) * 4 + wAddr("0x" + "0" * 40) * 2 + w64(352L) + w64(0L) * 2,
        Seq.empty),
      // tail length word runs past the input end → data null
      Tx("0xh3", user, other, "0",
        "0x6a761202" + wAddr(other) + w64(3L) + w64(320L) +
          w64(0L) * 4 + wAddr("0x" + "0" * 40) * 2 + w64(352L) +
          w64(999999L) + w64(0L),
        Seq.empty),
      // non-hex value word → that param null
      Tx("0xh4", user, other, "0",
        "0x6a761202" + wAddr(other) + "gg" * 32 + w64(320L) +
          w64(0L) * 4 + wAddr("0x" + "0" * 40) * 2 + w64(352L) + w64(0L) * 2,
        Seq.empty),
      // unregistered selector → drops
      Tx("0xh5", user, other, "0", "0xdeadbeef" + w64(1L) * 12, Seq.empty),
      // bare transfer input → drops
      Tx("0xh6", user, other, "0", "0x", Seq.empty))
    val out = AbiDecode.decodeCalls(hostile.toDS.toDF, Seq(ExecTransaction))
      .collect().map(r => (r.getAs[String]("hash"), r.getAs[String]("param"),
        Option(r.getAs[String]("value"))))
    val byHash = out.groupBy(_._1).view.mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    assert(!byHash.contains("0xh1"), "truncated head drops")
    assert(byHash("0xh2")("data").isEmpty, "garbage offset → null tail")
    assert(byHash("0xh2")("to").contains(other), "static params still decode")
    assert(byHash("0xh3")("data").isEmpty, "overrun tail length → null")
    assert(byHash("0xh3")("signatures").contains("0x"), "other tail unaffected")
    assert(byHash("0xh4")("value").isEmpty, "non-hex word → null")
    assert(!byHash.contains("0xh5"))
    assert(!byHash.contains("0xh6"))
  }

  test("strict tails: unaligned / head-overlapping offsets null (ADVICE r11)") {
    // strict ABI decoding rejects a tail offset that is not 32-byte aligned
    // or that points back into the head words — the reference's typed
    // decoder throws on both; the old lenient spelling decoded a
    // plausible-looking value (e.g. offset 128 lands on the zero safeTxGas
    // head word → len 0 → "0x") where null is required
    def withDataOff(off: String) =
      "0x6a761202" + wAddr(other) + w64(3L) + off +
        w64(0L) * 4 + wAddr("0x" + "0" * 40) * 2 + w64(352L) + w64(0L) * 2
    val txs = Seq(
      Tx("0xs1", user, other, "0", withDataOff(w64(321L)), Seq.empty),
      Tx("0xs2", user, other, "0", withDataOff(w64(128L)), Seq.empty)).toDS.toDF
    val rows = AbiDecode.decodeCall(txs, ExecTransaction).collect()
      .map(r => r.getAs[String]("hash") -> Option(r.getAs[String]("data"))).toMap
    assert(rows("0xs1").isEmpty, "unaligned tail offset → null (strict ABI)")
    assert(rows("0xs2").isEmpty, "offset into the head words → null (strict ABI)")
  }

  test("decodeCalls long format agrees with the wide decode; registry routes") {
    val txs = Seq(
      Tx("0xm1", user, other, "0", execInput(other, 42L), Seq.empty),
      Tx("0xm2", user, token, "0",
        "0xa9059cbb" + wAddr(user) + w64(5L), Seq.empty)).toDS.toDF
    val long = AbiDecode.decodeCalls(txs, CallRegistry)
      .select("fn", "param", "value").as[(String, String, String)].collect().toSet
    assert(long.contains(("execTransaction", "value", "42")))
    assert(long.contains(("transfer", "to", user)))
    assert(long.contains(("transfer", "value", "5")))
    val wide = AbiDecode.decodeCall(txs, Erc20TransferCall).collect()
    assert(wide.length == 1 && wide.head.getAs[String]("callee") == token)
  }

  test("callCoverage: decoded / truncated / unregistered accounting") {
    val txs = Seq(
      Tx("0xv1", user, other, "0", execInput(other, 1L), Seq.empty),
      Tx("0xv2", user, other, "0", execInput(other, 2L).take(80), Seq.empty),
      Tx("0xv3", user, other, "0", "0xdeadbeef", Seq.empty),
      Tx("0xv4", user, other, "0", "0x", Seq.empty)).toDS.toDF
    val r = AbiDecode.callCoverage(txs, Seq(ExecTransaction))
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r("0x6a761202") == ((2L, 1L, 1L)), "one decoded, one truncated")
    assert(r("0xdeadbeef") == ((1L, 0L, 0L)), "unregistered selector counted")
    assert(!r.contains("0x"), "bare transfers excluded")
  }

  test("call-registry validation: dup selectors, indexed params, event tails reject") {
    intercept[IllegalArgumentException] {
      AbiFunction("bad", "0x6a761202", Seq(AbiParam("a", AddressT, indexed = true)))
    }
    intercept[IllegalArgumentException] {
      AbiDecode.decodeCalls(txOf(), Seq(ExecTransaction,
        AbiFunction("twin", "0x6a761202", Seq(AbiParam("a", AddressT, indexed = false)))))
    }
    intercept[IllegalArgumentException] { // dynamic tails are call-only
      AbiEvent("Bad", "0x" + "ab" * 32, Seq(AbiParam("blob", DynBytesT, indexed = false)))
    }
  }

  // ---- r13 dynamic-array / static-tuple arms ------------------------------

  /** BatchTransfer data: pair (addr, amt) inline + uint256[] tail. */
  private def batchData(pairAddr: String, amt: Long, ids: Seq[Long],
                        offsetOverride: Option[String] = None,
                        lenOverride: Option[String] = None,
                        dropTailChars: Int = 0): String = {
    val tail = lenOverride.getOrElse(f"${ids.size}%064x") + ids.map(v => f"$v%064x").mkString
    val s = "0x" + wAddr(pairAddr) + f"$amt%064x" +
      offsetOverride.getOrElse(f"${96L}%064x") + tail
    s.dropRight(dropTailChars)
  }

  private def batchTx(data: String) = txOf(
    Log(token, Seq(BatchTransferTopic, word(user)), data))

  test("ArrayT/TupleT: typed wide decode, empty arrays, long-format rendering") {
    val t = batchTx(batchData(other, 77L, Seq(5L, 6L)))
    val row = AbiDecode.decodeEvent(t, DemoBatchTransfer).collect().head
    assert(row.getAs[String]("operator") == user)
    val pair = row.getAs[org.apache.spark.sql.Row]("pair")
    assert(pair.getAs[String]("_0") == other && pair.getAs[String]("_1") == "77")
    assert(row.getAs[scala.collection.Seq[String]]("ids") == Seq("5", "6"))
    // length 0: the EMPTY array, not null
    val t0 = batchTx(batchData(other, 1L, Seq.empty))
    assert(AbiDecode.decodeEvent(t0, DemoBatchTransfer)
      .collect().head.getAs[scala.collection.Seq[String]]("ids") == Seq.empty)
    // long format renders the explicit spellings
    val long = AbiDecode.decodeEvents(t, Seq(DemoBatchTransfer))
      .select("param", "value").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(long("pair") == s"($other,77)")
    assert(long("ids") == "[5,6]")
    assert(long("operator") == user)
  }

  test("hostile arrays/tuples: every malformed shape nulls, never raises") {
    def idsOf(data: String): Option[scala.collection.Seq[String]] = {
      val r = AbiDecode.decodeEvent(batchTx(data), DemoBatchTransfer).collect().head
      Option(r.getAs[scala.collection.Seq[String]]("ids"))
    }
    // unaligned offset
    assert(idsOf(batchData(other, 1L, Seq(5L), offsetOverride = Some(f"${97L}%064x"))).isEmpty)
    // offset back into the head section (strict: tails live past 3 words)
    assert(idsOf(batchData(other, 1L, Seq(5L), offsetOverride = Some(f"${32L}%064x"))).isEmpty)
    // junk offset word
    assert(idsOf(batchData(other, 1L, Seq(5L), offsetOverride = Some("zz" * 32))).isEmpty)
    // length word past MaxArrayLen (bounded allocation)
    assert(idsOf(batchData(other, 1L, Seq(5L),
      lenOverride = Some(f"${AbiDecode.MaxArrayLen + 1}%064x"))).isEmpty)
    // declared 2 elements, tail truncated mid-element
    assert(idsOf(batchData(other, 1L, Seq(5L, 6L), dropTailChars = 10)).isEmpty)
    // junk element word: per-element null, array survives, renders "null"
    val junkElem = batchData(other, 1L, Seq(5L)).dropRight(64) + "zz" * 32
    assert(idsOf(junkElem) == Some(Seq(null)))
    val rendered = AbiDecode.decodeEvents(batchTx(junkElem), Seq(DemoBatchTransfer))
      .where(col("param") === "ids").select("value").collect().head.getString(0)
    assert(rendered == "[null]")
    // data too short for the tuple's last word: the whole tuple nulls
    val shortTuple = "0x" + wAddr(other) + f"${7L}%064x".take(32)
    val r2 = AbiDecode.decodeEvent(batchTx(shortTuple), DemoBatchTransfer).collect().head
    assert(r2.isNullAt(r2.fieldIndex("pair")))
    assert(r2.isNullAt(r2.fieldIndex("ids")))
  }

  test("call-side ArrayT/TupleT: multi-word heads, cumulative indices, minLen") {
    // transferBatch((address,uint256) pair, uint256[] ids, address last):
    // the tuple inlines 2 words, so ids heads at word 2 and last at word 3
    val fn = AbiFunction("transferBatch", "0x11223344", Seq(
      AbiParam("pair", TupleT(Seq(AddressT, Uint256T)), indexed = false),
      AbiParam("ids", ArrayT(Uint256T), indexed = false),
      AbiParam("last", AddressT, indexed = false)))
    assert(fn.nHeadWords == 4 && fn.minLen == 10 + 64 * 4)
    val input = "0x11223344" + wAddr(other) + f"${9L}%064x" +
      f"${128L}%064x" + wAddr(user) + // ids offset = 4 words; last addr
      f"${2L}%064x" + f"${10L}%064x" + f"${11L}%064x"
    val row = AbiDecode.decodeCall(Seq(Tx("0xc1", user, other, "0", input, Seq.empty)).toDS().toDF(), fn)
      .collect().head
    val pair = row.getAs[org.apache.spark.sql.Row]("pair")
    assert(pair.getAs[String]("_0") == other && pair.getAs[String]("_1") == "9")
    assert(row.getAs[scala.collection.Seq[String]]("ids") == Seq("10", "11"))
    assert(row.getAs[String]("last") == user)
    // long format routes + renders through the same arms
    val long = AbiDecode.decodeCalls(
      Seq(Tx("0xc1", user, other, "0", input, Seq.empty)).toDS().toDF(), Seq(fn))
      .select("param", "value").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(long("pair") == s"($other,9)" && long("ids") == "[10,11]" && long("last") == user)
    // an input short of the 4 head words is quarantined (minLen gate)
    val short = "0x11223344" + wAddr(other) + f"${9L}%064x" + f"${128L}%064x"
    assert(AbiDecode.decodeCall(
      Seq(Tx("0xc2", user, other, "0", short, Seq.empty)).toDS.toDF, fn).isEmpty)
  }

  test("native word-array kernel is bit-equal to the Column parity reference") {
    // the hot path decodes arrays through AbiWordArrayExpr (one imperative
    // pass, codegen'd); dynWordArrayRef keeps the composable Column
    // spelling as the parity reference (the minhashExactAffineRef
    // precedent). Every envelope arm, every element kind.
    import org.apache.spark.sql.functions.{col, lit, when => cwhen}
    def payload(headWords: Seq[String], tail: String): String =
      "0x" + headWords.mkString + tail
    val goodTail2 = f"${2L}%064x" + f"${10L}%064x" + f"${11L}%064x"
    val boolTail = f"${3L}%064x" + f"${0L}%064x" + f"${1L}%064x" + f"${2L}%064x"
    val upperWord = "00000000000000000000000000000000000000000000000000000000000000AB"
    val payloads = Seq(
      payload(Seq(f"${32L}%064x"), goodTail2),                         // 1 head word, 2 elems
      payload(Seq(f"${32L}%064x"), f"${0L}%064x"),                     // empty array
      payload(Seq(f"${32L}%064x"), boolTail),                          // bool triple (0,1,2)
      payload(Seq(f"${32L}%064x"), f"${1L}%064x" + upperWord),         // UPPERCASE hex elem
      payload(Seq(f"${33L}%064x"), goodTail2),                         // unaligned offset
      payload(Seq(f"${0L}%064x"), goodTail2),                          // offset into the head
      payload(Seq("zz" * 32), goodTail2),                              // junk offset word
      payload(Seq(f"${32L}%064x"), f"${9999L}%064x"),                  // len > MaxArrayLen
      payload(Seq(f"${32L}%064x"), goodTail2).dropRight(7),            // truncated tail
      payload(Seq(f"${32L}%064x"), f"${2L}%064x" + "zz" * 32 + f"${7L}%064x"), // junk elem
      "0x" + f"${32L}%064x".take(40),                                  // head word too short
      payload(Seq(f"${32L}%064x"), goodTail2).stripPrefix("0x"),       // no 0x prefix
      "0x")                                                            // empty payload
    val df = payloads.toDF("data")
    for (elem <- Seq(AddressT, Uint256T, UintSmallT, BoolT, Bytes32T)) {
      val kind = elem match {
        case AddressT => 0; case Uint256T => 1; case UintSmallT => 2
        case BoolT => 3; case _ => 4
      }
      val both = df.select(
        graft.functions.HexUtils.abiWordArray(col("data"), 0, 0, 1, kind,
          AbiDecode.MaxArrayLen).as("ker"),
        AbiDecode.dynWordArrayRef(col("data"),
          cwhen(col("data").startsWith("0x"), lit(2)).otherwise(lit(0)),
          0, 1, elem).as("ref"))
      val diff = both.where(!(col("ker") <=> col("ref"))).collect()
      assert(diff.isEmpty, s"$elem kernel/reference divergence: ${diff.mkString("; ")}")
    }

    // call-shaped addressing (extraPrefixChars=8): a payload WITHOUT the
    // 0x prefix is quarantined outright — the Column reference addresses
    // call words at fixed positions after "0x"+selector, and silently
    // shifting the kernel's addressing would diverge from it (r13 ADVICE;
    // previously only the selector gate hid this envelope arm)
    val callGood = "0x11223344" + f"${32L}%064x" + goodTail2
    val calls = Seq(callGood, callGood.stripPrefix("0x")).toDF("data")
    val decoded = calls.select(graft.functions.HexUtils.abiWordArray(
      col("data"), 8, 0, 1, 2, AbiDecode.MaxArrayLen).as("a")).collect()
    assert(decoded(0).getSeq[Long](0) === Seq(10L, 11L))
    assert(decoded(1).isNullAt(0), "non-0x call payload must quarantine")
  }

  test("bytes[] kernel is bit-equal to the Column parity reference across the hostile envelope") {
    import org.apache.spark.sql.functions.{col, lit, when => cwhen}
    def w(v: Long) = f"$v%064x"
    // element tail: length word + data padded to whole words
    def el(hexBytes: String): String = {
      val padded = if (hexBytes.isEmpty) ""
        else hexBytes.padTo(((hexBytes.length + 63) / 64) * 64, '0')
      w(hexBytes.length / 2L) + padded
    }
    val twoElems = w(2) + w(64) + w(128) + el("aabbcc") + el("")
    val longElem = w(1) + w(32) + el("ab" * 40) // 40-byte element, 2 data words
    val payloads = Seq(
      "0x" + w(32) + twoElems,                          // happy: ["0xaabbcc","0x"]
      "0x" + w(32) + longElem,                          // multi-word element
      "0x" + w(32) + w(0),                              // empty array
      "0x" + "zz" * 32 + twoElems,                      // junk table offset
      "0x" + w(33) + twoElems,                          // unaligned offset
      "0x" + w(32) + w(9999) + w(64),                   // len > MaxArrayLen
      "0x" + w(32) + w(2) + w(0) + w(64) + el("aabbcc") + el(""), // elem offset into table
      "0x" + w(32) + w(1) + w(33) + el("aa"),           // unaligned elem offset
      "0x" + w(32) + w(1) + w(32) + "zz" * 32,          // junk elem length word
      "0x" + w(32) + w(1) + w(32) + w(3) + "aabb",      // elem tail truncated
      "0x" + w(32) + w(2) + w(64),                      // offset table truncated
      ("0x" + w(32) + twoElems).stripPrefix("0x"),      // no 0x prefix (event side)
      "0x")                                             // empty payload
    val df = payloads.toDF("data")
    val both = df.select(
      graft.functions.HexUtils.abiWordArray(col("data"), 0, 0, 1,
        graft.functions.AbiWordArrayImpl.KindDynBytes, AbiDecode.MaxArrayLen).as("ker"),
      AbiDecode.dynBytesArrayRef(col("data"),
        cwhen(col("data").startsWith("0x"), lit(2)).otherwise(lit(0)), 0, 1).as("ref"))
    val rows = both.collect()
    val diff = both.where(!(col("ker") <=> col("ref"))).collect()
    assert(diff.isEmpty, s"bytes[] kernel/reference divergence: ${diff.mkString("; ")}")
    // pin the happy-path VALUES, not just parity
    assert(rows(0).getSeq[String](0) === Seq("0xaabbcc", "0x"))
    assert(rows(1).getSeq[String](0) === Seq("0x" + "ab" * 40))
    assert(rows(2).getSeq[String](0) === Seq.empty)
    // index 11 is the NO-0x spelling — legal on the event side (prefix 0),
    // decodes like the happy payload; everything else hostile → null
    assert(rows(11).getSeq[String](0) === Seq("0xaabbcc", "0x"))
    ((3 until 11) :+ 12).foreach(i =>
      assert(rows(i).isNullAt(0), s"hostile payload $i must decode to null"))
  }

  test("static-tuple-array kernel is bit-equal to the Column parity reference across the hostile envelope") {
    import org.apache.spark.sql.functions.{col, lit, when => cwhen}
    def w(v: Long) = f"$v%064x"
    def aw(a: Long) = "0" * 24 + f"$a%040x" // address word
    val elems = Seq(AddressT, UintSmallT)
    val kinds = elems.map { case AddressT => 0; case _ => 2 }
    val twoPairs = w(2) + aw(0x11L) + w(7) + aw(0x22L) + w(9)
    val payloads = Seq(
      "0x" + w(32) + twoPairs,                       // happy: 2 pairs
      "0x" + w(32) + w(0),                           // empty array
      "0x" + w(32) + w(1) + aw(0x33L) + "zz" * 32,   // junk MEMBER word → per-member null
      "0x" + "zz" * 32 + twoPairs,                   // junk offset
      "0x" + w(33) + twoPairs,                       // unaligned offset
      "0x" + w(32) + w(9999) + aw(1) + w(1),         // len > MaxArrayLen
      "0x" + w(32) + w(2) + aw(0x11L) + w(7) + aw(0x22L), // truncated: 3 of 4 inline words
      ("0x" + w(32) + twoPairs).stripPrefix("0x"),   // no 0x (event-legal)
      "0x")                                          // empty payload
    val df = payloads.toDF("data")
    val both = df.select(
      graft.functions.HexUtils.abiTupleArray(col("data"), 0, 0, 1, kinds,
        AbiDecode.MaxArrayLen).as("ker"),
      AbiDecode.dynTupleArrayRef(col("data"),
        cwhen(col("data").startsWith("0x"), lit(2)).otherwise(lit(0)),
        0, 1, elems).as("ref"))
    val diff = both.where(!(col("ker") <=> col("ref"))).collect()
    assert(diff.isEmpty, s"tuple-array kernel/reference divergence: ${diff.mkString("; ")}")
    val rows = both.collect()
    def pair(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    assert(rows(0).getSeq[org.apache.spark.sql.Row](0).map(pair) ===
      Seq(("0x" + "0" * 38 + "11", 7L), ("0x" + "0" * 38 + "22", 9L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](0) === Seq.empty)
    // junk member: element survives with a per-member null (inline-tuple
    // convention), the array itself is NOT nulled
    val junkElem = rows(2).getSeq[org.apache.spark.sql.Row](0)
    assert(junkElem.size === 1 && junkElem.head.getString(0) === "0x" + "0" * 38 + "33"
      && junkElem.head.isNullAt(1))
    (3 to 6).foreach(i => assert(rows(i).isNullAt(0), s"hostile payload $i must null"))
    assert(rows(7).getSeq[org.apache.spark.sql.Row](0).map(pair) ===
      Seq(("0x" + "0" * 38 + "11", 7L), ("0x" + "0" * 38 + "22", 9L)))
    assert(rows(8).isNullAt(0))

    // call-side addressing quarantines non-0x payloads like the word kernel
    val callGood = "0x11223344" + w(32) + twoPairs
    val calls = Seq(callGood, callGood.stripPrefix("0x")).toDF("data")
    val decoded = calls.select(graft.functions.HexUtils.abiTupleArray(
      col("data"), 8, 0, 1, kinds, AbiDecode.MaxArrayLen).as("a")).collect()
    assert(decoded(0).getSeq[org.apache.spark.sql.Row](0).size === 2)
    assert(decoded(1).isNullAt(0))
  }

  test("dynamic-member tuple-array kernel (Multicall3 shape) is bit-equal to the Column parity reference") {
    import org.apache.spark.sql.functions.{col, lit, when => cwhen}
    def w(v: Long) = f"$v%064x"
    def aw(a: Long) = "0" * 24 + f"$a%040x"
    val elems = Seq(AddressT, BoolT, DynBytesT)
    val kinds = Seq(0, 3, 5) // KindAddress, KindBool, KindDynBytes
    def el(addr: Long, flag: String, hexBytes: String): String = {
      val padded = if (hexBytes.isEmpty) ""
        else hexBytes.padTo(((hexBytes.length + 63) / 64) * 64, '0')
      aw(addr) + flag + w(96) + w(hexBytes.length / 2L) + padded
    }
    val happy = w(2) + w(64) + w(224) + el(0x11L, w(1), "aabbcc") + el(0x22L, w(0), "")
    val payloads = Seq(
      "0x" + w(32) + happy,                                       // 0 happy
      "0x" + w(32) + w(0),                                        // 1 empty array
      "0x" + w(32) + w(1) + w(32) + el(0x33L, "zz" * 32, "aa"),   // 2 junk bool → member null
      "0x" + w(32) + w(1) + w(32) + aw(0x44L) + w(1) + w(33) + w(0), // 3 unaligned member offset → member null
      "0x" + w(32) + w(1) + "zz" * 32 + el(0x11L, w(1), ""),      // 4 junk elem offset → whole null
      "0x" + w(32) + w(2) + w(0) + w(224) + happy.drop(64 * 3),   // 5 elem offset into table → whole null
      "0x" + w(32) + w(1) + w(32) + aw(0x11L) + w(1),             // 6 truncated tuple head → whole null
      "0x" + w(32) + w(1) + w(32) + aw(0x55L) + w(0) + w(96) + w(3) + "aabb", // 7 member tail truncated → member null
      "0x" + w(32) + w(9999) + w(64),                             // 8 len > MaxArrayLen → whole null
      ("0x" + w(32) + happy).stripPrefix("0x"),                   // 9 no 0x (event-legal)
      "0x")                                                       // 10 empty payload
    val df = payloads.toDF("data")
    val both = df.select(
      graft.functions.HexUtils.abiDynTupleArray(col("data"), 0, 0, 1, kinds,
        AbiDecode.MaxArrayLen).as("ker"),
      AbiDecode.dynDynTupleArrayRef(col("data"),
        cwhen(col("data").startsWith("0x"), lit(2)).otherwise(lit(0)),
        0, 1, elems).as("ref"))
    val diff = both.where(!(col("ker") <=> col("ref"))).collect()
    assert(diff.isEmpty, s"multicall kernel/reference divergence: ${diff.mkString("; ")}")
    val rows = both.collect()
    def call(r: org.apache.spark.sql.Row) =
      (r.getString(0), if (r.isNullAt(1)) null else r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2))
    assert(rows(0).getSeq[org.apache.spark.sql.Row](0).map(call) === Seq(
      ("0x" + "0" * 38 + "11", true, "0xaabbcc"),
      ("0x" + "0" * 38 + "22", false, "0x")))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](0) === Seq.empty)
    // member-grain nulls: the element SURVIVES with a null member
    val junkBool = rows(2).getSeq[org.apache.spark.sql.Row](0)
    assert(junkBool.size === 1 && junkBool.head.isNullAt(1)
      && junkBool.head.getString(0) === "0x" + "0" * 38 + "33"
      && junkBool.head.getString(2) === "0xaa")
    val badMoff = rows(3).getSeq[org.apache.spark.sql.Row](0)
    assert(badMoff.size === 1 && badMoff.head.isNullAt(2)
      && badMoff.head.getString(0) === "0x" + "0" * 38 + "44")
    Seq(4, 5, 6, 8, 10).foreach(i =>
      assert(rows(i).isNullAt(0), s"structural violation $i must null the array"))
    val cutTail = rows(7).getSeq[org.apache.spark.sql.Row](0)
    assert(cutTail.size === 1 && cutTail.head.isNullAt(2)
      && cutTail.head.getString(0) === "0x" + "0" * 38 + "55")
    assert(rows(9).getSeq[org.apache.spark.sql.Row](0).size === 2)
  }

  test("nested-array kernel (uint[][]-style) is bit-equal to the Column parity reference") {
    import org.apache.spark.sql.functions.{col, lit, when => cwhen}
    def w(v: Long) = f"$v%064x"
    def in(vs: Long*) = w(vs.length.toLong) + vs.map(w).mkString
    // outer of 2: inner0 = [7, 9] (96 bytes), inner1 = [] (32 bytes)
    val happy = w(2) + w(64) + w(160) + in(7, 9) + in()
    val payloads = Seq(
      "0x" + w(32) + happy,                               // 0 happy: [[7,9],[]]
      "0x" + w(32) + w(0),                                // 1 empty outer
      "0x" + w(32) + w(1) + w(32) + w(1) + "zz" * 32,     // 2 junk inner word → inner-elem null
      "0x" + w(32) + w(1) + "zz" * 32 + in(1),            // 3 junk elem offset → whole null
      "0x" + w(32) + w(2) + w(0) + w(160) + in(7) + in(), // 4 elem offset into table → whole null
      "0x" + w(32) + w(1) + w(32) + w(9999),              // 5 inner len > MaxArrayLen → whole null
      "0x" + w(32) + w(1) + w(32) + w(2) + w(7),          // 6 inner words truncated → whole null
      "0x" + w(32) + w(9999) + w(64),                     // 7 outer len > MaxArrayLen → whole null
      ("0x" + w(32) + happy).stripPrefix("0x"),           // 8 no 0x (event-legal)
      "0x")                                               // 9 empty payload
    val df = payloads.toDF("data")
    val both = df.select(
      graft.functions.HexUtils.abiNestedArray(col("data"), 0, 0, 1, 2,
        AbiDecode.MaxArrayLen).as("ker"), // KindUintSmall
      AbiDecode.dynNestedArrayRef(col("data"),
        cwhen(col("data").startsWith("0x"), lit(2)).otherwise(lit(0)),
        0, 1, UintSmallT).as("ref"))
    val diff = both.where(!(col("ker") <=> col("ref"))).collect()
    assert(diff.isEmpty, s"nested kernel/reference divergence: ${diff.mkString("; ")}")
    val rows = both.collect()
    assert(rows(0).getSeq[Seq[Long]](0) === Seq(Seq(7L, 9L), Seq.empty))
    assert(rows(1).getSeq[Seq[Long]](0) === Seq.empty)
    val junkInner = rows(2).getSeq[Seq[Any]](0)
    assert(junkInner === Seq(Seq(null)), "junk inner word nulls the inner element only")
    (3 to 7).foreach(i => assert(rows(i).isNullAt(0), s"structural violation $i must null"))
    assert(rows(8).getSeq[Seq[Long]](0) === Seq(Seq(7L, 9L), Seq.empty))
    assert(rows(9).isNullAt(0))
  }

  test("nested-array end-to-end: Matrix demo decodes wide and long") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (400L, 2L, "error", ts0),  // n = 1 inner; inner0 len = 400%3 = 1
      (401L, 3L, "error", ts0),  // n = 2; lens (401%3)=2, (402%3)=0
      (402L, 4L, "error", ts0),  // n = 0 → []
      (403L, 4L, "click", ts0)   // other family: no Matrix log
    ).toDF("event_id", "user_id", "event_type", "ts")
    val receipts = AbiDecode.demoNestedArrayReceipts(events)
    def h(id: Long) = "0x" + java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wide = AbiDecode.decodeEvent(receipts, DemoMatrix)
      .collect().map(r => r.getAs[String]("hash") -> r.getAs[Seq[Seq[Long]]]("m")).toMap
    assert(wide.size === 3)
    assert(wide(h(400L)) === Seq(Seq(40000L)))
    assert(wide(h(401L)) === Seq(Seq(40100L, 40101L), Seq.empty))
    assert(wide(h(402L)) === Seq.empty)
    val long = AbiDecode.decodeEvents(receipts, Seq(DemoMatrix))
      .where(col("param") === "m")
      .collect().map(r => r.getAs[String]("hash") -> r.getAs[String]("value")).toMap
    assert(long(h(402L)) === "[]")
    assert(long(h(400L)) === "[[40000]]")
    assert(long(h(401L)) === "[[40100,40101],[]]")
  }

  test("Multicall3 end-to-end: aggregate3 demo decodes through decodeCalls") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (300L, 6L, "click", ts0),  // n = 0 calls → []
      (301L, 7L, "click", ts0),  // n = 1: addr(77), bool false(302%2... wait (301+0)%2=1 → true), 1-byte data
      (302L, 8L, "click", ts0),  // n = 2
      (303L, 8L, "view", ts0)    // other family: unregistered
    ).toDF("event_id", "user_id", "event_type", "ts")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(id: Long) = "0x" + md5hex(id.toString)
    def addr(v: Long) = "0x" + f"$v%040x"
    val r = AbiDecode.decodeCalls(
      AbiDecode.demoAggregate3Receipts(events), Seq(AbiDecode.Aggregate3))
      .collect().map(x => x.getAs[String]("hash") -> x.getAs[String]("value")).toMap
    assert(r.size === 3)
    assert(r(h(300L)) === "[]")
    // event 301, user 7: call0 = (addr(77), (301+0)%2=1 → true,
    // calldata = first (301+0)%3 = 1 byte of md5("301_c0"))
    assert(r(h(301L)) === s"[(${addr(77L)},true,0x${md5hex("301_c0").take(2)})]")
    // event 302, user 8: 2 calls — lens (302%3)=2 and (303%3)=0 bytes
    assert(r(h(302L)) ===
      s"[(${addr(88L)},false,0x${md5hex("302_c0").take(4)}),(${addr(89L)},true,0x)]")
  }

  test("tuple-array end-to-end: PairBatch demo decodes wide and long") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (200L, 3L, "view", ts0),   // n = 2 pairs
      (201L, 4L, "view", ts0),   // n = 0 → []
      (202L, 5L, "view", ts0),   // n = 1
      (203L, 5L, "click", ts0)   // other family: no PairBatch log
    ).toDF("event_id", "user_id", "event_type", "ts")
    val receipts = AbiDecode.demoTupleArrayReceipts(events)
    def addr(v: Long) = "0x" + f"$v%040x"
    val wide = AbiDecode.decodeEvent(receipts, DemoPairBatch)
      .collect().map { r =>
        r.getAs[String]("hash") -> r.getAs[Seq[org.apache.spark.sql.Row]]("pairs")
          .map(p => (p.getString(0), p.getString(1)))
      }.toMap
    def h(id: Long) = "0x" + java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(wide.size === 3)
    assert(wide(h(200L)) === Seq((addr(21L), "20000"), (addr(22L), "20001")))
    assert(wide(h(201L)) === Seq.empty)
    assert(wide(h(202L)) === Seq((addr(35L), "20200")))
    val long = AbiDecode.decodeEvents(receipts, Seq(DemoPairBatch))
      .where(col("param") === "pairs")
      .collect().map(r => r.getAs[String]("hash") -> r.getAs[String]("value")).toMap
    assert(long(h(201L)) === "[]")
    assert(long(h(202L)) === s"[(${addr(35L)},20200)]")
    assert(long(h(200L)) === s"[(${addr(21L)},20000),(${addr(22L)},20001)]")
  }

  test("bytes[] end-to-end: Multicall demo decodes wide and long, empty arrays/elements first-class") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (100L, 7L, "signup", ts0),  // n = 100%3 = 1, elem0 len = (100+0)%3 = 1 byte
      (101L, 8L, "signup", ts0),  // n = 2, lens (101%3)=2, (102%3)=0 → ["0x…",“0x”]
      (102L, 9L, "signup", ts0),  // n = 0 → []
      (103L, 9L, "purchase", ts0) // other family: no Multicall log
    ).toDF("event_id", "user_id", "event_type", "ts")
    val receipts = AbiDecode.demoDynArrayReceipts(events)
    val wide = AbiDecode.decodeEvent(receipts, DemoMulticall)
      .collect().map(r => r.getAs[String]("hash") ->
        (r.getAs[Long]("n_calls"), r.getAs[Seq[String]]("calls"))).toMap
    def h(id: Long) = "0x" + java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(wide.size === 3)
    assert(wide(h(100L)) === ((1L, Seq("0x" + md5hex("100_0").take(2)))))
    assert(wide(h(101L)) === ((2L, Seq("0x" + md5hex("101_0").take(4), "0x"))))
    assert(wide(h(102L)) === ((0L, Seq.empty)))
    // long format renders the explicit [a,b] spelling the oracle re-derives
    val long = AbiDecode.decodeEvents(receipts, Seq(DemoMulticall))
      .where(col("param") === "calls")
      .collect().map(r => r.getAs[String]("hash") -> r.getAs[String]("value")).toMap
    assert(long(h(102L)) === "[]")
    assert(long(h(101L)) === s"[0x${md5hex("101_0").take(4)},0x]")
  }

  test("registry validation: indexed dynamic/tuple params reject (keccak-hashed topics)") {
    intercept[IllegalArgumentException] {
      AbiEvent("Bad", "0x" + "cd" * 32,
        Seq(AbiParam("xs", ArrayT(Uint256T), indexed = true)))
    }
    intercept[IllegalArgumentException] {
      AbiEvent("Bad", "0x" + "cd" * 32,
        Seq(AbiParam("t", TupleT(Seq(AddressT)), indexed = true)))
    }
    ArrayT(ArrayT(Uint256T)) // r14: ONE nesting level IS in envelope
    intercept[IllegalArgumentException] { ArrayT(ArrayT(ArrayT(Uint256T))) } // depth 3 out
    intercept[IllegalArgumentException] { ArrayT(ArrayT(DynBytesT)) } // no bytes[][]
    intercept[IllegalArgumentException] { TupleT(Seq(ArrayT(Uint256T))) }
    intercept[IllegalArgumentException] { TupleT(Seq.empty) }
    // r14: a dynamic-MEMBER tuple constructs (it is the Multicall3 array
    // element) but is rejected as a STANDALONE param on both sides — its
    // inline head addressing would be wrong (offset-addressed type)
    val dynTuple = TupleT(Seq(AddressT, DynBytesT))
    intercept[IllegalArgumentException] {
      AbiEvent("Bad", "0x" + "cf" * 32,
        Seq(AbiParam("t", dynTuple, indexed = false)))
    }
    intercept[IllegalArgumentException] {
      AbiFunction("bad", "0x12345678",
        Seq(AbiParam("t", dynTuple, indexed = false)))
    }
    // ...while the ARRAY of it is in envelope on both sides
    AbiEvent("OkDyn", "0x" + "d0" * 32,
      Seq(AbiParam("calls", ArrayT(dynTuple), indexed = false)))
    AbiFunction("okDyn", "0x87654321",
      Seq(AbiParam("calls", ArrayT(dynTuple), indexed = false)))
    ArrayT(DynBytesT) // r14: bytes[]/string[] IS in envelope
    ArrayT(TupleT(Seq(AddressT, Uint256T))) // r14: static-tuple arrays too
    // a bare dynamic tail stays call-only on events; bytes[] is event-legal
    intercept[IllegalArgumentException] {
      AbiEvent("Bad", "0x" + "cd" * 32,
        Seq(AbiParam("d", DynBytesT, indexed = false)))
    }
    AbiEvent("Ok", "0x" + "ce" * 32,
      Seq(AbiParam("calls", ArrayT(DynBytesT), indexed = false)))
  }

  test("wide decodes are streaming-compatible: decodeEvent over a MemoryStream") {
    // the wide per-event/per-call decodes are pure projections (no orderBy,
    // no agg), so they run unchanged inside a micro-batch pipeline — the
    // streaming half of the generic-decoder claim
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Tx]
    val q = AbiDecode.decodeEvent(mem.toDF(), Erc20Transfer)
      .writeStream.format("memory").queryName("abi_stream").outputMode("append").start()
    mem.addData(
      Tx("0xs1", user, other, "0", "0x",
        Seq(Log(token, Seq(TransferTopic, word(user), word(other)), uintHex(7)))),
      Tx("0xs2", user, other, "0", "0x", Seq.empty))
    q.processAllAvailable()
    mem.addData(
      Tx("0xs3", user, other, "0", "0x",
        Seq(Log(token, Seq(TransferTopic, word(other), word(user)), uintHex(9)))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("abi_stream")
      .select("hash", "from", "to", "value").as[(String, String, String, String)]
      .collect().toSet
    assert(got == Set(
      ("0xs1", user, other, "7"),
      ("0xs3", other, user, "9")))
  }
}
