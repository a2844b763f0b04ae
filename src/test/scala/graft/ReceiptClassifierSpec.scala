package graft

import graft.operators.ReceiptClassifier._
import org.apache.spark.sql.functions._

/** Mirrors the reference's `TransactionClassifierTests.cs` case-for-case —
  * the reference fetches live receipts over RPC; here the same receipt
  * shapes are constructed synthetically (same topics, same co-occurrence
  * structure, same edge predicates).
  */
case class Log(address: String, topics: Seq[String], data: String)
case class Tx(hash: String, from: String, to: String, value: String,
              input: String, logs: Seq[Log])

class ReceiptClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val hub = DefaultHubAddress
  private val user = "0xde374ece6fa50e781e81aac78e811b33d16912c4"
  private val other = "0xaaaa74ece6fa50e781e81aac78e811b33d1691aa"
  private val token = "0x1111111111111111111111111111111111111111"
  private def word(addr: String) = "0x" + "0" * 24 + addr.drop(2)
  private def limitHex(v: Long) = "0x" + f"$v%064x"

  private def transferLog(tok: String, from: String, to: String, data: String = limitHex(7)) =
    Log(tok, Seq(TransferTopic, word(from), word(to)), data)
  private def trustLog(canSendTo: String, usr: String, limit: Long = 100) =
    Log(hub, Seq(CrcTrustTopic, word(canSendTo), word(usr)), limitHex(limit))
  private val signupReceipt = Seq(
    Log(hub, Seq(CrcSignupTopic, word(user)), word(token)),
    trustLog(user, user),
    transferLog(token, EmptyAddress, user, SignupMintHex))

  private def tx(logs: Seq[Log], value: String = "0",
                 input: String = "0xdeadbeef", to: String = other) =
    Tx("0xhash", user, to, value, input, logs)

  private def classOf1(t: Tx): String =
    classify(Seq(t).toDS.toDF).select("classification").as[String].collect()(0)

  test("TestErc20Transfer: two transfer logs extract as two detail rows") {
    val t = tx(Seq(transferLog(token, user, other), transferLog(token, other, user)))
    val details = extractErc20Transfers(Seq(t).toDS.toDF)
    assert(details.count() == 2)
    assert(classOf1(t) == "Erc20Transfer")
    assert(details.select("from").as[String].collect().toSet == Set(user, other))
  }

  test("TestCrcSignup: signup + self-trust + exact 50e18 mint co-occur") {
    assert(classOf1(tx(signupReceipt)).contains("CrcSignup"))
    // wrong mint value → not a signup
    val badMint = signupReceipt.updated(2, transferLog(token, EmptyAddress, user, limitHex(1)))
    assert(!classOf1(tx(badMint)).contains("CrcSignup"))
    // trust of someone else → not a signup
    val badTrust = signupReceipt.updated(1, trustLog(other, user))
    assert(!classOf1(tx(badTrust)).contains("CrcSignup"))
  }

  test("TestCrcOrganisationSignup: org topic at hub with 2 topics") {
    val t = tx(Seq(Log(hub, Seq(CrcOrgSignupTopic, word(user)), "0x")))
    assert(classOf1(t) == "CrcOrganisationSignup")
    // wrong emitting address → unknown
    val t2 = tx(Seq(Log(other, Seq(CrcOrgSignupTopic, word(user)), "0x")))
    assert(classOf1(t2) == "Unknown")
  }

  test("TestCrcHubTransfer: hub-transfer log requires an accompanying erc20 transfer") {
    val ht = Log(hub, Seq(CrcHubTransferTopic, word(user), word(other)), limitHex(5))
    assert(classOf1(tx(Seq(ht, transferLog(token, user, other)))).contains("CrcHubTransfer"))
    assert(!classOf1(tx(Seq(ht))).contains("CrcHubTransfer"))
  }

  test("TestCrcTrust: limit bounds enforced") {
    assert(classOf1(tx(Seq(trustLog(user, other, 50)))) == "CrcTrust")
    assert(classOf1(tx(Seq(trustLog(user, other, 150)))) == "Unknown")
    val trusts = extractTrusts(Seq(tx(Seq(trustLog(user, other, 50)))).toDS.toDF)
    val r = trusts.select("user", "can_send_to", "limit").as[(String, String, Long)].collect()(0)
    assert(r == ((other, user, 50L)))
  }

  test("TestEoaEthTransfer: nonzero value, bare input, no logs") {
    assert(classOf1(tx(Nil, value = "1000", input = "0x")) == "EoaEthTransfer")
    assert(classOf1(tx(Nil, value = "0", input = "0x")) == "Unknown")
    assert(classOf1(tx(Seq(transferLog(token, user, other)), value = "1000", input = "0x"))
      == "Erc20Transfer") // logs present → not an EOA transfer
  }

  test("TestSafeEthTransfer: execTransaction head decode + ExecutionSuccess log") {
    def headWords(operation: Long): String = {
      val p0 = word(other).drop(2) // to
      val p1 = f"${1000000L}%064x" // value
      val p2 = f"${320L}%064x" // data offset (10 head words * 32)
      val p3 = f"$operation%064x"
      val rest = Seq.fill(6)("0" * 64).mkString
      val tailLen = "0" * 64 // empty bytes param
      ExecTransactionMethodId + p0 + p1 + p2 + p3 + rest + tailLen
    }
    val okLog = Log(other, Seq(ExecutionSuccessTopic), "0x")
    assert(classOf1(tx(Seq(okLog), input = headWords(0))) == "SafeEthTransfer")
    // operation != 0 (delegatecall) → not a plain eth transfer
    assert(classOf1(tx(Seq(okLog), input = headWords(1))) == "Unknown")
    // no ExecutionSuccess log → not counted
    assert(classOf1(tx(Nil, input = headWords(0))) == "Unknown")
  }

  test("hub transfer / signup / org extractors yield the reference detail rows") {
    val ht = Log(hub, Seq(CrcHubTransferTopic, word(user), word(other)), limitHex(42))
    val hubTx = tx(Seq(ht, transferLog(token, user, other)))
    val r = extractHubTransfers(Seq(hubTx).toDS.toDF)
      .select("from", "to", "value_hex").as[(String, String, String)].collect()(0)
    assert(r == ((user, other, limitHex(42))))
    // non-hub-transfer receipts extract nothing
    assert(extractHubTransfers(Seq(tx(Seq(transferLog(token, user, other)))).toDS.toDF).count() == 0)

    val su = extractSignups(Seq(tx(signupReceipt)).toDS.toDF)
      .select("user", "token").as[(String, String)].collect()(0)
    assert(su == ((user, token)))

    val org = extractOrgSignups(
      Seq(tx(Seq(Log(hub, Seq(CrcOrgSignupTopic, word(other)), "0x")))).toDS.toDF)
      .select("organisation").as[String].collect()(0)
    assert(org == other)
  }

  test("classification flags combine like the reference's [Flags] enum") {
    val ht = Log(hub, Seq(CrcHubTransferTopic, word(user), word(other)), limitHex(5))
    val combined = tx(Seq(ht, transferLog(token, user, other), trustLog(user, other, 10)))
    val c = classOf1(combined)
    assert(c.contains("Erc20Transfer") && c.contains("CrcHubTransfer") && c.contains("CrcTrust"))
  }

  test("SingleOrDefault semantics: duplicate matching logs throw -> whole receipt Unknown") {
    // 2nd trust log in a signup receipt: reference's SingleOrDefault(IsCrcTrust)
    // throws (TransactionClassifier.cs:67) -> Classify catches -> Unknown,
    // wiping even the Erc20Transfer/CrcTrust flags that individually match
    assert(classOf1(tx(signupReceipt :+ trustLog(user, other, 10))) == "Unknown")
    // 2nd signup-topic log (cs:41)
    assert(classOf1(tx(signupReceipt :+ Log(hub, Seq(CrcSignupTopic, word(other)), word(token))))
      == "Unknown")
    // 2nd erc20 transfer in a signup receipt (cs:92)
    assert(classOf1(tx(signupReceipt :+ transferLog(token, user, other))) == "Unknown")
    // 2 hub-transfer-topic logs, even at a WRONG address: SingleOrDefault
    // filters on topic containment only (cs:167) -> throws -> Unknown
    val ht = Log(hub, Seq(CrcHubTransferTopic, word(user), word(other)), limitHex(5))
    val htWrongAddr = Log(other, Seq(CrcHubTransferTopic, word(user), word(other)), limitHex(5))
    assert(classOf1(tx(Seq(ht, htWrongAddr, transferLog(token, user, other)))) == "Unknown")
    // but a receipt with ONE valid hub-transfer log still classifies
    assert(classOf1(tx(Seq(ht, transferLog(token, user, other)))).contains("CrcHubTransfer"))
  }

  test("SingleOrDefault semantics: duplicate ExecutionSuccess + truncated exec input") {
    def headWords(operation: Long): String = {
      val p0 = word(other).drop(2)
      val p1 = f"${1000000L}%064x"
      val p2 = f"${320L}%064x"
      val p3 = f"$operation%064x"
      ExecTransactionMethodId + p0 + p1 + p2 + p3 + Seq.fill(6)("0" * 64).mkString + "0" * 64
    }
    val okLog = Log(other, Seq(ExecutionSuccessTopic), "0x")
    // two ExecutionSuccess logs: SingleOrDefault throws (cs:333) -> Unknown
    assert(classOf1(tx(Seq(okLog, okLog), input = headWords(0))) == "Unknown")
    // selector-prefixed but truncated input: FunctionCallDecoder throws -> Unknown
    assert(classOf1(tx(Nil, input = ExecTransactionMethodId + "00ff")) == "Unknown")
  }

  test("EthTransfer detail extractor mirrors EthTransferDetailExtractor.cs") {
    val eoa = tx(Nil, value = "12345", input = "0x")
    val r = extractEthTransfers(Seq(eoa, tx(signupReceipt)).toDS.toDF)
      .select("from", "to", "value").as[(String, String, String)].collect()
    assert(r.toSeq == Seq((user, other, "12345"))) // only the EOA transfer row
  }

  test("GnosisSafeEthTransfer detail extractor ABI-decodes to/value head params") {
    val dest = "0xbbbb74ece6fa50e781e81aac78e811b33d1691bb"
    val valueWord = f"${77000L}%064x"
    val input = ExecTransactionMethodId + word(dest).drop(2) + valueWord +
      f"${320L}%064x" + "0" * 64 + Seq.fill(5)("0" * 64).mkString +
      f"${352L}%064x" + "0" * 128
    val safeTx = tx(Seq(Log(other, Seq(ExecutionSuccessTopic), "0x")), input = input)
    val r = extractSafeEthTransfers(Seq(safeTx, tx(signupReceipt)).toDS.toDF)
      .select("initiator", "from", "to", "value")
      .as[(String, String, String, String)].collect()
    // initiator = tx sender, from = the safe (tx target), to/value from ABI
    // head; value is the reference's DECIMAL string (cs:33), to lowercased
    assert(r.toSeq == Seq((user, other, dest, "77000")))
  }

  test("mixed-case ABI `to` is lowercased like Nethereum's decode (cs:312)") {
    val dest = "0xBBBB74ECE6FA50E781E81AAC78E811B33D1691BB"
    val input = ExecTransactionMethodId + word(dest).drop(2) + f"${7L}%064x" +
      f"${320L}%064x" + "0" * 64 + Seq.fill(5)("0" * 64).mkString +
      f"${352L}%064x" + "0" * 128
    val safeTx = tx(Seq(Log(other, Seq(ExecutionSuccessTopic), "0x")), input = input)
    val r = extractSafeEthTransfers(Seq(safeTx).toDS.toDF)
      .select("to", "value").as[(String, String)].collect()
    assert(r.toSeq == Seq((dest.toLowerCase, "7")))
  }

  test("malformed execTransaction decode throws -> whole receipt Unknown (cs:295)") {
    val okLog = Log(other, Seq(ExecutionSuccessTopic), "0x")
    def withOffsetWord(offsetWord: String): String =
      ExecTransactionMethodId + word(other).drop(2) + f"${1L}%064x" +
        offsetWord + "0" * 64 + Seq.fill(5)("0" * 64).mkString +
        f"${352L}%064x" + "0" * 128
    // full-length input, data offset points past the end of the input:
    // the tail length word is unreadable -> DecodeFunctionInput throws
    assert(classOf1(tx(Seq(okLog), input = withOffsetWord(f"${99999L * 64}%064x"))) == "Unknown")
    // non-hex garbage in the offset word -> decode throws
    assert(classOf1(tx(Seq(okLog), input = withOffsetWord("zz" + "0" * 62))) == "Unknown")
    // absurdly huge offset (would overflow any sane decode) -> Unknown, and
    // crucially NOT a Spark-side ANSI conv/cast crash
    assert(classOf1(tx(Seq(okLog), input = withOffsetWord("f" * 64))) == "Unknown")
    // a well-formed non-empty-data call is NOT a throw: decode succeeds,
    // the safe-transfer flag is simply false, other flags still apply
    val dataAt320 = f"${2L}%064x" + "abcd" + "0" * 60 // len 2, 2 bytes data
    val nonEmpty = ExecTransactionMethodId + word(other).drop(2) + f"${1L}%064x" +
      f"${320L}%064x" + "0" * 64 + Seq.fill(5)("0" * 64).mkString +
      f"${448L}%064x" + dataAt320 + "0" * 64
    assert(classOf1(tx(Seq(transferLog(token, user, other)), input = nonEmpty)) == "Erc20Transfer")
  }

  test("hostile trust-log data words never crash ANSI, they just don't classify") {
    // huge uint256 limit: reference's BigInteger check fails (limit > 100);
    // an unguarded conv/cast would throw ARITHMETIC_OVERFLOW here
    val hugeTrust = Log(hub, Seq(CrcTrustTopic, word(other), word(user)), "0x" + "f" * 64)
    assert(classOf1(tx(Seq(hugeTrust))) == "Unknown") // no flag matches
    // non-hex data word: parse fails -> not a trust log
    val garbageTrust = Log(hub, Seq(CrcTrustTopic, word(other), word(user)), "0x" + "zz" + "0" * 62)
    assert(classOf1(tx(Seq(garbageTrust))) == "Unknown")
    // boundary: limit exactly 100 still classifies
    assert(classOf1(tx(Seq(trustLog(user, other, 100)))) == "CrcTrust")
  }
}
