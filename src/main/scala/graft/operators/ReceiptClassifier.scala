package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Literal re-expression of the reference's transaction classifier over a
  * receipt data model: each transaction row carries
  * `logs: array<struct<address:string, topics:array<string>, data:string>>`.
  *
  * Every predicate below mirrors one in
  * `DetailExtractors/TransactionClassifier.cs` (file:line cited per method),
  * expressed as codegen'd higher-order functions over the logs array —
  * map-only at any scale, no explode needed until detail extraction.
  *
  * Chain-scale uint256 values stay hex strings end-to-end (the reference
  * stores them as Postgres text for the same reason); only known-small
  * quantities (trust limits 0..100) decode to longs.
  */
object ReceiptClassifier {

  // Settings.cs:47-66 — event topic constants (public contract ABI hashes)
  val TransferTopic = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
  val CrcSignupTopic = "0x358ba8f768af134eb5af120e9a61dc1ef29b29f597f047b555fc3675064a0342"
  val CrcOrgSignupTopic = "0xb0b94cff8b84fc67513b977d68a5cdd67550bd9b8d99a34b570e3367b7843786"
  val CrcTrustTopic = "0xe60c754dd8ab0b1b5fccba257d6ebcd7d09e360ab7dd7a6e58198ca1f57cdcec"
  val CrcHubTransferTopic = "0x8451019aab65b4193860ef723cb0d56b475a26a72b7bfc55c1dbd6121015285a"
  val ExecutionSuccessTopic = "0x442e715f626346e8c54381002da614f62bee8d27386535b2521ec8540898556e"
  val DefaultHubAddress = "0x29b9a7fbb8995b2423a71cc17cf9810798f6c543"
  val EmptyAddress = "0x0000000000000000000000000000000000000000"
  val ExecTransactionMethodId = "0x6a761202"
  /** 50e18 (the UBI signup mint) as a 32-byte hex word (IsCrcSignup checks
    * value == "50000000000000000000", TransactionClassifier.cs:118). */
  val SignupMintHex = "0x000000000000000000000000000000000000000000000002b5e3af16b1880000"

  /** topic (32-byte word) → address: strip the 24 zero hex chars
    * (Settings.AddressEmptyBytesPrefix replace). */
  def topicAddress(t: Column): Column = concat(lit("0x"), substring(t, 27, 40))

  // --- per-log predicates -------------------------------------------------

  /** TransactionClassifier.cs:243 IsErc20Transfer: Transfer topic + exactly
    * 3 topics. */
  def isErc20TransferLog(log: Column): Column =
    array_contains(log.getField("topics"), TransferTopic) &&
      size(log.getField("topics")) === 3

  /** TransactionClassifier.cs:199 IsCrcTrust: Trust topic, hub address,
    * 3 topics, 0 <= limit <= 100. */
  def isCrcTrustLog(log: Column, hub: String = DefaultHubAddress): Column = {
    val limit = conv(regexp_replace(log.getField("data"), "^0x", ""), 16, 10).cast("long")
    array_contains(log.getField("topics"), CrcTrustTopic) &&
      log.getField("address") === hub &&
      size(log.getField("topics")) === 3 &&
      limit.isNotNull && limit >= 0 && limit <= 100
  }

  /** TransactionClassifier.cs:126 IsCrcOrganisationSignup. */
  def isCrcOrgSignupLog(log: Column, hub: String = DefaultHubAddress): Column =
    array_contains(log.getField("topics"), CrcOrgSignupTopic) &&
      log.getField("address") === hub &&
      size(log.getField("topics")) === 2

  private def signupLog(log: Column, hub: String): Column =
    array_contains(log.getField("topics"), CrcSignupTopic) &&
      log.getField("address") === hub &&
      size(log.getField("topics")) === 2

  // --- per-transaction predicates ----------------------------------------

  private def existsLog(logs: Column, pred: Column => Column): Column =
    exists(logs, pred)

  /** TransactionClassifier.cs:25 IsCrcSignup — the 3-log co-occurrence:
    * one Signup log (user, token), one SELF-trust log for that user, one
    * mint Transfer of exactly 50e18 from 0x0 to the user on the new token.
    */
  def isCrcSignup(logs: Column, hub: String = DefaultHubAddress): Column = {
    val su = filter(logs, l => signupLog(l, hub))
    val suLog = element_at(su, 1)
    val user = topicAddress(element_at(suLog.getField("topics"), 2))
    val token = concat(lit("0x"), substring(suLog.getField("data"), 27, 40))
    val selfTrust = (l: Column) => isCrcTrustLog(l, hub) &&
      topicAddress(element_at(l.getField("topics"), 2)) === user &&
      topicAddress(element_at(l.getField("topics"), 3)) === user
    val mint = (l: Column) => isErc20TransferLog(l) &&
      l.getField("address") === token &&
      topicAddress(element_at(l.getField("topics"), 2)) === EmptyAddress &&
      topicAddress(element_at(l.getField("topics"), 3)) === user &&
      l.getField("data") === SignupMintHex
    size(logs) >= 3 && size(su) === 1 &&
      existsLog(logs, selfTrust) && existsLog(logs, mint)
  }

  /** TransactionClassifier.cs:155 IsCrcHubTransfer: one HubTransfer log at
    * the hub with 3 topics, plus at least one ERC20 transfer log. */
  def isCrcHubTransfer(logs: Column, hub: String = DefaultHubAddress): Column = {
    val ht = filter(logs, l =>
      array_contains(l.getField("topics"), CrcHubTransferTopic) &&
        l.getField("address") === hub &&
        size(l.getField("topics")) === 3)
    size(ht) === 1 && existsLog(logs, l => isErc20TransferLog(l))
  }

  /** TransactionClassifier.cs:317 IsEoaEthTransfer: value != 0, no logs,
    * bare "0x" input, a recipient. */
  def isEoaEthTransfer(value: Column, input: Column, to: Column, logs: Column): Column =
    value =!= "0" && size(logs) === 0 && input === "0x" && to.isNotNull

  /** TransactionClassifier.cs:258 IsSafeEthTransfer: execTransaction call
    * (ABI head decoded by fixed hex offsets: param2 `data` must be empty
    * bytes via its tail length word, param3 `operation` must be 0) plus an
    * ExecutionSuccess log.
    */
  def isSafeEthTransfer(input: Column, logs: Column): Column = {
    // head param i (32-byte word) lives at string offset 11 + 64*i (1-based
    // substring; after "0x" + 8 selector chars)
    def headWord(i: Int): Column = substring(input, 11 + 64 * i, 64)
    val dataOffsetBytes = conv(headWord(2), 16, 10).cast("long")
    // ABI offsets are relative to the params section (char 11, after
    // "0x" + selector): byte b lives at 1-based char 11 + 2b
    val dataLen = conv(input.substr(lit(11) + dataOffsetBytes.cast("int") * 2, lit(64)), 16, 10).cast("long")
    val operation = conv(headWord(3), 16, 10).cast("long")
    input.startsWith(ExecTransactionMethodId) &&
      length(input) >= 10 + 64 * 10 &&
      dataLen === 0 && operation === 0 &&
      existsLog(logs, l => array_contains(l.getField("topics"), ExecutionSuccessTopic))
  }

  // --- classification + extraction ---------------------------------------

  /** TransactionClassifier.cs:338 Classify — the flag set per transaction,
    * one projection, no shuffle. Expects columns (hash, from, to, value,
    * input, logs).
    */
  def classify(txs: DataFrame, hub: String = DefaultHubAddress): DataFrame = {
    val logs = col("logs")
    val flags = Seq(
      "Erc20Transfer" -> existsLog(logs, l => isErc20TransferLog(l)),
      "CrcSignup" -> isCrcSignup(logs, hub),
      "CrcOrganisationSignup" -> existsLog(logs, l => isCrcOrgSignupLog(l, hub)),
      "CrcHubTransfer" -> isCrcHubTransfer(logs, hub),
      "CrcTrust" -> existsLog(logs, l => isCrcTrustLog(l, hub)),
      "SafeEthTransfer" -> isSafeEthTransfer(col("input"), logs),
      "EoaEthTransfer" -> isEoaEthTransfer(col("value"), col("input"), col("to"), logs)
    ).map { case (name, pred) => when(pred, lit(name)) }
    txs.withColumn("classification",
      coalesce(nullif(concat_ws(",", flags: _*), lit("")), lit("Unknown")))
  }

  /** Erc20TransferDetailExtractor.cs:12 — one detail row per Transfer log
    * (1→N): token, from, to, value (hex word kept as text, like the
    * reference's Postgres `value text` columns).
    */
  def extractErc20Transfers(txs: DataFrame): DataFrame =
    txs.select(col("hash"), explode(filter(col("logs"), l => isErc20TransferLog(l))).as("log"))
      .select(
        col("hash"),
        col("log.address").as("token"),
        topicAddress(element_at(col("log.topics"), 2)).as("from"),
        topicAddress(element_at(col("log.topics"), 3)).as("to"),
        col("log.data").as("value_hex"))

  /** Deterministic synthetic receipts derived from the events table — lets
    * the receipt-level classifier run through the Verify/Bench surface
    * (rows-only; the per-predicate semantics are pinned by
    * ReceiptClassifierSpec against the reference's test cases).
    */
  def demoFromEvents(events: DataFrame, hub: String = DefaultHubAddress): DataFrame =
    classify(demoReceipts(events, hub), hub)
      .select("event_id", "hash", "classification").orderBy("event_id")

  /** The synthetic receipts frame itself (hash, from, to, value, input,
    * logs, event_id) — input for the extractor/view compositions.
    */
  def demoReceipts(events: DataFrame, hub: String = DefaultHubAddress): DataFrame = {
    def addr(c: Column): Column = concat(lit("0x"), lpad(lower(hex(c)), 40, "0"))
    def word(c: Column): Column = concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
    val user = addr(col("user_id"))
    val token = addr(col("user_id") + 1000000L)
    val other = addr(col("user_id") + 2000000L)
    val limit = get_json_object(col("props"), "$.k").cast("long") % 101
    val transferLog = struct(token.as("address"),
      array(lit(TransferTopic), word(col("user_id")), word(col("user_id") + 2000000L)).as("topics"),
      word(col("event_id")).as("data"))
    val trustLog = struct(lit(hub).as("address"),
      array(lit(CrcTrustTopic), word(col("user_id") + 2000000L), word(col("user_id"))).as("topics"),
      word(limit).as("data"))
    val orgLog = struct(lit(hub).as("address"),
      array(lit(CrcOrgSignupTopic), word(col("user_id"))).as("topics"), lit("0x").as("data"))
    val hubLog = struct(lit(hub).as("address"),
      array(lit(CrcHubTransferTopic), word(col("user_id")), word(col("user_id") + 2000000L)).as("topics"),
      word(col("event_id")).as("data"))
    val logs = when(col("event_type") === "purchase", array(transferLog))
      .when(col("event_type") === "signup", array(trustLog))
      .when(col("event_type") === "view", array(orgLog))
      .when(col("event_type") === "click", array(hubLog, transferLog))
      .otherwise(array().cast("array<struct<address:string,topics:array<string>,data:string>>"))
    val txs = events.select(
      concat(lit("0x"), md5(col("event_id").cast("string"))).as("hash"),
      user.as("from"), other.as("to"),
      when(col("event_type") === "error", lit("1000000")).otherwise(lit("0")).as("value"),
      when(col("event_type") === "error", lit("0x")).otherwise(lit("0xdeadbeef")).as("input"),
      logs.as("logs"),
      col("event_id"))
    txs
  }

  /** The crc_current_trust view: latest limit per (user, can_send_to) edge
    * over extracted trust details — receipts → details → state view, the
    * full reference pipeline composed from this module + StateOps'
    * max_by-shaped latest-per-key (1 shuffle, no sort).
    */
  def currentTrustGraph(trustDetails: DataFrame, orderCol: String = "hash"): DataFrame =
    trustDetails
      .groupBy("user", "can_send_to")
      .agg(max_by(col("limit"), col(orderCol)).as("limit"))
      .where(col("limit") > 0) // limit 0 == revoked edge
      .orderBy("user", "can_send_to")

  /** CrcHubTransferDetailExtractor.cs:10 — (from, to, amount) of the hub
    * transfer log; value stays a hex word (uint256-safe), like the
    * reference's `value text` column.
    */
  def extractHubTransfers(txs: DataFrame, hub: String = DefaultHubAddress): DataFrame =
    txs
      .where(isCrcHubTransfer(col("logs"), hub))
      .select(col("hash"), explode(filter(col("logs"), l =>
        array_contains(l.getField("topics"), CrcHubTransferTopic) &&
          l.getField("address") === hub &&
          size(l.getField("topics")) === 3)).as("log"))
      .select(
        col("hash"),
        topicAddress(element_at(col("log.topics"), 2)).as("from"),
        topicAddress(element_at(col("log.topics"), 3)).as("to"),
        col("log.data").as("value_hex"))

  /** CrcSignupDetailExtractor.cs:11 — (user, token) from the validated
    * 3-log signup receipt. (The reference's `owners text[]` column comes
    * from a live getOwners() contract call, not from logs — out of scope
    * for a log-derived pipeline; left null downstream.)
    */
  def extractSignups(txs: DataFrame, hub: String = DefaultHubAddress): DataFrame =
    txs
      .where(isCrcSignup(col("logs"), hub))
      .select(col("hash"), explode(filter(col("logs"), l =>
        array_contains(l.getField("topics"), CrcSignupTopic) &&
          l.getField("address") === hub)).as("log"))
      .select(
        col("hash"),
        topicAddress(element_at(col("log.topics"), 2)).as("user"),
        concat(lit("0x"), substring(col("log.data"), 27, 40)).as("token"))

  /** CrcOrganisationSignupDetailExtractor.cs — (organisation). */
  def extractOrgSignups(txs: DataFrame, hub: String = DefaultHubAddress): DataFrame =
    txs
      .select(col("hash"), explode(filter(col("logs"), l => isCrcOrgSignupLog(l, hub))).as("log"))
      .select(col("hash"), topicAddress(element_at(col("log.topics"), 2)).as("organisation"))

  /** CrcTrustDetailExtractor.cs:13 — (user, canSendTo, limit). */
  def extractTrusts(txs: DataFrame, hub: String = DefaultHubAddress): DataFrame =
    txs.select(col("hash"), explode(filter(col("logs"), l => isCrcTrustLog(l, hub))).as("log"))
      .select(
        col("hash"),
        topicAddress(element_at(col("log.topics"), 3)).as("user"),
        topicAddress(element_at(col("log.topics"), 2)).as("can_send_to"),
        conv(regexp_replace(col("log.data"), "^0x", ""), 16, 10).cast("long").as("limit"))
}
