package graft

import graft.operators.{Integrity, ReceiptClassifier, StateOps}
import graft.operators.ReceiptClassifier._
import org.apache.spark.sql.functions._

/** The whole reference flow in one batch pass over synthetic receipts:
  *
  *   receipts → classify → extract details → staging dedup + incremental
  *   import → derived views (balances, current trust) → gap check
  *
  * mirroring `[BlockSource] → … → [Classify] → [Extract] → [Staging] →
  * [Import]` (README "How it works") plus the downstream Circles views.
  */
class EndToEndPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val hub = DefaultHubAddress
  private val u1 = "0x1000000000000000000000000000000000000001"
  private val u2 = "0x1000000000000000000000000000000000000002"
  private val tok = "0x2000000000000000000000000000000000000001"
  private def word(a: String) = "0x" + "0" * 24 + a.drop(2)
  private def hexWord(v: Long) = "0x" + f"$v%064x"

  private def transfer(from: String, to: String, amt: Long) =
    Log(tok, Seq(TransferTopic, word(from), word(to)), hexWord(amt))
  private def trust(canSendTo: String, user: String, limit: Long) =
    Log(hub, Seq(CrcTrustTopic, word(canSendTo), word(user)), hexWord(limit))

  test("receipts → classify → extract → import → views → gap check") {
    // block-tx stream with a duplicate (staging tolerates dups) and a gap
    // (tx 3 missing)
    val txs = Seq(
      Tx("0xt0", u1, hub, "0", "0xdeadbeef", Seq(transfer(u1, u2, 100), trust(u2, u1, 50))),
      Tx("0xt1", u2, hub, "0", "0xdeadbeef", Seq(transfer(u2, u1, 30))),
      Tx("0xt1", u2, hub, "0", "0xdeadbeef", Seq(transfer(u2, u1, 30))), // dup
      Tx("0xt2", u1, hub, "0", "0xdeadbeef", Seq(trust(u2, u1, 80))), // trust update
      Tx("0xt4", u1, u2, "5", "0x", Nil) // eth transfer; tx index 3 missing
    ).toDF()

    // classify (flags) — every row classified, none Unknown except none here
    val classified = classify(txs)
    val classes = classified.select("hash", "classification").as[(String, String)]
      .collect().toMap
    assert(classes("0xt0") == "Erc20Transfer,CrcTrust")
    assert(classes("0xt4") == "EoaEthTransfer")

    // staging dedup + incremental import on tx hash (main starts with 0xt0)
    val staging = classified
    val main = classified.where($"hash" === "0xt0")
    val imported = Integrity.incrementalImport(staging, main, "hash")
    assert(imported.select("hash").as[String].collect().sorted.toSeq ==
      Seq("0xt1", "0xt2", "0xt4"))

    // extract details from the full imported set
    val all = main.unionAll(imported)
    val transfers = extractErc20Transfers(all)
    assert(transfers.count() == 2)

    // balances view: Σ received − Σ sent per address
    val amounts = transfers.withColumn("amt",
      conv(regexp_replace($"value_hex", "^0x", ""), 16, 10).cast("long"))
    val recv = amounts.groupBy($"to".as("addr")).agg(sum("amt").as("in_amt"))
    val sent = amounts.groupBy($"from".as("addr")).agg(sum("amt").as("out_amt"))
    val balances = recv.join(sent, Seq("addr"), "full_outer")
      .select($"addr",
        (coalesce($"in_amt", lit(0L)) - coalesce($"out_amt", lit(0L))).as("balance"))
      .as[(String, Long)].collect().toMap
    assert(balances(u1) == -70L && balances(u2) == 70L)

    // current trust view: later tx (0xt2) wins over 0xt0
    val trustNow = currentTrustGraph(extractTrusts(all)).as[(String, String, Long)].collect()
    assert(trustNow.toSeq == Seq((u1, u2, 80L)))

    // gap check over imported tx indexes (hash suffix as the sequence)
    val seq = all.select(substring($"hash", 4, 10).cast("long").as("idx"))
    val gaps = Integrity.gaps(seq, "idx").as[(Long, Long)].collect().toSeq
    assert(gaps == Seq((3L, 3L))) // tx 3 was never imported → re-request
  }

  test("imported receipts → timeline + ledger, ledger reconciles the balances") {
    import graft.operators.CirclesViews
    val txs = Seq(
      Tx("0xt0", u1, hub, "0", "0xdeadbeef", Seq(transfer(u1, u2, 100), trust(u2, u1, 50))),
      Tx("0xt1", u2, hub, "0", "0xdeadbeef", Seq(transfer(u2, u1, 30))),
      Tx("0xt2", u1, hub, "0", "0xdeadbeef", Seq(trust(u2, u1, 80))),
      Tx("0xt4", u1, u2, "5", "0x", Nil)
    ).toDF()
    // signup registry: u1 is a person owning tok (so tok transfers are
    // CRC); u2 an organisation
    val registry = Seq(("0xs1", u1, tok), ("0xs2", u2, null)).toDF("hash", "user", "token")
    def dec(c: org.apache.spark.sql.Column) =
      graft.functions.HexUtils.hexLongGuarded(regexp_replace(c, "^0x", ""))
    val erc20 = extractErc20Transfers(txs)
      .withColumn("value", dec($"value_hex").cast("string")).drop("value_hex")
    val hubT = extractHubTransfers(txs)
      .withColumn("value", dec($"value_hex").cast("string")).drop("value_hex")
    val timeline = CirclesViews.safeTimeline(registry, extractTrusts(txs), hubT,
      erc20, extractEthTransfers(txs), extractSafeEthTransfers(txs))
      .as[(String, String, String, String, String, String)].collect().toSet
    assert(timeline == Set(
      ("0xs1", "CrcSignup", u1, u1, "self", "0"),
      ("0xs2", "CrcSignup", u2, u2, "self", "0"),
      ("0xt0", "CrcTrust", u2, u1, "out", "50"),
      ("0xt0", "CrcTrust", u1, u2, "in", "50"),
      ("0xt2", "CrcTrust", u2, u1, "out", "80"),
      ("0xt2", "CrcTrust", u1, u2, "in", "80"),
      // tok transfers are CRC → ledger territory, never Erc20Transfer legs
      ("0xt4", "EthTransfer", u1, u2, "out", "5"),
      ("0xt4", "EthTransfer", u2, u1, "in", "5")))
    // double-entry ledger over the CRC transfers, rolled up per safe —
    // must reconcile the balances the first test computed by hand
    val ledger = CirclesViews.ledger(
      erc20.withColumn("value", $"value".cast("long")), registry)
    val bySafe = CirclesViews.balancesBySafe(ledger)
      .as[(String, Double)].collect().toMap
    assert(bySafe == Map(u1 -> -70.0, u2 -> 70.0))
    assert(ledger.agg(sum($"value")).as[Double].head() == 0.0)
  }
}
