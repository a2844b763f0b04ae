package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.ReceiptClassifier._

/** Parity pins for the one-pass log-subset kernel
  * ([[graft.functions.LogOps.filterLogs]]) against the interpreted
  * filter-HOF spellings it replaced — including every null arm the HOF
  * resolves to a drop (null topics, null address, null element, null or
  * undecodable data) and the limit-range trust arm.
  */
class LogOpsSpec extends SparkSpec {
  import spark.implicits._

  private val hub = DefaultHubAddress

  // (address, topics, data) triples covering: clean matches for each
  // predicate family, wrong address / arity / limit, null address, null
  // topics, topics with a null element, null data, non-hex data, data
  // without 0x, limit 0/100/101, and a null log element.
  private val logsCases: Seq[Seq[(String, Seq[String], String)]] = {
    val w = (v: Long) => "0x" + ("%064x".format(v))
    Seq(
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), w(50))),             // clean trust
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), w(0))),              // limit 0
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), w(100))),            // limit 100
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), w(101))),            // limit 101 → drop
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), null)),              // null data → drop
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), "0xzz")),            // non-hex → drop
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), "%064x".format(7L))), // no 0x prefix
      Seq((hub, Seq(CrcTrustTopic, w(1)), w(50))),                   // arity 2 → drop
      Seq(("0xother", Seq(CrcTrustTopic, w(1), w(2)), w(50))),       // wrong addr
      Seq((null, Seq(CrcTrustTopic, w(1), w(2)), w(50))),            // null addr
      Seq((hub, null, w(50))),                                       // null topics
      Seq((hub, Seq(null, CrcTrustTopic, w(2)), w(50))),             // null topic elem
      Seq((hub, Seq(null, w(1), w(2)), w(50))),                      // not found + null elem
      Seq((hub, Seq(TransferTopic, w(1), w(2)), w(5))),              // erc20 at hub
      Seq(("0xtok", Seq(TransferTopic, w(1), w(2)), w(5))),          // erc20 elsewhere
      Seq(("0xtok", Seq(TransferTopic, w(1)), w(5))),                // erc20 arity 2
      Seq((hub, Seq(CrcSignupTopic, w(1)), "0x")),                   // signup topic
      Seq((hub, Seq(CrcOrgSignupTopic, w(1)), "0x")),                // org signup
      Seq((hub, Seq(CrcHubTransferTopic, w(1), w(2)), w(9))),        // hub transfer
      Seq(),                                                          // empty array
      null,                                                           // null array
      // mixed multi-log receipts
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), w(50)),
        ("0xtok", Seq(TransferTopic, w(1), w(2)), w(5)),
        (hub, Seq(CrcHubTransferTopic, w(1), w(2)), w(9))),
      Seq((hub, Seq(CrcTrustTopic, w(1), w(2)), w(200)),
        (hub, Seq(CrcTrustTopic, w(3), w(4)), w(99)))
    )
  }

  private def df = {
    val rows = logsCases.map(ls =>
      Tuple1(if (ls == null) null else ls.map { case (a, t, d) => (a, t, d) }))
    rows.toDF("raw").select(
      when(col("raw").isNotNull, transform(col("raw"), r =>
        struct(r.getField("_1").as("address"), r.getField("_2").as("topics"),
          r.getField("_3").as("data")))).as("logs"))
  }

  private def assertParity(kernel: Column, hof: Column, label: String): Unit = {
    val rows = df.select(kernel.as("k"), hof.as("h"))
      .select(to_json(col("k")).as("k"), to_json(col("h")).as("h"))
      .as[(Option[String], Option[String])].collect()
    rows.zipWithIndex.foreach { case ((k, h), i) =>
      assert(k == h, s"$label case $i: kernel=$k hof=$h")
    }
  }

  test("trust-log kernel matches the isCrcTrustLog filter HOF") {
    assertParity(
      graft.functions.LogOps.filterLogs(col("logs"), CrcTrustTopic,
        Some(hub), 3, Some((0L, 100L))),
      filter(col("logs"), l => isCrcTrustLog(l, hub)), "trust")
  }

  test("erc20 kernel matches the isErc20TransferLog filter HOF") {
    assertParity(
      graft.functions.LogOps.filterLogs(col("logs"), TransferTopic, None, 3),
      filter(col("logs"), l => isErc20TransferLog(l)), "erc20")
  }

  test("topic-containment kernel matches the bare array_contains filter") {
    for (t <- Seq(CrcSignupTopic, CrcHubTransferTopic, ExecutionSuccessTopic))
      assertParity(
        graft.functions.LogOps.filterLogs(col("logs"), t),
        filter(col("logs"), l => array_contains(l.getField("topics"), t)),
        s"topic $t")
  }

  test("addr+arity kernel matches the org-signup / signup / hub filters") {
    assertParity(
      graft.functions.LogOps.filterLogs(col("logs"), CrcOrgSignupTopic, Some(hub), 2),
      filter(col("logs"), l => isCrcOrgSignupLog(l, hub)), "org")
    assertParity(
      graft.functions.LogOps.filterLogs(col("logs"), CrcSignupTopic, Some(hub)),
      filter(col("logs"), l => array_contains(l.getField("topics"), CrcSignupTopic) &&
        l.getField("address") === hub), "signup")
    assertParity(
      graft.functions.LogOps.filterLogs(col("logs"), CrcHubTransferTopic, Some(hub), 3),
      filter(col("logs"), l => array_contains(l.getField("topics"), CrcHubTransferTopic) &&
        l.getField("address") === hub && size(l.getField("topics")) === 3), "hub")
  }

  test("kernel parity on the full demo receipt frame (sf0.001)") {
    val rr = demoReceipts(Tables.events(spark, "/root/testdata/sf0.001"))
    val k = graft.functions.LogOps.filterLogs(col("logs"), CrcTrustTopic,
      Some(hub), 3, Some((0L, 100L)))
    val h = filter(col("logs"), l => isCrcTrustLog(l, hub))
    val bad = rr.select(to_json(k).as("k"), to_json(h).as("h"))
      .where(!(col("k") <=> col("h"))).count()
    assert(bad == 0L)
  }
}
