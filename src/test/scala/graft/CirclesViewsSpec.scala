package graft

import graft.operators.CirclesViews
import org.apache.spark.sql.functions._

class CirclesViewsSpec extends SparkSpec {
  import spark.implicits._

  // hand-built detail frames (hashes double as the monotonic order)
  private def transfers = Seq(
    ("0xa1", "tokA", "u1", "u2", 100L),
    ("0xa2", "tokA", "u2", "u3", 30L),
    ("0xa3", "tokB", "u1", "u3", 10L)
  ).toDF("hash", "token", "from", "to", "value")

  private def trusts = Seq(
    ("0xa1", "u2", "u1", 50L),
    ("0xa4", "u2", "u1", 80L), // later update wins
    ("0xa2", "u3", "u2", 100L)
  ).toDF("hash", "user", "can_send_to", "limit")

  private def signups = Seq(("0xs1", "u1", "tokA"), ("0xs2", "u2", "tokB"))
    .toDF("hash", "user", "token")
  private def orgSignups = Seq(("0xo1", "org1")).toDF("hash", "organisation")

  test("currentTrust: latest limit, history count, last change") {
    val r = CirclesViews.currentTrust(trusts)
      .as[(String, String, Long, Long, String)].collect().toSet
    assert(r == Set(
      ("u2", "u1", 80L, 2L, "0xa4"),
      ("u3", "u2", 100L, 1L, "0xa2")))
  }

  test("balancesBySafeAndToken: signed single-pass per (address, token)") {
    val r = CirclesViews.balancesBySafeAndToken(transfers)
      .select("safe_address", "token", "balance")
      .as[(String, String, Double)].collect().toSet
    assert(r.contains(("u2", "tokA", 70.0))) // +100 −30
    assert(r.contains(("u3", "tokA", 30.0)))
    assert(r.contains(("u1", "tokA", -100.0)))
    assert(r.contains(("u3", "tokB", 10.0)))
  }

  test("allAddresses: distinct registry across event kinds") {
    val r = CirclesViews.allAddresses(transfers, trusts, signups, orgSignups)
    assert(r.where($"address" === "org1").count() == 1)
    assert(r.select("address").distinct().count() >= 4)
    assert(r.count() == r.distinct().count())
  }

  test("allSignups: persons and organisations unified") {
    val r = CirclesViews.allSignups(signups, orgSignups).collect()
    assert(r.length == 3)
    assert(r.exists(x => x.getString(1) == "org1" && x.isNullAt(2)))
  }

  test("capacityGraph: balance x latest trust limit via token owner") {
    val balances = CirclesViews.balancesBySafeAndToken(transfers)
    val trust = CirclesViews.currentTrust(trusts)
    val g = CirclesViews.capacityGraph(balances, trust, signups)
      .select("token_holder", "token", "can_send_to", "capacity")
      .as[(String, String, String, Double)].collect().toSet
    // tokB's owner is u2; u2's current trust edge is (user=u2 →
    // can_send_to=u1, limit 80): holder u3's 10 tokB can flow to u1 with
    // capacity 10·80/100 = 8
    assert(g == Set(("u3", "tokB", "u1", 8.0)))
    // tokA's owner u1 has no edges where user==u1 → no tokA capacity
    assert(!g.exists(_._2 == "tokA"))
  }

  // --- crc_capacity_graph_2/_3 (0.0.64.sql:945,1107) ---------------------

  // every CASE arm of the catalog formula gets a row: regular receiver
  // with holdings + already-held deduction, org receiver, own-token
  // receiver, limit-0 edge, missing-own-holdings NULL propagation,
  // negative-balance holder exclusion, from=to self filter
  private def capTransfers = Seq(
    ("0xt1", "tokA", "alice", "carol", 100L), // carol holds 100 tokA
    ("0xt2", "tokA", "alice", "bob", 20L),    // bob already holds 20 tokA
    ("0xt3", "tokB", zero, "bob", 200L),      // bob mints own token
    ("0xt4", "tokB", "bob", "alice", 80L),    // alice holds 80 tokB; bob own=120
    ("0xt5", "tokC", "carol", "bob", 40L),    // bob holds 40 tokC; carol −40
    ("0xt6", "tokC", zero, "carol", 50L)      // carol own tokC = 10
  ).toDF("hash", "token", "from", "to", "value")
  private def capTrusts = Seq(
    ("0xh1", "alice", "bob", 50L),   // bob accepts tokA at 50%
    ("0xh2", "bob", "org1", 60L),    // org receiver arm
    ("0xh3", "carol", "carol", 100L),// own-token receiver arm (self-trust)
    ("0xh4", "bob", "carol", 0L),    // revoked edge arm
    ("0xh5", "carol", "eve", 40L)    // receiver with NO balance rows → NULL
  ).toDF("hash", "user", "can_send_to", "limit")
  private def capSignups = Seq(
    ("0xs1", "alice", "tokA"), ("0xs2", "bob", "tokB"), ("0xs3", "carol", "tokC")
  ).toDF("hash", "user", "token")
  private def capOrgs = Seq("org1").toDF("organisation")

  test("capacityGraph2: every catalog CASE arm against hand-computed capacities") {
    val g = CirclesViews.capacityGraph2(
        CirclesViews.balancesBySafeAndToken(capTransfers),
        CirclesViews.currentTrust(capTrusts), capSignups, capOrgs)
      .as[(String, String, String, Option[Double], Long)].collect().toSet
    assert(g == Set(
      // regular arm: bob's own 120·50% = 60, minus already-held 20 scaled
      // by (100−50)% = 10 → 50, minus the catalog's 1 → 49
      ("carol", "bob", "alice", Some(49.0), 50L),
      // org receivers take the sender's full balance
      ("alice", "org1", "bob", Some(80.0), 60L),
      ("bob", "org1", "bob", Some(120.0), 60L),
      // own-token receiver takes the sender's full balance
      ("bob", "carol", "carol", Some(40.0), 100L),
      // limit-0 edges carry zero capacity (not dropped)
      ("alice", "carol", "bob", Some(0.0), 0L),
      ("bob", "carol", "bob", Some(0.0), 0L),
      // receiver with no own-token balance row: NULL propagates like the
      // Postgres CASE arms (no invented zero)
      ("bob", "eve", "carol", None, 40L),
      ("carol", "eve", "carol", None, 40L)))
    // the self pair (bob holds tokA, bob trusted for tokA) and every
    // negative-balance holder (alice's tokA = −120) are excluded
    assert(!g.exists(r => r._1 == r._2))
    assert(!g.exists(r => r._1 == "alice" && r._3 == "alice"))
  }

  test("capacityGraph3: min(net, from_balance) capacity + block provenance") {
    val blocks = Seq(
      ("0xt1", 1L), ("0xt2", 2L), ("0xt3", 3L), ("0xt4", 4L), ("0xt5", 5L),
      ("0xt6", 6L), ("0xh1", 11L), ("0xh2", 12L), ("0xh3", 13L), ("0xh4", 14L),
      ("0xh5", 15L)
    ).toDF("hash", "number").withColumn("ts", lit(null).cast("timestamp"))
    val g = CirclesViews.capacityGraph3(
        CirclesViews.balancesBySafeAndToken(capTransfers),
        CirclesViews.currentTrust(capTrusts), capSignups, capOrgs, blocks)
      .as[(String, String, String, Option[Double], Option[Long], Option[Long],
           Option[Long], Option[Long])].collect()
      .map(r => (r._1, r._2, r._3) -> r).toMap
    // no −1 margin in _3: 60 − 10 = 50, min(50, 100) = 50; provenance =
    // trust 0xh1→11, carol's tokA last move 0xt1→1, bob's tokA 0xt2→2,
    // bob's own tokB last move 0xt4→4
    assert(g(("carol", "bob", "alice")) ==
      ("carol", "bob", "alice", Some(50.0), Some(11L), Some(1L), Some(2L), Some(4L)))
    // _3 has no limit>0 gate, but a 0-limit edge still nets 10·0% − 0 = 0
    assert(g(("alice", "carol", "bob"))._4 == Some(0.0))
    // NULL own-holdings → NULL capacity and NULL holdings provenance
    assert(g(("bob", "eve", "carol"))._4.isEmpty &&
      g(("bob", "eve", "carol"))._8.isEmpty)
  }

  test("capacityGraph1: original catalog arms — registration gate, zero arm, clamp") {
    // v1 takes ONE unified registry (orgs = null-token rows) and requires
    // the receiver to be registered; frank exists to exercise the regular
    // and clamp-at-balance arms (no tokC holdings, 100-limit edge)
    val v1Signups = capSignups.unionByName(
      Seq(("0xo1", "org1", null.asInstanceOf[String]), ("0xs4", "frank", "tokF"))
        .toDF("hash", "user", "token"))
    val v1Trusts = capTrusts.unionByName(
      Seq(("0xh6", "carol", "frank", 100L)).toDF("hash", "user", "can_send_to", "limit"))
    val g = CirclesViews.capacityGraph1(
        CirclesViews.balancesBySafeAndToken(capTransfers),
        CirclesViews.currentTrust(v1Trusts), v1Signups)
      .as[(String, String, String, Double, String, Boolean, Double)].collect().toSet
    assert(g == Set(
      // zero arm: alice's own tokA balance is −120 → mta −60 < bob's held
      // 20 (> 0) → capacity 0 (not negative, not clamped)
      ("carol", "tokA", "alice", 100.0, "bob", false, 0.0),
      // org receivers take the holder's full balance
      ("bob", "tokB", "bob", 120.0, "org1", true, 120.0),
      ("alice", "tokB", "bob", 80.0, "org1", true, 80.0),
      // own-token receiver takes the holder's full balance
      ("bob", "tokC", "carol", 40.0, "carol", false, 40.0),
      // regular arm: carol's own tokC = 10, limit 100 → mta 10; frank holds
      // none → maxCap 10 < bob's 40 → 10
      ("bob", "tokC", "carol", 40.0, "frank", false, 10.0),
      // clamp at the holder's balance: maxCap 10 is NOT < carol's 10 → 10
      ("carol", "tokC", "carol", 10.0, "frank", false, 10.0)))
    // v1 differences vs _2: unregistered receivers (eve) drop entirely,
    // limit-0 edges drop (strict > 0), self pairs and non-positive-balance
    // holders never appear
    assert(!g.exists(_._5 == "eve"))
    assert(!g.exists(r => r._1 == r._5))
    assert(g.forall(_._4 > 0))
  }

  test("capacityChangesSince: provenance OR filter, null provenance = unchanged") {
    // 0xh5 (the eve edges' trust hash) deliberately has NO block row →
    // null trust provenance, which the reference's null comparison treats
    // as unchanged: those edges pass only via their balance provenance
    val blocks = Seq(
      ("0xt1", 1L), ("0xt2", 2L), ("0xt3", 3L), ("0xt4", 4L), ("0xt5", 5L),
      ("0xt6", 6L), ("0xh1", 11L), ("0xh2", 12L), ("0xh3", 13L), ("0xh4", 14L)
    ).toDF("hash", "number").withColumn("ts", lit(null).cast("timestamp"))
    def delta(since: Long) = CirclesViews.capacityChangesSince(
        CirclesViews.balancesBySafeAndToken(capTransfers),
        CirclesViews.currentTrust(capTrusts), capSignups, capOrgs, blocks, since)
      .select("from", "to", "token_owner")
      .as[(String, String, String)].collect().toSet
    // hand-derived: trust edges 0xh2..0xh4 changed at blocks 12–14; the
    // eve edges' balances last moved at 5 (bob tokC) and 6 (carol tokC)
    assert(delta(12L) == Set(
      ("alice", "org1", "bob"), ("bob", "org1", "bob"),
      ("bob", "carol", "carol"), ("alice", "carol", "bob"),
      ("bob", "carol", "bob")))
    // (carol,bob,alice): trust block 11, balance block 1
    assert(delta(11L).contains(("carol", "bob", "alice")))
    assert(!delta(12L).contains(("carol", "bob", "alice")))
    // balance-side arm: carol's tokC position last moved at block 6 (0xt6)
    assert(delta(6L).contains(("carol", "eve", "carol")))
    assert(!delta(7L).contains(("carol", "eve", "carol")))
    // a floor sinceBlock returns the whole capacity graph
    assert(delta(Long.MinValue).size == 8)
  }

  test("capacityChangesSince2: _2 arithmetic + same moved-edge set as the _3 feed") {
    val blocks = Seq(
      ("0xt1", 1L), ("0xt2", 2L), ("0xt3", 3L), ("0xt4", 4L), ("0xt5", 5L),
      ("0xt6", 6L), ("0xh1", 11L), ("0xh2", 12L), ("0xh3", 13L), ("0xh4", 14L)
    ).toDF("hash", "number").withColumn("ts", lit(null).cast("timestamp"))
    def d2(since: Long) = CirclesViews.capacityChangesSince2(
      CirclesViews.balancesBySafeAndToken(capTransfers),
      CirclesViews.currentTrust(capTrusts), capSignups, capOrgs, blocks, since)
    def d3Keys(since: Long) = CirclesViews.capacityChangesSince(
        CirclesViews.balancesBySafeAndToken(capTransfers),
        CirclesViews.currentTrust(capTrusts), capSignups, capOrgs, blocks, since)
      .select("from", "to", "token_owner")
      .as[(String, String, String)].collect().toSet
    // independent cross-check: the _2 inline-recompute filter and the _3
    // provenance filter select the SAME moved-edge key set at every cut
    for (since <- Seq(Long.MinValue, 6L, 7L, 11L, 12L, 15L))
      assert(d2(since).select("token_holder", "can_send_to", "token_owner")
        .as[(String, String, String)].collect().toSet == d3Keys(since),
        s"moved-edge sets diverge at since=$since")
    // but the VALUES are the _2 formula: 60 − 10 − 1 margin = 49 (the _3
    // feed reports 50 for the same edge)
    val m = d2(11L).as[(String, String, String, Option[Double])]
      .collect().map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(m(("carol", "alice", "bob")) == Some(49.0))
    // limit-0 edge: _2 gates to 0.0 (present, not dropped)
    assert(d2(12L).as[(String, String, String, Option[Double])].collect()
      .exists(r => r._1 == "alice" && r._3 == "carol" && r._4 == Some(0.0)))
  }

  test("erc20BalancesBySafeAndToken: non-CRC only, registry legs, self collapse") {
    val all = CirclesViews.allSignups(capSignups, Seq(("0xo1", "org1")).toDF("hash", "organisation"))
    val tx = capTransfers.unionAll(Seq(
      ("0xn1", "tokX", "alice", "dave", 30L), // dave unregistered → leg dropped
      ("0xn2", "tokX", "dave", "bob", 10L),
      ("0xn3", "tokX", "alice", "alice", 5L)  // self transfer → ONE out leg
    ).toDF("hash", "token", "from", "to", "value"))
    val r = CirclesViews.erc20BalancesBySafeAndToken(tx, all)
      .as[(String, String, Double, String)].collect().toSet
    // CRC tokens (tokA/B/C) are absent entirely; only tokX rows remain
    assert(r == Set(
      ("alice", "tokX", -35.0, "0xn3"),
      ("bob", "tokX", 10.0, "0xn2")))
  }

  // --- SQL-migration view catalog (0.0.64.sql) ---------------------------

  private val zero = "0x" + "0" * 40
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def catSignups = Seq(
    ("0xs1", "u1", "tokA"), ("0xs2", "u2", "tokB"), ("0xs3", "u3", null)
  ).toDF("hash", "user", "token")
  private def catTransfers = Seq(
    ("0xa1", "tokA", "u1", "u2", 100L), // CRC: ledger only, not timeline
    ("0xa2", "tokC", "u1", "u9", 7L),   // non-CRC, out only (u9 unregistered)
    ("0xa3", "tokC", "u2", "u2", 5L),   // non-CRC self transfer
    ("0xm1", "tokA", zero, "u1", 50L),  // CRC mint
    ("0xm2", "tokC", zero, "u9", 11L),  // non-CRC mint (erc20_minting only)
    ("0xh1", "tokA", "u1", "u2", 40L)   // the hub transfer's erc20 step
  ).toDF("hash", "token", "from", "to", "value")
  private def catHub = Seq(("0xh1", "u1", "u2", "40"), ("0xh2", "u1", "u9", "4"))
    .toDF("hash", "from", "to", "value")
  private def catTrusts = Seq(("0xt1", "u2", "u1", 50L), ("0xt2", "u3", "u3", 10L))
    .toDF("hash", "user", "can_send_to", "limit")
  private def catEth = Seq(("0xe1", "u9", "u1", "9")).toDF("hash", "from", "to", "value")
  private def catSafeEth = Seq(("0xse1", "0xinit", "u9", "u2", "3"))
    .toDF("hash", "initiator", "from", "to", "value")
  private def catTimeline(withObj: Boolean = false) =
    CirclesViews.safeTimeline(catSignups, catTrusts, catHub,
      catTransfers.withColumn("value", $"value".cast("string")), catEth, catSafeEth,
      withObj = withObj)

  test("safeTimeline: every leg, direction arms, self collapse, registry restriction") {
    val t = catTimeline()
      .select("hash", "type", "safe_address", "contact_address", "direction", "value")
      .as[(String, String, String, String, String, String)].collect().toSet
    // hand-derived from the fixtures per the catalog's CASE arms
    // (0.0.64.sql:1417-1545): CRC-token transfers appear only as
    // CrcMinting (0xm1) or inside the ledger — never as Erc20Transfer
    val expected = Set(
      ("0xs1", "CrcSignup", "u1", "u1", "self", "0"),
      ("0xs2", "CrcSignup", "u2", "u2", "self", "0"),
      ("0xs3", "CrcSignup", "u3", "u3", "self", "0"),
      ("0xt1", "CrcTrust", "u1", "u2", "out", "50"),
      ("0xt1", "CrcTrust", "u2", "u1", "in", "50"),
      ("0xt2", "CrcTrust", "u3", "u3", "self", "10"),
      ("0xh1", "CrcHubTransfer", "u1", "u2", "out", "40"),
      ("0xh1", "CrcHubTransfer", "u2", "u1", "in", "40"),
      ("0xh2", "CrcHubTransfer", "u1", "u9", "out", "4"),
      ("0xm1", "CrcMinting", "u1", zero, "in", "50"),
      ("0xe1", "EthTransfer", "u1", "u9", "in", "9"),
      ("0xa2", "Erc20Transfer", "u1", "u9", "out", "7"),
      ("0xa3", "Erc20Transfer", "u2", "u2", "self", "5"),
      ("0xse1", "GnosisSafeEthTransfer", "u2", "u9", "in", "3"))
    assert(t == expected)
  }

  test("safeTimeline obj: hub transitive_path steps, absent elsewhere") {
    val t = catTimeline(withObj = true)
    val hubObjs = t.where($"type" === "CrcHubTransfer" && $"hash" === "0xh1")
      .select(get_json_object($"obj", "$.transactionHash"),
        get_json_object($"obj", "$.flow"),
        get_json_object($"obj", "$.transfers[0].token"),
        get_json_object($"obj", "$.transfers[0].value"))
      .as[(String, String, String, String)].collect().toSet
    assert(hubObjs == Set(("0xh1", "40", "tokA", "40")))
    // a hub tx with no crc steps keeps a well-formed obj with null transfers
    // (one row: 0xh2's 'in' side u9 is unregistered)
    assert(t.where($"hash" === "0xh2" && $"obj".isNotNull).count() == 1)
    assert(t.where($"type" =!= "CrcHubTransfer" && $"obj".isNotNull).count() == 0)
  }

  test("ledger: double-entry add/remove rows, token-owner attributed, Σ = 0") {
    val l = CirclesViews.ledger(catTransfers, catSignups)
    val rows = l.as[(String, String, Double, String, String, String, String)]
      .collect().toSet
    assert(rows == Set(
      ("0xa1", "add", 100.0, "tokA", "u1", "to", "u2"),
      ("0xa1", "remove", -100.0, "tokA", "u1", "from", "u1"),
      ("0xm1", "add", 50.0, "tokA", "u1", "to", "u1"),
      ("0xm1", "remove", -50.0, "tokA", "u1", "from", zero),
      ("0xh1", "add", 40.0, "tokA", "u1", "to", "u2"),
      ("0xh1", "remove", -40.0, "tokA", "u1", "from", "u1")))
    // the double-entry invariant the catalog's auditors rely on
    assert(l.agg(sum($"value")).as[Double].head() == 0.0)
  }

  test("balancesBySafe reconciles with balancesBySafeAndToken on CRC tokens") {
    val ledgerBal = CirclesViews.balancesBySafe(CirclesViews.ledger(catTransfers, catSignups))
      .as[(String, Double)].collect().toSet
    val crcOnly = catTransfers.join(
      catSignups.where($"token".isNotNull).select("token").distinct(),
      Seq("token"), "left_semi")
    val viewBal = CirclesViews.balancesBySafeAndToken(crcOnly)
      .groupBy($"safe_address").agg(sum($"balance").as("balance"))
      .as[(String, Double)].collect().toSet
    assert(ledgerBal == viewBal)
    assert(ledgerBal == Set(("u1", -90.0), ("u2", 140.0), (zero, -50.0)))
  }

  test("minting views: transfers from 0x0, CRC attribution, total") {
    assert(CirclesViews.erc20Minting(catTransfers).select("hash")
      .as[String].collect().toSet == Set("0xm1", "0xm2"))
    assert(CirclesViews.crcMinting(catTransfers, catSignups)
      .select("hash", "token_owner").as[(String, String)].collect().toSet ==
      Set(("0xm1", "u1")))
    assert(CirclesViews.totalMinted(catTransfers, catSignups).as[Double].head() == 50.0)
  }

  test("safeAcceptedCrc: latest trust edge per (safe, accepted token, owner)") {
    val tr = Seq(
      ("0xt1", "u2", "u1", 50L), // u1 accepts u2's token at 50…
      ("0xt4", "u2", "u1", 80L), // …then 80 (later order wins)
      ("0xt2", "u3", "u1", 10L), // u3 owns no token (org) → no accepted row
      ("0xt3", "u1", "u2", 25L)
    ).toDF("hash", "user", "can_send_to", "limit")
    val r = CirclesViews.safeAcceptedCrc(tr, catSignups)
      .as[(String, String, String, Long, String)].collect().toSet
    assert(r == Set(
      ("u1", "tokB", "u2", 80L, "0xt4"),
      ("u2", "tokA", "u1", 25L, "0xt3")))
  }

  test("alive/dead accounts: strict horizon split on last CRC-transfer recency") {
    val blocks = Seq(
      ("0xa1", ts("2024-01-02 00:00:00")), ("0xa3", ts("2024-01-03 00:00:00")),
      ("0xh1", ts("2024-01-06 00:00:00")), ("0xb1", ts("2024-01-08 00:00:00")),
      ("0xm1", ts("2024-01-10 00:00:00")), ("0xa2", ts("2024-01-11 00:00:00"))
    ).toDF("hash", "ts")
    val crc = catTransfers
      .union(Seq(("0xb1", "tokA", "u9", "u3", 1L)).toDF("hash", "token", "from", "to", "value"))
      .join(catSignups.where($"token".isNotNull).select("token").distinct(),
        Seq("token"), "left_semi")
    // frontier = 01-11 (block 0xa2), horizon 3d → cutoff 01-08
    val alive = CirclesViews.aliveAccounts(crc, blocks, horizonDays = 3).as[String].collect().toSet
    val dead = CirclesViews.deadAccounts(crc, blocks, horizonDays = 3).as[String].collect().toSet
    assert(alive == Set("u1")) // last seen 01-10 (the mint)
    assert(dead == Set("u2"))  // last seen 01-06
    // u3's last transfer lands exactly ON the cutoff: the catalog's strict
    // inequalities put a boundary account in NEITHER view
    assert(!alive.contains("u3") && !dead.contains("u3"))
  }

  test("trustHistoryScd: validity intervals, re-states collapse, open row") {
    // edge history: 50 (blk1), 50 re-stated (blk2), 80 (blk3), 0 (blk5)
    val tr = Seq(
      ("0xc1", "u1", "v1", 50L), ("0xc2", "u1", "v1", 50L),
      ("0xc3", "u1", "v1", 80L), ("0xc5", "u1", "v1", 0L),
      ("0xc4", "u2", "v2", 30L)
    ).toDF("hash", "user", "can_send_to", "limit")
    val blocks = Seq(("0xc1", 1L), ("0xc2", 2L), ("0xc3", 3L), ("0xc5", 5L),
      ("0xc4", 4L)).toDF("hash", "number")
    val r = CirclesViews.trustHistoryScd(tr, blocks)
      .as[(String, String, Long, Long, Option[Long])].collect().toSeq
    assert(r == Seq(
      ("u1", "v1", 50L, 1L, Some(3L)), // blk2 re-state opened no interval
      ("u1", "v1", 80L, 3L, Some(5L)),
      ("u1", "v1", 0L, 5L, None),      // revocation is a real SCD row
      ("u2", "v2", 30L, 4L, None)))
    // the open (valid_to IS NULL) slice is exactly currentTrust's state
    // (which keeps 0-limit rows — revocation is state, not absence)
    val open = r.filter(_._5.isEmpty).map(t => (t._1, t._2, t._3)).toSet
    val cur = CirclesViews.currentTrust(tr, orderCol = "hash")
      .select("user", "can_send_to", "limit")
      .as[(String, String, Long)].collect().toSet
    assert(open == cur)
  }

  test("trustAtBlock: range predicate over SCD == max_by over the cut history") {
    val tr = Seq(
      ("0xc1", "u1", "v1", 50L), ("0xc2", "u1", "v1", 50L),
      ("0xc3", "u1", "v1", 80L), ("0xc5", "u1", "v1", 0L),
      ("0xc4", "u2", "v2", 30L)
    ).toDF("hash", "user", "can_send_to", "limit")
    val blocks = Seq(("0xc1", 1L), ("0xc2", 2L), ("0xc3", 3L), ("0xc5", 5L),
      ("0xc4", 4L)).toDF("hash", "number")
    val scd = CirclesViews.trustHistoryScd(tr, blocks)
    def at(n: Long) = CirclesViews.trustAtBlock(scd, n)
      .as[(String, String, Long)].collect().toSet
    assert(at(2L) == Set(("u1", "v1", 50L)))           // re-state interval
    assert(at(3L) == Set(("u1", "v1", 80L)))           // boundary: new row wins
    assert(at(4L) == Set(("u1", "v1", 80L), ("u2", "v2", 30L)))
    assert(at(9L) == Set(("u1", "v1", 0L), ("u2", "v2", 30L))) // open rows
    assert(at(0L) == Set.empty)                        // before history
    // the UNCOLLAPSED form (what the maintained store keeps) answers every
    // cut identically: per key exactly one interval covers N in either
    // form — adjacent same-limit intervals agree on the limit
    val raw = CirclesViews.scdEventIntervals(
      tr.join(blocks.select("hash", "number"), "hash"))
    def atRaw(n: Long) = CirclesViews.trustAtBlock(raw, n)
      .as[(String, String, Long)].collect().toSet
    (0L to 9L).foreach(n => assert(atRaw(n) == at(n), s"cut at $n diverged"))
  }

  test("trustDelta: create/update/revocation arms; unchanged and flickering edges absent") {
    val tr = Seq(
      ("0xc1", "u1", "v1", 50L), // before A, then re-stated 80 between cuts
      ("0xc3", "u1", "v1", 80L),
      ("0xc4", "u2", "v2", 30L), // created between cuts
      ("0xc2", "u3", "v3", 40L), // before A, untouched → absent
      ("0xc5", "u4", "v4", 20L), // before A, revoked to 0 between cuts
      ("0xc6", "u4", "v4", 0L),
      ("0xc7", "u5", "v5", 10L), // created AND superseded between cuts:
      ("0xc8", "u5", "v5", 60L)  //   only the final state shows as create
    ).toDF("hash", "user", "can_send_to", "limit")
    val blocks = Seq("0xc1" -> 1L, "0xc2" -> 2L, "0xc3" -> 4L, "0xc4" -> 5L,
      "0xc5" -> 2L, "0xc6" -> 6L, "0xc7" -> 4L, "0xc8" -> 5L)
      .toDF("hash", "number")
    val scd = CirclesViews.trustHistoryScd(tr, blocks)
    val d = CirclesViews.trustDelta(scd, fromBlock = 3L, toBlock = 7L)
      .as[(String, String, String, Option[Long], Option[Long])].collect().toSeq
    assert(d == Seq(
      ("u1", "v1", "update", Some(50L), Some(80L)),
      ("u2", "v2", "create", None, Some(30L)),
      ("u4", "v4", "update", Some(20L), Some(0L)), // revocation is an update
      ("u5", "v5", "create", None, Some(60L))))
    // identical on the uncollapsed stored form (re-states land on different
    // cut rows but equal limits fall out of the change filter)
    val raw = CirclesViews.scdEventIntervals(
      tr.join(blocks.select("hash", "number"), "hash"))
    val dRaw = CirclesViews.trustDelta(raw, 3L, 7L)
      .as[(String, String, String, Option[Long], Option[Long])].collect().toSeq
    assert(dRaw == d)
    // from == to → empty changelog; applying the delta to state(from)
    // reproduces state(to) exactly
    assert(CirclesViews.trustDelta(scd, 3L, 3L).isEmpty)
    val before = CirclesViews.trustAtBlock(scd, 3L)
      .as[(String, String, Long)].collect()
      .map { case (u, c, l) => (u, c) -> l }.toMap
    val after = CirclesViews.trustAtBlock(scd, 7L)
      .as[(String, String, Long)].collect()
      .map { case (u, c, l) => (u, c) -> l }.toMap
    val applied = d.foldLeft(before) {
      case (st, (u, c, "delete", _, _)) => st - ((u, c))
      case (st, (u, c, _, _, Some(n))) => st + ((u, c) -> n)
      case (st, _) => st
    }
    assert(applied == after)
  }

  test("balancesAtBlock: ledger state rewinds to the block cut") {
    val blocks = Seq(("0xa1", ts("2024-01-01 10:00:00"), 1L),
      ("0xa2", ts("2024-01-02 10:00:00"), 2L), ("0xa3", ts("2024-01-03 10:00:00"), 3L)
    ).toDF("hash", "ts", "number")
    // after block 2: only 0xa1 (u1->u2 100 tokA) and 0xa2 (u2->u3 30 tokA)
    val r = CirclesViews.balancesAtBlock(transfers, blocks, 2L)
      .as[(String, String, Double, String)].collect().toSet
    assert(r == Set(
      ("u1", "tokA", -100.0, "0xa1"), ("u2", "tokA", 70.0, "0xa2"),
      ("u3", "tokA", 30.0, "0xa2")))
    // a cut past the frontier reproduces the full current view
    val full = CirclesViews.balancesBySafeAndToken(transfers)
      .as[(String, String, Double, String)].collect().toSet
    val late = CirclesViews.balancesAtBlock(transfers, blocks, 99L)
      .as[(String, String, Double, String)].collect().toSet
    assert(late == full)
  }

  test("trustChurnPerDay: creations/revocations from limit transitions only") {
    // edge (u1,c1): absent->50 (create, day1), 50->80 (re-state, day1),
    //   80->0 (revoke, day2), 0->30 (re-create, day3)
    // edge (u2,c2): absent->0 (never created: 0-limit first write, day1)
    val tr = Seq(
      ("0xb1", "u1", "c1", 50L), ("0xb2", "u1", "c1", 80L),
      ("0xb3", "u1", "c1", 0L), ("0xb4", "u1", "c1", 30L),
      ("0xb5", "u2", "c2", 0L)
    ).toDF("hash", "user", "can_send_to", "limit")
    val blocks = Seq(
      ("0xb1", ts("2024-01-01 10:00:00"), 1L), ("0xb2", ts("2024-01-01 12:00:00"), 2L),
      ("0xb3", ts("2024-01-02 10:00:00"), 3L), ("0xb4", ts("2024-01-03 10:00:00"), 4L),
      ("0xb5", ts("2024-01-01 11:00:00"), 5L)
    ).toDF("hash", "ts", "number")
    val r = CirclesViews.trustChurnPerDay(tr, blocks)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (ts("2024-01-01 00:00:00").getTime, 1L, 0L),
      (ts("2024-01-02 00:00:00").getTime, 0L, 1L),
      (ts("2024-01-03 00:00:00").getTime, 1L, 0L)))
  }

  test("perDayCounts: date-truncated counts through the block join") {
    val blocks = Seq(
      ("0xh1", ts("2024-01-06 10:00:00")), ("0xh2", ts("2024-01-06 23:59:59"))
    ).toDF("hash", "ts")
    val r = CirclesViews.perDayCounts(catHub, blocks, "transfers")
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((ts("2024-01-06 00:00:00").getTime, 2L)))
  }

  test("formattedView: block context attached, value rendered as text") {
    val blocks = Seq(
      ("0xa1", ts("2024-01-06 10:00:00"), 11L),
      ("0xa2", ts("2024-01-06 11:00:00"), 12L),
      ("0xa3", ts("2024-01-06 12:00:00"), 13L)
    ).toDF("hash", "ts", "number")
    val r = CirclesViews.formattedView(transfers, blocks)
    assert(r.schema("value").dataType == org.apache.spark.sql.types.StringType)
    val row = r.where(col("hash") === "0xa1")
      .select("token", "from", "to", "value", "ts_us", "block_number", "tx_index")
      .as[(String, String, String, String, Long, Long, Long)].collect().toSeq
    assert(row == Seq(("tokA", "u1", "u2", "100",
      ts("2024-01-06 10:00:00").getTime * 1000L, 11L, 0L)))
    assert(r.count() == 3)
  }

  test("crcTokenTransfer: only CRC-token transfers survive the registry semi join") {
    val blocks = Seq(
      ("0xa1", ts("2024-01-06 10:00:00"), 11L),
      ("0xa2", ts("2024-01-06 11:00:00"), 12L),
      ("0xa3", ts("2024-01-06 12:00:00"), 13L)
    ).toDF("hash", "ts", "number")
    // signups register tokA and tokB; add a transfer of an unregistered token
    val xfers = transfers.unionAll(
      Seq(("0xa4", "tokX", "u1", "u2", 5L)).toDF("hash", "token", "from", "to", "value"))
    val blocks4 = blocks.unionAll(Seq(("0xa4", ts("2024-01-06 13:00:00"), 14L))
      .toDF("hash", "ts", "number"))
    val r = CirclesViews.crcTokenTransfer(xfers, signups, blocks4)
    assert(r.select("hash").as[String].collect().toSet == Set("0xa1", "0xa2", "0xa3"))
  }

  test("getCapacity: args rows only when matched; calc rows always, null-propagating") {
    // owner o1 holds 100 of its own token; receiver r1 holds 40 of o1's
    // token and 200 of its own; r1 trusts o1 at 50%
    val bal = Seq(
      ("o1", "o1", 100.0), ("r1", "o1", 40.0), ("r1", "r1", 200.0),
      ("s1", "o1", 70.0)
    ).toDF("safe_address", "token_owner", "balance")
    val trust = Seq(("o1", "r1", 50L)).toDF("user", "can_send_to", "limit")
    val r = CirclesViews.getCapacity(bal, trust, from = "s1", to = "r1", tokenOwner = "o1")
      .as[(Int, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(r.map(_._1) == Seq(1, 2, 3, 4, 5, 6, 7, 8, 9))
    val byId = r.map(t => t._1 -> t._3).toMap
    assert(byId(1).contains(100.0) && byId(2).contains(40.0) &&
      byId(3).contains(70.0) && byId(4).contains(50.0) && byId(5).contains(200.0))
    assert(byId(6).contains(100.0))            // 200 * 50 / 100
    assert(byId(7).contains(20.0))             // 40 * (100-50) / 100
    assert(byId(8).contains(0.0))              // max >= held
    assert(byId(9).contains(80.0))             // 100 - 20

    // missing trust edge: arm 4 absent; 6/7 go null; 8 falls to else=0;
    // 9 = null - null = null — the reference's scalar-subquery semantics
    val r2 = CirclesViews.getCapacity(bal, trust.limit(0), from = "s1", to = "r1",
        tokenOwner = "o1")
      .as[(Int, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(r2.map(_._1) == Seq(1, 2, 3, 5, 6, 7, 8, 9))
    val byId2 = r2.map(t => t._1 -> t._3).toMap
    assert(byId2(6).isEmpty && byId2(7).isEmpty && byId2(9).isEmpty)
    assert(byId2(8).contains(0.0))

    // determinism valve: an owner mapping to MULTIPLE balance rows for the
    // same (safe_address, token_owner) key (multi-token owner after the
    // owners join) SUMS instead of picking an arbitrary row — the
    // reference's scalar subqueries would error; an arbitrary first() would
    // silently diverge between runs
    val balDup = bal.unionAll(Seq(("r1", "o1", 2.0))
      .toDF("safe_address", "token_owner", "balance"))
    val r3 = CirclesViews.getCapacity(balDup, trust, from = "s1", to = "r1",
        tokenOwner = "o1")
      .as[(Int, String, Option[Double])].collect().map(t => t._1 -> t._3).toMap
    assert(r3(2).contains(42.0)) // 40 + 2, not whichever row came first

    // plan shape: the four balance lookups are ONE conditional-agg scan —
    // exactly two leaf scans total (balances + trust), not five
    val plan = CirclesViews.getCapacity(bal, trust, from = "s1", to = "r1",
      tokenOwner = "o1").queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).length == 2,
      s"expected exactly 2 scans (balances + trust):\n$plan")
  }
}
