package graft

import graft.operators.CirclesViews

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
}
