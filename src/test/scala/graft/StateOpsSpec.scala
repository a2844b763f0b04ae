package graft

import graft.operators.{Classify, StateOps}
import java.sql.Timestamp

class StateOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events = Seq(
    (0L, ts("2024-01-01 10:00:00"), 1L, "purchase", 100.0, """{"k": 2}"""),
    (1L, ts("2024-01-01 10:10:00"), 1L, "purchase", 50.0, """{"k": 3}"""),
    (2L, ts("2024-01-01 10:15:00"), 1L, "click", 30.0, """{"k": 4}"""),
    (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 10.0, """{"k": 5}"""),
    (4L, ts("2024-01-01 10:00:00"), 2L, "signup", 120.0, """{"k": 6}""")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("latestPerKey returns the last row per (user, type) by (ts, id)") {
    val r = StateOps.latestPerKey(events)
      .select("user_id", "event_type", "last_event_id", "last_value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(r.contains((1L, "purchase", 3L, 10.0)))
    assert(r.contains((1L, "click", 2L, 30.0)))
    assert(r.contains((2L, "signup", 4L, 120.0)))
  }

  test("balances: single-pass credits minus debits") {
    val r = StateOps.balances(events).where($"user_id" === 1L).collect()(0)
    assert(r.getAs[Double]("credits") == 160.0)
    assert(r.getAs[Double]("debits") == 30.0)
    assert(r.getAs[Double]("balance") == 130.0)
    assert(r.getAs[Long]("n_events") == 4L)
  }

  test("running balance accumulates in (ts, id) order") {
    val r = StateOps.runningBalance(events).where($"user_id" === 1L)
      .select("event_id", "balance_after").as[(Long, Double)].collect().toMap
    assert(r(0L) == 100.0 && r(1L) == 150.0 && r(2L) == 120.0 && r(3L) == 130.0)
  }

  test("sessionize splits on >30min inactivity") {
    val r = StateOps.sessionize(events).where($"user_id" === 1L)
      .select("session_start_id", "n_events").as[(Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L), (3L, 1L))) // 10:00-10:15 session, then 12:00
  }

  test("classify flags combine, Unknown when nothing matches") {
    val r = Classify.classify(events).select("event_id", "classification")
      .as[(Long, String)].collect().toMap
    assert(r(0L) == "Purchase,EvenProp")
    assert(r(1L) == "Purchase")
    assert(r(2L) == "EvenProp")
    assert(r(4L) == "HighValue,Signup,EvenProp")
  }

  test("coOccurrence requires all three event kinds (IsCrcSignup shape)") {
    val extra = Seq(
      (10L, ts("2024-01-02 10:00:00"), 1L, "signup", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Classify.coOccurrence(events.unionAll(extra))
      .select("user_id").as[Long].collect().toSeq
    assert(r == Seq(1L)) // user 1: signup+purchase+click; user 2 lacks purchase/click
  }

  test("extractDetails emits one row per matching class") {
    val r = Classify.extractDetails(events)
    assert(r.count() == 4L) // 3 purchases + 1 signup, clicks not extracted
    assert(r.where($"detail_type" === "signup").count() == 1L)
  }

  test("resampleLocf: ceil-aligned grid, carry-forward, same-ms event wins, ties by event_id") {
    def t(ms: Long) = new Timestamp(ms)
    val ev = Seq(
      // user 1: events at 5 and 25; step 10 → grid {10, 20}
      (0L, t(5L), 1L, "x", 1.0, "{}"),
      (1L, t(25L), 1L, "x", 2.0, "{}"),
      // user 2: single on-grid event → grid {10}
      (2L, t(10L), 2L, "x", 5.0, "{}"),
      // user 3: single off-grid event, ceil(11)=20 > hi=11 → NO grid rows
      (3L, t(11L), 3L, "x", 6.0, "{}"),
      // user 4: same-ms tie at 10 → highest event_id wins; event AT the
      // grid point is visible to it ("at or before")
      (4L, t(10L), 4L, "x", 1.0, "{}"),
      (5L, t(10L), 4L, "x", 9.0, "{}"),
      (6L, t(30L), 4L, "x", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = StateOps.resampleLocf(ev, stepMs = 10L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 10L, 1.0), (1L, 20L, 1.0),
      (2L, 10L, 5.0),
      (4L, 10L, 9.0), (4L, 20L, 9.0), (4L, 30L, 3.0)))
  }

  test("nearestEvent: both directions, tie prefers earlier, no-target nulls") {
    val e = Seq(
      // u1: purchase at 10:00 and 10:10; clicks at 10:02 (prev closer),
      // 10:09 (next closer), 10:05 (tie → earlier target)
      (0L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0, "{}"),
      (1L, ts("2024-01-01 10:10:00"), 1L, "purchase", 1.0, "{}"),
      (2L, ts("2024-01-01 10:02:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:09:00"), 1L, "click", 1.0, "{}"),
      (4L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      // u2: a click with no purchase anywhere → null match
      (5L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0, "{}"),
      // u3: other users' purchases must not leak across the partition
      (6L, ts("2024-01-01 10:00:30"), 3L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = StateOps.nearestEvent(e, "click", "purchase").collect()
      .map(x => x.getLong(1) -> (Option(x.get(3)), Option(x.get(4)))).toMap
    assert(r(2L) == ((Some(0L), Some(-120000L)))) // prev at 2 min back
    assert(r(3L) == ((Some(1L), Some(60000L))))   // next at 1 min ahead
    assert(r(4L) == ((Some(0L), Some(-300000L)))) // 5-min tie → earlier
    assert(r(5L) == ((None, None)))               // no purchase for u2
    val rep = StateOps.nearestEvent(e.repartition(7), "click", "purchase")
      .collect().map(x => x.getLong(1) -> Option(x.get(3))).toMap
    assert(rep == r.view.mapValues(_._1).toMap)
    assert(StateOps.nearestEvent(e.limit(0), "click", "purchase").count() == 0)
  }

  test("timeWeightedBalance: opening carry, segment weights, frontier zero-duration") {
    // frontier t1 = 2024-01-03 00:00 (u2's last event), window = 1 day
    val ev = Seq(
      // u1: pre-window opening 100, then +100 at t1-12h → (100·12h+200·12h)/24h = 150
      (0L, ts("2024-01-01 00:00:00"), 1L, "purchase", 100.0, "{}"),
      (1L, ts("2024-01-02 12:00:00"), 1L, "purchase", 100.0, "{}"),
      // u2: +10 exactly at t0, +40 exactly at the frontier (zero duration) → 10
      (2L, ts("2024-01-02 00:00:00"), 2L, "purchase", 10.0, "{}"),
      (3L, ts("2024-01-03 00:00:00"), 2L, "purchase", 40.0, "{}"),
      // u3: pre-window only → flat opening 7 across the whole window
      (4L, ts("2023-12-31 00:00:00"), 3L, "purchase", 7.0, "{}"),
      // u4: first active inside the window (implicit zero opening) → 60·6h/24h = 15
      (5L, ts("2024-01-02 18:00:00"), 4L, "purchase", 60.0, "{}"),
      // non-ledger event types are invisible
      (6L, ts("2024-01-02 23:00:00"), 1L, "signup", 999.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = StateOps.timeWeightedBalance(ev, windowDays = 1)
      .select("user_id", "twab").as[(Long, Double)].collect().toMap
    assert(r == Map(1L -> 150.0, 2L -> 10.0, 3L -> 7.0, 4L -> 15.0))
    // clicks debit: u5 holds 100 for half the window then 40 for the rest
    val ev2 = Seq(
      (0L, ts("2024-01-02 00:00:00"), 5L, "purchase", 100.0, "{}"),
      (1L, ts("2024-01-02 12:00:00"), 5L, "click", 60.0, "{}"),
      (2L, ts("2024-01-03 00:00:00"), 5L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = StateOps.timeWeightedBalance(ev2, windowDays = 1)
      .select("user_id", "twab").as[(Long, Double)].collect().toMap
    assert(r2 == Map(5L -> 70.0))
    // deterministic under repartitioning; total on empty input
    val rep = StateOps.timeWeightedBalance(ev.repartition(7), windowDays = 1)
      .select("user_id", "twab").as[(Long, Double)].collect().toMap
    assert(rep == r)
    val none = ev.limit(0)
    assert(StateOps.timeWeightedBalance(none).count() == 0)
  }
}
