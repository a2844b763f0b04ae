package graft

import graft.operators.Behavior
import java.sql.Timestamp

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, Long, String)*) = rows.map {
    case (id, t, u, k) => (id, ts(t), u, k, 1.0, "{}")
  }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private val steps = Seq("signup", "view", "purchase")

  test("funnel: first-occurrence chain, ordering enforced, horizon enforced") {
    val events = ev(
      // u1 completes all three in order
      (0L, "2024-01-01 10:00:00", 1L, "signup"),
      (1L, "2024-01-01 11:00:00", 1L, "view"),
      (2L, "2024-01-01 12:00:00", 1L, "purchase"),
      // u2: purchase BEFORE view → depth stops at view
      (3L, "2024-01-02 10:00:00", 2L, "signup"),
      (4L, "2024-01-02 10:30:00", 2L, "purchase"),
      (5L, "2024-01-02 11:00:00", 2L, "view"),
      // u3: view only, never signed up → depth 0, not counted
      (6L, "2024-01-03 10:00:00", 3L, "view"),
      // u4: signup, then view OUTSIDE the horizon
      (7L, "2024-01-04 10:00:00", 4L, "signup"),
      (8L, "2024-01-20 10:00:00", 4L, "view"),
      // noise types are ignored
      (9L, "2024-01-01 10:30:00", 1L, "error"))
    val r = Behavior.funnel(events, steps)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, "signup", 3L, 1.0),
      (2L, "view", 2L, BigDecimal(2.0 / 3.0).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (3L, "purchase", 1L, BigDecimal(1.0 / 3.0).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("funnel: same-timestamp step events count (>= chain semantics)") {
    val events = ev(
      (0L, "2024-01-01 10:00:00", 1L, "signup"),
      (1L, "2024-01-01 10:00:00", 1L, "view"), // t == t1 → counts via >=
      (2L, "2024-01-01 10:00:00", 2L, "view"), // view with no signup ever
      (3L, "2024-01-01 11:00:00", 2L, "signup"))
    val r = Behavior.funnel(events, Seq("signup", "view"))
      .select("step", "users").as[(Long, Long)].collect().toMap
    // u1 reaches view at the shared instant; u2's view precedes its signup
    assert(r == Map(1L -> 2L, 2L -> 1L))
  }

  test("funnel matches the chain-of-mins brute force on hashed data") {
    val rows = (0 until 400).map { i =>
      val u = (i * 13) % 23
      val t = ((i * 37) % 211) * 3600000L
      val k = Seq("signup", "view", "purchase", "click", "error")((i * 7) % 5)
      (u.toLong, t, k)
    }
    val events = rows.zipWithIndex.map { case ((u, t, k), id) =>
      (id.toLong, new Timestamp(t), u, k, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val horizon = 100L * 3600000L
    // brute force: per user, chain of mins with the horizon from step 1
    val byUser = rows.filter(r => steps.contains(r._3)).groupBy(_._1)
    val depths = byUser.toSeq.map { case (u, es) =>
      val t1 = es.filter(_._3 == steps.head).map(_._2).sorted.headOption
      var depth = if (t1.isDefined) 1 else 0
      var cur = t1.getOrElse(0L)
      for (s <- steps.tail) {
        if (depth >= 1 && depth < steps.size) {
          es.filter(e => e._3 == s && e._2 >= cur && e._2 <= t1.get + horizon)
            .map(_._2).sorted.headOption match {
            case Some(t) if depth == steps.indexOf(s) => depth += 1; cur = t
            case _ =>
          }
        }
      }
      u -> depth
    }.filter(_._2 >= 1)
    val want = (1 to steps.size).map(i => i.toLong -> depths.count(_._2 >= i).toLong)
      .filter(_._2 > 0).toMap
    val got = Behavior.funnel(events, steps, horizon)
      .select("step", "users").as[(Long, Long)].collect().toMap
    assert(got == want && got(1L) > got(3L)) // non-trivial funnel
  }

  test("retention cohorts: hand-computed triangle, distinct users per cell") {
    val events = ev(
      // u1 first in week 0 (epoch day 0-6 is week 2819 for 2024-01-01; use
      // relative assertions instead of absolute week ids)
      (0L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-09 10:00:00", 1L, "view"), // +1 week
      (2L, "2024-01-09 11:00:00", 1L, "click"), // same week: still 1 user
      (3L, "2024-01-17 10:00:00", 1L, "view"), // +2 weeks
      (4L, "2024-01-02 10:00:00", 2L, "view"), // same cohort as u1
      (5L, "2024-01-10 10:00:00", 3L, "view")) // next cohort, offset 0 only
    val r = Behavior.retentionCohorts(events)
      .as[(Long, Long, Long)].collect().toSeq
    val cohorts = r.map(_._1).distinct.sorted
    assert(cohorts.size == 2 && cohorts(1) == cohorts(0) + 1)
    val c0 = r.filter(_._1 == cohorts(0)).map(t => (t._2, t._3)).toMap
    val c1 = r.filter(_._1 == cohorts(1)).map(t => (t._2, t._3)).toMap
    assert(c0 == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
    assert(c1 == Map(0L -> 1L))
  }

  test("robustAnomalies: median/MAD flags the spike, not the mean-shifted mass") {
    // 9 quiet days around 100 plus one 10x spike: mean/stddev would be
    // dragged by the spike; median/MAD flags exactly the spike
    val series = Seq(
      (1L, 98L), (2L, 100L), (3L, 102L), (4L, 99L), (5L, 101L),
      (6L, 100L), (7L, 97L), (8L, 103L), (9L, 100L), (10L, 1000L)
    ).toDF("day_ms", "transfers")
    val r = Behavior.robustAnomalies(series, "transfers")
      .select("day_ms", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(r(10L))
    assert((1L to 9L).forall(d => !r(d)))
  }

  test("robustAnomalies: MAD=0 degrades to any-deviation-from-median") {
    val series = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 6L))
      .toDF("day_ms", "transfers")
    val r = Behavior.robustAnomalies(series, "transfers")
      .select("day_ms", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(r == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true))
  }

  test("retention cohorts: a user stays in its cohort as activity grows") {
    val base = ev((0L, "2024-01-01 10:00:00", 1L, "view"))
    val grown = ev(
      (0L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-02-01 10:00:00", 1L, "view"))
    val c0 = Behavior.retentionCohorts(base)
      .as[(Long, Long, Long)].collect().map(_._1).min
    val cg = Behavior.retentionCohorts(grown)
      .as[(Long, Long, Long)].collect().map(_._1).min
    assert(c0 == cg) // first-event cohort is growth-stable
  }

  test("transitionMatrix: per-user consecutive pairs, deterministic tie order, probabilities") {
    def t(ms: Long) = new Timestamp(ms)
    // user 1: a→b→a ; user 2: a→b ; user 3 has one event (no transition);
    // user 4 has two events at the SAME ts — event_id breaks the tie
    val ev = Seq(
      (1L, 1L, t(1000), "a"), (2L, 1L, t(2000), "b"), (3L, 1L, t(3000), "a"),
      (4L, 2L, t(1000), "a"), (5L, 2L, t(2000), "b"),
      (6L, 3L, t(1000), "c"),
      (7L, 4L, t(5000), "x"), (8L, 4L, t(5000), "y")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val m = Behavior.transitionMatrix(ev)
      .as[(String, String, Long, Double)].collect()
      .map { case (f, to, n, p) => (f, to) -> ((n, p)) }.toMap
    assert(m(("a", "b")) == ((2L, 1.0)))     // both a's transition to b
    assert(m(("b", "a")) == ((1L, 1.0)))     // b's only outgoing transition
    assert(m(("x", "y")) == ((1L, 1.0)))     // same-ts tie ordered by event_id
    assert(!m.keySet.exists(_._1 == "c"), "a single-event user yields no transition")
    assert(m.size == 3, s"got $m")
    // repartition invariance
    val m7 = Behavior.transitionMatrix(ev.repartition(7))
      .as[(String, String, Long, Double)].collect()
      .map { case (f, to, n, p) => (f, to) -> ((n, p)) }.toMap
    assert(m7 == m)
  }

  test("seasonalAnomalies: dow baseline isolates the off-pattern Sunday") {
    // Sundays (Jan 7/14/21/28 2024) run n=2 except one n=20 outlier;
    // Mondays run a constant n=10. Within-dow stats: Monday σ=0 → z=0;
    // Sunday μ=6.5, σ=round(sqrt(60.75),12) → z(20)=1.732… — only the odd
    // Sunday crosses k=1.5 (a whole-series z would read EVERY Sunday as
    // low and every Monday as high)
    val days = Seq(("2024-01-07", 2), ("2024-01-14", 2), ("2024-01-21", 20),
      ("2024-01-28", 2), ("2024-01-08", 10), ("2024-01-15", 10),
      ("2024-01-22", 10), ("2024-01-29", 10))
    val rows = days.zipWithIndex.flatMap { case ((d, n), di) =>
      (0 until n).map(j => (di * 100L + j, f"$d 0${j % 10}:0${j / 10}:00", 1L, "a"))
    }
    val r = Behavior.seasonalAnomalies(ev(rows: _*), k = 1.5)
      .select("day", "dow", "n", "z", "is_anomaly")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(r.length == 8)
    // 2024-01-07 is a Sunday: epoch-day 19729, (19729+4)%7 == 0 + all
    // Sundays share a dow; Mondays share another
    val sundays = r.filter(_._3 != 10L)
    assert(sundays.map(_._2).distinct.length == 1)
    assert(r.filter(_._3 == 10L).forall(x => x._4 == 0.0 && !x._5)) // σ=0 weekdays
    val flagged = r.filter(_._5)
    assert(flagged.length == 1 && flagged.head._3 == 20L)
    assert(flagged.head._4 == 1.732050807569)
    assert(sundays.filter(_._3 == 2L).forall(x => !x._5 && x._4 < 0))
    assert(Behavior.seasonalAnomalies(ev(rows: _*).limit(0)).count() == 0)
  }

  test("topPaths: hand-counted sequences, cross-user isolation, tie order, top-k") {
    val e = ev(
      // u1: a b c a b c → paths a>b>c ×2, b>c>a ×1, c>a>b ×1
      (0L, "2024-01-01 10:00:00", 1L, "a"), (1L, "2024-01-01 10:01:00", 1L, "b"),
      (2L, "2024-01-01 10:02:00", 1L, "c"), (3L, "2024-01-01 10:03:00", 1L, "a"),
      (4L, "2024-01-01 10:04:00", 1L, "b"), (5L, "2024-01-01 10:05:00", 1L, "c"),
      // u2: a b then c for u3 — sequences never cross users
      (6L, "2024-01-01 10:00:00", 2L, "a"), (7L, "2024-01-01 10:01:00", 2L, "b"),
      (8L, "2024-01-01 10:02:00", 3L, "c"))
    val r = Behavior.topPaths(e).as[(String, Long)].collect()
    assert(r.toMap == Map("a>b>c" -> 2L, "b>c>a" -> 1L, "c>a>b" -> 1L))
    assert(r.head == ("a>b>c", 2L)) // count desc, then path asc
    assert(r(1) == ("b>c>a", 1L))
    // same-ts ties order by event_id; k cut; n=2 equals transition pairs
    assert(Behavior.topPaths(e, k = 1).count() == 1)
    val p2 = Behavior.topPaths(e, n = 2).as[(String, Long)].collect().toMap
    assert(p2("a>b") == 3L) // u1 ×2 + u2 ×1
    val rep = Behavior.topPaths(e.repartition(7)).as[(String, Long)].collect()
    assert(rep.toSeq == r.toSeq)
    assert(Behavior.topPaths(e.limit(0)).count() == 0)
  }

  test("cusumChangepoints: planted level shift trips both sides at the hand-computed days") {
    // 2 events/day for 10 days then 8/day for 10 days: μ=5, σ=3 exactly,
    // so z=∓1. S⁻ grows 0.5/day through the low regime (>4 at day index
    // 8), drains at 1.5/day after the shift; S⁺ grows 0.5/day from day 10
    // (>4 at day index 18).
    val rows = (0 until 20).flatMap { d =>
      val n = if (d < 10) 2 else 8
      (0 until n).map(j =>
        (d * 10L + j, f"2024-01-${d + 1}%02d 0$j:00:00", 1L, "view"))
    }
    val r = Behavior.cusumChangepoints(ev(rows: _*))
      .select("day", "z", "sp", "sn", "changepoint")
      .as[(Long, Double, Double, Double, Boolean)].collect().sortBy(_._1)
    val d0 = r.head._1
    assert(r.map(_._2).toSeq == Seq.fill(10)(-1.0) ++ Seq.fill(10)(1.0))
    assert(r.filter(_._5).map(x => x._1 - d0).toSeq == Seq(8L, 9L, 18L, 19L))
    assert(r.find(x => x._1 - d0 == 9).get._4 == 5.0)  // S⁻ peak
    assert(r.find(x => x._1 - d0 == 19).get._3 == 5.0) // S⁺ peak
    assert(r.find(x => x._1 - d0 == 13).get._4 == 0.0) // S⁻ drained post-shift
    // constant series: σ=0 → z=0, no changepoints; repartition invariance
    val const = (0 until 5).flatMap(d =>
      (0 until 3).map(j => (d * 10L + j, f"2024-02-${d + 1}%02d 0$j:00:00", 1L, "buy")))
    val c = Behavior.cusumChangepoints(ev(const: _*)).collect()
    assert(c.length == 5 && c.forall(x => !x.getAs[Boolean]("changepoint")
      && x.getAs[Double]("z") == 0.0))
    val rep = Behavior.cusumChangepoints(ev(rows: _*).repartition(7))
      .select("day", "z", "sp", "sn", "changepoint")
      .as[(Long, Double, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(rep.toSeq == r.toSeq)
    assert(Behavior.cusumChangepoints(ev(rows: _*).limit(0)).count() == 0)
  }

  test("activeUsers: per-day DAU with new/returning split; same-day dedup") {
    val e = ev(
      // day 1: u1 (×3 events — counts once) and u2, both new
      (0L, "2024-01-01 08:00:00", 1L, "view"),
      (1L, "2024-01-01 09:00:00", 1L, "view"),
      (2L, "2024-01-01 23:59:59", 1L, "purchase"),
      (3L, "2024-01-01 10:00:00", 2L, "view"),
      // day 2: u1 returns, u3 is new
      (4L, "2024-01-02 11:00:00", 1L, "view"),
      (5L, "2024-01-02 12:00:00", 3L, "view"),
      // day 4 (gap day 3): u2 and u3 return
      (6L, "2024-01-04 01:00:00", 2L, "view"),
      (7L, "2024-01-04 02:00:00", 3L, "view"))
    val r = Behavior.activeUsers(e)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, dau, nw, ret) => d -> ((dau, nw, ret)) }
    val days = r.map(_._1)
    assert(days.length == 3 && days(1) == days(0) + 1 && days(2) == days(0) + 3)
    assert(r.map(_._2).toSeq == Seq((2L, 2L, 0L), (2L, 1L, 1L), (2L, 0L, 2L)))
    // repartition invariance + empty totality
    assert(Behavior.activeUsers(e.repartition(7))
      .as[(Long, Long, Long, Long)].collect().toSeq ==
      r.map { case (d, (a, b, c)) => (d, a, b, c) }.toSeq)
    assert(Behavior.activeUsers(e.limit(0)).count() == 0)
  }

  // ---- interEventStats ----

  test("interEventStats: metronome, burst, single-event and same-instant users") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // u1: metronome, gaps exactly 60s -> sigma 0, B = -1
      (1L, 1L, "a", t("2024-01-01 10:00:00")),
      (2L, 1L, "a", t("2024-01-01 10:01:00")),
      (3L, 1L, "a", t("2024-01-01 10:02:00")),
      (4L, 1L, "a", t("2024-01-01 10:03:00")),
      // u2: burst then silence, gaps 1s,1s,3598s
      (5L, 2L, "a", t("2024-01-01 10:00:00")),
      (6L, 2L, "a", t("2024-01-01 10:00:01")),
      (7L, 2L, "a", t("2024-01-01 10:00:02")),
      (8L, 2L, "a", t("2024-01-01 11:00:00")),
      // u3: a single event -> no gaps, no row
      (9L, 3L, "a", t("2024-01-01 10:00:00")),
      // u4: two events at the SAME instant -> one zero gap -> B null
      (10L, 4L, "a", t("2024-01-01 10:00:00")),
      (11L, 4L, "a", t("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = graft.operators.Behavior.interEventStats(events).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), if (x.isNullAt(4)) None else Some(x.getDouble(4))))).toMap
    assert(r.keySet == Set(1L, 2L, 4L))
    // u1: D = 3·3·60000² − 180000² = 0 → σ 0, B = (0−s1)/(0+s1) = −1
    assert(r(1L) == ((3L, 60000000L, 0L, Some(-1.0))))
    // u2 exact protocol: gaps ms = 1000, 1000, 3598000
    val g = Seq(1000L, 1000L, 3598000L)
    val s1 = g.sum
    val d = 3L * g.map(x => x * x).sum - s1 * s1
    val sq = math.sqrt(d.toDouble)
    val meanUs = s1 * 1000L / 3L
    val stdUs = math.floor(sq * 1000.0 / 3).toLong
    val b = BigDecimal((sq - s1) / (sq + s1))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(2L) == ((3L, meanUs, stdUs, Some(b))))
    // n=3 gaps bounds B by (√2−1)/(√2+1) ≈ 0.1716 (population σ); this
    // burst profile should sit essentially at that ceiling
    assert(b > 0.15, s"burst-and-silence must skew positive, got $b")
    // u4: one zero gap → s1 = 0, D = 0 → burstiness null
    assert(r(4L) == ((1L, 0L, 0L, None)))
    // deterministic under repartition; empty totality
    val r2 = graft.operators.Behavior.interEventStats(events.repartition(5)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), if (x.isNullAt(4)) None else Some(x.getDouble(4))))).toMap
    assert(r2 == r)
    assert(graft.operators.Behavior.interEventStats(events.limit(0)).count() == 0)
  }

  test("touchAttribution: first/last windows, direct backfill, value sums") {
    def evv(rows: (Long, String, Long, String, Double)*) = rows.map {
      case (id, t, u, k, v) => (id, ts(t), u, k, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val events = evv(
      // u1: click → view → purchase(10): first=click, last=view
      (0L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (1L, "2024-01-01 11:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 12:00:00", 1L, "purchase", 10.0),
      // u2: bare purchase(5) → direct/direct
      (3L, "2024-01-02 10:00:00", 2L, "purchase", 5.0),
      // u3: purchase(7) with no prior → direct; then click; then
      // purchase(3): a prior PURCHASE is not a touch, so first=last=click
      (4L, "2024-01-03 10:00:00", 3L, "purchase", 7.0),
      (5L, "2024-01-03 11:00:00", 3L, "click", 1.0),
      (6L, "2024-01-03 12:00:00", 3L, "purchase", 3.0))
    val r = Behavior.touchAttribution(events)
      .as[(String, Long, Double, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("click", 2L, 13.0, 1L, 3.0),   // first: u1 + u3c2; last: u3c2
      ("direct", 2L, 12.0, 2L, 12.0), // u2 + u3c1 under both models
      ("view", 0L, 0.0, 1L, 10.0)))   // last-touch only (u1)
    // conversion mass is conserved across both models
    assert(r.map(_._2).sum == r.map(_._4).sum)
    assert(math.abs(r.map(_._3).sum - r.map(_._5).sum) < 1e-9)
    assert(Behavior.touchAttribution(events.limit(0)).count() == 0)
  }

  test("markovAttribution: hand-solved chains, bottleneck channel, conservation") {
    def evv(rows: (Long, String, Long, String)*) = rows.map {
      case (id, t, u, k) => (id, ts(t), u, k, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // chain 1: START→A (2/3) / START→B (1/3); A→CONV ½, A→NULL ½; B→CONV 1
    // p = 2/3·½ + 1/3·1 = 2/3; removing either channel → p' = 1/3 → RE ½, ½
    val e1 = evv(
      (0L, "2024-01-01 10:00:00", 1L, "A"),
      (1L, "2024-01-01 11:00:00", 1L, "purchase"),
      (2L, "2024-01-02 10:00:00", 2L, "A"),
      (3L, "2024-01-03 10:00:00", 3L, "B"),
      (4L, "2024-01-03 11:00:00", 3L, "purchase"))
    val r1 = Behavior.markovAttribution(e1)
      .as[(String, Double, Double, Double)].collect().toSeq
    def r12(d: Double) =
      BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1 == Seq(
      ("A", r12(2.0 / 3.0), 0.5, 0.5),
      ("B", r12(2.0 / 3.0), 0.5, 0.5)))
    // chain 2: M sits on EVERY converting path — position models split
    // evenly, the removal effect sees the bottleneck: RE(M)=1, share ½
    val e2 = evv(
      (0L, "2024-01-01 10:00:00", 1L, "A"),
      (1L, "2024-01-01 11:00:00", 1L, "M"),
      (2L, "2024-01-01 12:00:00", 1L, "purchase"),
      (3L, "2024-01-02 10:00:00", 2L, "B"),
      (4L, "2024-01-02 11:00:00", 2L, "M"),
      (5L, "2024-01-02 12:00:00", 2L, "purchase"))
    val r2 = Behavior.markovAttribution(e2)
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(r2 == Seq(
      ("A", 1.0, 0.5, 0.25), ("B", 1.0, 0.5, 0.25), ("M", 1.0, 1.0, 0.5)))
    // shares always sum to 1 when any channel has effect; journeys split
    // at each conversion (a post-conversion touch starts a NEW journey)
    assert(math.abs(r2.map(_._4).sum - 1.0) < 1e-9)
    // bare conversions only → no channels → empty report; empty totality
    assert(Behavior.markovAttribution(evv(
      (0L, "2024-01-01 10:00:00", 1L, "purchase"))).count() == 0)
    assert(Behavior.markovAttribution(e1.limit(0)).count() == 0)
  }

  test("ewmaForecast: hand half-weights, zero-padded history, gaps skipped") {
    val events = ev(
      (0L, "2024-01-01 10:00:00", 1L, "view"), (1L, "2024-01-01 11:00:00", 2L, "view"),
      (2L, "2024-01-01 12:00:00", 3L, "view"), (3L, "2024-01-01 13:00:00", 4L, "view"),
      (4L, "2024-01-02 10:00:00", 1L, "view"), (5L, "2024-01-02 11:00:00", 2L, "view"),
      (6L, "2024-01-02 12:00:00", 3L, "view"), (7L, "2024-01-02 13:00:00", 4L, "view"),
      (8L, "2024-01-02 14:00:00", 5L, "view"), (9L, "2024-01-02 15:00:00", 6L, "view"),
      (10L, "2024-01-02 16:00:00", 7L, "view"), (11L, "2024-01-02 17:00:00", 8L, "view"),
      // gap: Jan 3-4 have no views; the observed series is [4, 8, 2]
      (12L, "2024-01-05 10:00:00", 1L, "view"), (13L, "2024-01-05 11:00:00", 2L, "view"),
      // a second type is its own series
      (14L, "2024-01-01 10:00:00", 1L, "click"))
    val r = Behavior.ewmaForecast(events)
      .as[(String, Long, Long, Double)].collect()
    val views = r.filter(_._1 == "view").sortBy(_._2).map(t => (t._3, t._4)).toSeq
    // day1: 4/2; day2: 8/2 + 4/4; day3 (observed-sequence, gap skipped):
    // 2/2 + 8/4 + 4/8
    assert(views == Seq((4L, 2.0), (8L, 5.0), (2L, 3.5)))
    val clicks = r.filter(_._1 == "click").map(t => (t._3, t._4)).toSeq
    assert(clicks == Seq((1L, 0.5)))
  }

  test("cohortLtv: hand cells, decimal running sum, per-user denominators") {
    val rows = Seq(
      // u1, u2 first-seen in week of Jan 1 (any event type sets the cohort)
      (0L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (1L, ts("2024-01-02 10:00:00"), 2L, "click", 0.0, "{}"),
      // u3 first-seen the following week
      (2L, ts("2024-01-09 10:00:00"), 3L, "view", 0.0, "{}"),
      // purchases: u1 week0 (10.5), u2 week1 (2.25), u3 offset0 (4.0)
      (3L, ts("2024-01-03 10:00:00"), 1L, "purchase", 10.5, "{}"),
      (4L, ts("2024-01-10 10:00:00"), 2L, "purchase", 2.25, "{}"),
      (5L, ts("2024-01-10 11:00:00"), 3L, "purchase", 4.0, "{}"),
      // a non-purchase with value never counts as revenue
      (6L, ts("2024-01-03 11:00:00"), 2L, "view", 99.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Behavior.cohortLtv(rows)
      .as[(Long, Long, Double, Double, Long, Double)].collect().toSeq
    val cohorts = r.map(_._1).distinct.sorted
    assert(cohorts.size == 2 && cohorts(1) == cohorts(0) + 1)
    val c0 = r.filter(_._1 == cohorts(0)).map(t => (t._2, t._3, t._4, t._5, t._6))
    assert(c0 == Seq((0L, 10.5, 10.5, 2L, 5.25), (1L, 2.25, 12.75, 2L, 6.375)))
    val c1 = r.filter(_._1 == cohorts(1)).map(t => (t._2, t._3, t._4, t._5, t._6))
    assert(c1 == Seq((0L, 4.0, 4.0, 1L, 4.0)))
  }

  test("abTest matches a JVM-md5 brute force on hashed exposure/conversion data") {
    // deterministic pseudo-random event log: ~40 users, some never exposed,
    // some convert before exposure (must NOT count), some after
    val rows = (0 until 400).map { i =>
      val u = (i * 2654435761L) % 40
      // kind pattern period-7 (coprime to the 40-user cycle) so every
      // user sees mixed kinds; a third of the users never convert —
      // keeps p̂ strictly in (0,1)
      val kind = (i.toLong * i + 3L * i) % 7 match {
        case 0 | 1 => "view"
        case 2 | 3 if u % 3 != 0 => "purchase"
        case _ => "click"
      }
      (i.toLong, new Timestamp(1700000000000L + (i * 7919L) % 1000000L * 1000L),
        u, kind, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Behavior.abTest(rows)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    // brute force in plain JVM: md5 parity, first view, any later purchase
    val evs = rows.select("user_id", "ts", "event_type")
      .as[(Long, Timestamp, String)].collect().toSeq
    def parity(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 2
    }
    val perUser = evs.groupBy(_._1).iterator.flatMap { case (u, es) =>
      val exp = es.filter(_._3 == "view").map(_._2.getTime)
      if (exp.isEmpty) None
      else Some((parity(u),
        es.filter(_._3 == "purchase").map(_._2.getTime)
          .exists(_ > exp.min)))
    }.toSeq
    val n0 = perUser.count(_._1 == 0); val c0 = perUser.count(p => p._1 == 0 && p._2)
    val n1 = perUser.count(_._1 == 1); val c1 = perUser.count(p => p._1 == 1 && p._2)
    assert((got._1, got._2, got._3, got._4) == ((n0, c0, n1, c1)))
    assert(got._5 == c0.toDouble / n0 && got._6 == c1.toDouble / n1)
    // the planted mix keeps the pool non-degenerate, so z is defined
    assert(c0 + c1 > 0 && c0 + c1 < n0 + n1)
    val p = (c0 + c1).toDouble / (n0 + n1)
    val z = (c1.toDouble / n1 - c0.toDouble / n0) /
      math.sqrt(p * (1.0 - p) * (1.0 / n0 + 1.0 / n1))
    assert(got._7 == z)
    // degenerate pool (nobody converts): z is null, counts still emit
    val noConv = rows.where($"event_type" =!= "purchase")
    val d = Behavior.abTest(noConv).collect().head
    assert(d.isNullAt(d.fieldIndex("z")) && d.getAs[Long]("n0") == n0)
  }

  test("rfmSegments: hand quintiles, exact decimal monetary, tie-break by custkey") {
    def ord(rows: (Long, Long, Double, String)*) = rows.map {
      case (ok, ck, tp, d) => (ok, ck, "O", tp, ts(d), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    // 5 customers → with n=5, score = rank: recency orders c1<c2<..<c5,
    // frequency c5 has 2 orders (others 1), monetary reverses recency
    val orders = ord(
      (1L, 1L, 500.0, "2024-01-01 00:00:00"),
      (2L, 2L, 400.0, "2024-01-02 00:00:00"),
      (3L, 3L, 300.0, "2024-01-03 00:00:00"),
      (4L, 4L, 200.0, "2024-01-04 00:00:00"),
      (5L, 5L, 50.0, "2024-01-05 00:00:00"),
      (6L, 5L, 50.0, "2023-12-01 00:00:00"))
    val r = Behavior.rfmSegments(orders)
      .as[(Long, Long, Long, Double, Long, Long, Long, Long)].collect().toSeq
    // recency rank: c1..c5 ascending by latest date → r = 1..5
    // frequency: c5 freq 2 ranks last (others tie at 1, break by custkey)
    // monetary: c5 100 < c4 200 < c3 < c2 < c1 → m = 5..1 reversed
    assert(r.map(x => (x._1, x._5, x._6, x._7, x._8)) == Seq(
      (1L, 1L, 1L, 5L, 115L),
      (2L, 2L, 2L, 4L, 224L),
      (3L, 3L, 3L, 3L, 333L),
      (4L, 4L, 4L, 2L, 442L),
      (5L, 5L, 5L, 1L, 551L)))
    val c5 = r.find(_._1 == 5L).get
    assert(c5._3 == 2L && c5._4 == 100.0) // exact decimal 50+50
    assert(Behavior.rfmSegments(orders.limit(0)).count() == 0)
  }
}
