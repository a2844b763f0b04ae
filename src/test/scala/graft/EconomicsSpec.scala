package graft

import graft.operators.{Behavior, Economics, Sampling}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EconomicsSpec extends SparkSpec {
  import spark.implicits._

  // ---- orderedScan -------------------------------------------------------

  private def wealthDf(rows: (Long, Double)*) =
    rows.toDF("id", "wealth")

  test("orderedScan: rank and running weight match the single-window spelling") {
    val df = wealthDf((1L, 30.0), (2L, 10.0), (3L, 20.0), (4L, 10.0), (5L, 0.0))
      .withColumn("w", col("wealth").cast("decimal(18,4)"))
    val r = Economics.orderedScan(df, "wealth", "id", "w", numBuckets = 3)
      .select("id", "rank", "cum_w")
      .as[(Long, Long, BigDecimal)].collect()
      .map { case (id, rk, cw) => id -> ((rk, cw.toDouble)) }.toMap
    // ascending (wealth, id): 5(0), 2(10), 4(10), 3(20), 1(30)
    assert(r(5L) == (1L, 0.0))
    assert(r(2L) == (2L, 10.0))
    assert(r(4L) == (3L, 20.0))
    assert(r(3L) == (4L, 40.0))
    assert(r(1L) == (5L, 70.0))
  }

  test("orderedScan: bucket-count and partitioning invariance") {
    val df = (1L to 200L).map(i => (i, ((i * 37) % 50).toDouble))
      .toDF("id", "wealth")
      .withColumn("w", col("wealth").cast("decimal(18,4)"))
    def run(d: org.apache.spark.sql.DataFrame, buckets: Int) =
      Economics.orderedScan(d, "wealth", "id", "w", buckets)
        .select("id", "rank", "cum_w").as[(Long, Long, BigDecimal)]
        .collect().sortBy(_._1).toSeq
    val base = run(df, 64)
    assert(run(df, 1) == base)          // degenerate: one bucket
    assert(run(df, 7) == base)          // odd bucket count
    assert(run(df.repartition(13), 64) == base) // layout-independent
  }

  test("orderedScan: empty input is total and keeps the schema") {
    val df = wealthDf().withColumn("w", col("wealth").cast("decimal(18,4)"))
    val r = Economics.orderedScan(df, "wealth", "id", "w")
    assert(r.count() == 0)
    assert(r.columns.toSeq == Seq("id", "wealth", "w", "rank", "cum_w"))
  }

  // ---- gini --------------------------------------------------------------

  test("gini: perfect equality -> 0, concentration -> (n-1)/n") {
    val eq = Economics.gini(wealthDf((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0)),
      "wealth", "id").select("gini").as[Double].head()
    assert(eq == 0.0)
    // one holder owns everything: G = (n-1)/n = 0.75
    val conc = Economics.gini(
      wealthDf((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0)), "wealth", "id")
      .select("n", "total", "gini").as[(Long, Double, Double)].head()
    assert(conc == ((4L, 100.0, 0.75)))
  }

  test("gini: hand-computed mixed case, tie-order-robust") {
    // x = (1,2,3,4): G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    val g = Economics.gini(
      wealthDf((9L, 2.0), (5L, 1.0), (7L, 4.0), (2L, 3.0)), "wealth", "id")
      .select("gini").as[Double].head()
    assert(g == 0.25)
    // ties: duplicate values — result must not depend on the tiebreak ids
    val a = Economics.gini(wealthDf((1L, 5.0), (2L, 5.0), (3L, 10.0)), "wealth", "id")
      .select("gini").as[Double].head()
    val b = Economics.gini(wealthDf((3L, 5.0), (1L, 5.0), (2L, 10.0)), "wealth", "id")
      .select("gini").as[Double].head()
    assert(a == b)
  }

  // ---- lorenz ------------------------------------------------------------

  test("lorenz: shares sum to 1, cumulative monotone, hand case") {
    val df = wealthDf((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
    val r = Economics.lorenz(df, "wealth", "id", buckets = 2)
      .select("bin", "n_rows", "wealth", "share", "cum_share")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    // bottom half holds (10+20)/100, top half the rest
    assert(r == Seq((0L, 2L, 30.0, 0.3, 0.3), (1L, 2L, 70.0, 0.7, 1.0)))
  }

  test("lorenz: decile bins cover all rows and end at share 1") {
    val df = (1L to 95L).map(i => (i, i.toDouble)).toDF("id", "wealth")
    val r = Economics.lorenz(df, "wealth", "id")
      .select("bin", "n_rows", "cum_share").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(r.map(_._2).sum == 95L)
    assert(r.last._3 == 1.0)
    assert(r.map(_._3) == r.map(_._3).sorted)
  }

  // ---- moneyVelocity -----------------------------------------------------

  test("concentration: hand-computed Nakamoto, top-k share, degenerate totals") {
    // wealth 5,3,1,1 (total 10): cum desc = 5,8,9,10 → first strict
    // majority (cum > 5) at rank 2
    val r = Economics.concentration(
      wealthDf((1L, 5.0), (2L, 3.0), (3L, 1.0), (4L, 1.0)), "wealth", "id")
      .collect().head
    assert(r.getAs[Long]("n_holders") == 4L && r.getAs[Double]("total") == 10.0)
    assert(r.getAs[Long]("nakamoto") == 2L)
    assert(r.getAs[Double]("topk_share") == 1.0) // n < topK → everyone
    val top2 = Economics.concentration(
      wealthDf((1L, 5.0), (2L, 3.0), (3L, 1.0), (4L, 1.0)), "wealth", "id",
      topK = 2).collect().head
    assert(top2.getAs[Double]("topk_share") == 0.8)
    // perfect equality over 4: majority needs 3 holders
    val eq = Economics.concentration(
      wealthDf((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0)), "wealth", "id")
      .collect().head
    assert(eq.getAs[Long]("nakamoto") == 3L)
    // non-positive total → null coefficient/share (no majority to capture)
    val neg = Economics.concentration(wealthDf((1L, -5.0)), "wealth", "id")
      .collect().head
    assert(neg.isNullAt(neg.fieldIndex("nakamoto"))
      && neg.isNullAt(neg.fieldIndex("topk_share")))
    // bucket/partitioning invariance; empty totality
    val base = Economics.concentration(
      wealthDf((1L to 40L).map(i => (i, (i * 7 % 13).toDouble)): _*),
      "wealth", "id").collect().head
    val rep = Economics.concentration(
      wealthDf((1L to 40L).map(i => (i, (i * 7 % 13).toDouble)): _*)
        .repartition(7), "wealth", "id", numBuckets = 5).collect().head
    assert(rep.toSeq == base.toSeq)
    assert(Economics.concentration(wealthDf(), "wealth", "id").count() == 0)
  }

  private val zero = "0x" + "0" * 40

  private def xfer(rows: (String, String, String, Long, String)*) = rows.map {
    case (tok, from, to, v, day) =>
      (s"0xh$tok$from$to$v", tok, from, to, v, Timestamp.valueOf(s"$day 12:00:00"))
  }.toDF("hash", "token", "from", "to", "value", "ts")

  private def signups(rows: (String, String)*) = rows.map {
    case (u, t) => (s"0xs$u", u, if (t.isEmpty) null else t)
  }.toDF("hash", "user", "token")

  test("hhi: monopoly -> 1, equality -> 1/n, hand mixed case, degenerate totals") {
    val mono = Economics.hhi(wealthDf((1L, 7.0)), "wealth").collect().head
    assert(mono.getAs[Long]("n_holders") == 1L)
    assert(mono.getAs[Double]("hhi") == 1.0)
    assert(mono.getAs[Double]("effective_holders") == 1.0)
    val eq = Economics.hhi(
      wealthDf((1L, 2.5), (2L, 2.5), (3L, 2.5), (4L, 2.5)), "wealth")
      .collect().head
    assert(eq.getAs[Double]("hhi") == 0.25)
    assert(eq.getAs[Double]("effective_holders") == 4.0)
    // wealth 5,3,1,1 (total 10): hhi = (25+9+1+1)/100 = 0.36
    val mixed = Economics.hhi(
      wealthDf((1L, 5.0), (2L, 3.0), (3L, 1.0), (4L, 1.0)), "wealth")
      .collect().head
    assert(mixed.getAs[Double]("total") == 10.0)
    assert(mixed.getAs[Double]("hhi") == 0.36)
    assert(mixed.getAs[Double]("effective_holders") == 1.0 / 0.36)
    // zero total → null (no shares to square); empty input keeps the row
    val zero = Economics.hhi(wealthDf((1L, 0.0)), "wealth").collect().head
    assert(zero.isNullAt(zero.fieldIndex("hhi")))
    assert(zero.isNullAt(zero.fieldIndex("effective_holders")))
  }

  test("moneyVelocity: mint/volume split, cumulative supply, registry gate") {
    val tx = xfer(
      ("0xt1", zero, "0xa", 100L, "2024-01-01"),  // day1 mint
      ("0xt1", "0xa", "0xb", 50L, "2024-01-02"),  // day2 transfer
      ("0xt1", zero, "0xb", 100L, "2024-01-02"),  // day2 mint
      ("0xt1", "0xb", "0xa", 100L, "2024-01-03"), // day3 transfer
      ("0xbad", zero, "0xa", 999L, "2024-01-01"), // unregistered: ignored
      ("0xbad", "0xa", "0xb", 999L, "2024-01-03"))
    val r = Economics.moneyVelocity(tx, signups(("0xa", "0xt1"), ("0xorg", "")))
      .select("day", "volume", "minted", "supply", "velocity")
      .collect().map(x => (x.getDate(0).toString, x.getDouble(1), x.getDouble(2),
        x.getDouble(3), if (x.isNullAt(4)) -1.0 else x.getDouble(4))).toSeq
    assert(r == Seq(
      ("2024-01-01", 0.0, 100.0, 100.0, 0.0),
      ("2024-01-02", 50.0, 100.0, 200.0, 0.25),
      ("2024-01-03", 100.0, 0.0, 200.0, 0.5)))
  }

  test("moneyVelocity: volume before any mint has null velocity; empty total") {
    val tx = xfer(("0xt1", "0xa", "0xb", 10L, "2024-01-01"),
      ("0xt1", zero, "0xa", 10L, "2024-01-02"))
    val r = Economics.moneyVelocity(tx, signups(("0xa", "0xt1")))
      .select("day", "velocity").collect()
      .map(x => (x.getDate(0).toString, x.isNullAt(1))).toSeq
    assert(r == Seq(("2024-01-01", true), ("2024-01-02", false)))
    assert(Economics.moneyVelocity(xfer(), signups()).count() == 0)
  }

  // ---- budgetSelect ------------------------------------------------------

  private def docs(rows: (Long, String)*) = rows.map {
    case (id, text) => (id, text, "en", "web", text.length.toLong)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("budgetSelect: keeps the best-score prefix that fits the budget") {
    val d = docs(
      (1L, "the a the a"),        // 4 toks, stopword-rich -> best score
      (2L, "x y z w"),            // 4 toks, score 0
      (3L, "q!!! r!!! s!!! t!!!")) // 4 toks, punct-heavy -> worst
    // budget 8: docs 1 and 2 fit, doc 3's cumulative 12 > 8
    val r = Sampling.budgetSelect(d, budgetTokens = 8L)
      .select("doc_id", "cum_tokens", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(r == Seq((1L, 4L, true), (2L, 8L, true), (3L, 12L, false)))
  }

  test("budgetSelect: zero budget keeps nothing, ample budget keeps all") {
    val d = docs((1L, "a b"), (2L, "c d"))
    assert(Sampling.budgetSelect(d, 0L).where(col("keep")).count() == 0)
    assert(Sampling.budgetSelect(d, 100L).where(!col("keep")).count() == 0)
    assert(Sampling.budgetSelect(docs(), 5L).count() == 0)
  }

  test("budgetSelect: selection is partition-layout invariant") {
    val d = (1 to 60)
      .map(i => (i.toLong, (("word " * (i % 7 + 1)) + ("the " * (i % 5))).trim))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).cast("long").as("n_chars"))
    val a = Sampling.budgetSelect(d, 100L, numBuckets = 4)
      .as[(Long, Long, Double, Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = Sampling.budgetSelect(d.repartition(7), 100L, numBuckets = 16)
      .as[(Long, Long, Double, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  // ---- trendingEvents ----------------------------------------------------

  private def dayEv(rows: (Long, String, String)*) = rows.map {
    case (id, day, t) => (id, Timestamp.valueOf(s"$day 10:00:00"), id % 10, t, 1.0, "{}")
  }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("trendingEvents: lift over the trailing mean, null until full window") {
    val ev = dayEv(
      (1L, "2024-01-01", "err"), (2L, "2024-01-02", "err"),
      (3L, "2024-01-03", "err"), (4L, "2024-01-03", "err"),
      // day 4 spikes to 4 = 2x the trailing (1,1,2) mean... 4/(4/3) = 3
      (5L, "2024-01-04", "err"), (6L, "2024-01-04", "err"),
      (7L, "2024-01-04", "err"), (8L, "2024-01-04", "err"))
    val r = Behavior.trendingEvents(ev, lookback = 3, minLift = 2.0)
      .select("day", "n", "baseline", "lift", "trending")
      .collect().map(x => (x.getDate(0).toString, x.getLong(1),
        if (x.isNullAt(2)) -1.0 else x.getDouble(2),
        if (x.isNullAt(3)) -1.0 else x.getDouble(3), x.getBoolean(4))).toSeq
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val baseline = r12(4.0 / 3.0)
    assert(r == Seq(
      ("2024-01-01", 1L, -1.0, -1.0, false),
      ("2024-01-02", 1L, -1.0, -1.0, false),
      ("2024-01-03", 2L, -1.0, -1.0, false),
      ("2024-01-04", 4L, baseline, r12(4.0 / baseline), true)))
  }

  test("trendingEvents: windows are per event type; empty input total") {
    val ev = dayEv(
      (1L, "2024-01-01", "a"), (2L, "2024-01-02", "a"), (3L, "2024-01-03", "a"),
      (4L, "2024-01-04", "a"),
      (5L, "2024-01-04", "b")) // b has no history: baseline null
    val r = Behavior.trendingEvents(ev, lookback = 3)
      .select("event_type", "day", "baseline").collect()
      .map(x => (x.getString(0), x.getDate(1).toString, !x.isNullAt(2))).toSeq
    assert(r.filter(_._1 == "b") == Seq(("b", "2024-01-04", false)))
    assert(r.filter(_._1 == "a").count(_._3) == 1) // only day 4 has 3 predecessors
    assert(Behavior.trendingEvents(dayEv()).count() == 0)
  }
}
