package graft

import org.apache.spark.sql.functions._

/** The documented 100 TB fallbacks for exact-but-unscalable aggregates:
  * percentile_approx (t-digest) and approx_count_distinct (HLL) are
  * partial-aggregable where their exact twins are not. These tests pin the
  * error bounds the scale path actually delivers on real data.
  */
class ApproxAggSpec extends SparkSpec {

  private lazy val customer = Tables.customer(spark, "/root/testdata/sf0.01")

  test("percentile_approx tracks exact percentile within accuracy bound") {
    val r = customer.groupBy("c_mktsegment").agg(
      expr("percentile(c_acctbal, 0.5)").as("exact"),
      expr("percentile_approx(c_acctbal, 0.5, 1000)").as("approx"),
      (max("c_acctbal") - min("c_acctbal")).as("range")
    ).collect()
    r.foreach { row =>
      val err = math.abs(row.getAs[Double]("exact") - row.getAs[Double]("approx"))
      assert(err <= row.getAs[Double]("range") * 0.02,
        s"approx median off by $err for ${row.getString(0)}")
    }
  }

  test("segmentPercentilesApprox tracks the exact reporting operator") {
    import graft.operators.Analytics
    val exact = Analytics.segmentPercentiles(customer).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Analytics.segmentPercentilesApprox(customer).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (m, p90) = exact(r.getString(0))
      // at accuracy=10000 on ~3k rows/segment the sketch is near-exact
      assert(math.abs(r.getDouble(1) - m) <= math.abs(m) * 0.05 + 50.0)
      assert(math.abs(r.getDouble(2) - p90) <= math.abs(p90) * 0.05 + 50.0)
      assert(r.getAs[Long]("n_nations_approx") >= 20 && r.getAs[Long]("n_nations_approx") <= 30)
    }
  }

  test("approx_count_distinct within configured rsd of exact") {
    val r = customer.agg(
      countDistinct("c_custkey").as("exact"),
      approx_count_distinct("c_custkey", rsd = 0.02).as("approx")
    ).collect()(0)
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.06) // 3x rsd margin
  }

  test("trust graph view: latest edge wins, revoked edges drop") {
    import spark.implicits._
    val details = Seq(
      ("0xa1", "u1", "v1", 50L),
      ("0xa2", "u1", "v1", 80L), // later hash → wins
      ("0xa3", "u2", "v1", 100L),
      ("0xa4", "u3", "v2", 60L),
      ("0xa5", "u3", "v2", 0L) // revoked
    ).toDF("hash", "user", "can_send_to", "limit")
    val g = graft.operators.ReceiptClassifier.currentTrustGraph(details)
      .as[(String, String, Long)].collect().toSet
    assert(g == Set(("u1", "v1", 80L), ("u2", "v1", 100L)))
  }

  test("sketch table: rollup from stored sketches tracks exact distinct counts") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("day", col("ts").cast("date"))
    val daily = graft.operators.Analytics.hllSketchTable(ev, "user_id", Seq("event_type", "day"))
    // the sketch table is small: one row per (type, day), fixed-size sketch
    assert(daily.count() == ev.select("event_type", "day").distinct().count())
    val got = graft.operators.Analytics.distinctFromSketches(daily, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val rel = math.abs(got(k) - n).toDouble / n
      assert(rel < 0.05, s"$k: sketch ${got(k)} vs exact $n (rel $rel)")
    }
    // merging stored partials tracks a direct one-shot sketch (sparse/dense
    // transitions may differ → tolerance, not equality)
    val direct = graft.operators.Analytics.distinctFromSketches(
        graft.operators.Analytics.hllSketchTable(ev, "user_id", Seq("event_type")),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (k, n) =>
      assert(math.abs(got(k) - n).toDouble / math.max(n, 1) < 0.02)
    }
  }

  test("sketch set-algebra: pairwise overlap from stored sketches tracks exact intersections") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("day", col("ts").cast("date"))
    val daily = graft.operators.Analytics.hllSketchTable(ev, "user_id", Seq("event_type", "day"))
    val got = graft.operators.Analytics.distinctOverlapFromSketches(daily, "event_type")
      .select("group_a", "group_b", "overlap_est")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val types = ev.select("event_type").distinct().as[String].collect().sorted
    assert(got.keySet == types.combinations(2).map(p => (p(0), p(1))).toSet)
    // exact intersection per pair (users active in BOTH types)
    val sets = types.map(t => t -> ev.where($"event_type" === t)
      .select("user_id").distinct().as[Long].collect().toSet).toMap
    got.foreach { case ((a, b), est) =>
      val exact = (sets(a) & sets(b)).size
      // overlap inherits the additive error of three HLL terms — allow 10%
      // of the UNION size (the error scale), not of the tiny intersection
      val tol = math.max(0.10 * (sets(a) | sets(b)).size, 3.0)
      assert(math.abs(est - exact) <= tol, s"($a,$b): est $est vs exact $exact")
    }
    // disjoint synthetic groups clamp at 0-ish: two id ranges never overlap
    val syn = (0L until 500L).map(i => (i, if (i < 250) "g1" else "g2"))
      .toDF("user_id", "event_type").withColumn("day", lit("2024-01-01"))
    val d = graft.operators.Analytics.distinctOverlapFromSketches(
      graft.operators.Analytics.hllSketchTable(syn, "user_id", Seq("event_type", "day")),
      "event_type").collect().head
    assert(d.getAs[Long]("overlap_est") <= 15) // ≈0 at HLL error scale, never negative
    assert(d.getAs[Long]("overlap_est") >= 0)
  }
}
