package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one pass, hand-computed counts/range/decimal mean per column") {
    val df = Seq(
      (Some(1.0), Some(10L)), (Some(2.5), Some(10L)),
      (None, Some(30L)), (Some(2.5), None)
    ).toDF("x", "y")
    val p = Profiler.profile(df, Seq("x", "y"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toList
    def rd(v: Double) =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p == List(
      ("x", 4L, 1L, 2L, Some(1.0), Some(2.5), Some(rd((1.0 + 2.5 + 2.5) / 3))),
      ("y", 4L, 1L, 2L, Some(10.0), Some(30.0), Some(rd(50.0 / 3)))))
  }

  test("profile: all-null column keeps null range and mean; empty input yields zero-count rows") {
    val df = Seq((Some(1.0), Option.empty[Double]), (Some(2.0), None))
      .toDF("x", "z")
    val p = Profiler.profile(df, Seq("z")).collect().head
    assert(p.getLong(1) == 2L && p.getLong(2) == 2L && p.getLong(3) == 0L)
    assert(p.isNullAt(4) && p.isNullAt(5) && p.isNullAt(6))
    val e = Profiler.profile(df.limit(0), Seq("x", "z")).collect()
    assert(e.length == 2 && e.forall(r => r.getLong(1) == 0L && r.isNullAt(6)))
  }

  test("dqReport: planted orphans, childless parents, dup PKs, null FKs") {
    val parent = Seq(100L, 200L, 300L).toDF("pk")
    val child = Seq(
      (Some(100L), 1), (Some(100L), 1),           // duplicate (fk, line) PK
      (Some(200L), 1), (Some(999L), 2),           // 999 has no parent
      (None, 3)                                   // null FK (not an orphan)
    ).toDF("fk", "line")
    val r = Profiler.dqReport(child, parent, "fk", "pk", Seq("fk", "line"))
      .as[(String, Long)].collect().toMap
    assert(r == Map(
      "orphan_children" -> 1L,    // the 999 row
      "childless_parents" -> 1L,  // 300
      "duplicate_child_pk" -> 1L, // one violating PK group
      "null_child_fk" -> 1L))
  }

  test("dqReport: clean tables report all-zero violations (the report is total)") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq((1L, 1), (1L, 2), (2L, 1)).toDF("fk", "line")
    val r = Profiler.dqReport(child, parent, "fk", "pk", Seq("fk", "line"))
      .as[(String, Long)].collect().toMap
    assert(r.values.forall(_ == 0L) && r.size == 4)
  }

  test("histogram: integer-exact bins, nulls excluded, degenerate and empty inputs") {
    import org.apache.spark.sql.functions._
    // values 0..9 in 4 bins: span 10, width ceil(10/4)=3 → bins 0..3
    val df = (0L to 9L).map(Option(_)).:+(Option.empty[Long]).toDF("v")
    val h = Profiler.histogram(df, "v", bins = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(h == Seq((0L, 0L, 2L, 3L), (1L, 3L, 5L, 3L), (2L, 6L, 8L, 3L), (3L, 9L, 11L, 1L)))
    assert(h.map(_._4).sum == 10L, "the null row must not be counted")
    // single distinct value → width 1, one bin
    val one = Seq(7L, 7L, 7L).toDF("v")
    assert(Profiler.histogram(one, "v", bins = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq == Seq((0L, 7L, 7L, 3L)))
    // empty input → empty frame, not a throw
    assert(Profiler.histogram(df.where(lit(false)), "v", bins = 4).collect().isEmpty)
  }

  test("correlationMatrix: exact ±1 on linear columns, null r on constants, hand value") {
    import org.apache.spark.sql.functions._
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0)).toDF("x", "y2", "neg", "const")
    val r = Profiler.correlationMatrix(df, Seq("x", "y2", "neg", "const"))
      .as[(String, String, Option[Double], Long)].collect()
      .map { case (a, b, v, n) => (a, b) -> ((v, n)) }.toMap
    assert(r(("x", "y2"))._1.contains(1.0))
    assert(r.get(("neg", "x")).orElse(r.get(("x", "neg"))).exists(_._1.contains(-1.0)))
    // a constant column has zero variance → r undefined → null
    assert(r.filter(_._1.productIterator.contains("const")).forall(_._2._1.isEmpty))
    // ...including constants that are NOT double-exact (0.1: the double
    // cancellation test sees ±3e-18, the exact distinct guard sees 1)
    val tenth = Seq((1.0, 0.1), (2.0, 0.1), (3.0, 0.1)).toDF("x", "c")
    assert(Profiler.correlationMatrix(tenth, Seq("x", "c"))
      .as[(String, String, Option[Double], Long)].collect().head._3.isEmpty)
    assert(r.values.forall(_._2 == 4L))
    // hand-computed r for a non-degenerate pair
    val hand = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 5.0)).toDF("a", "b")
    val rv = Profiler.correlationMatrix(hand, Seq("a", "b"))
      .as[(String, String, Option[Double], Long)].collect().head._3.get
    // n=4 Σa=10 Σb=11 Σab=33 Σa²=30 Σb²=39: r=(132-110)/(sqrt(20)*sqrt(35))
    val expected = BigDecimal(22.0 / (math.sqrt(20.0) * math.sqrt(35.0)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rv == expected)
    // pairwise null deletion: a null in either column drops the row
    val withNull = Seq((Some(1.0), Some(1.0)), (None, Some(9.0)), (Some(2.0), Some(2.0)),
      (Some(3.0), None)).toDF("a", "b")
    val rn = Profiler.correlationMatrix(withNull, Seq("a", "b"))
      .as[(String, String, Option[Double], Long)].collect().head
    assert(rn._4 == 2L && rn._3.contains(1.0))
  }

  test("correlationMatrix: fast double arm agrees with the exact arm within 1e-6") {
    import org.apache.spark.sql.functions._
    // non-trivial values (fractional, negative, a null, correlated and
    // anti-correlated columns) so the arms' arithmetic actually diverges
    // in the low bits if at all
    val df = spark.range(0, 500).select(
      (col("id") * 0.37 - 91.5).as("x"),
      (col("id") * col("id") * 0.011 + 3.25).as("y"),
      (lit(1000.0) - col("id") * 2.5).as("z"),
      when(col("id") % 97 === 0, lit(null).cast("double"))
        .otherwise(sin(col("id").cast("double")) * 40.0).as("w"))
    def collect(exact: Boolean) =
      Profiler.correlationMatrix(df, Seq("x", "y", "z", "w"), exact = exact)
        .as[(String, String, Option[Double], Long)].collect()
        .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    val e = collect(exact = true)
    val f = collect(exact = false)
    assert(e.keySet == f.keySet && e.nonEmpty)
    e.foreach { case (k, (re, ne)) =>
      val (rf, nf) = f(k)
      assert(ne == nf, s"$k n mismatch: $ne vs $nf")
      assert(re.isDefined == rf.isDefined, s"$k definedness mismatch")
      re.zip(rf).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"$k arms disagree: $a vs $b") }
    }
    // the exact arm quantizes inputs at 4 dp, so the arms are NOT
    // bit-identical in general — the spec pins closeness, not equality
  }

  // ---- psiDrift ----

  /** Driver-side reference of psiDrift's exact contract: clamped integral
    * bucketing, full-grid Laplace smoothing, per-term round-12, exact
    * decimal term sums. */
  private def brutePsi(oldRows: Seq[(String, Long)], newRows: Seq[(String, Long)],
                       width: Long = 200L, b: Int = 10): Map[String, (Double, Long, Long)] = {
    def bucket(v: Long) = math.min(math.max(v / width, 0L), (b - 1).toLong)
    val grps = (oldRows.map(_._1) ++ newRows.map(_._1)).distinct
    grps.map { g =>
      val oc = oldRows.filter(_._1 == g).groupBy(r => bucket(r._2)).view.mapValues(_.size.toLong).toMap
      val nc = newRows.filter(_._1 == g).groupBy(r => bucket(r._2)).view.mapValues(_.size.toLong).toMap
      val totO = oc.values.sum; val totN = nc.values.sum
      val terms = (0 until b).map { i =>
        val p = (oc.getOrElse(i.toLong, 0L) + 1).toDouble / (totO + b)
        val q = (nc.getOrElse(i.toLong, 0L) + 1).toDouble / (totN + b)
        BigDecimal((p - q) * math.log(p / q))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val psi = terms.sum.setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      g -> ((psi, totO, totN))
    }.toMap
  }

  test("psiDrift: identical distributions score 0; a shifted group is flagged") {
    val oldDf = Seq(("s1", 10L), ("s1", 210L), ("s1", 410L),
      ("s2", 50L), ("s2", 60L), ("s2", 70L)).toDF("source", "n_chars")
    // s1 unchanged (same bucket counts), s2 jumps two buckets up
    val newDf = Seq(("s1", 20L), ("s1", 220L), ("s1", 420L),
      ("s2", 450L), ("s2", 460L), ("s2", 470L)).toDF("source", "n_chars")
    val got = Profiler.psiDrift(oldDf, newDf, "n_chars", "source")
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("s1")._1 == 0.0, s"identical dist must be PSI 0, got ${got("s1")}")
    assert(got("s2")._1 > 0.25, s"two-bucket shift must flag, got ${got("s2")}")
    val expected = brutePsi(
      Seq(("s1", 10L), ("s1", 210L), ("s1", 410L), ("s2", 50L), ("s2", 60L), ("s2", 70L)),
      Seq(("s1", 20L), ("s1", 220L), ("s1", 420L), ("s2", 450L), ("s2", 460L), ("s2", 470L)))
    assert(got == expected)
  }

  test("psiDrift: hashed-data brute parity, one-sided groups, clamps, repartition invariance") {
    val rng = new scala.util.Random(5)
    val oldRows = List.fill(300)((s"s${rng.nextInt(5)}", rng.nextInt(2500).toLong))
    // s9 exists only in the new snapshot; oversized values clamp to the top
    // bucket; a negative value clamps to bucket 0
    val newRows = List.fill(300)((s"s${rng.nextInt(5)}", rng.nextInt(2500).toLong)) ++
      List(("s9", 100L), ("s9", 999999L), ("s9", -3L))
    val expected = brutePsi(oldRows, newRows)
    val got = Profiler.psiDrift(oldRows.toDF("source", "n_chars"),
      newRows.toDF("source", "n_chars"), "n_chars", "source")
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    assert(got("s9")._2 == 0L && got("s9")._3 == 3L)
    val got2 = Profiler.psiDrift(oldRows.toDF("source", "n_chars").repartition(7),
      newRows.toDF("source", "n_chars").repartition(5), "n_chars", "source")
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got2 == expected)
    // both snapshots empty -> no groups, empty report
    assert(Profiler.psiDrift(oldRows.toDF("source", "n_chars").limit(0),
      newRows.toDF("source", "n_chars").limit(0), "n_chars", "source").count() == 0)
  }

  /** Brute two-sample KS over longs: max |F1−F2| at pooled values. */
  private def bruteKs(a: Seq[Long], b: Seq[Long]): Double = {
    val vals = (a ++ b).distinct.sorted
    val d = vals.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
    }.max
    BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("ksDrift: identical dists 0, disjoint dists 1, hand value, one-sided NULL") {
    val oldDf = Seq(("same", 10L), ("same", 20L), ("same", 30L),
      ("shift", 1L), ("shift", 2L), ("shift", 3L), ("shift", 4L),
      ("gone", 5L)).toDF("source", "n_chars")
    val newDf = Seq(("same", 10L), ("same", 20L), ("same", 30L),
      ("shift", 3L), ("shift", 4L), ("new", 7L)).toDF("source", "n_chars")
    val got = Profiler.ksDrift(oldDf, newDf, "n_chars", "source")
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getLong(2), r.getLong(3)))).toMap
    assert(got("same") == ((Some(0.0), 3L, 3L)))
    // shift: F_old at v=2 is 2/4, F_new 0 -> D = 1/2
    assert(got("shift") == ((Some(0.5), 4L, 2L)))
    // one-sided groups: statistic undefined, NULL not a fake 1.0
    assert(got("gone") == ((None, 1L, 0L)))
    assert(got("new") == ((None, 0L, 1L)))
    assert(got("shift")._1.get ==
      bruteKs(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L)))
  }

  test("ksDrift: brute parity on hashed data; disjoint supports hit D=1; repartition-invariant; empty") {
    val rng = new scala.util.Random(11)
    val a = List.fill(400)((s"g${rng.nextInt(4)}", rng.nextInt(1000).toLong))
    val b = List.fill(300)((s"g${rng.nextInt(4)}", (rng.nextInt(1000) + rng.nextInt(300)).toLong))
    val got = Profiler.ksDrift(a.toDF("source", "n_chars"),
        b.toDF("source", "n_chars"), "n_chars", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = (0 until 4).map { i =>
      val g = s"g$i"
      g -> bruteKs(a.filter(_._1 == g).map(_._2), b.filter(_._1 == g).map(_._2))
    }.toMap
    assert(got == want)
    // disjoint value supports: every cum pair is (k, 0) or (n, j) -> D = 1
    val dis = Profiler.ksDrift(
      Seq(("g", 1L), ("g", 2L)).toDF("source", "n_chars"),
      Seq(("g", 100L), ("g", 200L)).toDF("source", "n_chars"),
      "n_chars", "source").collect()
    assert(dis.length == 1 && dis.head.getDouble(1) == 1.0)
    val rep = Profiler.ksDrift(a.toDF("source", "n_chars").repartition(7),
        b.toDF("source", "n_chars").repartition(5), "n_chars", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rep == got)
    assert(Profiler.ksDrift(a.toDF("source", "n_chars").limit(0),
      b.toDF("source", "n_chars").limit(0), "n_chars", "source").count() == 0)
  }
}
