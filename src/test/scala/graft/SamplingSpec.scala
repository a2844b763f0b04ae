package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample: deterministic under repartitioning, rate within tolerance") {
    val df = (0L until 5000L).toDF("id")
    val a = Sampling.hashSample(df, "id", 200).as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(17), "id", 200).as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size - 1000) < 120, s"rate off: ${a.size}") // ±>4σ
    // a different salt gives a different (but rerun-stable) sample
    val c = Sampling.hashSample(df, "id", 200, salt = "v2").as[Long].collect().toSet
    assert(c != a && math.abs(c.size - 1000) < 120)
    // edges: 0‰ drops everything, 1000‰ keeps EVERYTHING (incl. the
    // md5 prefixes at the very top of the hex range)
    assert(Sampling.hashSample(df, "id", 0).count() == 0L)
    assert(Sampling.hashSample(df, "id", 1000).count() == 5000L)
  }

  test("sourceMix: per-source rates hit, unlisted sources dropped") {
    val df = (0L until 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val m = Sampling.sourceMix(df, "src", "id", Map("s0" -> 1000, "s1" -> 300))
      .as[(Long, String)].collect()
    val bySrc = m.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("s0") == 1000, "full-rate source keeps every row")
    assert(math.abs(bySrc("s1") - 300) < 70, s"mixture rate off: ${bySrc("s1")}")
    assert(!bySrc.contains("s2"), "unlisted source must be dropped")
    // mixture is a subset of the corpus and deterministic
    val again = Sampling.sourceMix(df, "src", "id", Map("s0" -> 1000, "s1" -> 300))
      .as[(Long, String)].collect()
    assert(again.toSet == m.toSet)
  }

  test("stratifiedSplit: disjoint, exhaustive, rate-accurate, growth-stable") {
    val df = (0L until 5000L).toDF("id")
    val s = Sampling.stratifiedSplit(df, "id", valPermille = 100, testPermille = 100)
      .as[(Long, String)].collect()
    assert(s.length == 5000, "every row gets exactly one split")
    val byS = s.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byS("val") - 500) < 90, s"val rate off: ${byS("val")}")
    assert(math.abs(byS("test") - 500) < 90, s"test rate off: ${byS("test")}")
    assert(byS("train") == 5000 - byS("val") - byS("test"))
    // partition-layout invariance
    val r = Sampling.stratifiedSplit(df.repartition(11), "id", 100, 100)
      .as[(Long, String)].collect()
    assert(r.toSet == s.toSet)
    // growth stability: a row's split NEVER changes when the corpus grows —
    // the anti-leakage property (an eval doc can't migrate into train)
    val grown = Sampling.stratifiedSplit((0L until 10000L).toDF("id"), "id", 100, 100)
      .as[(Long, String)].collect().toMap
    s.foreach { case (id, sp) => assert(grown(id) == sp, s"row $id migrated") }
    // val+test over 1000‰ is a caller bug, not a silent clamp
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSplit(df, "id", 800, 300)
    }
  }

  test("sampleExactK: exact count, repartition-stable, samples nest") {
    val df = (0L until 2000L).toDF("id")
    val k100 = Sampling.sampleExactK(df, "id", 100).as[Long].collect().toSeq
    assert(k100.size == 100)
    val again = Sampling.sampleExactK(df.repartition(7), "id", 100)
      .as[Long].collect().toSeq
    assert(again == k100, "sample must not depend on partition layout")
    // nesting: growing k extends the sample, never re-draws it
    val k250 = Sampling.sampleExactK(df, "id", 250).as[Long].collect().toSeq
    assert(k250.take(100) == k100)
    // growth stability: new rows only displace from the tail
    val grownTop = Sampling.sampleExactK((0L until 4000L).toDF("id"), "id", 100)
      .as[Long].collect().toSet
    assert(k100.toSet.intersect(grownTop).size >= 40, "hash order is stable")
    // the plan is a bounded top-k, not a global sort
    val plan = Sampling.sampleExactK(df, "id", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("temperatureMixPermille: α=1 natural, α=0 uniform-mass, cap, overflow-safe") {
    val counts = Map("a" -> 9000L, "b" -> 900L, "c" -> 100L)
    // α=1: every source keeps the same RATE target/total → proportions kept
    val nat = Sampling.temperatureMixPermille(counts, 1.0, targetRows = 5000L)
    assert(nat.values.toSet.size == 1 && nat("a") == 500)
    // α=0: equal MASS per source → small sources asked for more than they
    // have cap at 1000; the big source's rate shrinks accordingly
    val flat = Sampling.temperatureMixPermille(counts, 0.0, targetRows = 3000L)
    assert(flat("c") == 1000, s"oversubscribed source must cap: $flat")
    assert(flat("a") == 111, s"1000*1000/9000 floored: $flat") // mass 1000 over 9000 rows
    // α=0.5 lies between: sqrt weights favor small sources vs natural
    val mid = Sampling.temperatureMixPermille(counts, 0.5, targetRows = 5000L)
    assert(mid("c") > nat("c") && mid("a") < nat("a"))
    // 100 TB-sized counts: BigInt path, no Long overflow
    val big = Sampling.temperatureMixPermille(
      Map("x" -> 90000000000L, "y" -> 10000000000L), 0.5, 50000000000L)
    assert(big.values.forall(p => p >= 0 && p <= 1000))
  }

  test("temperatureMix: expected total hit, repartition-invariant, mixture flattened") {
    val df = ((0L until 8000L).map(i => (i, "big")) ++
      (8000L until 9000L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(df, "source", "doc_id", 0.5, targetRows = 4500L)
      .as[(Long, String)].collect()
    // expected total within sampling noise of the target
    assert(math.abs(kept.length - 4500) < 300, s"got ${kept.length}")
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // sqrt temperature: small source keeps a ~3x higher RATE than big
    val rBig = bySource("big").toDouble / 8000
    val rSmall = bySource("small").toDouble / 1000
    assert(rSmall / rBig > 2.0 && rSmall / rBig < 4.0, s"rates: $rSmall vs $rBig")
    val again = Sampling.temperatureMix(df.repartition(7), "source", "doc_id",
      0.5, targetRows = 4500L).as[(Long, String)].collect()
    assert(again.sortBy(_._1).toSeq == kept.sortBy(_._1).toSeq)
  }

  test("epochPlanPermille: cap, full+residual, fractional-only, unknown source dropped") {
    val plan = Sampling.epochPlanPermille(
      Map("a" -> 1000L, "b" -> 1000L, "c" -> 1000L),
      Map("a" -> 500, "b" -> 250, "c" -> 30, "ghost" -> 100),
      budgetTokens = 10000L, maxEpochs = 3)
    assert(plan("a") == ((3, 0)))       // target 5000 = 5 epochs → capped, no residual
    assert(plan("b") == ((2, 500)))     // target 2500 → 2 full + half pass
    assert(plan("c") == ((0, 300)))     // target 300 → fractional-only
    assert(!plan.contains("ghost"))     // no tokens observed → dropped
    // 100 TB-sized counts: BigInt path
    val big = Sampling.epochPlanPermille(Map("x" -> 5000000000000L),
      Map("x" -> 1000), budgetTokens = 9000000000000L, maxEpochs = 4)
    assert(big("x") == ((1, 800)))
  }

  test("epochExpand: per-epoch copies + deterministic fractional pass, repartition-stable") {
    val df = (0L until 1000L).map(i => (i, if (i < 800) "big" else "small"))
      .toDF("doc_id", "source")
    val plan = Map("big" -> ((2, 250)), "small" -> ((0, 500)))
    val out = Sampling.epochExpand(df, "source", "doc_id", plan)
      .as[(Long, String, Long)].collect()
    val byEpoch = out.groupBy(t => (t._2, t._3)).view.mapValues(_.length).toMap
    // full epochs are complete copies
    assert(byEpoch(("big", 0L)) == 800 && byEpoch(("big", 1L)) == 800)
    // fractional passes are hash-gated subsets near the planned rate
    assert(math.abs(byEpoch(("big", 2L)) - 200) < 60, s"got ${byEpoch(("big", 2L))}")
    assert(math.abs(byEpoch(("small", 0L)) - 100) < 40, s"got ${byEpoch(("small", 0L))}")
    assert(!byEpoch.keySet.exists(_._2 > 2))
    // the fractional subset equals the standalone hash gate (same salt):
    // the residual pass IS hashSample at the residual rate
    val gated = Sampling.hashSample(df.where($"source" === "big"), "doc_id", 250)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(out.filter(t => t._2 == "big" && t._3 == 2L).map(_._1).toSet == gated)
    // deterministic under repartitioning
    val again = Sampling.epochExpand(df.repartition(7), "source", "doc_id", plan)
      .as[(Long, String, Long)].collect()
    assert(again.sortBy(t => (t._1, t._3)).toSeq == out.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("epochMix: realized token mass tracks each source's budget share") {
    val df = (0L until 2000L).map(i =>
      (i, if (i % 4 == 0) "small" else "big", 10L)).toDF("doc_id", "source", "n_tok")
    // budget 40000: big share 30000 over 15000 tokens → 2 full epochs;
    // small share 8000 over 5000 tokens → 1 full + 600‰ pass
    val out = Sampling.epochMix(df, "source", "doc_id", "n_tok",
        Map("big" -> 750, "small" -> 200), budgetTokens = 40000L, maxEpochs = 3)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out("big") == 3000L)                      // exactly 2 epochs × 1500
    assert(math.abs(out("small") - 800L) < 80L)      // 500 + ~300 gated
  }

  test("groupCap: at most cap per group, equals the window spelling, salt redraws") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (0L until 900L).map(i => (i, s"g${i % 3}", s"payload_$i"))
      .toDF("id", "grp", "payload")
    val capped = Sampling.groupCap(df, "grp", "id", cap = 50, salt = "s1")
    val sizes = capped.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 50L), s"every group holds 300 > cap: $sizes")
    // the bounded-heap result must equal the row_number window spelling
    val viaWindow = df.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(
          md5(concat(col("id").cast("string"), lit(":s1"))), col("id"))))
      .where(col("rn") <= 50).drop("rn")
      .as[(Long, String, String)].collect().toSet
    assert(capped.as[(Long, String, String)].collect().toSet == viaWindow)
    // partition-invariant; salt redraws without changing group sizes
    val again = Sampling.groupCap(df.repartition(13), "grp", "id", cap = 50, salt = "s1")
    assert(again.as[(Long, String, String)].collect().toSet == viaWindow)
    val redrawn = Sampling.groupCap(df, "grp", "id", cap = 50, salt = "s2")
      .as[(Long, String, String)].collect().toSet
    assert(redrawn != viaWindow && redrawn.size == 150)
    // a group smaller than the cap passes through whole
    val small = df.where(col("id") < 10)
    assert(Sampling.groupCap(small, "grp", "id", cap = 50).count() == 10L)
  }

  test("groupCap: a key recurring across groups cannot resurrect capped-out rows") {
    // key k1 lives in BOTH groups; in g1 it survives the cap, in g2 it is
    // ranked out — the g2 row must stay dropped (the keep-set must match
    // on (group, key), not key alone)
    val df = Seq(("g1", "k1"), ("g2", "k1"), ("g2", "k2"), ("g2", "k3"))
      .toDF("grp", "key")
    // find a salt where g2's heap of size 2 evicts k1 (rank order varies
    // by salt; try a few deterministically)
    val salt = (0 until 50).map(i => s"s$i").find { s =>
      val kept = Sampling.groupCap(df.where(org.apache.spark.sql.functions.col("grp") === "g2"),
          "grp", "key", cap = 2, salt = s)
        .select("key").as[String].collect().toSet
      !kept.contains("k1")
    }
    assert(salt.nonEmpty, "some salt must rank k1 out of g2's top-2")
    val out = Sampling.groupCap(df, "grp", "key", cap = 2, salt = salt.get)
      .as[(String, String)].collect().toSet
    assert(out.contains(("g1", "k1")), "g1 keeps its only row")
    assert(!out.contains(("g2", "k1")), "g1's keep of k1 must not resurrect g2's k1 row")
    assert(out.count(_._1 == "g2") == 2, "g2 holds exactly cap rows")
  }

  test("weightedSample: weight-proportional, deterministic, nesting, top-k plan") {
    import graft.operators.Sampling
    // 500 light (w=1) vs 500 heavy (w=100) rows: the k=100 sample must be
    // dominated by heavy rows (each heavy row is ~100× likelier)
    val df = ((0L until 500L).map((_, 1L)) ++ (500L until 1000L).map((_, 100L)))
      .toDF("id", "w")
    val s = Sampling.weightedSample(df, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(s.size == 100)
    assert(s.count(_ >= 500L) > 85, s"heavy rows: ${s.count(_ >= 500L)}")
    // deterministic under repartition; samples NEST (fixed priorities →
    // top-k prefix property); salt redraws
    val rep = Sampling.weightedSample(df.repartition(7), "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(rep == s)
    val s40 = Sampling.weightedSample(df, "id", "w", k = 40)
      .select("id").as[Long].collect().toSet
    assert(s40.subsetOf(s))
    val salted = Sampling.weightedSample(df, "id", "w", k = 100, salt = "v2")
      .select("id").as[Long].collect().toSet
    assert(salted != s)
    // non-positive weights carry no mass; zero-weight-only input is empty
    val z = Sampling.weightedSample(
      Seq((1L, 0L), (2L, -5L), (3L, 2L)).toDF("id", "w"), "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(z == Seq(3L))
    // per-partition heaps, never a global sort
    val plan = Sampling.weightedSample(df, "id", "w", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
    assert(Sampling.weightedSample(df.limit(0), "id", "w", k = 10).count() == 0)
  }

  test("leakFreeSplit: train text in eval demotes the eval copy only") {
    // 200 docs over 20 shared texts: every text group spans both splits
    // with near-certainty, so leakage is exercised heavily
    val docs = (0L until 200L).map(i => (i, s"shared text number ${i % 20}"))
      .toDF("doc_id", "text")
    val out = Sampling.leakFreeSplit(docs, "doc_id", testPermille = 200)
      .as[(Long, String)].collect().toMap
    assert(out.size == 200)
    assert(out.values.toSet.subsetOf(Set("train", "test", "test_leaked")))
    // brute-force expectation from the published gate
    val base = Sampling.stratifiedSplit(docs, "doc_id", 0, 200)
      .select("doc_id", "text", "split").as[(Long, String, String)].collect()
    val trainTexts = base.filter(_._3 == "train").map(_._2).toSet
    base.foreach { case (id, text, split) =>
      val expected =
        if (split == "test" && trainTexts(text)) "test_leaked" else split
      assert(out(id) == expected, s"doc $id: ${out(id)} != $expected")
    }
    // train labels are never rewritten, and a test-only duplicate stays test
    val testOnly = Seq((1000L, "eval only dup"), (1001L, "eval only dup"))
    val withPair = docs.unionByName(testOnly.toDF("doc_id", "text"))
    val r2 = Sampling.leakFreeSplit(withPair, "doc_id", testPermille = 1000)
      .as[(Long, String)].collect().toMap // everything lands in test
    assert(r2(1000L) == "test" && r2(1001L) == "test")
    // repartition determinism
    val rep = Sampling.leakFreeSplit(docs.repartition(7), "doc_id", 200)
      .as[(Long, String)].collect().toMap
    assert(rep == out)
    assert(Sampling.leakFreeSplit(docs.limit(0), "doc_id", 200).count() == 0)
  }
}
