package graft

import graft.functions.{JaccardImpl, TextHashImpl, TopKAgg}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Property-style checks for the custom kernels over seeded random inputs:
  * the example-based specs pin behavior on chosen cases; these pin the
  * algebraic laws on 100s of generated ones (deterministic seed).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def arrData(s: Seq[Long]) = new GenericArrayData(s.sorted.distinct.toArray)

  test("jaccardSorted == brute-force set jaccard on random long sets") {
    val rng = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val a = List.fill(rng.nextInt(30))(rng.nextInt(100).toLong - 50)
      val b = List.fill(rng.nextInt(30))(rng.nextInt(100).toLong - 50)
      val sa = a.toSet
      val sb = b.toSet
      val expected =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      val got = JaccardImpl.jaccardSorted(arrData(a), arrData(b))
      assert(got == expected, s"a=$sa b=$sb")
    }
  }

  test("simhash/minhash are pure functions of the text") {
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    val rng = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val t = UTF8String.fromString(
        List.fill(1 + rng.nextInt(40))(vocab(rng.nextInt(vocab.length))).mkString(" "))
      assert(TextHashImpl.simhash64(t) == TextHashImpl.simhash64(t))
      val s1 = TextHashImpl.minhash(t, 3, 16)
      assert(s1.toSeq == TextHashImpl.minhash(t, 3, 16).toSeq && s1.length == 16)
    }
  }

  test("minhash similarity estimates jaccard within statistical tolerance") {
    // two texts sharing a 20-word run: estimator should approach the true
    // jaccard of their 3-shingle sets (18 shared / 58 distinct)
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = (21 to 60).map(i => s"tok$i").mkString(" ")
    val sa = TextHashImpl.minhash(UTF8String.fromString(a), 3, 256)
    val sb = TextHashImpl.minhash(UTF8String.fromString(b), 3, 256)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256.0
    val truth = 18.0 / 58.0
    assert(math.abs(est - truth) < 0.12, s"est=$est truth=$truth")
  }

  test("TopKAgg == sort-take on random grouped data") {
    val rng = new scala.util.Random(13)
    (1 to 10).foreach { _ =>
      val k = 1 + rng.nextInt(5)
      val vs = List.fill(60)(rng.nextInt(2000).toLong - 1000)
      val rows = vs.zipWithIndex.map { case (v, i) => (i % 3, v, i.toLong) }
      val df = rows.toDF("g", "v", "i")
      val got = df.groupBy("g").agg(TopKAgg.topK(struct(col("v"), col("i")), k).as("t"))
        .select(col("g"), col("t.v").as("vs")).as[(Int, Seq[Long])].collect().toMap
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted.take(k).map(_._1)
      }
      expected.foreach { case (g, want) => assert(got(g) == want, s"k=$k group $g") }
    }
  }

  test("guarded hexLong: native == Column formulation on generated inputs") {
    val rng = new scala.util.Random(99)
    val hexChars = "0123456789abcdefABCDEF"
    val junkChars = hexChars + "ghxyz -!"
    def gen(chars: String, max: Int) =
      List.fill(rng.nextInt(max))(chars(rng.nextInt(chars.length))).mkString
    val inputs = (1 to 150).map(_ => gen(hexChars, 70)) ++
      (1 to 150).map(_ => gen(junkChars, 70)) ++
      (1 to 50).map(_ => "0" * rng.nextInt(66) + gen(hexChars, 18))
    val both = inputs.toDF("h")
      .select(graft.functions.HexUtils.hexLongGuarded($"h").as("native"),
        graft.operators.ReceiptClassifier.hexLongRef($"h").as("ref"))
      .as[(Option[Long], Option[Long])].collect()
    inputs.zip(both).foreach { case (in, (n, r)) =>
      assert(n == r, s"input [$in]")
    }
  }

  test("hexWordDecimal: native decimal string == BigInteger ground truth") {
    val rng = new scala.util.Random(5)
    (1 to 200).foreach { _ =>
      val digits = 1 + rng.nextInt(31)
      val hex = List.fill(digits)("0123456789abcdef"(rng.nextInt(16))).mkString
      val word = "0" * (64 - digits) + hex
      val got = graft.functions.HexWordImpl.hexWordDecimal(
        org.apache.spark.unsafe.types.UTF8String.fromString(word))
      val want = new java.math.BigInteger(hex, 16).toString
      assert(got != null && got.toString == want, s"word $word")
    }
    // out-of-range and garbage words are null, never a crash
    assert(graft.functions.HexWordImpl.hexWordDecimal(
      org.apache.spark.unsafe.types.UTF8String.fromString("f" * 64)) == null)
    assert(graft.functions.HexWordImpl.hexWordDecimal(
      org.apache.spark.unsafe.types.UTF8String.fromString("0" * 63 + "g")) == null)
  }

  test("dotFloat == plain scala fold on random vectors") {
    val rng = new scala.util.Random(21)
    (1 to 100).foreach { _ =>
      val n = 1 + rng.nextInt(80)
      val a = Array.fill(n)(rng.nextFloat() * 4 - 2)
      val b = Array.fill(n)(rng.nextFloat() * 4 - 2)
      val got = graft.functions.DotImpl.dotFloat(
        new GenericArrayData(a), new GenericArrayData(b))
      var want = 0.0d
      (0 until n).foreach(i => want += a(i).toDouble * b(i).toDouble)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want))
    }
  }

  test("prefix-indexed jaccard == all-pairs on randomized overlapping docs") {
    val rng = new scala.util.Random(31)
    val vocab = (1 to 60).map(i => s"w$i")
    def doc(n: Int) = List.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")
    // random docs + near-dup pairs built by word substitution
    val bases = (0 until 12).map(i => (i.toLong, doc(8 + rng.nextInt(25)), s"s${i % 3}"))
    val dups = bases.take(5).map { case (id, t, s) =>
      val w = t.split(" "); w(rng.nextInt(w.length)) = "sub"
      (id + 100, w.mkString(" "), s)
    }
    val docs = (bases ++ dups).toDF("doc_id", "text", "source")
    for (t <- Seq(0.05, 0.3); byFreq <- Seq(false, true); salt <- Seq(1, 3)) {
      val indexed = graft.operators.Dedup.ngramJaccardPairsIndexed(docs, t, byFreq, salt)
        .collect().map(_.toSeq).toSeq
      val allPairs = graft.operators.Dedup.ngramJaccardPairsBalanced(docs, t, buckets = 4)
        .collect().map(_.toSeq).toSeq
      assert(indexed == allPairs, s"t=$t byFreq=$byFreq salt=$salt")
      assert(allPairs.nonEmpty, "dup construction must produce pairs")
    }
  }

  test("dupClusters == union-find on random graphs") {
    val rng = new scala.util.Random(11)
    (1 to 8).foreach { _ =>
      val n = 2 + rng.nextInt(30)
      val edges = List.fill(1 + rng.nextInt(40))(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // reference: plain union-find over the same edges
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(v => v -> find(v)).toMap
        val got = graft.operators.Dedup.dupClusters(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        // same vertex set; same PARTITION (min-root canonical labels agree)
        assert(got.keySet == expected.keySet)
        got.foreach { case (v, c) => assert(c == expected(v), s"vertex $v: $got vs $expected") }
      }
    }
  }

  test("CMS laws on random streams: never-underestimate, exact merge, exact total") {
    import graft.functions.CmsImpl
    val rng = new scala.util.Random(13)
    (1 to 40).foreach { _ =>
      // zipf-ish stream over a small id space (forces counter collisions
      // at width 64 — the interesting regime)
      val stream = List.fill(200 + rng.nextInt(400))(
        rng.nextInt(1 + rng.nextInt(80)).toLong)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val one = CmsImpl.empty(4, 64)
      stream.foreach(h => CmsImpl.add(one, h, 1L))
      val oneBytes = CmsImpl.serialize(one)
      // (a) never an underestimate, for seen AND unseen items
      (truth.keys ++ Seq(-1L, 999L)).foreach { h =>
        assert(CmsImpl.estimate(oneBytes, h) >= truth.getOrElse(h, 0L))
      }
      // (b) any slicing merges byte-identically to the one-pass build
      val k = 1 + rng.nextInt(4)
      val parts = stream.zipWithIndex.groupBy(_._2 % k).values.map { slice =>
        val b = CmsImpl.empty(4, 64)
        slice.foreach { case (h, _) => CmsImpl.add(b, h, 1L) }
        b
      }
      val merged = CmsImpl.empty(4, 64)
      parts.foreach(p => CmsImpl.mergeInto(merged, p))
      assert(java.util.Arrays.equals(CmsImpl.serialize(merged), oneBytes))
      // (c) the header total is the exact stream length
      assert(CmsImpl.total(oneBytes) == stream.length.toLong)
    }
  }

  test("dotFloatInt == reference fold on random arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rng = new scala.util.Random(29)
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(80)
      val fs = Array.fill(n)(rng.nextFloat() * 4f - 2f)
      val is = Array.fill(n)(rng.nextInt(256))
      val expected = {
        var acc = 0.0d; var i = 0
        while (i < n) { acc += fs(i).toDouble * is(i).toDouble; i += 1 }
        acc
      }
      val got = graft.functions.DotImpl.dotFloatInt(
        new GenericArrayData(fs), new GenericArrayData(is))
      assert(got == expected)
    }
  }

  test("winnowing: shared long runs share fingerprints; disjoint texts don't") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"aa bb cc $shared"),
      (1L, s"$shared xx yy zz"),
      (2L, (100 to 120).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fps = graft.operators.TextMetrics.winnow(docs)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(0L).toSet.intersect(fps(1L).toSet).nonEmpty)
    assert(fps(0L).toSet.intersect(fps(2L).toSet).isEmpty)
  }

  test("embeddingDrift laws on random snapshots: self-drift 0, lower bound vs any dim, null one-sided") {
    val rng = new scala.util.Random(91)
    val rows = (0 until 200).map { i =>
      (s"g${i % 5}", Array.fill(8)(rng.nextDouble() * 4.0 - 2.0))
    }
    val df = rows.toDF("src", "embedding")
    // identical snapshots drift exactly 0 in every group — the quantized
    // sums cancel term-for-term, no float luck involved
    val self = graft.operators.Ann.embeddingDrift(df, df, "src")
      .as[(String, Option[Long], Option[Long], Option[Double], Option[Long])].collect()
    assert(self.length == 5 && self.forall(_._4.contains(0.0)))
    // against a driver-side brute mean-shift: equal within quantization
    // (1/2^20 per component => < 3e-5 on the L2 over 8 dims)
    val rng2 = new scala.util.Random(17)
    val rowsB = (0 until 150).map { i =>
      (s"g${i % 5}", Array.fill(8)(rng2.nextDouble() * 4.0 - 2.0))
    }
    val dfB = rowsB.toDF("src", "embedding")
    val got = graft.operators.Ann.embeddingDrift(df, dfB, "src")
      .as[(String, Option[Long], Option[Long], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> r._4.get).toMap
    def mean(vs: Seq[Array[Double]]): Array[Double] =
      vs.transpose.map(c => c.sum / c.size).toArray
    (0 until 5).foreach { g =>
      val a = mean(rows.filter(_._1 == s"g$g").map(_._2))
      val b = mean(rowsB.filter(_._1 == s"g$g").map(_._2))
      val brute = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(got(s"g$g") - brute) < 3e-5,
        s"g$g: got ${got(s"g$g")} brute $brute")
    }
  }

  test("lexicalDiversity invariants on random corpora: hapax <= types <= tokens, ratios in range") {
    val rng = new scala.util.Random(23)
    val vocab = (1 to 40).map(i => s"w$i")
    val docs = (0 until 120).map { i =>
      (i.toLong, List.fill(1 + rng.nextInt(50))(vocab(rng.nextInt(vocab.size)))
        .mkString(" "), s"s${i % 4}")
    }.toDF("doc_id", "text", "source")
    val got = graft.operators.TextMetrics.lexicalDiversity(docs)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(got.length == 4)
    got.foreach { case (src, tok, typ, hap, ttr, hr) =>
      assert(hap <= typ && typ <= tok, s"$src ordering")
      assert(ttr > 0.0 && ttr <= 1.0, s"$src ttr $ttr")
      assert(hr >= 0.0 && hr <= 1.0, s"$src hapax ratio $hr")
      // cross-check against a driver-side count
      val toks = docs.where(col("source") === src)
        .as[(Long, String, String)].collect()
        .flatMap(_._2.split(" ")).filter(_.nonEmpty)
      assert(tok == toks.length && typ == toks.distinct.length &&
        hap == toks.groupBy(identity).count(_._2.length == 1), s"$src counts")
    }
  }
}
