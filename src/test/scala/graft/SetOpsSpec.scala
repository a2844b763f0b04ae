package graft

import graft.functions.SetOps
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SetOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jaccardSorted matches exact string-set jaccard") {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g x"),
      (2L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(col("text"))
    val hashed = docs.select(
      col("doc_id"), sh.as("sh"), SetOps.sortedShingleHashes(sh).as("hs"))
    val pairs = hashed.as("a").crossJoin(hashed.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        SetOps.jaccardSorted(col("a.hs"), col("b.hs")).as("fast"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("exact"))
      .as[(Long, Long, Double, Double)].collect()
    pairs.foreach { case (_, _, fast, exact) => assert(fast == exact) }
    assert(pairs.exists(_._3 > 0)) // overlapping docs score > 0
  }

  test("triangle-bucket balanced pair join equals the naive blocked join") {
    import graft.operators.Dedup
    // 40 docs in 2 sources with overlapping word-salads → nontrivial pairs
    val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0L until 40L).map { i =>
      val text = (0 until 10).map(j => words(((i + j) % 8).toInt)).mkString(" ")
      (i, text, s"src${i % 2}")
    }.toDF("doc_id", "text", "source")
    def naive = {
      val d = docs.select(col("doc_id"), col("source"),
        graft.functions.SetOps.sortedShingleHashes(Dedup.shingles(col("text"))).as("sh"))
      d.as("a").join(d.as("b"),
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          graft.functions.SetOps.jaccardSorted(col("a.sh"), col("b.sh")).as("jaccard"))
        .where(col("jaccard") >= 0.1)
    }
    val a = naive.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Dedup.ngramJaccardPairsBalanced(docs, 0.1, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("native shingleHashes matches the HOF sort/distinct/hash chain") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "one two"), // fewer words than k
      (2L, "single")
    ).toDF("doc_id", "text")
    val both = docs.select(
      graft.functions.TextHashes.shingleHashes(col("text")).as("native"),
      SetOps.sortedShingleHashes(Dedup.shingles(col("text"))).as("hof")
    ).as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (n, h) => assert(n == h) }
  }

  test("jaccardSorted edge cases: identical and disjoint") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 1.0),
      (Seq(1L, 2L), Seq(3L, 4L), 0.0),
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), 0.5)
    ).toDF("a", "b", "expected")
    val r = df.select(SetOps.jaccardSorted(col("a"), col("b")).as("j"), col("expected"))
      .as[(Double, Double)].collect()
    r.foreach { case (j, e) => assert(j == e) }
  }

  test("sortedPairs kernel matches the nested-transform HOF row-for-row") {
    def hofPairs(items: org.apache.spark.sql.Column) =
      flatten(transform(items, (x, i) => transform(
        slice(items, i + lit(2), size(items)),
        y => struct(x.as("a"), y.as("b")))))
    // long items (the q_basket_affinity shape)
    val longs = Seq(
      Seq(1L, 2L, 3L, 4L), Seq(10L), Seq.empty[Long], Seq(5L, 5L, 7L))
      .toDF("items")
    val lb = longs.select(
        graft.functions.SetOps.sortedPairs(col("items")).cast("string").as("native"),
        hofPairs(col("items")).cast("string").as("hof"))
      .as[(String, String)].collect()
    lb.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
    // string items (the spec corpus shape)
    val strs = Seq(Seq("a", "b", "c"), Seq("x"), Seq.empty[String]).toDF("items")
    val sb = strs.select(
        graft.functions.SetOps.sortedPairs(col("items")).cast("string").as("native"),
        hofPairs(col("items")).cast("string").as("hof"))
      .as[(String, String)].collect()
    sb.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
    // null array -> null
    val nul = Seq(Option.empty[Seq[Long]]).toDF("items")
      .select(graft.functions.SetOps.sortedPairs(col("items")).as("p")).collect().head
    assert(nul.isNullAt(0))
  }
}
