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
}
