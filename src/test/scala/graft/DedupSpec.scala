package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
  private val nearDup = base.replace("green", "dark") // 1-word change
  private val unrelated =
    "completely different content about spark sql engines processing huge datasets with shuffles and joins all day"

  private def docs = Seq(
    (0L, base, "s0"), (1L, nearDup, "s0"), (2L, unrelated, "s0"),
    (3L, base, "s1") // exact duplicate of 0
  ).toDF("doc_id", "text", "source")

  test("exact dedup keeps smallest id and counts copies") {
    val r = Dedup.exact(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r(0L) == 2L) // base text appears twice (doc 0 + doc 3)
    assert(r(1L) == 1L && r(2L) == 1L)
    assert(!r.contains(3L)) // canonical representative is min id
  }

  test("hash-keyed exact dedup matches the text-keyed form") {
    val a = Dedup.exact(docs).collect().map(_.toSeq).toSeq
    val b = Dedup.exactByHash(docs).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("minhash LSH finds near and exact duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashLsh(docs, jaccardThreshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L))) // near dup: 1-word change over 3-shingles
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated never pairs
  }

  test("minhash candidates agree with brute-force jaccard at the threshold") {
    // brute force over all pairs via the exposed shingle/jaccard kernel
    val brute = Dedup.ngramJaccardPairs(docs.withColumn("source", lit("all")), threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, jaccardThreshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute) // at 0.5 with 16 bands × 2 rows, recall ≈ 1 here
  }

  test("simhash: near-identical docs collide within hamming 3, unrelated don't") {
    val r = Dedup.simhashDedup(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(r.contains((0L, 3L))) // identical text → hamming 0
    assert(!r.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash signature is deterministic and exactly 0 hamming for equal text") {
    val sigs = docs.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(3L))
    assert(sigs(0L) != sigs(2L))
  }

  test("native simhash expression matches the HOF reference bit-for-bit") {
    val both = docs.select(
      Dedup.simhash64($"text").as("native"),
      Dedup.simhash64Reference($"text").as("ref")
    ).as[(Long, Long)].collect()
    both.foreach { case (n, r) => assert(n == r) }
  }
}
