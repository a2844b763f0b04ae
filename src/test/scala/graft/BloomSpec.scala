package graft

import graft.functions.{BloomImpl, BloomOps}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives, ever; build is partition-invariant byte-for-byte") {
    val keys = (0 until 2000).map(i => (i.toLong, BloomImpl.mix(i * 7919L)))
    val df = keys.toDF("id", "h")
    def build(d: org.apache.spark.sql.DataFrame) =
      d.select(BloomOps.bloomAgg(col("h"), numBits = 1 << 16).as("b"))
        .head.getAs[Array[Byte]](0)
    val b1 = build(df)
    val b2 = build(df.repartition(13))
    assert(java.util.Arrays.equals(b1, b2), "OR-merge must be layout-independent")
    keys.foreach { case (_, h) =>
      assert(BloomImpl.mightContain(b1, h, BloomOps.DefaultNumHashes))
    }
  }

  test("false-positive rate stays near the design point") {
    // 1000 keys in 2^13 bits ≈ 8.2 bits/key, k=7 → theoretical FPR ~1.2%
    val inserted = (0 until 1000).map(i => BloomImpl.mix(i * 104729L))
    val bloom = inserted.map(h => (h, 1)).toDF("h", "x")
      .select(BloomOps.bloomAgg(col("h"), numBits = 1 << 13).as("b"))
      .head.getAs[Array[Byte]](0)
    val probes = (0 until 20000).map(i => BloomImpl.mix(0x0defaced00L + i * 31L))
      .filterNot(inserted.toSet)
    val fp = probes.count(BloomImpl.mightContain(bloom, _, BloomOps.DefaultNumHashes))
    val fpr = fp.toDouble / probes.size
    info(f"measured FPR: $fpr%.4f over ${probes.size} disjoint probes")
    assert(fpr < 0.04, f"FPR $fpr%.4f blew past the ~1.2%% design point")
    assert(fp > 0, "a filter this loaded should show SOME false positives")
  }

  test("bloomGate flags exact eval overlap map-only; codegen probe agrees with eval") {
    val eval = Seq((100L, "the quick brown fox"), (101L, "pack my box")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "the quick brown fox"), // exact eval dup → must flag
      (1L, "pack my box"),         // exact eval dup → must flag
      (2L, "something else entirely"),
      (3L, "the quick brown foxes") // near, not exact → exact gate may pass it
    ).toDF("doc_id", "text")
    val bloom = Dedup.buildContaminationBloom(eval, numBits = 1 << 16)
    val got = Dedup.bloomGate(corpus, bloom)
      .select("doc_id", "maybe_contaminated")
      .as[(Long, Boolean)].collect().toMap
    assert(got(0L) && got(1L))
    // interpreted-eval cross-check of the codegen'd probe
    val hashes = corpus.select(col("doc_id"), xxhash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    (0L to 3L).foreach { id =>
      assert(got(id) == BloomImpl.mightContain(bloom, hashes(id), BloomOps.DefaultNumHashes))
    }
  }
}
