package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packLayout: hand-computed offsets and sequence spans") {
    // token counts: 3, 5, 4, 6 at seqLen 8 ->
    // offsets 0, 3, 8, 12; spans [0,0], [0,0 (3..7)], [1,1 (8..11)], [1,2 (12..17)]
    val docs = Seq(
      (0L, "a b c"), (1L, "d e f g h"), (2L, "i j k l"), (3L, "m n o p q r")
    ).toDF("doc_id", "text")
    val r = Packing.packLayout(docs, seqLen = 8, numBuckets = 2)
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(0L) == ((0L, 3L, 0L, 0L, 0L)))
    assert(r(1L) == ((1L, 5L, 3L, 0L, 0L)))
    assert(r(2L) == ((2L, 4L, 8L, 1L, 1L)))
    assert(r(3L) == ((3L, 6L, 12L, 1L, 2L)))
  }

  test("two-phase scan equals the single-partition window on testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bucketed = Packing.packLayout(docs, seqLen = 512, numBuckets = 16)
      .select("doc_id", "tok_offset").as[(Long, Long)].collect().sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val global = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("tok_offset", coalesce(sum("n_tok").over(w), lit(0L)))
      .select("doc_id", "tok_offset").as[(Long, Long)].collect().sortBy(_._1)
    assert(bucketed.sameElements(global))
  }

  test("layout is invariant under repartitioning and bucket count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame, buckets: Int) =
      Packing.packLayout(df, 512, buckets).collect().map(_.toSeq).toSeq
    assert(run(docs, 16) == run(docs.repartition(7), 16))
    assert(run(docs, 16) == run(docs, 3))
  }

  test("seqFanIn: straddlers count on both sides, totals add up") {
    val docs = Seq(
      (0L, "a b c"), (1L, "d e f g h"), (2L, "i j k l"), (3L, "m n o p q r")
    ).toDF("doc_id", "text")
    val f = Packing.seqFanIn(docs, seqLen = 8, numBuckets = 2)
      .as[(Long, Long)].collect().toMap
    // seq 0: docs 0,1; seq 1: docs 2,3; seq 2: doc 3 (straddler)
    assert(f == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }
}
