package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // planted skew: one hot key owns 90% of the fact rows
  private def skewed = (1 to 1000).map { i =>
    (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "hot", i * 3L)
  }.toDF("row_id", "k", "v")

  private def dims = Seq(("hot", "H"), ("k1", "A"), ("k3", "B"), ("zzz", "Z"))
    .toDF("k", "tag")

  test("saltedJoin == plain join for every supported type") {
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val plain = skewed.join(dims, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(skewed, dims, Seq("k"),
        col("row_id"), salts = 8, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, jt)
      val a = plain.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val b = salted.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(a == b, s"parity broke for $jt")
    }
  }

  test("the hot key's rows actually spread across salts; layout is deterministic") {
    val factsS = skewed.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
    val spread = factsS.where(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(spread == 8L) // 900 hot rows hit every one of the 8 salt groups
    // same rows → same salts on any input partitioning (xxhash64 of row_id)
    val again = skewed.repartition(13)
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
    assert(factsS.select("row_id", "__salt").except(
      again.select("row_id", "__salt")).isEmpty)
  }

  test("dim-replicating join types are rejected; salts >= 1 enforced") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(skewed, dims, Seq("k"), col("row_id"), 8, "full_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(skewed, dims, Seq("k"), col("row_id"), 0)
    }
  }
}
