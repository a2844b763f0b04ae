package graft

import graft.functions.TopKAgg
import graft.operators.Analytics
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps the k smallest structs, sorted, with partial merge") {
    // force many partitions so merge() paths execute
    val df = spark.range(0, 1000, 1, 8)
      .select((col("id") % 7).as("g"), col("id"))
    val r = df.groupBy("g")
      .agg(TopKAgg.topK(struct(col("id")), 3).as("top"))
      .select(col("g"), col("top.id").as("ids")) // array<struct<id>> → array<long>
      .as[(Long, Seq[Long])].collect().toMap
    (0L until 7L).foreach { g =>
      assert(r(g) == Seq(g, g + 7, g + 14))
    }
  }

  test("topK with fewer rows than k returns all, sorted") {
    val df = Seq((1L, 5L), (1L, 3L)).toDF("g", "v")
    val r = df.groupBy("g").agg(TopKAgg.topK(struct(col("v")), 10).as("top"))
      .select(col("top.v")).as[Seq[Long]].collect()(0)
    assert(r == Seq(3L, 5L))
  }

  test("heap aggregate matches the window row_number formulation exactly") {
    val part = Tables.part(spark, "/root/testdata/sf0.001")
    val a = Analytics.topKPerGroup(part, 3).collect().map(_.toSeq).toSeq
    val b = Analytics.topKPerGroupWindow(part, 3).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("skewReport: hand-computed group sizes, heavy keys ranked") {
    import spark.implicits._
    // key 1 → 5 rows, key 2 → 3, key 3 → 1, key 4 → 1
    val df = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 4L)).toDF("k")
    val r = Analytics.skewReport(df, "k", topK = 2).collect()
    assert(r.map(x => (x.getAs[Long]("key"), x.getAs[Long]("n"), x.getAs[Long]("rank"))).toSeq
      == Seq((1L, 5L, 1L), (2L, 3L, 2L)))
    val h = r.head
    assert(h.getAs[Long]("n_keys") == 4 && h.getAs[Long]("max_n") == 5)
    assert(h.getAs[Double]("mean_n") == 2.5)
    assert(h.getAs[Double]("p50_n") == 2.0)  // sizes (1,1,3,5) interpolated
    assert(h.getAs[Double]("p99_n") == 4.94) // 1 + 0.97*... → round(4.94,4)
  }

  test("basketAffinity: hand pair counts, dup items collapse, cap throws, empty") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{c} → pairs (a,b)=3, (a,c)=1, (b,c)=1
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (2L, "b"), // duplicate item in a basket counts once
      (3L, "a"), (3L, "b"), (4L, "c")).toDF("bk", "item")
    val r = Analytics.basketAffinity(df, "bk", "item").collect()
    assert(r.length == 1) // only (a,b) reaches minPairCount=2
    val ab = r.head
    assert(ab.getString(0) == "a" && ab.getString(1) == "b")
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 3L && ab.getLong(4) == 3L)
    assert(ab.getAs[Double]("support") == 0.75)      // 3/4 baskets
    assert(ab.getAs[Double]("confidence") == 1.0)    // 3/3
    assert(ab.getAs[Double]("lift") == 1.333333333333) // round(4/3, 12)
    // minPairCount=1 surfaces the singleton pairs too
    assert(Analytics.basketAffinity(df, "bk", "item", minPairCount = 1L)
      .count() == 3)
    // the mega-basket valve is loud, not a silent quadratic explosion
    val mega = (1 to 40).map(i => (9L, s"i$i")).toDF("bk", "item")
    assertThrows[RuntimeException] {
      Analytics.basketAffinity(mega, "bk", "item", basketCap = 10).collect()
    }
    // pair counts invariant under repartitioning
    val rep = Analytics.basketAffinity(df.repartition(7), "bk", "item").collect()
    assert(rep.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
    val empty = Seq.empty[(Long, String)].toDF("bk", "item")
    assert(Analytics.basketAffinity(empty, "bk", "item").count() == 0)
  }
}
