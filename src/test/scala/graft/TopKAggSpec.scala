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
}
