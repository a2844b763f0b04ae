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
}
