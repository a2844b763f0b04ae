package graft

import graft.functions.QuantileSketchOps._
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed distribution: quadratic growth keeps the interpolation honest
  private def df = (0L until 5000L).map(i => (i, (i % 100) * (i % 100) * 1.0)).toDF("id", "v")

  test("sketch quantiles land within the sampling rank bound") {
    val sk = df.agg(sketchAgg($"id", $"v").as("s"))
      .select(sketchQuantile($"s", 0.5).as("p50"), sketchQuantile($"s", 0.9).as("p90"))
      .as[(Double, Double)].head()
    // rank of the estimate in the TRUE distribution must be near p:
    // k=512 → σ ≈ 1/√512 ≈ 0.044; allow 3σ
    def rankOf(v: Double): Double = df.where($"v" <= v).count().toDouble / 5000.0
    assert(math.abs(rankOf(sk._1) - 0.5) < 0.14, s"p50 rank ${rankOf(sk._1)}")
    assert(math.abs(rankOf(sk._2) - 0.9) < 0.14, s"p90 rank ${rankOf(sk._2)}")
  }

  test("union of group sketches is BYTE-IDENTICAL to the one-pass sketch") {
    // bottom-k is an exact semilattice — stronger than HLL's approximate
    // convergence: rollups from the sketch table can't drift, and manifest
    // micro-batch slicing can't change the stored artifact.
    val grouped = df.withColumn("g", $"id" % 7)
      .groupBy("g").agg(sketchAgg($"id", $"v").as("s"))
      .agg(sketchUnionAgg($"s").as("s")).as[Array[Byte]].head()
    val onePass = df.agg(sketchAgg($"id", $"v").as("s")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(grouped, onePass))
  }

  test("sketch bytes are partition-invariant") {
    val a = df.agg(sketchAgg($"id", $"v").as("s")).as[Array[Byte]].head()
    val b = df.repartition(13).agg(sketchAgg($"id", $"v").as("s")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(a, b))
  }

  test("degenerate sketches: empty → null quantile, singleton → its value") {
    val empty = df.where(lit(false)).agg(sketchAgg($"id", $"v").as("s"))
      .select(sketchQuantile($"s", 0.5)).collect()(0)
    assert(empty.isNullAt(0))
    val one = Seq((1L, 42.0)).toDF("id", "v").agg(sketchAgg($"id", $"v").as("s"))
      .select(sketchQuantile($"s", 0.5)).as[Double].head()
    assert(one == 42.0)
  }

  test("small groups are carried exactly (sample == population below k)") {
    val sk = df.limit(100).agg(sketchAgg($"id", $"v").as("s"))
      .select(sketchQuantile($"s", 0.5).as("p50")).as[Double].head()
    // below k the sketch IS the population → quantile_cont interpolation
    val vs = df.limit(100).select("v").as[Double].collect().sorted
    val exact = (vs(49) + vs(50)) / 2.0
    assert(math.abs(sk - exact) < 1e-9, s"below-k sketch must be exact: $sk vs $exact")
  }
}
