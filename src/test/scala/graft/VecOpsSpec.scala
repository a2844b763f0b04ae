package graft

import graft.functions.VecOps
import graft.operators.Ann
import org.apache.spark.sql.functions._

class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  test("native dotFloat matches the HOF zip_with/aggregate fold bit-for-bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.as("a").crossJoin(emb.as("b").limit(5))
      .select($"a.embedding".as("x"), $"b.embedding".as("y"))
    val hof = aggregate(zip_with($"x", $"y", (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    val both = pairs.select(VecOps.dotFloat($"x", $"y").as("native"), hof.as("ref"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, r) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(r))
    }
  }

  test("cosFast parity: native cosine equals the HOF reference") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    val n = Ann.norm($"embedding")
    val withN = emb.select($"vec_id", $"embedding", n.as("nrm")).where($"nrm" > 0)
    val both = withN.as("a").crossJoin(withN.as("b"))
      .select(
        Ann.cosFastHof($"a.embedding", $"b.embedding", $"a.nrm", $"b.nrm").as("ref"),
        (VecOps.dotFloat($"a.embedding", $"b.embedding") / ($"a.nrm" * $"b.nrm")).as("native"))
      .as[(Double, Double)].collect()
    both.foreach { case (r, v) =>
      assert(java.lang.Double.doubleToLongBits(r) == java.lang.Double.doubleToLongBits(v))
    }
  }
}
