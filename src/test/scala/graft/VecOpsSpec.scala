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

  test("native dotDecimalFloat matches the HOF decimal fold bit-for-bit on corpus rows") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.as("a").crossJoin(emb.as("b").limit(7))
      .select($"a.embedding".as("x"), $"b.embedding".as("y"))
    val both = pairs.select(
        VecOps.dotDecimalFloat($"x", $"y").cast("string").as("native"),
        Ann.dotDecimalHof($"x", $"y").cast("string").as("ref"))
      .as[(String, String)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, r) => assert(n == r, s"native=$n ref=$r") }
  }

  test("dotDecimalFloat hostile envelope: nulls, length mismatch, rounding edges") {
    val rows: Seq[(Array[java.lang.Float], Array[java.lang.Float])] = Seq(
      // plain
      (Array[java.lang.Float](1.1f, -2.3f), Array[java.lang.Float](0.7f, 4.25f)),
      // empty both sides → 0E-18
      (Array.empty[java.lang.Float], Array.empty[java.lang.Float]),
      // length mismatch → zip_with null pad → null
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](1f)),
      // null element → null
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](1f, 2f)),
      // large-but-in-range products (just under the 1e10 integral bound)
      (Array[java.lang.Float](9.9e4f, -9.9e4f), Array[java.lang.Float](9.9e4f, 9.9e4f)),
      // subnormal / tiny values exercising the HALF_UP rounding at scale 18
      (Array[java.lang.Float](1e-20f, 1.4e-45f), Array[java.lang.Float](1e-20f, 1.4e-45f)),
      (Array[java.lang.Float](1.0000001f, -0.0f), Array[java.lang.Float](0.99999994f, 0.0f)))
    val df = rows.toDF("x", "y")
      .select(col("x").cast("array<float>").as("x"), col("y").cast("array<float>").as("y"))
    val both = df.select(
        VecOps.dotDecimalFloat($"x", $"y").cast("string").as("native"),
        Ann.dotDecimalHof($"x", $"y").cast("string").as("ref"))
      .as[(Option[String], Option[String])].collect()
    assert(both.length == rows.length)
    both.foreach { case (n, r) => assert(n == r, s"native=$n ref=$r") }
    // null input arrays → null (nullSafeEval)
    val nullDf = Seq((Some(Array(1f)), Option.empty[Array[Float]])).toDF("x", "y")
    val nr = nullDf.select(VecOps.dotDecimalFloat($"x", $"y").as("d"))
      .collect().head
    assert(nr.isNullAt(0))
  }

  test("dotDecimalFloat matches the ANSI HOF's throw-vs-null shape (NaN/Inf/overflow)") {
    // the session runs Spark 4's default ANSI mode: the reference HOF's
    // double→decimal(28,18) cast THROWS on finite out-of-range products
    // and NULLS non-finite ones — the kernel must fail/NULL exactly the
    // same inputs, never return a different score
    val bad: Seq[(Array[java.lang.Float], Array[java.lang.Float])] = Seq(
      (Array[java.lang.Float](Float.NaN), Array[java.lang.Float](1f)),
      (Array[java.lang.Float](Float.PositiveInfinity), Array[java.lang.Float](1f)),
      (Array[java.lang.Float](Float.MaxValue), Array[java.lang.Float](Float.MaxValue)),
      (Array[java.lang.Float](1e6f), Array[java.lang.Float](1e6f)),
      // mid-sum overflow (8.1e9 + 8.1e9 > 1e10) that a later negative term
      // would return to range (final 8.1e9): the HOF re-casts the
      // accumulator every step, so the transient overflow still fails
      (Array[java.lang.Float](9e4f, 9e4f, 9e4f),
        Array[java.lang.Float](9e4f, 9e4f, -9e4f)))
    def shape(df: org.apache.spark.sql.DataFrame): Either[String, Option[String]] =
      try {
        val r = df.collect().head
        Right(if (r.isNullAt(0)) None else Some(r.getDecimal(0).toString))
      } catch { case e: Throwable => Left("threw") }
    bad.foreach { case (x, y) =>
      val df = Seq((x, y)).toDF("x", "y")
        .select(col("x").cast("array<float>").as("x"), col("y").cast("array<float>").as("y"))
      val ref = shape(df.select(Ann.dotDecimalHof($"x", $"y").as("d")))
      val nat = shape(df.select(VecOps.dotDecimalFloat($"x", $"y").as("d")))
      assert(nat == ref, s"x=${x.toSeq} y=${y.toSeq}: native=$nat ref=$ref")
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
