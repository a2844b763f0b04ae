package graft

import graft.operators.{Ann, TextVectors}
import org.apache.spark.sql.functions._

class TextVectorsSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
  private val nearDup = base.replace("green", "dark")
  private val unrelated =
    "completely different content about spark sql engines processing huge datasets with shuffles and joins all day"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, unrelated), (3L, base), (4L, "")
  ).toDF("doc_id", "text")

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    dot // vectors are L2-normalized
  }

  test("hashed vectors: shared vocabulary → high cosine, disjoint → near zero") {
    val v = TextVectors.hashedVectors(docs).as[(Long, Array[Float])].collect().toMap
    assert(cos(v(0L), v(3L)) > 0.999, "identical docs → identical vectors")
    assert(cos(v(0L), v(1L)) > 0.8, s"near-dup cosine ${cos(v(0L), v(1L))}")
    assert(cos(v(0L), v(2L)) < 0.4, s"unrelated cosine ${cos(v(0L), v(2L))}")
    assert(v(4L).forall(_ == 0.0f), "empty doc → zero vector")
    assert(v(0L).length == 64)
    val n = math.sqrt(v(0L).map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(n - 1.0) < 1e-5, s"L2-normalized, got $n")
  }

  test("native kernel == HOF formulation bit-for-bit (incl. edge docs)") {
    val tricky = docs.union(Seq(
      (5L, "  leading and  double  spaces "), (6L, "one"),
      (7L, Seq.fill(300)("rep").mkString(" "))).toDF("doc_id", "text"))
    val kernel = TextVectors.hashedVectors(tricky).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val hof = TextVectors.hashedVectorsHof(tricky).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(kernel.keySet == hof.keySet)
    kernel.foreach { case (id, v) =>
      assert(v == hof(id), s"doc $id: kernel != HOF") // exact float equality
    }
  }

  test("hashed vectors are map-only (zero exchanges) and partition-invariant") {
    val plan = TextVectors.hashedVectors(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"text→vector must not shuffle:\n$plan")
    val a = TextVectors.hashedVectors(docs).collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val b = TextVectors.hashedVectors(docs.repartition(5)).collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("bridge composes: semantic dedup over hashed vectors collapses exact dups") {
    val verdict = Ann.semanticDedup(TextVectors.hashedVectors(docs),
        numCentroids = 2, tau = 0.95, kmeansIters = 2)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, g, k) => id -> ((g, k)) }.toMap
    assert(verdict(0L) == ((0L, true)), "canonical survives")
    assert(verdict(3L) == ((0L, false)), "exact dup dropped into doc 0's group")
    assert(verdict(2L)._2, "unrelated doc keeps")
  }
}
