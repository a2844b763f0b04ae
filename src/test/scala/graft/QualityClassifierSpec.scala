package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def axisExamples = Seq(
    (Array(1.0f, 0.0f), 1.0d), (Array(0.9f, 0.1f), 1.0d),
    (Array(0.8f, 0.0f), 1.0d),
    (Array(0.0f, 1.0f), 0.0d), (Array(0.1f, 0.9f), 0.0d),
    (Array(0.0f, 0.8f), 0.0d)
  ).toDF("embedding", "label")

  test("train separates axis-aligned classes; weights point the right way") {
    val w = QualityClassifier.train(axisExamples, dim = 2, iters = 100)
    assert(w(0) > 0 && w(1) < 0) // positive class lives on dim 0
    val scored = QualityClassifier.score(
      axisExamples.withColumn("vec_id", monotonically_increasing_id())
        .select(col("vec_id"), col("embedding")), w)
      .as[(Long, Double)].collect().toMap
    // training data itself classifies perfectly
    assert(scored.count(_._2 >= 0.5) == 3 && scored.count(_._2 < 0.5) == 3)
  }

  test("training is bit-deterministic under repartitioning") {
    val w1 = QualityClassifier.train(axisExamples, dim = 2, iters = 20)
    val w7 = QualityClassifier.train(axisExamples.repartition(7), dim = 2, iters = 20)
    assert(w1.toSeq == w7.toSeq) // decimal gradient sums + round12 updates
  }

  test("empty example set trains to zero weights; scores are 0.5") {
    val w = QualityClassifier.train(axisExamples.where(lit(false)), dim = 2)
    assert(w.toSeq == Seq(0.0, 0.0, 0.0))
    val p = QualityClassifier.score(
      Seq((1L, Array(0.3f, 0.7f))).toDF("vec_id", "embedding"), w)
      .as[(Long, Double)].collect().head._2
    assert(p == 0.5)
  }

  test("end-to-end: learns a token-presence gate through hashed vectors") {
    val docs = Seq(
      (0L, "clean prose with useful words"),
      (1L, "spamword junk spamword offer junk"),
      (2L, "useful clean sentences and prose"),
      (3L, "offer spamword click junk offer"),
      (4L, "words of clean useful text"),
      (5L, "junk spamword junk offer click")
    ).toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"),
      when(array_contains(split(col("text"), " "), "spamword"), 0.0d)
        .otherwise(1.0d).as("label"))
    val r = QualityClassifier.classifyDocuments(docs, labels, iters = 100)
      .as[(Long, Double, Boolean)].collect().map(t => t._1 -> t._3).toMap
    assert(Seq(0L, 2L, 4L).forall(r(_)) && Seq(1L, 3L, 5L).forall(!r(_)))
  }
}
