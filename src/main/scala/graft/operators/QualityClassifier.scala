package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier — the fastText-shaped linear gate the big
  * corpus pipelines (CCNet, GPT-3, LLaMA) filter web text with: logistic
  * regression over the engine's own hashed text vectors ([[TextVectors]]),
  * so no external model or vocabulary ships with the job; seed labels in,
  * per-document keep probabilities out.
  *
  * Training is batch gradient descent where the MODEL rides the plan, not
  * the data: each iteration embeds the current weights as a plan literal,
  * computes margins with the codegen'd dot kernel
  * ([[graft.functions.VecOps.dotFloat]] — the Ann centroid discipline),
  * and reduces the per-dimension gradient with ONE partial-agg shuffle of
  * ≤ partitions·(dim+1) rows (posexplode of the bias-extended feature
  * array, map-side combine). Weight updates are dim+1 doubles on the
  * driver — bounded, like the k-means centroid sums. Per-row gradient
  * terms cast to decimal before summing (associative, order-independent →
  * training is bit-deterministic under any partitioning; spec'd), and
  * updated weights round to 12 dp per the iterative-parity doctrine.
  * Scoring is MAP-ONLY: literal weights, one kernel call per row.
  *
  * At 100 TB: train on a hash-gated sample ([[Sampling.hashSample]] —
  * seed label sets are human-sized anyway), score the full corpus
  * map-only; the model is dim+1 doubles however big the corpus gets.
  */
object QualityClassifier {

  /** Bias fold: x :+ 1, so the intercept is just weight dim. */
  private def withBias(x: Column): Column = concat(x, array(lit(1.0f)))

  private def round12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** examples: (embedding: array<float> of `dim`, label ∈ {0,1}) →
    * trained weights, length dim+1 (bias last). Mean-gradient updates:
    * w ← round12(w − lr·Σ(σ(w·x)−y)·x / n).
    */
  def train(examples: DataFrame, dim: Int, iters: Int = 25,
            lr: Double = 4.0): Array[Double] = {
    val ex = examples
      .select(withBias(col("embedding")).as("x"),
        col("label").cast("double").as("y"))
      .localCheckpoint(true) // read every iteration
    val n = ex.count()
    val w = Array.fill(dim + 1)(0.0d)
    if (n == 0) return w
    for (_ <- 1 to iters) {
      val margin = graft.functions.VecOps.dotFloat(col("x"),
        typedlit(w.map(_.toFloat)))
      val err = (lit(1.0d) / (lit(1.0d) + exp(negate(margin))) - col("y")).as("e")
      val grad = ex
        .select(err, posexplode(col("x")))
        .select(col("pos"),
          (col("e") * col("col").cast("double")).cast("decimal(28,18)").as("g"))
        .groupBy("pos").agg(sum("g").as("g"))
        .collect().map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
      for (j <- 0 to dim)
        w(j) = round12(w(j) - lr * grad.getOrElse(j, 0.0d) / n)
    }
    w
  }

  /** Map-only scoring: (vec_id, embedding) → (vec_id, p) with
    * p = σ(w·x + bias) rounded to 12 dp.
    */
  def score(vectors: DataFrame, weights: Array[Double]): DataFrame = {
    val margin = graft.functions.VecOps.dotFloat(withBias(col("embedding")),
      typedlit(weights.map(_.toFloat)))
    vectors.select(col("vec_id"),
      round(lit(1.0d) / (lit(1.0d) + exp(negate(margin))), 12).as("p"))
  }

  /** End-to-end: hash-embed the corpus, train on the labeled seed subset
    * (labels: (doc_id, label)), score every document; keep = p ≥ 0.5.
    * The vector frame is materialized once — it feeds both the training
    * join and the scoring pass (the tfidf double-scan lesson).
    */
  def classifyDocuments(documents: DataFrame, labels: DataFrame, dim: Int = 64,
                        iters: Int = 25, lr: Double = 4.0): DataFrame = {
    // spread + materialize: the hashing HOF must compute once (it would
    // otherwise re-evaluate per training iteration), and a single-file
    // corpus read must not pin every GD pass on one task
    val vecs = TextVectors.hashedVectors(documents, dim)
      .repartition(col("vec_id")).localCheckpoint(true)
    val ex = vecs.join(broadcast(labels), col("vec_id") === col("doc_id"))
      .select(col("embedding"), col("label"))
    val w = train(ex, dim, iters, lr)
    score(vecs, w)
      .select(col("vec_id").as("doc_id"), col("p"), (col("p") >= 0.5d).as("keep"))
      .orderBy("doc_id")
  }
}
