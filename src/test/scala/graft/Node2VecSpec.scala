package graft

import graft.operators.{Graph, Node2Vec}

/** Deterministic SGNS graph embeddings: pair generation, bit-exact
  * training reruns, loss descent, and cluster recovery on a planted
  * two-community graph.
  */
class Node2VecSpec extends SparkSpec {
  import spark.implicits._

  // two directed 4-cliques bridged by one edge — walks stay mostly
  // inside their community
  private val clique1 = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b)
  private val clique2 = for (a <- 10L to 13L; b <- 10L to 13L if a != b) yield (a, b)
  private val edges = (clique1 ++ clique2 :+ ((3L, 10L))).toSeq

  test("walkPairs: every pair within the window of the same sentence, none across") {
    val walks = Seq(
      (1L, 0L, 0, 1L), (1L, 0L, 1, 2L), (1L, 0L, 2, 3L), (1L, 0L, 3, 4L),
      (9L, 0L, 0, 9L), (9L, 0L, 1, 8L)) // a second sentence
      .toDF("start", "walk", "step", "node")
    val got = Node2Vec.walkPairs(walks, window = 2)
      .as[(Long, Long)].collect().toSeq
    // position 0 of sentence 1 pairs with steps 1,2 (not 3: window=2)
    assert(got.count(x => x == ((1L, 2L))) == 1)
    assert(got.contains((1L, 3L)) && !got.contains((1L, 4L)))
    // never across sentences
    assert(!got.contains((1L, 9L)) && !got.contains((4L, 8L)))
    // symmetric counts: (a,b) within window iff (b,a) is
    assert(got.toSet.map((x: (Long, Long)) => (x._2, x._1)) == got.toSet)
  }

  test("trainSgns: bit-deterministic, loss descends, communities separate in cosine") {
    val walks = Graph.randomWalks(edges.toDF("src", "dst"),
      walksPerNode = 4, length = 6)
    val pairs = Node2Vec.walkPairs(walks, window = 2).persist()
    val (u0, v0) = Node2Vec.initMatrices(pairs, dim = 8)
    val l0 = Node2Vec.sgnsLoss(pairs, u0, v0)
    val (u1, v1) = Node2Vec.trainSgnsMatrices(pairs, dim = 8, epochs = 5,
      lr = 0.2)
    val l1 = Node2Vec.sgnsLoss(pairs, u1, v1)
    assert(l1 < l0, s"loss must descend: $l0 -> $l1")
    // rerun on a different partitioning: bit-identical artifact (the
    // exact-decimal gradient sums are partition-order independent)
    val a = Node2Vec.trainSgns(pairs, dim = 8, epochs = 15, lr = 0.5)
      .as[(Long, Seq[Double])].collect().toSeq
    val b = Node2Vec.trainSgns(pairs.repartition(7), dim = 8, epochs = 15, lr = 0.5)
      .as[(Long, Seq[Double])].collect().toSeq
    assert(a == b)
    // community structure: average intra-clique cosine beats inter-clique
    val emb = a.toMap
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(q => q * q).sum))
    }
    val c1 = (0L to 3L).filter(emb.contains)
    val c2 = (10L to 13L).filter(emb.contains)
    def avg(ps: Seq[Double]) = ps.sum / ps.size
    val intra = avg(for (a1 <- c1; b1 <- c1 if a1 < b1) yield cos(emb(a1), emb(b1))) +
      avg(for (a2 <- c2; b2 <- c2 if a2 < b2) yield cos(emb(a2), emb(b2)))
    val inter = 2 * avg(for (a1 <- c1; b2 <- c2) yield cos(emb(a1), emb(b2)))
    assert(intra > inter,
      s"intra-community cosine must dominate: intra=$intra inter=$inter")
    pairs.unpersist()
    // empty totality
    assert(Node2Vec.trainSgns(
      Seq.empty[(Long, Long)].toDF("center", "context")).count() == 0)
  }
}
