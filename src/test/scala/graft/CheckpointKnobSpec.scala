package graft

import graft.operators.{Dedup, Graph}
import java.nio.file.Files

/** The reliable-checkpoint knob ([[graft.operators.Checkpoints]]) is a
  * fault-tolerance policy, not a semantics change: every iterative
  * operator must return IDENTICAL results with and without it, at any
  * cadence. (The knob swaps executor-local lineage truncation for
  * recoverable reliable checkpoints — see the Scaladoc for the cost
  * model.)
  */
class CheckpointKnobSpec extends SparkSpec {
  import spark.implicits._

  private def ckDir(): Option[String] =
    Some(Files.createTempDirectory("graft-ck").toString)

  // a graph with a hub, a chain (diameter > 2 exercises multiple rounds),
  // parallel edges, and a cycle
  private def edges = Seq(
    (1L, 2L, 10.0), (2L, 3L, 5.0), (3L, 4L, 7.0), (4L, 5L, 2.0),
    (1L, 3L, 1.0), (5L, 1L, 9.0), (2L, 3L, 6.0), (6L, 1L, 4.0),
    (1L, 6L, 4.0), (7L, 8L, 3.0)
  ).toDF("src", "dst", "cap")

  test("pageRank: knob-independent at every-1 and every-3 cadence") {
    val base = Graph.pageRank(edges, iters = 6).collect().toSeq
    for (every <- Seq(1, 3))
      assert(Graph.pageRank(edges, iters = 6, checkpointDir = ckDir(),
        checkpointEvery = every).collect().toSeq == base, s"every=$every")
  }

  test("pageRankWeighted: knob-independent") {
    val base = Graph.pageRankWeighted(edges, iters = 5).collect().toSeq
    assert(Graph.pageRankWeighted(edges, iters = 5, checkpointDir = ckDir(),
      checkpointEvery = 2).collect().toSeq == base)
  }

  test("hits: knob-independent at every-1 and every-3 cadence") {
    val base = Graph.hits(edges, iters = 5).collect().toSeq
    for (every <- Seq(1, 3))
      assert(Graph.hits(edges, iters = 5, checkpointDir = ckDir(),
        checkpointEvery = every).collect().toSeq == base, s"every=$every")
  }

  test("personalizedPageRank: knob-independent") {
    val seeds = Seq(1L, 7L).toDF("node")
    val base = Graph.personalizedPageRank(edges, seeds, iters = 6).collect().toSeq
    assert(Graph.personalizedPageRank(edges, seeds, iters = 6,
      checkpointDir = ckDir(), checkpointEvery = 2).collect().toSeq == base)
  }

  test("widestPaths: knob-independent, beam and exact") {
    for (cap <- Seq(0, 2)) {
      val base = Graph.widestPaths(edges, maxHops = 4, frontierCap = cap)
        .collect().toSeq
      assert(Graph.widestPaths(edges, maxHops = 4, frontierCap = cap,
        checkpointDir = ckDir(), checkpointEvery = 2).collect().toSeq == base,
        s"frontierCap=$cap")
    }
  }

  test("dupClusters/connectedComponents: knob-independent through convergence") {
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 6L), (3L, 1L))
      .toDF("doc_a", "doc_b")
    val base = Dedup.dupClusters(pairs).collect().toSeq
    assert(Dedup.dupClusters(pairs, checkpointDir = ckDir(),
      checkpointEvery = 2).collect().toSeq == base)
    val ccBase = Graph.connectedComponents(edges).collect().toSeq
    assert(Graph.connectedComponents(edges, checkpointDir = ckDir(),
      checkpointEvery = 3).collect().toSeq == ccBase)
  }
}
