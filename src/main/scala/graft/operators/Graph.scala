package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge lists — the shapes the Circles
  * pathfinder's precompute consumes (the trust/capacity graph of
  * `crc_capacity_graph_2` is exactly such an edge list; reference consumer:
  * CirclesUBI's pathfinder service reads the capacity view the catalog
  * maintains, DbMigrations/0.0.64.sql:945).
  *
  * Connected components live in [[Dedup.dupClusters]] (near-dup clustering
  * uses the same label-propagation engine); this file holds the DIRECTED
  * reachability family.
  */
object Graph {

  /** Hop-bounded widest paths: for every ordered pair (src, dst) reachable
    * in ≤ `maxHops` edges, the maximum over walks of the minimum edge
    * capacity along the walk — the "how much can u route to v" number a
    * payment pathfinder prunes with before exact flow. The recurrence is
    * widest-path Bellman–Ford:
    *
    *   best_k(u,v) = max(best_{k-1}(u,v),
    *                     max_w min(best_{k-1}(u,w), cap(w,v)))
    *
    * which is exact because appending edge (w,v) to the best ≤k−1 walk
    * u→w realizes min(best_{k-1}(u,w), cap(w,v)). Walks may revisit nodes
    * but a revisit can never raise a min, so hop-bounded walks ≡
    * hop-bounded simple paths here; u→…→u pairs are excluded (the join
    * filters src ≠ dst at every extension).
    *
    * Scale shape: each round shuffles (src, dst, cap) triples only —
    * 24 B/row regardless of what the edges carry — and the round count is
    * the hop bound, not the diameter. The per-round groupBy is a partial
    * (map-side) max. Per-round eager localCheckpoint keeps the iterative
    * plan flat (the 2^n-lineage rule, as in [[Dedup.dupClusters]]). At
    * 100 TB: hub vertices make skewed join groups — salt the dst key the
    * same way the prefix index salts hot tokens; the hop bound (2–4 in
    * the pathfinder use) keeps the closure from densifying.
    *
    * Input `edges`: (src, dst, cap) — parallel edges reduce to max cap,
    * self-loops and non-positive capacities are dropped.
    */
  def widestPaths(edges: DataFrame, maxHops: Int = 3): DataFrame = {
    val e = edges
      .where(col("cap") > 0 && col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(max("cap").as("cap"))
      .localCheckpoint(true)
    var best = e
    for (_ <- 2 to maxHops) {
      val extended = best.as("b")
        .join(e.as("x"), col("b.dst") === col("x.src") && col("b.src") =!= col("x.dst"))
        .select(col("b.src").as("src"), col("x.dst").as("dst"),
          least(col("b.cap"), col("x.cap")).as("cap"))
      best = best.unionByName(extended)
        .groupBy("src", "dst").agg(max("cap").as("cap"))
        .localCheckpoint(true)
    }
    best.orderBy("src", "dst")
  }

  /** Hop-bounded reachable set sizes per source — the cheap fan-out stat
    * (how many safes can u reach in ≤ k trust hops) dashboards and
    * pathfinder admission checks read. One extra partial-agg shuffle over
    * [[widestPaths]].
    */
  def reachCounts(edges: DataFrame, maxHops: Int = 3): DataFrame =
    widestPaths(edges, maxHops)
      .groupBy("src")
      .agg(count(lit(1)).as("n_reachable"), max("cap").as("best_cap"))
      .orderBy("src")

  /** PageRank over the trust graph — the "who does the network vouch for"
    * centrality a social-currency UI ranks accounts by (trust edges are
    * endorsements; rank flows along them). Fixed-iteration power method:
    *
    *   r_{t+1}(v) = (1−d)/N + d·Σ_{u→v} r_t(u)/outdeg(u)
    *
    * Dangling-node mass is dropped (not redistributed) — the deterministic
    * variant an unrolled SQL twin can express; ranks then sum to < 1,
    * which only rescales the ordering. Ranks are rounded to 12 decimals
    * EVERY iteration on both engines, so cross-engine double-sum ulp drift
    * cannot compound across rounds.
    *
    * Scale shape, per iteration: one join of edges⋈ranks on src (edges
    * pre-partitioned by src once, outside the loop), one partial-agg sum
    * shuffle on dst, one co-partitioned left join back to the node set —
    * payload is (node, double) pairs regardless of graph size. Eager
    * localCheckpoint per round keeps the plan flat (the 2^n-lineage rule);
    * iteration count is a fixed knob, not data-dependent. Hub skew lives
    * in the dst-sum, which partial-aggregates map-side — the hot key
    * arrives at its reducer once per map partition.
    *
    * Input `edges`: (src, dst, cap) — cap>0/self-loop normalization as
    * [[widestPaths]]; parallel edges collapse to one.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val e = edges
      .where(col("cap") > 0 && col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .repartition(col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = nodes.count() // bounded driver aggregate: one long
    var ranks = nodes.select(col("node"), round(lit(1.0d / n), 12).as("r"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("r") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit((1.0d - damping) / n) +
            lit(damping) * coalesce(col("s"), lit(0.0d)), 12).as("r"))
        .localCheckpoint(true)
    }
    ranks.orderBy(col("r").desc, col("node"))
  }
}
