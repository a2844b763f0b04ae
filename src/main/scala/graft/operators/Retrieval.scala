package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** HYBRID retrieval: fuse the engine's lexical leg (BM25,
  * [[TextMetrics.bm25TopK]] / the served index twin) with its dense leg
  * (embedding cosine, [[Ann]]'s exact scorer) by Reciprocal Rank Fusion —
  * the standard score-free combiner (Cormack et al. 2009):
  * rrf(d) = Σ_legs 1/(k + rank_leg(d)). Rank-based fusion needs no score
  * calibration between BM25's unbounded sums and cosine's [−1, 1], which
  * is exactly why RRF is the production default for hybrid search.
  *
  * Scale shape: each leg already ends in a bounded top-`legK` artifact
  * (BM25's TakeOrderedAndProject, the ANN family's bounded-heap rankings)
  * — fusion runs on two ≤legK-row frames, so the full-outer join and the
  * final ordering are driver-trivial no matter the corpus size; the heavy
  * lifting stays inside the legs, which keep their own 100 TB shapes
  * (pruned index reads, bucketed ANN). Determinism: both legs rank on
  * 12-dp-rounded scores with doc-id tie-breaks (their standing contract),
  * and the RRF terms 1/(k+rank) are rounded to 12 dp and summed as
  * decimal, so the fused ordering is a pure function of the two rank
  * lists — fully oracle-checkable even though one leg is
  * floating-point-dense.
  */
object Retrieval {

  /** Fuse two 1-based rankings `(doc_id, rk)` by RRF. A doc absent from a
    * leg contributes nothing for that leg (the standard convention);
    * emitted ranks ride along for audit. Ties on the fused score break by
    * doc_id ascending.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, kConst: Int = 60,
              topK: Int = 10): DataFrame = {
    def term(rk: org.apache.spark.sql.Column) =
      coalesce(round(lit(1.0d) / (lit(kConst.toDouble) + rk.cast("double")), 12), lit(0.0d))
        .cast("decimal(16,12)")
    val fa = a.select(col("doc_id"), col("rk").as("rk_a"))
    val fb = b.select(col("doc_id"), col("rk").as("rk_b"))
    fa.join(fb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rk_a"), col("rk_b"),
        (term(col("rk_a")) + term(col("rk_b"))).cast("double").as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** BM25 leg as a ranked `(doc_id, rk)` frame: [[TextMetrics.bm25TopK]]'s
    * deterministic (score desc, doc_id) order made explicit. The window is
    * unpartitioned BY CONSTRUCTION LEGAL: it runs over the already-limited
    * ≤legK-row leg artifact, never the corpus (the robustAnomalies
    * discipline).
    */
  def bm25Leg(documents: DataFrame, queryTerms: Seq[String], legK: Int): DataFrame =
    TextMetrics.bm25TopK(documents, queryTerms, topK = legK)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rk"))

  /** Dense leg: exact cosine of `queryVecId`'s embedding against every
    * other vector (id-capped like the knn-graph oracle baseline), ranked
    * by the bounded-heap top-k on the 12-dp-rounded score. The query row
    * broadcasts; the corpus never shuffles. At scale this leg swaps in
    * any of the ANN family (IVF/PQ/LSH) unchanged — fusion only sees
    * (doc_id, rk).
    */
  def denseLeg(embeddings: DataFrame, queryVecId: Long, legK: Int,
               maxId: Long = Long.MaxValue): DataFrame = {
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"), Ann.norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
    val base = embeddings
      .where(col("vec_id") =!= queryVecId && col("vec_id") < maxId)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        Ann.norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val scored = base.crossJoin(broadcast(q))
      .select(lit(queryVecId).as("qid"), col("nid"),
        round(Ann.dotDecimal(col("qe"), col("ne")).cast("double") /
          (col("qn") * col("nn")), 12).as("cosine"))
    Ann.rankTopK(scored, legK)
      .select(col("nid").as("doc_id"), col("rk"))
  }

  /** RANKING-AGREEMENT diagnostics between two top-k rankings — the
    * retrieval-evaluation report a hybrid deployment watches: how
    * complementary are the lexical and dense legs (low overlap ⇒ fusion
    * adds recall; high overlap ⇒ one leg suffices), and how far do the
    * shared docs move between them. One row:
    *   - `n_a`/`n_b`: docs in each leg's top-k (≤ k)
    *   - `n_overlap`, `jaccard`: set agreement of the two top-k sets
    *   - `footrule`: Σ |rk_a − rk_b| over the overlap — Spearman's
    *     footrule distance, EXACT integer (the standard rank-displacement
    *     measure; 0 = identical ordering on the shared docs)
    *   - `mean_rank_shift`: footrule / n_overlap (round 12)
    *   - `rank_in_b_of_a_top1`: where leg B puts leg A's best doc (NULL
    *     when absent from B's top-k — the "would dense alone have found
    *     the lexical winner" probe)
    * Both inputs are ≤k-row leg artifacts (the [[rrfFuse]] contract), so
    * the join and the single agg are driver-trivial at any corpus size;
    * the heavy lifting stays inside the legs. Deterministic and fully
    * oracle-checkable for deterministic legs (exact integer ranks in,
    * exact counts/sums out; the two ratios are single IEEE divisions
    * rounded 12 dp).
    */
  def rankingAgreement(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k < 1: $k")
    val fa = a.where(col("rk") <= k).select(col("doc_id"), col("rk").as("rk_a"))
    val fb = b.where(col("rk") <= k).select(col("doc_id"), col("rk").as("rk_b"))
    val both = col("rk_a").isNotNull && col("rk_b").isNotNull
    fa.join(fb, Seq("doc_id"), "full_outer")
      .agg(
        count(col("rk_a")).as("n_a"),
        count(col("rk_b")).as("n_b"),
        count(when(both, lit(1))).as("n_overlap"),
        sum(when(both, abs(col("rk_a") - col("rk_b")))).as("footrule"),
        min(when(col("rk_a") === 1, col("rk_b"))).as("rank_in_b_of_a_top1"))
      .select(
        lit(k.toLong).as("k"), col("n_a"), col("n_b"), col("n_overlap"),
        when(col("n_a") + col("n_b") - col("n_overlap") > 0,
          round(col("n_overlap").cast("double") /
            (col("n_a") + col("n_b") - col("n_overlap")).cast("double"), 12))
          .as("jaccard"),
        col("footrule"),
        when(col("n_overlap") > 0,
          round(col("footrule").cast("double") / col("n_overlap").cast("double"), 12))
          .as("mean_rank_shift"),
        col("rank_in_b_of_a_top1"))
  }

  /** The composed hybrid query: BM25(terms) ⊕ cosine(query vector), RRF'd.
    * doc_id and vec_id share the corpus id space (the embeddings table IS
    * the documents' dense representation).
    */
  def hybridSearch(documents: DataFrame, embeddings: DataFrame,
                   queryTerms: Seq[String], queryVecId: Long,
                   legK: Int = 20, kConst: Int = 60, topK: Int = 10,
                   maxId: Long = Long.MaxValue): DataFrame =
    rrfFuse(bm25Leg(documents, queryTerms, legK),
      denseLeg(embeddings, queryVecId, legK, maxId), kConst, topK)

  /** [[denseLeg]] keeping the 12-dp cosine as a SCORE column — the
    * candidate-list shape [[mmrRerank]] consumes. */
  def denseLegScored(embeddings: DataFrame, queryVecId: Long, legK: Int,
                     maxId: Long = Long.MaxValue): DataFrame = {
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"), Ann.norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
    val base = embeddings
      .where(col("vec_id") =!= queryVecId && col("vec_id") < maxId)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        Ann.norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val scored = base.crossJoin(broadcast(q))
      .select(lit(queryVecId).as("qid"), col("nid"),
        round(Ann.dotDecimal(col("qe"), col("ne")).cast("double") /
          (col("qn") * col("nn")), 12).as("cosine"))
    Ann.rankTopK(scored, legK)
      .select(col("nid").as("doc_id"), col("cosine").as("score"))
  }

  /** MAXIMAL-MARGINAL-RELEVANCE rerank (Carbonell–Goldstein 1998): greedily
    * re-order a bounded candidate list so each pick balances relevance
    * against redundancy with what is already picked —
    *   mmr(c) = λ·rel̂(c) − (1−λ)·max_{s∈selected} sim(c, s)
    * with rel̂ = min-max-normalized candidate score (1.0 when all scores
    * tie) and sim = exact 12-dp cosine between candidate embeddings. The
    * diversity member of the retrieval stack: RRF fuses legs, the ranking-
    * agreement report diagnoses them, this de-duplicates the final page
    * (near-identical top hits collapse to one + the next DIFFERENT doc).
    *
    * Scale shape: candidates are a ≤maxCandidates leg artifact by contract
    * (every leg here ends in a bounded top-k), so the pairwise-sim frame is
    * ≤N² small rows and the greedy loop runs driver-side over collected
    * arrays — the markov-chain-solve precedent (a |candidates|-bounded
    * matrix, never corpus data). Sims use the engine's decimal-dot cosine
    * protocol, every intermediate rounds to 12 dp, ties break by doc_id —
    * fully deterministic and ORACLE-CHECKABLE (the DuckDB twin unrolls the
    * same greedy steps).
    *
    * Input `candidates`: (doc_id, score); `embeddings`: (vec_id, embedding)
    * sharing the id space. Candidates without a usable embedding (missing
    * row or zero norm) drop before selection — sim against them is
    * undefined. Output: (rank 1.., doc_id, mmr_score), ≤k rows.
    */
  def mmrRerank(candidates: DataFrame, embeddings: DataFrame, k: Int = 10,
                lambda: Double = 0.7, maxCandidates: Int = 256): DataFrame = {
    require(k >= 1, s"k < 1: $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda outside [0,1]: $lambda")
    require(maxCandidates >= 1 && maxCandidates <= 4096,
      s"maxCandidates outside [1, 4096]: $maxCandidates")
    val spark = candidates.sparkSession
    val ce = candidates.orderBy(col("score").desc, col("doc_id")).limit(maxCandidates)
      .join(embeddings.select(col("vec_id").as("doc_id"), col("embedding"),
        Ann.norm(col("embedding")).as("nrm")), Seq("doc_id"))
      .where(col("nrm") > 0)
      .persist()
    // bounded driver aggregates: ≤N scores + ≤N(N−1)/2 sims
    val rels = ce.select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val sims = ce.as("a").join(ce.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        round(Ann.dotDecimal(col("a.embedding"), col("b.embedding")).cast("double") /
          (col("a.nrm") * col("b.nrm")), 12).as("sim"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ce.unpersist()
    def r12(x: Double): Double =
      BigDecimal.valueOf(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def simOf(a: Long, b: Long): Double =
      if (a < b) sims((a, b)) else sims((b, a))
    val mn = if (rels.isEmpty) 0.0 else rels.map(_._2).min
    val mx = if (rels.isEmpty) 0.0 else rels.map(_._2).max
    val rel = rels.map { case (id, sc) =>
      id -> (if (mx == mn) 1.0 else r12((sc - mn) / (mx - mn))) }.toMap
    val mu = 1.0 - lambda
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ rel.keys
    while (picked.size < k && remaining.nonEmpty) {
      val best = remaining.iterator.map { c =>
        val maxSim =
          if (picked.isEmpty) 0.0
          else picked.iterator.map(p => simOf(c, p._1)).max
        (c, r12(lambda * rel(c) - mu * maxSim))
      }.minBy { case (id, ms) => (-ms, id) }
      picked += best
      remaining -= best._1
    }
    import spark.implicits._
    picked.toSeq.zipWithIndex
      .map { case ((id, ms), i) => (i + 1L, id, ms) }
      .toDF("rank", "doc_id", "mmr_score")
  }
}
