package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse: hand-computed fusion, one-leg docs, tie-break by doc_id") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rk")
    val b = Seq((20L, 1L), (30L, 2L), (40L, 3L)).toDF("doc_id", "rk")
    val r = Retrieval.rrfFuse(a, b).collect()
      .map(x => (x.getLong(0), x.getAs[Double]("rrf")))
    // d20: 1/62 + 1/61 tops; d30: 1/63 + 1/62; d10: 1/61; d40: 1/63
    assert(r.map(_._1).toSeq == Seq(20L, 30L, 10L, 40L))
    assert(r(0)._2 == r12(r12(1.0 / 62) + r12(1.0 / 61)))
    assert(r(2)._2 == r12(1.0 / 61)) // single-leg doc keeps its one term
    // equal single-leg ranks tie → doc_id ascending
    val t = Retrieval.rrfFuse(
      Seq((5L, 1L)).toDF("doc_id", "rk"), Seq((3L, 1L)).toDF("doc_id", "rk"))
      .collect().map(_.getLong(0)).toSeq
    assert(t == Seq(3L, 5L))
    // topK cut
    assert(Retrieval.rrfFuse(a, b, topK = 2).count() == 2)
  }

  test("hybridSearch: fused output == manual fusion of the two legs; both-legs doc wins") {
    // corpus: doc 1 is the lexical hit, doc 2 the dense hit, doc 3 BOTH
    val docs = Seq(
      (1L, "spark merge dup spark"), // strong lexical
      (2L, "unrelated words only here"),
      (3L, "spark dup appears here"), // lexical AND dense
      (4L, "other text entirely now")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), // the query vector
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.8f, 0.2f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val fused = Retrieval.hybridSearch(docs, emb, Seq("spark", "dup"), 0L, legK = 2)
    val manual = Retrieval.rrfFuse(
      Retrieval.bm25Leg(docs, Seq("spark", "dup"), 2),
      Retrieval.denseLeg(emb, 0L, 2))
    assert(fused.collect().map(_.toSeq).toSeq ==
      manual.collect().map(_.toSeq).toSeq)
    // legK=2 keeps the zero-cosine docs out of the dense leg, so doc 3 is
    // the only doc present in BOTH legs (rank 2 each: 2/62 beats any 1/61)
    val top = fused.collect().head
    assert(top.getLong(0) == 3L) // present in both legs → fused winner
    assert(!top.isNullAt(1) && !top.isNullAt(2))
    // empty corpus: total, zero rows
    assert(Retrieval.hybridSearch(docs.limit(0), emb.limit(0),
      Seq("spark"), 0L).count() == 0)
  }

  test("rankingAgreement: hand-computed overlap/footrule; one-leg and empty edges") {
    // A: 10@1 20@2 30@3 ; B: 20@1 40@2 10@3 — overlap {10, 20},
    // footrule = |1−3| + |2−1| = 3, A's top-1 (10) sits at B rank 3
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rk")
    val b = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("doc_id", "rk")
    val r = Retrieval.rankingAgreement(a, b, k = 3).collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_overlap") == 2L)
    assert(r.getAs[Double]("jaccard") == r12(2.0 / 4.0))
    assert(r.getAs[Long]("footrule") == 3L)
    assert(r.getAs[Double]("mean_rank_shift") == r12(1.5))
    assert(r.getAs[Long]("rank_in_b_of_a_top1") == 3L)
    // k cuts BOTH legs before comparing
    val r2 = Retrieval.rankingAgreement(a, b, k = 2).collect().head
    assert(r2.getAs[Long]("n_overlap") == 1L) // only 20 survives both top-2
    assert(r2.getAs[Long]("footrule") == 1L)
    assert(r2.isNullAt(r2.fieldIndex("rank_in_b_of_a_top1"))) // 10 fell out of B
    // disjoint legs: zero overlap → null footrule ratio, jaccard 0
    val d = Retrieval.rankingAgreement(a,
      Seq((77L, 1L)).toDF("doc_id", "rk"), k = 3).collect().head
    assert(d.getAs[Long]("n_overlap") == 0L)
    assert(d.getAs[Double]("jaccard") == 0.0)
    assert(d.isNullAt(d.fieldIndex("mean_rank_shift")))
    // both legs empty: the 1-row report with zero counts and null ratios
    val e = Retrieval.rankingAgreement(a.limit(0), b.limit(0), k = 3).collect().head
    assert(e.getAs[Long]("n_a") == 0L && e.getAs[Long]("n_overlap") == 0L)
    assert(e.isNullAt(e.fieldIndex("jaccard")))
  }

  test("served hybrid == ad-hoc hybrid on the sf0.001 corpus (both index legs)") {
    // the q_hybrid_search_served contract: BM25-from-index + full-probe
    // IVF-from-index fuse to EXACTLY the ad-hoc legs' RRF result
    val sf = "/root/testdata/sf0.001"
    val adhoc = SparkEntry.queries("q_hybrid_search")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val served = SparkEntry.queries("q_hybrid_search_served")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(adhoc.nonEmpty, "hybrid result must be non-empty at sf0.001")
    assert(served == adhoc,
      s"served hybrid diverged from the ad-hoc twin:\n$served\nvs\n$adhoc")
  }

  test("mmrRerank: lambda=1 is pure relevance order; diversity demotes the near-twin") {
    // q-space: A and B nearly identical high-relevance vectors, C distinct
    // but still relevant — classic MMR shape
    val emb = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),        // A
      (11L, Array(0.999f, 0.045f, 0.0f)),    // B ≈ A
      (12L, Array(0.0f, 1.0f, 0.0f)),        // C ⊥ A
      (13L, Array(0.5f, 0.5f, 0.7f))         // D middling
    ).toDF("vec_id", "embedding")
    val cands = Seq((10L, 0.95), (11L, 0.94), (12L, 0.80), (13L, 0.70))
      .toDF("doc_id", "score")
    // λ=1: exactly the candidate order
    val pure = Retrieval.mmrRerank(cands, emb, k = 4, lambda = 1.0)
      .select("doc_id").as[Long].collect().toSeq
    assert(pure == Seq(10L, 11L, 12L, 13L))
    // λ=0.5: A first (top relevance), then C (B is ~A, sim≈1 kills it) —
    // the near-twin B demotes below C (it ranked 2nd on pure relevance);
    // D stays last (min-max rel-hat 0 outweighs its moderate diversity)
    val div = Retrieval.mmrRerank(cands, emb, k = 4, lambda = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(div == Seq(10L, 12L, 11L, 13L), s"got $div")
    // ranks are 1..k and mmr_score is non-increasing only within no-tie
    val full = Retrieval.mmrRerank(cands, emb, k = 4, lambda = 0.5).collect()
    assert(full.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("mmrRerank: k beyond candidates, equal scores, missing embeddings") {
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // doc 3 has no embedding: drops before selection
    val cands = Seq((1L, 0.5), (2L, 0.5), (3L, 0.9)).toDF("doc_id", "score")
    val out = Retrieval.mmrRerank(cands, emb, k = 10, lambda = 0.7).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
    // equal scores: rel-hat = 1.0 for both, first pick ties break by doc_id
    assert(out.head.getAs[Long]("doc_id") == 1L)
    // empty candidates: schema-stable empty
    val empty = Retrieval.mmrRerank(cands.where($"doc_id" > 99), emb, k = 3)
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq == Seq("rank", "doc_id", "mmr_score"))
  }
}
