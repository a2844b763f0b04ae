package graft

import graft.operators.{Ann, Pq}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def axis(a: Int, dim: Int): Array[Float] =
    Array.tabulate(dim)(d => if (d == a) 1f else 0f)

  test("encode: codes are m ids < ksub; vectors ON centroids reconstruct exactly") {
    // base vectors sit exactly on what will become their own codebook
    // centroids (tight clusters collapse to their mean), so the
    // reconstruction is exact and ADC cosine == exact cosine == 1 for a
    // query equal to a base vector
    val dim = 8; val m = 2
    val rows = (0 until 24).map(i => (i.toLong, axis(i % 4, dim)))
    val emb = rows.toDF("vec_id", "embedding")
    val cbs = Pq.trainCodebooks(emb, dim, m, ksub = 4, iters = 4)
    assert(cbs.length == m)
    val codes = Pq.encode(emb, dim, cbs).as[(Long, Array[Int])].collect().toMap
    assert(codes.size == 24)
    assert(codes.values.forall(c => c.length == m && c.forall(x => x >= 0 && x < 4)))
    // same input vector -> same codes (and 4 distinct code words across the
    // 4 distinct vectors in each subspace's image)
    assert(codes(0L).sameElements(codes(4L)))
  }

  test("ADC equals exact cosine when vectors lie on codebook centroids") {
    val dim = 8; val m = 2
    // queries 0..2 then base 3..26 over 4 exact axis clusters
    val rows = (0 until 3).map(i => (i.toLong, axis(i % 4, dim))) ++
      (3 until 27).map(i => (i.toLong, axis(i % 4, dim)))
    val emb = rows.toDF("vec_id", "embedding")
    val pq = Pq.pqTopK(emb, dim, m, ksub = 4, iters = 4, numQueries = 3, k = 5)
      .select("qid", "nid", "cosine").as[(Long, Long, Double)].collect()
    // every returned neighbor is either identical (cos 1) or orthogonal (0)
    assert(pq.nonEmpty)
    assert(pq.forall { case (_, _, c) => c == 1.0d || c == 0.0d })
    // top-1 per query is an identical-cluster member at cosine exactly 1
    val top1 = pq.groupBy(_._1).view.mapValues(_.maxBy(_._3)._3).toMap
    assert(top1.values.forall(_ == 1.0d))
  }

  test("PQ recall vs brute force on jittered clusters") {
    val rng = new scala.util.Random(11)
    val dim = 16; val subDim = 4
    // cluster c lights up dim c of EVERY subspace block — each sub-quantizer
    // sees 4 clean clusters (PQ's fidelity is per-subspace structure; a
    // cluster signal confined to one block would leave the other codes
    // quantizing pure noise)
    def clusterVec(c: Int): Array[Float] =
      Array.tabulate(dim)(d => if (d % subDim == c) 1f else 0f)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rng.nextFloat() - 0.5f) * 0.04f)
    val rows = (0 until 4).map(q => (q.toLong, jitter(clusterVec(q)))) ++
      (0 until 40).map(i => (4L + i, jitter(clusterVec(i / 10))))
    val emb = rows.toDF("vec_id", "embedding")
    val brute = Ann.bruteForceTopK(emb, numQueries = 4, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pq = Pq.pqTopK(emb, dim, m = 4, ksub = 8, iters = 5, numQueries = 4, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // PQ's promise is COARSE quality: quantization collapses same-cluster
    // members to tied reconstructions (ties then break by id), so exact
    // top-5 identity is not recoverable — cluster membership is. Assert
    // every PQ neighbor comes from the query's cluster (precision 1.0),
    // plus a loose floor on exact-id recall from the intra-cluster
    // resolution ksub=8 > 4 clusters leaves per subspace.
    def clusterOf(id: Long): Long = if (id < 4) id else (id - 4) / 10
    val precision = pq.map { case (q, ns) =>
      ns.count(n => clusterOf(n) == clusterOf(q)).toDouble / ns.size
    }.sum / pq.size
    val recall = brute.map { case (q, b) =>
      pq.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size
    }.sum / brute.size
    info(f"PQ cluster precision@5: $precision%.2f, exact-id recall@5: $recall%.2f")
    assert(precision == 1.0, f"PQ neighbors must come from the query's cluster, got $precision%.2f")
    assert(recall >= 0.4, f"intra-cluster resolution collapsed entirely: $recall%.2f")
  }

  test("codebooks and codes are invariant under repartitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val cbs = Pq.trainCodebooks(df, 64, 8, 16, iters = 3, samplePermille = 400)
      val codes = Pq.encode(df, 64, cbs).as[(Long, Array[Int])]
        .collect().sortBy(_._1).map(_._2.toSeq).toSeq
      (cbs.map(_.map(_.toSeq)), codes)
    }
    val (cb1, codes1) = run(emb)
    val (cb2, codes2) = run(emb.repartition(7))
    assert(cb1 == cb2, "training must not depend on partition layout")
    assert(codes1 == codes2)
  }

  test("ivfPqTopK with nprobe = numCentroids equals pqTopK (pruning no-op)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val full = Pq.pqTopK(emb, dim = 64, m = 8, ksub = 16, iters = 3,
      numQueries = 5, k = 5).collect().map(_.toSeq).toSeq
    val ivf = Pq.ivfPqTopK(emb, dim = 64, numCentroids = 8, nprobe = 8,
      m = 8, ksub = 16, iters = 3, numQueries = 5, k = 5)
      .collect().map(_.toSeq).toSeq
    assert(ivf == full)
  }

  test("ivfPqTopK keeps cluster precision at nprobe=1 on clustered data") {
    val rng = new scala.util.Random(13)
    val dim = 16; val subDim = 4
    def clusterVec(c: Int): Array[Float] =
      Array.tabulate(dim)(d => if (d % subDim == c) 1f else 0f)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rng.nextFloat() - 0.5f) * 0.04f)
    val rows = (0 until 4).map(q => (q.toLong, jitter(clusterVec(q)))) ++
      (0 until 40).map(i => (4L + i, jitter(clusterVec(i / 10))))
    val emb = rows.toDF("vec_id", "embedding")
    val got = Pq.ivfPqTopK(emb, dim, numCentroids = 8, nprobe = 2, m = 4,
      ksub = 8, iters = 5, numQueries = 4, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def clusterOf(id: Long): Long = if (id < 4) id else (id - 4) / 10
    val precision = got.map { case (q, ns) =>
      ns.count(n => clusterOf(n) == clusterOf(q)).toDouble / ns.size
    }.sum / got.size
    info(f"IVF-PQ cluster precision@5 (nprobe=2): $precision%.2f")
    assert(precision == 1.0)
  }

  test("residual IVF-PQ is exact when every base vector sits on a coarse centroid") {
    val dim = 8; val m = 2
    // base 3..26 over 4 exact axis clusters; coarse = first 4 base vectors
    // = all 4 axes; residuals are identically zero, so x̂ = centroid exactly
    val rows = (0 until 3).map(i => (i.toLong, axis(i % 4, dim))) ++
      (3 until 27).map(i => (i.toLong, axis((i - 3) % 4, dim)))
    val emb = rows.toDF("vec_id", "embedding")
    val r = Pq.ivfPqResidualTopK(emb, dim, numCentroids = 4, nprobe = 4,
      m = m, ksub = 4, iters = 4, numQueries = 3, k = 5)
      .select("qid", "nid", "cosine").as[(Long, Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (_, _, c) => c == 1.0d || c == 0.0d })
    val top1 = r.groupBy(_._1).view.mapValues(_.maxBy(_._3)._3).toMap
    assert(top1.values.forall(_ == 1.0d))
  }

  test("residual codes drop reconstruction error vs flat IVF-PQ") {
    // Each base vector = cluster center + one of 4 FIXED offset patterns
    // (offset 0 = none). The residual distribution is exactly {0, o1, o2,
    // o3} — learnable perfectly with ksub=4 — while flat codebooks must
    // cover 16 distinct per-subspace patterns with 4 centroids and cannot
    // be exact. Clusters live in dims 0-3 of each subspace block, offsets
    // in dims 4-7, so neither signal hides from any sub-quantizer.
    val dim = 16; val m = 2; val subDim = dim / m
    def clusterVec(c: Int): Array[Float] =
      Array.tabulate(dim)(d => if (d % subDim == c) 1f else 0f)
    def offVec(p: Int): Array[Float] =
      Array.tabulate(dim)(d => if (p > 0 && d % subDim == 3 + p) 0.1f else 0f)
    def plus(a: Array[Float], b: Array[Float]) = a.indices.map(i => a(i) + b(i)).toArray
    val queries = (0 until 4).map(q => (q.toLong, clusterVec(q)))
    val coarse = (0 until 4).map(c => (4L + c, clusterVec(c))) // pure centers first
    val rest = (0 until 40).map { i =>
      (8L + i, plus(clusterVec(i % 4), offVec((i / 4) % 4)))
    }
    val emb = (queries ++ coarse ++ rest).toDF("vec_id", "embedding")
    val vecs = (queries ++ coarse ++ rest).toMap
    def exactCos(q: Long, n: Long): Double = {
      val a = vecs(q); val b = vecs(n)
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    def meanErr(rows: Array[(Long, Long, Double)]): Double =
      rows.map { case (q, n, c) => math.abs(c - exactCos(q, n)) }.sum / rows.length
    val res = Pq.ivfPqResidualTopK(emb, dim, numCentroids = 4, nprobe = 4,
      m = m, ksub = 4, iters = 5, numQueries = 4, k = 8)
      .select("qid", "nid", "cosine").as[(Long, Long, Double)].collect()
    val flat = Pq.ivfPqTopK(emb, dim, numCentroids = 4, nprobe = 4,
      m = m, ksub = 4, iters = 5, numQueries = 4, k = 8)
      .select("qid", "nid", "cosine").as[(Long, Long, Double)].collect()
    val (resErr, flatErr) = (meanErr(res), meanErr(flat))
    info(f"mean |ADC - exact| residual: $resErr%.2e, flat: $flatErr%.2e")
    assert(resErr < 1e-8, f"residual ADC should be near-exact here, got $resErr%.2e")
    assert(flatErr > 1e-5, f"flat should show real quantization error here, got $flatErr%.2e")
    assert(resErr < flatErr)
  }

  test("residual IVF-PQ is deterministic under repartitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pq.ivfPqResidualTopK(df, dim = 64, numCentroids = 8, nprobe = 3,
        m = 8, ksub = 16, iters = 3, numQueries = 5, k = 5)
        .collect().map(_.toSeq).toSeq
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("pqTopK runs on the testdata embeddings and returns k rows per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Pq.pqTopK(emb, dim = 64, m = 8, ksub = 16, iters = 3,
      numQueries = 5, k = 5).collect()
    assert(r.length == 25)
  }

  test("sq8: codes in [0,255], dequantization error bounded by half a step") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (mins, maxs) = Pq.sq8Stats(emb, 64)
    assert(mins.length == 64 && maxs.length == 64)
    assert(mins.zip(maxs).forall { case (mn, mx) => mn <= mx })
    val enc = Pq.sq8Encode(emb, 64, mins, maxs)
      .select("vec_id", "codes").as[(Long, Array[Int])].collect()
    assert(enc.forall(_._2.forall(c => c >= 0 && c <= 255)))
    val raw = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val steps = mins.zip(maxs).map { case (mn, mx) => if (mx > mn) (mx - mn) / 255f else 1f }
    enc.foreach { case (id, codes) =>
      codes.zipWithIndex.foreach { case (c, d) =>
        val deq = mins(d) + c.toDouble * steps(d)
        assert(math.abs(deq - raw(id)(d)) <= steps(d) / 2 + 1e-6,
          s"vec $id dim $d: |$deq - ${raw(id)(d)}| > step/2")
      }
    }
  }

  test("sq8TopK: near-exact recall vs brute force at 8 bits") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = graft.operators.Ann.bruteForceTopK(emb, numQueries = 5, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq = Pq.sq8TopK(emb, dim = 64, numQueries = 5, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = brute.map { case (q, b) =>
      sq.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size }.sum / brute.size
    info(f"SQ8 recall@5 vs brute force: $recall%.2f")
    assert(recall >= 0.8, f"8-bit scalar quantization should be near-exact, got $recall%.2f")
    assert(sq.values.forall(_.size == 5))
  }

  test("sq8TopK is deterministic under repartitioning; empty input is total") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pq.sq8TopK(df, dim = 64, numQueries = 5, k = 5).collect().map(_.toSeq).toSeq
    assert(run(emb) == run(emb.repartition(7)))
    val empty = emb.where(org.apache.spark.sql.functions.lit(false))
    assert(Pq.sq8TopK(empty, dim = 64).collect().isEmpty)
  }
}
