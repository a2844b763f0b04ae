package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization ANN — the memory-bounded scale path of the ANN
  * family (SURVEY §2 #28/29/29b cover brute force / LSH / IVF; this adds
  * the compressed-index leg). A d-dim float vector (d·4 bytes) is encoded
  * as `m` byte-ish codes (one nearest-centroid id per subspace), a
  * d·4/m-fold compression: at 100 TB of embeddings the code table is
  * hundreds of GB instead of the raw corpus, which is what makes
  * exhaustive ADC scans affordable — queries score against codes via
  * per-subspace lookup tables and never touch the raw vectors.
  *
  * Pipeline:
  *  1. [[trainCodebooks]]: per-subspace k-means (L2, Lloyd) on a
  *     hash-gated sample. The sample is collected — codebook training is
  *     sample-based at ANY scale (same doctrine as IVF's
  *     train-on-a-sample) and the artifact is m·ksub·(d/m) floats — KBs.
  *     Deterministic: hash-gate row choice, first-k-distinct seeding,
  *     lowest-index tie-breaks, double accumulators in a fixed order.
  *  2. [[encode]]: map-side argmin over plan-literal centroids per
  *     subspace (the IVF assignment pattern — zero shuffles, codegen'd
  *     dot kernels under `greatest`).
  *  3. [[pqTopK]]: ADC — each query computes its m×ksub lookup table of
  *     subvector·centroid dots ONCE (query side, tiny), approximate
  *     dot(q,x) = Σ_j lut[j][code_j(x)] is m array lookups per candidate
  *     (static expressions, no HOF), normalized by the reconstructed
  *     vector norm (a second literal lookup). The query side broadcasts;
  *     the code table never shuffles — the only exchange is the bounded
  *     top-k heap merge ([[Ann.rankTopK]]).
  */
object Pq {

  private def normSq(v: Array[Float]): Double = {
    var s = 0.0d; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    s
  }

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0d; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic Lloyd iterations on the driver: seed = first k DISTINCT
    * sub-vectors in input order; assignment ties break to the lowest
    * centroid index; empty clusters keep their previous centroid; means
    * accumulate in doubles in input order.
    */
  private def lloydL2(xs: Array[Array[Float]], k: Int, iters: Int): Seq[Array[Float]] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Float]]
    xs.iterator.takeWhile(_ => seen.size < k).foreach(v => seen += v.toSeq)
    var cents = seen.toArray.map(_.toArray)
    if (cents.isEmpty) return Seq.empty
    for (_ <- 0 until iters) {
      val dim = cents(0).length
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      xs.foreach { x =>
        var bi = 0; var bd = Double.MaxValue; var ci = 0
        while (ci < cents.length) {
          val d = l2(x, cents(ci)); if (d < bd) { bd = d; bi = ci }; ci += 1
        }
        counts(bi) += 1
        var j = 0; while (j < dim) { sums(bi)(j) += x(j); j += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, ci) =>
        if (counts(ci) == 0) old
        else sums(ci).map(s => (s / counts(ci)).toFloat)
      }
    }
    cents.toSeq
  }

  /** Per-subspace codebooks from a hash-gated sample (partition-invariant
    * row choice, like every sampler in the engine). Returns m codebooks of
    * ≤ ksub centroids each.
    */
  def trainCodebooks(embeddings: DataFrame, dim: Int, m: Int, ksub: Int,
                     iters: Int, samplePermille: Int = 1000,
                     idCol: String = "vec_id"): Seq[Seq[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sample = (if (samplePermille >= 1000) embeddings
                  else Sampling.hashSample(embeddings, idCol, samplePermille, salt = "pq"))
      .select(col(idCol).cast("long"), col("embedding"))
      .orderBy(idCol).as[(Long, Array[Float])].collect().map(_._2)
    val subDim = dim / m
    (0 until m).map { j =>
      lloydL2(sample.map(_.slice(j * subDim, (j + 1) * subDim)), ksub, iters)
    }
  }

  /** Map-side PQ encoding: per subspace, the argmin-L2 centroid id via
    * plan-literal centroids — argmin ||x−c||² ≡ argmax (2x·c − ||c||²)
    * since ||x||² is constant within a subspace, so each code is a
    * `greatest` over ksub codegen'd dot kernels (ties → lowest id), the
    * exact shape of IVF's map-side assignment. Zero shuffles at any scale.
    */
  def encode(embeddings: DataFrame, dim: Int,
             codebooks: Seq[Seq[Array[Float]]]): DataFrame =
    // empty corpus → empty codebooks → nothing to encode (total op)
    if (codebooks.exists(_.isEmpty))
      embeddings.select(col("vec_id"), typedlit(Array.empty[Int]).as("codes"))
        .where(lit(false))
    else
      embeddings.select(col("vec_id"),
        codeArray(col("embedding"), dim, codebooks).as("codes"))

  /** Schema-stable empty top-k result for the empty-corpus degenerate case. */
  private def emptyTopK(embeddings: DataFrame): DataFrame =
    Ann.rankTopK(embeddings.select(col("vec_id").as("qid"),
      col("vec_id").as("nid"), lit(0.0d).as("cosine")).where(lit(false)), 1)

  /** The m-code array for one embedding column — ONE fused codegen'd
    * kernel pass ([[graft.functions.PqOps.pqCodes]]). The previous
    * spelling ([[codeArrayRef]], kept as the parity reference) was m
    * `greatest` trees over ksub dot kernels each re-slicing the
    * embedding: m·ksub slice copies + struct allocations per ROW and an
    * expression tree whose analysis + codegen compile dominated the
    * sf-scale keys (the AbiWordArrayExpr lesson). PqKernelSpec pins
    * row-for-row parity.
    */
  private def codeArray(e: Column, dim: Int,
                        codebooks: Seq[Seq[Array[Float]]]): Column = {
    val subDim = dim / codebooks.length
    graft.functions.PqOps.pqCodes(e, codebooks, subDim,
      codebooks.map(_.map(normSq).toArray))
  }

  /** The `greatest`-tree Column spelling [[codeArray]] replaced — the
    * kernel's pinned parity reference (PqKernelSpec), never on a query
    * path.
    */
  private[graft] def codeArrayRef(e: Column, dim: Int,
                                  codebooks: Seq[Seq[Array[Float]]]): Column = {
    val m = codebooks.length
    val subDim = dim / m
    val codeCols = codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(e, j * subDim + 1, subDim)
      val scored = cb.zipWithIndex.map { case (c, ci) =>
        struct(
          (graft.functions.VecOps.dotFloat(sub, typedlit(c)) * 2.0d - lit(normSq(c))).as("s"),
          lit(-ci).as("t"))
      }
      val win = if (scored.length == 1) scored.head else greatest(scored: _*)
      (-win.getField("t")).cast("int")
    }
    array(codeCols: _*)
  }

  /** Reconstructed ||x̂||² from the `codes` column — literal per-subspace
    * ||centroid||² lookups.
    */
  private def reconNormSqCol(codebooks: Seq[Seq[Array[Float]]]): Column =
    codebooks.zipWithIndex.map { case (cb, j) =>
      element_at(typedlit(cb.map(normSq).toArray),
        element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)

  /** Per-query ADC lookup table: luts[j][c] = q_subvector_j · centroid_c. */
  private def lutArray(qe: Column, dim: Int,
                       codebooks: Seq[Seq[Array[Float]]]): Column = {
    val subDim = dim / codebooks.length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(qe, j * subDim + 1, subDim)
      array(cb.map(c => graft.functions.VecOps.dotFloat(sub, typedlit(c))): _*)
    }: _*)
  }

  /** Σ_j luts[j][code_j] — m static array lookups, no HOF. */
  private def adcDot(m: Int): Column =
    (0 until m).map { j =>
      element_at(element_at(col("luts"), j + 1), element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)

  /** ADC top-k: train + encode + score in one call (training is the
    * labeled one-time cost, as with q_ann_ivf_trained; at scale codes are
    * a write-once table). Scores are approximate cosine — query·centroid
    * lookups over the reconstructed vector, normalized by the
    * reconstruction's norm — rounded to 12 dp; ranking via the
    * bounded-heap top-k.
    */
  def pqTopK(embeddings: DataFrame, dim: Int = 64, m: Int = 8, ksub: Int = 16,
             iters: Int = 5, numQueries: Int = 5, k: Int = 5): DataFrame = {
    val base = embeddings.where(col("vec_id") >= numQueries)
    val queries = embeddings.where(col("vec_id") < numQueries)
    val codebooks = trainCodebooks(base, dim, m, ksub, iters)
    if (codebooks.exists(_.isEmpty)) return emptyTopK(embeddings)
    // BARRIER: without it CollapseProject inlines the 128-kernel codes
    // expression into every downstream reference (m recon-norm + m ADC
    // lookups → 16 copies), blowing past what codegen compiles — measured
    // 38s → ~2s at sf0.1. Production writes codes as an index table
    // (the buildIvfIndex pattern); the inline path materializes once.
    val codes = encode(base, dim, codebooks)
      .select(col("vec_id").as("nid"), col("codes"))
      .localCheckpoint(true)
    val q = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), Ann.norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
      .withColumn("luts", lutArray(col("qe"), dim, codebooks))
      .select("qid", "qn", "luts")
    val scored = codes
      .withColumn("rn", sqrt(reconNormSqCol(codebooks)))
      .where(col("rn") > 0)
      .join(broadcast(q))
      .select(col("qid"), col("nid"),
        round(adcDot(m) / (col("qn") * col("rn")), 12).as("cosine"))
    Ann.rankTopK(scored, k)
  }

  private def dotArr(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0d; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Residual codebooks: per-subspace k-means over (x − assigned coarse
    * centroid) on a hash-gated sample. Assignment replicates
    * `Ann.assignToCentroids`'s rule exactly (max cosine rounded to 12 dp,
    * ties to the smallest cid) so training sees the same residuals the
    * encoder will quantize.
    */
  def trainResidualCodebooks(embeddings: DataFrame, dim: Int, m: Int, ksub: Int,
                             iters: Int, cents: Array[(Long, Array[Float], Double)],
                             samplePermille: Int = 1000,
                             idCol: String = "vec_id"): Seq[Seq[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sample = (if (samplePermille >= 1000) embeddings
                  else Sampling.hashSample(embeddings, idCol, samplePermille, salt = "pq"))
      .select(col(idCol).cast("long"), col("embedding"))
      .orderBy(idCol).as[(Long, Array[Float])].collect().map(_._2)
    def rnd12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val resids = sample.flatMap { v =>
      val vn = math.sqrt(normSq(v))
      if (vn == 0.0d || cents.isEmpty) None
      else {
        var bs = Double.MinValue; var bcid = Long.MaxValue; var bce: Array[Float] = null
        cents.foreach { case (cid, ce, cn) =>
          val s = rnd12(dotArr(v, ce) / (vn * cn))
          if (s > bs || (s == bs && cid < bcid)) { bs = s; bcid = cid; bce = ce }
        }
        Some(v.indices.map(i => v(i) - bce(i)).toArray)
      }
    }
    val subDim = dim / m
    (0 until m).map { j =>
      lloydL2(resids.map(_.slice(j * subDim, (j + 1) * subDim)), ksub, iters)
    }
  }

  /** Residual PQ codes WITHOUT materializing the residual: per subspace,
    * argmin ||(x−cent)−c||² ≡ argmax 2·((x−cent)·c) − ||c||²
    *       ≡ argmax 2·(x_sub·c) − (2·(cent_sub·c) + ||c||²),
    * and the second term depends only on (cid, c) — a literal map lookup.
    * So residual encoding keeps the flat encoder's shape exactly: ksub
    * codegen'd dot kernels per subspace plus one `element_at` on a
    * plan-literal map, zero shuffles, no per-row vector subtraction HOF.
    */
  private def residualCodeArray(e: Column, cidCol: Column, dim: Int,
                                codebooks: Seq[Seq[Array[Float]]],
                                cents: Array[(Long, Array[Float], Double)]): Column = {
    val m = codebooks.length
    val subDim = dim / m
    // the same fused kernel as [[codeArray]], with the per-(cid, j, ci)
    // offset table precomputed driver-side exactly as the reference
    // spelling's literal maps were ([[residualCodeArrayRef]];
    // PqKernelSpec pins parity)
    val offsetsByCid = cents.toSeq.map { case (_, ce, _) =>
      (0 until m).map { j =>
        codebooks(j).map(c =>
          2.0d * dotArr(ce.slice(j * subDim, (j + 1) * subDim), c) + normSq(c)).toArray
      }
    }
    graft.functions.PqOps.pqCodesResidual(e, cidCol, codebooks, subDim,
      cents.map(_._1), offsetsByCid)
  }

  /** The `greatest`-tree Column spelling [[residualCodeArray]] replaced —
    * the kernel's pinned parity reference (PqKernelSpec), never on a
    * query path.
    */
  private[graft] def residualCodeArrayRef(e: Column, cidCol: Column, dim: Int,
                                codebooks: Seq[Seq[Array[Float]]],
                                cents: Array[(Long, Array[Float], Double)]): Column = {
    val m = codebooks.length
    val subDim = dim / m
    val codeCols = (0 until m).map { j =>
      val sub = slice(e, j * subDim + 1, subDim)
      val scored = codebooks(j).zipWithIndex.map { case (c, ci) =>
        val off = cents.map { case (cid, ce, _) =>
          cid -> (2.0d * dotArr(ce.slice(j * subDim, (j + 1) * subDim), c) + normSq(c))
        }.toMap
        struct(
          (graft.functions.VecOps.dotFloat(sub, typedlit(c)) * 2.0d -
            element_at(typedlit(off), cidCol)).as("s"),
          lit(-ci).as("t"))
      }
      val win = if (scored.length == 1) scored.head else greatest(scored: _*)
      (-win.getField("t")).cast("int")
    }
    array(codeCols: _*)
  }

  /** IVF-PQ: the coarse quantizer prunes which inverted lists a query
    * scores (IVF's nprobe/numCentroids read reduction) and PQ codes make
    * the scoring itself compressed (ADC lookups instead of raw-vector
    * dots) — composed exactly like the write-once IVF index plus a codes
    * column instead of raw embeddings: at 100 TB the stored artifact is
    * (nid, cid, m codes) ≈ tens of bytes/vector, cid-partition-pruned at
    * query time. Assignment AND encoding are both map-side (plan-literal
    * centroids/codebooks) — building this index shuffles nothing but the
    * one cid-clustering write.
    *
    * This is the "flat" IVF-PQ (codes quantize raw vectors);
    * [[ivfPqResidualTopK]] is the residual refinement — quantizing
    * x−centroid instead shrinks the dynamic range the codebooks must
    * cover, dropping reconstruction error (spec-measured). With
    * nprobe = numCentroids the list pruning is a no-op and results equal
    * [[pqTopK]] (spec-pinned).
    */
  def ivfPqTopK(embeddings: DataFrame, dim: Int = 64, numCentroids: Int = 16,
                nprobe: Int = 4, m: Int = 8, ksub: Int = 16, iters: Int = 3,
                numQueries: Int = 5, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val baseAll = embeddings.where(col("vec_id") >= numQueries)
    val base = baseAll
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), Ann.norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val cents = Ann.collectCentroids(base.orderBy("nid").limit(numCentroids)
      .select(col("nid").as("cid"), col("ne").as("ce"), col("nn").as("cn")))
    val codebooks = trainCodebooks(baseAll, dim, m, ksub, iters)
    if (codebooks.exists(_.isEmpty)) return emptyTopK(embeddings)
    // inverted lists carrying CODES, not raw vectors — both columns map-side
    // same materialization barrier as pqTopK (codes referenced 2m times
    // downstream); production writes these lists cid-partitioned
    val lists = Ann.assignToCentroids(base, cents)
      .select(col("nid"), col("cid"),
        codeArray(col("ne"), dim, codebooks).as("codes"))
      .localCheckpoint(true)
    val probes = Ann.probeLists(embeddings.where(col("vec_id") < numQueries),
        cents.toSeq.toDF("cid", "ce", "cn"), nprobe)
      .withColumn("luts", lutArray(col("qe"), dim, codebooks))
      .select("qid", "qn", "cid", "luts")
    val scored = lists
      .withColumn("rn", sqrt(reconNormSqCol(codebooks)))
      .where(col("rn") > 0)
      .join(broadcast(probes), "cid")
      .select(col("qid"), col("nid"),
        round(adcDot(m) / (col("qn") * col("rn")), 12).as("cosine"))
    Ann.rankTopK(scored, k)
  }

  /** Residual IVF-PQ (the FAISS-style refinement of [[ivfPqTopK]]): codes
    * quantize x−centroid, whose dynamic range is the within-list spread
    * instead of the whole corpus — the same m·ksub codebook budget covers
    * it far more finely (spec measures the reconstruction-error drop).
    *
    * Everything stays map-side via plan literals, nothing new shuffles:
    *  - encoding: [[residualCodeArray]] — the centroid subtraction folds
    *    algebraically into per-(cid, code) literal offsets;
    *  - scoring: dot(q, x̂) = q·cent + Σ_j lut_j[code_j] (x̂ = cent + r̂),
    *    where q·cent is one literal-map dot per probed (query, cid) pair —
    *    already broadcast-sized — and the luts are the flat ADC tables
    *    over residual codebooks;
    *  - reconstructed ‖x̂‖² = ‖cent‖² + 2·Σ_j cent_j·r̂_j + Σ_j ‖r̂_j‖²,
    *    all three terms (cid literal, per-(cid,j,code) literal,
    *    per-(j,code) literal) static lookups on the code row.
    */
  def ivfPqResidualTopK(embeddings: DataFrame, dim: Int = 64, numCentroids: Int = 16,
                        nprobe: Int = 4, m: Int = 8, ksub: Int = 16, iters: Int = 3,
                        numQueries: Int = 5, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val baseAll = embeddings.where(col("vec_id") >= numQueries)
    val base = baseAll
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), Ann.norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val cents = Ann.collectCentroids(base.orderBy("nid").limit(numCentroids)
      .select(col("nid").as("cid"), col("ne").as("ce"), col("nn").as("cn")))
    val codebooks = trainResidualCodebooks(baseAll, dim, m, ksub, iters, cents)
    if (cents.isEmpty || codebooks.exists(_.isEmpty)) return emptyTopK(embeddings)
    val subDim = dim / m
    val centMapLit = typedlit(cents.map { case (cid, ce, _) => cid -> ce }.toMap)
    val cnormLit = typedlit(cents.map { case (cid, ce, _) => cid -> normSq(ce) }.toMap)
    // per-subspace cid → (cent_sub_j · residual-centroid_c) lookup arrays
    val cdotLits = (0 until m).map { j =>
      typedlit(cents.map { case (cid, ce, _) =>
        cid -> codebooks(j).map(c => dotArr(ce.slice(j * subDim, (j + 1) * subDim), c)).toArray
      }.toMap)
    }
    // same materialization barrier as pqTopK/ivfPqTopK
    val lists = Ann.assignToCentroids(base, cents)
      .select(col("nid"), col("cid"),
        residualCodeArray(col("ne"), col("cid"), dim, codebooks, cents).as("codes"))
      .localCheckpoint(true)
    val probes = Ann.probeLists(embeddings.where(col("vec_id") < numQueries),
        cents.toSeq.toDF("cid", "ce", "cn"), nprobe)
      .withColumn("luts", lutArray(col("qe"), dim, codebooks))
      .withColumn("qc", graft.functions.VecOps.dotFloat(col("qe"),
        element_at(centMapLit, col("cid"))))
      .select("qid", "qn", "cid", "qc", "luts")
    val crossTerm = (0 until m).map { j =>
      element_at(element_at(cdotLits(j), col("cid")), element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    val scored = lists
      .withColumn("rn",
        sqrt(element_at(cnormLit, col("cid")) + crossTerm * 2.0d + reconNormSqCol(codebooks)))
      .where(col("rn") > 0)
      .join(broadcast(probes), "cid")
      .select(col("qid"), col("nid"),
        round((col("qc") + adcDot(m)) / (col("qn") * col("rn")), 12).as("cosine"))
    Ann.rankTopK(scored, k)
  }

  // ---------------------------------------------------------------- SQ8

  /** Per-dimension (min, max) quantization stats for [[sq8TopK]] — ONE
    * aggregate pass over the corpus producing 2·dim scalars (a single
    * driver row, bounded by construction like the centroid collects).
    */
  def sq8Stats(embeddings: DataFrame, dim: Int): (Array[Float], Array[Float]) = {
    val aggs = (0 until dim).flatMap(d => Seq(
      min(get(col("embedding"), lit(d))).as(s"mn_$d"),
      max(get(col("embedding"), lit(d))).as(s"mx_$d")))
    val row = embeddings.agg(aggs.head, aggs.tail: _*).head()
    if (row.isNullAt(0)) (Array.empty[Float], Array.empty[Float])
    else (Array.tabulate(dim)(d => row.getAs[Float](s"mn_$d")),
          Array.tabulate(dim)(d => row.getAs[Float](s"mx_$d")))
  }

  private def sq8Scales(mins: Array[Float], maxs: Array[Float]): Array[Float] =
    mins.zip(maxs).map { case (mn, mx) => if (mx > mn) (mx - mn) / 255f else 1f }

  /** Map-side SQ8 encoding: per dimension, code = round((x−min)/step)
    * clamped to [0,255] — 8-bit uniform scalar quantization, the simplest
    * compressed-vector layout (byte-per-dimension ≈ 4× smaller than
    * float32; stored as an int array here, the kernel-friendly spelling of
    * the same plumbing). `dnorm` (the dequantized vector's norm) is
    * precomputed once at encode time so query scoring never reconstructs.
    * Zero shuffles, like PQ's [[encode]].
    */
  def sq8Encode(embeddings: DataFrame, dim: Int,
                mins: Array[Float], maxs: Array[Float]): DataFrame = {
    if (mins.isEmpty)
      return embeddings.select(col("vec_id"), typedlit(Array.empty[Int]).as("codes"),
        lit(0.0d).as("dnorm")).where(lit(false))
    val scales = sq8Scales(mins, maxs)
    // r15: one codegen'd walk per row (codes + dequantized norm fused)
    // replacing two interpreted HOF layers — bit-equal to [[sq8EncodeRef]]
    // incl. the zip_with null arms (PqKernelSpec pins parity)
    embeddings.select(col("vec_id"),
        graft.functions.PqOps.sq8Encode(col("embedding"), mins, scales).as("enc"))
      .select(col("vec_id"), col("enc.codes").as("codes"),
        col("enc.dnorm").as("dnorm"))
  }

  /** Column reference spelling of [[sq8Encode]] — the parity oracle for
    * the fused kernel (PqKernelSpec asserts frame equality). Interpreted
    * HOFs; not a hot path.
    */
  private[graft] def sq8EncodeRef(embeddings: DataFrame, dim: Int,
                                  mins: Array[Float], maxs: Array[Float]): DataFrame = {
    if (mins.isEmpty)
      return embeddings.select(col("vec_id"), typedlit(Array.empty[Int]).as("codes"),
        lit(0.0d).as("dnorm")).where(lit(false))
    val scales = sq8Scales(mins, maxs)
    val minsL = typedlit(mins)
    val scalesL = typedlit(scales)
    val codes = zip_with(col("embedding"), sequence(lit(1), lit(dim)), (x, i) =>
      least(greatest(
        round((x.cast("double") - element_at(minsL, i).cast("double"))
          / element_at(scalesL, i).cast("double")).cast("int"), lit(0)), lit(255)))
    val dnormSq = aggregate(
      zip_with(col("codes"), sequence(lit(1), lit(dim)), (c, i) =>
        pow(element_at(minsL, i).cast("double")
          + c.cast("double") * element_at(scalesL, i).cast("double"), 2)),
      lit(0.0d), (acc, x) => acc + x)
    embeddings.select(col("vec_id"), codes.as("codes"))
      .withColumn("dnorm", sqrt(dnormSq))
  }

  /** SQ8 ANN: exhaustive scan over 8-bit scalar-quantized codes — the
    * third compression point of the family (float32 brute force → SQ8 at
    * 4× → PQ at d·4/m×; SQ8 trades less memory saving for near-exact
    * recall and NO training/codebook artifact — two corpus passes: one
    * stats agg, one encode). Scoring never dequantizes per pair:
    * dot(q, dequant(x)) = q·min + (q∘step)·codes, so the query
    * precomputes q·min (scalar) and q∘step (one array) ONCE and each
    * candidate costs a single codegen'd
    * [[graft.functions.VecOps.dotFloatInt]] kernel — the SQ analog of
    * PQ's ADC lookup tables. Queries broadcast; the code table never
    * shuffles; the only exchange is [[Ann.rankTopK]]'s bounded heap
    * merge. Rows-only on the driver gate (quantized scores are
    * engine-specific); AnnSpec measures recall vs the exact graph.
    */
  def sq8TopK(embeddings: DataFrame, dim: Int = 64,
              numQueries: Int = 5, k: Int = 5): DataFrame = {
    val (mins, maxs) = sq8Stats(embeddings, dim)
    if (mins.isEmpty) return emptyTopK(embeddings)
    val scales = sq8Scales(mins, maxs)
    val minsL = typedlit(mins)
    val scalesL = typedlit(scales)
    val base = sq8Encode(embeddings.where(col("vec_id") >= numQueries), dim, mins, maxs)
      .select(col("vec_id").as("nid"), col("codes"), col("dnorm"))
      .where(col("dnorm") > 0)
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        Ann.norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
      .select(col("qid"), col("qn"),
        graft.functions.VecOps.dotFloat(col("qe"), minsL).as("qmin"),
        zip_with(col("qe"), scalesL, (x, s) => (x * s).cast("float")).as("qscaled"))
    val scored = base.crossJoin(broadcast(q))
      .select(col("qid"), col("nid"),
        round((graft.functions.VecOps.dotFloatInt(col("qscaled"), col("codes")) + col("qmin"))
          / (col("qn") * col("dnorm")), 12).as("cosine"))
    Ann.rankTopK(scored, k)
  }
}
