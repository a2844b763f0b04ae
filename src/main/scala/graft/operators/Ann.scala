package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against a linear scan of the base. No shuffle of the base except
  *    the final per-query top-k, which runs on the engine's bounded-heap
  *    [[graft.functions.TopKAgg]] so only k·queries rows per partition
  *    ever cross the wire.
  *  - [[lshTopK]]: random-hyperplane LSH — bucket base and queries by the
  *    sign-bit key, search only matching buckets. The 100 TB path: the scan
  *    is pruned to candidate buckets, trading recall for a ~2^bits fan-in
  *    reduction.
  *
  * Determinism: dot products accumulate CAST(x*y AS DECIMAL(28,18)) — exact,
  * order-independent — then one double division/sqrt (IEEE-exact), so Spark
  * and the DuckDB oracle agree bit-for-bit and ranking has no ulp ties;
  * remaining ties break on neighbor id.
  */
object Ann {

  /** Exact decimal dot product of two float arrays (cast to double per
    * element; products are IEEE-identical cross-engine, the decimal sum is
    * associative so parallelism can't reorder it into a different answer).
    * Runs on the native codegen'd [[graft.functions.VecOps.dotDecimalFloat]]
    * kernel — bit-identical to the readable HOF spelling [[dotDecimalHof]]
    * (VecOpsSpec pins parity across the hostile envelope), but inside
    * whole-stage codegen where the HOF is interpreted per evaluation with
    * a BigDecimal lambda re-entry per element (the [[cosFast]]/cosFastHof
    * precedent; measured across the ANN family's norm() + scoring paths).
    */
  def dotDecimal(a: Column, b: Column): Column =
    graft.functions.VecOps.dotDecimalFloat(a, b)

  /** HOF reference formulation of [[dotDecimal]] — the parity oracle for
    * the native kernel, not a hot path (CodegenFallback).
    */
  def dotDecimalHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(28,18)")),
      lit(0).cast("decimal(28,18)"),
      (acc, x) => (acc + x).cast("decimal(28,18)")
    )

  def norm(a: Column): Column = sqrt(dotDecimal(a, a).cast("double"))

  /** Per-query top-k ranking of a scored (qid, nid, cosine) frame via the
    * engine's bounded-heap [[graft.functions.TopKAgg]] instead of a
    * `row_number()` window: partials combine map-side, so the shuffle
    * carries at most k·queries·partitions rows — the answer, not the
    * candidate set. Ordering (cosine desc, nid asc) is encoded as the
    * struct's lexicographic order on (−cosine, nid); output is identical
    * to the window formulation (AnnSpec pins this). Caveat: for NaN cosines
    * negate(NaN)=NaN would sort GREATEST here while a `cosine desc` window
    * puts NaN first — so every caller excludes zero-norm vectors (the only
    * NaN source, 0/0) before scoring and the two formulations agree.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val item = struct(negate(col("cosine")).as("neg_cosine"), col("nid").as("nid"), col("cosine").as("cosine"))
    scored
      .groupBy("qid")
      .agg(graft.functions.TopKAgg.topK(item, k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.nid").as("nid"), col("col.cosine").as("cosine"),
        (col("pos") + 1).cast("long").as("rk"))
      .orderBy("qid", "rk")
  }

  def bruteForceTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 5): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
    val base = embeddings.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    // cosine is rounded to 12 dp: the decimal dot is exact, but sqrt/divide
    // accumulate engine-specific last-ulp noise; ranking on the rounded value
    // keeps ordering identical cross-engine (ties then break on nid).
    val scored = base.crossJoin(broadcast(q))
      .select(
        col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine")
      )
    rankTopK(scored, k)
  }

  /** LABEL PROPAGATION over the kNN graph — semi-supervised labeling in
    * representation space: a handful of seed labels (language tags,
    * quality judgments, topic labels) spread to every vector whose
    * neighborhood agrees, turning an expensive human/model labeling pass
    * into a cheap geometric one (the standard trick for bootstrapping
    * corpus labels from a small audited sample). Majority vote by
    * NEIGHBOR COUNT per iteration — not cosine-weighted sums, so each
    * round is exact integer arithmetic with a deterministic tie-break
    * (smallest label) and the fixpoint is partition-independent; seeds
    * are CLAMPED (an audited label never flips).
    *
    * Shape, per iteration: edges⋈labels on the neighbor key, a
    * partial-agg (node, label) count, a bounded min_by winner pick, one
    * co-partitioned join back — (id, label) pairs in every shuffle,
    * lineage cut by the standard checkpoint knob. The exact kNN build is
    * the demo baseline; at scale the LSH graph ([[knnGraphLsh]]) swaps
    * in unchanged.
    */
  def labelPropagation(embeddings: DataFrame, seeds: DataFrame, k: Int = 5,
                       iters: Int = 5, maxId: Long = Long.MaxValue,
                       checkpointDir: Option[String] = None,
                       checkpointEvery: Int = 5): DataFrame = {
    def cut(df: DataFrame, round: Int) =
      Checkpoints.cut(df, round, checkpointDir, checkpointEvery)
    val edges = cut(knnGraph(embeddings, k, maxId)
      .select(col("qid"), col("nid")), 0)
    val nodes = edges.select(col("qid").as("vec_id")).distinct()
    val seed = seeds.select(col("vec_id"), col("label").as("seed_label"))
      .groupBy("vec_id").agg(min("seed_label").as("seed_label")) // dedup, deterministic
    var labels = cut(nodes.join(seed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("seed_label"),
        col("seed_label").as("label")), 0)
    for (it <- 1 to iters) {
      val votes = edges
        .join(labels.select(col("vec_id").as("nid"), col("label").as("nbr")),
          "nid")
        .where(col("nbr").isNotNull)
        .groupBy(col("qid"), col("nbr"))
        .agg(count(lit(1)).as("nv"))
      val winner = votes.groupBy(col("qid").as("vec_id"))
        .agg(min_by(col("nbr"),
          struct((-col("nv")).as("neg"), col("nbr"))).as("win"))
      labels = cut(labels.join(winner, Seq("vec_id"), "left")
        .select(col("vec_id"), col("seed_label"),
          coalesce(col("seed_label"), col("win"), col("label")).as("label")),
        it)
    }
    labels.select(col("vec_id"), col("label"),
        col("seed_label").isNotNull.as("is_seed"))
      .orderBy("vec_id")
  }

  /** Cheap double cosine for bucketing decisions (not oracle-checked).
    * Runs on the native codegen'd [[graft.functions.VecOps.dotFloat]] —
    * bit-identical to the readable HOF fold [[cosFastHof]] (left-to-right
    * double accumulation; VecOpsSpec pins parity), but it stays inside
    * whole-stage codegen where the HOF is interpreted per evaluation.
    */
  private def cosFast(a: Column, b: Column, an: Column, bn: Column): Column =
    graft.functions.VecOps.dotFloat(a, b) / (an * bn)

  /** HOF reference formulation of [[cosFast]] — the parity oracle for the
    * native kernel, not a hot path (CodegenFallback).
    */
  def cosFastHof(a: Column, b: Column, an: Column, bn: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x) / (an * bn)

  /** The centroid set collected to the driver — bounded by construction
    * (numCentroids rows, broadcast-sized), sorted by cid for determinism.
    * Embedded as plan literals, the centroids ride the serialized task to
    * every executor — an implicit broadcast — so assignment becomes a pure
    * per-row computation.
    */
  private[graft] def collectCentroids(centroids: DataFrame): Array[(Long, Array[Float], Double)] = {
    val spark = centroids.sparkSession
    import spark.implicits._
    centroids.select(col("cid"), col("ce"), col("cn"))
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
  }

  /** Per-row winner struct: lexicographic `greatest` over
    * (rounded cosine, −cid) — max cosine, ties to the smallest cid
    * (exactly the `max_by(cid, struct(s, −cid))` ordering the shuffled
    * formulation used). numCentroids codegen'd [[cosFast]] kernels per row;
    * scores can't be NaN (both sides are norm-filtered > 0).
    */
  private def winnerStruct(cents: Array[(Long, Array[Float], Double)]): Column = {
    val scored = cents.map { case (cid, ce, cn) =>
      struct(
        round(graft.functions.VecOps.dotFloat(col("ne"), typedlit(ce)) / (col("nn") * lit(cn)), 12).as("s"),
        lit(-cid).as("t"))
    }
    if (scored.length == 1) scored.head else greatest(scored.toIndexedSeq: _*)
  }

  /** Nearest-centroid id per base vector — MAP-SIDE: no shuffle, no join.
    * Assignment is a per-ROW property, so the former
    * crossJoin(broadcast) + groupBy(nid) argmax — which pushed the whole
    * corpus (embeddings riding `first(ne)`) through an exchange to compute
    * it — was one avoidable corpus-wide shuffle; this shape has zero
    * (AnnSpec plan-asserts it), leaving the write-side cid clustering of
    * [[buildIvfIndex]] as the only shuffle an IVF build pays.
    */
  private[graft] def assignToCentroids(base: DataFrame,
                                       cents: Array[(Long, Array[Float], Double)]): DataFrame =
    if (cents.isEmpty) // empty corpus → no centroids → no lists (total op)
      base.select(col("nid"), lit(null).cast("long").as("cid"), col("ne"), col("nn"))
        .where(lit(false))
    else
      base.withColumn("_w", winnerStruct(cents))
        .select(col("nid"), (-col("_w").getField("t")).as("cid"), col("ne"), col("nn"))

  /** Assignment plus the winning cosine — the trainer needs the score to
    * find the worst-covered vectors (re-seed targets). Map-side like
    * [[assignToCentroids]].
    */
  private def assignScored(base: DataFrame, cents: Array[(Long, Array[Float], Double)]): DataFrame =
    if (cents.isEmpty)
      base.select(col("nid"), lit(null).cast("long").as("cid"),
        lit(null).cast("double").as("score"), col("ne")).where(lit(false))
    else
      base.withColumn("_w", winnerStruct(cents))
        .select(col("nid"), (-col("_w").getField("t")).as("cid"),
          col("_w").getField("s").as("score"), col("ne"))

  private def cosArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0.0d || nb == 0.0d) 1.0d // degenerate → treat as duplicate
    else dot / math.sqrt(na) / math.sqrt(nb)
  }

  /** `iters` Lloyd refinements of the deterministic first-N seed centroids.
    * Per iteration:
    *  1. assign every base vector to its nearest centroid (cosine);
    *  2. recompute each centroid as the per-dimension DECIMAL mean of its
    *     members (order-independent sums → trained centroids are
    *     bit-deterministic across runs and partitionings);
    *  3. empty or near-duplicate centroids (cos > 0.995 with a lower-cid
    *     survivor — plain Lloyd can never merge these, they just keep
    *     splitting one dense region while other regions go uncovered)
    *     RE-SEED to the worst-covered vectors (lowest winning cosine,
    *     ties by id) — the standard empty-cluster fix, kept deterministic.
    *
    * The per-centroid sums are numCentroids × dim rows and the re-seed
    * pick is a sort-limit — both driver-safe; the loop costs iters ×
    * (one scan + one narrow shuffle). At 100 TB you'd train on a sample
    * with the same code path; the centroid table is broadcast-sized
    * either way.
    */
  def kmeansCentroids(base: DataFrame, numCentroids: Int, iters: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    var cents = collectCentroids(base.orderBy("nid").limit(numCentroids)
      .select(col("nid").as("cid"), col("ne").as("ce"), col("nn").as("cn")))
    // the per-dimension stats below need the corpus's max vector length
    // once (vectors don't change across iterations); null-safe on an
    // empty base
    val dimRow = base.agg(max(size(col("ne")))).head()
    val maxDim = if (dimRow.isNullAt(0)) 0 else dimRow.getInt(0)
    for (_ <- 0 until iters) {
      val assigned = assignScored(base, cents).persist()
      // per-dimension partial aggregates instead of the old
      // posexplode → groupBy(cid, pos) spelling: that pass multiplied
      // every row ×dim through an exchange to compute numCentroids×dim
      // scalars. `get(ne, i)` nulls past the end (no ANSI throw), the
      // count arm replicates posexplode's per-position row count
      // (members whose vector HAS position i, null elements included),
      // and decimal sums are order-independent — the collected stats are
      // bit-identical, so trained centroids are unchanged (AnnSpec's
      // determinism pins hold).
      val means: Map[Long, Array[Float]] =
        if (maxDim == 0) Map.empty
        else {
          val aggs = (0 until maxDim).flatMap { i =>
            Seq(sum(get(col("ne"), lit(i)).cast("decimal(28,18)")).as(s"s_$i"),
              count(when(size(col("ne")) > i, lit(1))).as(s"n_$i"))
          }
          assigned.groupBy("cid").agg(aggs.head, aggs.tail: _*).collect()
            .map { r =>
              val cid = r.getLong(0)
              // trailing never-populated positions were ABSENT from the
              // posexplode rows — size the centroid to the last
              // populated one to match that spelling exactly
              var last = -1
              var i = 0
              while (i < maxDim) {
                if (r.getLong(2 + 2 * i) > 0) last = i
                i += 1
              }
              val v = new Array[Float](last + 1)
              i = 0
              while (i <= last) {
                val n = r.getLong(2 + 2 * i)
                if (n > 0)
                  v(i) = (r.getDecimal(1 + 2 * i).doubleValue() / n).toFloat
                i += 1
              }
              cid -> v
            }.toMap
        }
      val accepted = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
      val reseedCids = scala.collection.mutable.ArrayBuffer.empty[Long]
      cents.foreach { case (c, ce, _) =>
        val v = means.getOrElse(c, Array.empty[Float])
        val degenerate = v.isEmpty ||
          accepted.exists { case (_, u) => cosArr(u, v) > 0.995d }
        if (degenerate) reseedCids += c else accepted += ((c, v))
      }
      if (reseedCids.nonEmpty) {
        val worst = assigned.orderBy(col("score").asc, col("nid").asc)
          .limit(reseedCids.size)
          .select(col("nid"), col("ne")).as[(Long, Array[Float])].collect()
        reseedCids.zip(worst).foreach { case (c, (_, v)) => accepted += ((c, v)) }
      }
      assigned.unpersist()
      // norms through the same decimal-exact norm() the seeds used — a
      // numCentroids-row job, so trained centroids stay bit-deterministic
      cents = collectCentroids(accepted.toSeq.toDF("cid", "ce")
        .select(col("cid"), col("ce"), norm(col("ce")).as("cn"))
        .where(col("cn") > 0))
    }
    cents.toSeq.toDF("cid", "ce", "cn")
  }

  /** IVF-style ANN: coarse quantizer (centroid set) partitions the base into
    * inverted lists; a query probes only its `nprobe` nearest centroids'
    * lists. At 100 TB the assignment is a write-once index (bucketed table
    * partitioned by cid); query cost drops from |base| to
    * nprobe/numCentroids of it. Centroids seed from the first
    * `numCentroids` base vectors (deterministic); `kmeansIters` > 0 runs
    * that many Lloyd refinements first ([[kmeansCentroids]]) — better list
    * balance and recall at equal nprobe, same plumbing.
    */
  /** nprobe nearest centroids per query vector, carrying (qid, qe, qn, cid)
    * — a tiny cross join (queries × numCentroids) + per-query window.
    */
  private[operators] def probeLists(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), norm(col("embedding")).as("qn"))
      .where(col("qn") > 0)
    val wProbe = Window.partitionBy("qid")
      .orderBy(col("c_sim").desc, col("cid"))
    q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qe"), col("qn"), col("cid"),
        round(cosFast(col("qe"), col("ce"), col("qn"), col("cn")), 12).as("c_sim"))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nprobe)
      .select("qid", "qe", "qn", "cid")
  }

  /** Exact (decimal) scoring of probed lists + bounded-heap ranking. The
    * probe side (≤ queries·nprobe rows) is BROADCAST, so the corpus-sized
    * list side never shuffles; the only exchange in the whole query is
    * rankTopK's partial-agged k·queries rows.
    */
  private def scoreProbed(lists: DataFrame, probes: DataFrame, k: Int,
                          excludeSelf: Boolean = false): DataFrame = {
    val joined = lists.join(broadcast(probes), "cid")
    // self-exclusion happens BEFORE scoring and ranking: when queries live
    // in the index, ranking first and filtering after can drop the self-hit
    // outside top-k under cosine ties (>= k neighbors tied at 1.0 with
    // smaller ids), silently yielding k instead of k-1 true neighbors
    val cand = if (excludeSelf) joined.where(col("qid") =!= col("nid")) else joined
    rankTopK(
      cand.select(col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine")),
      k)
  }

  def ivfTopK(embeddings: DataFrame, numCentroids: Int = 16, nprobe: Int = 4,
              numQueries: Int = 5, k: Int = 5, kmeansIters: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val cents = collectCentroids(
      if (kmeansIters > 0) kmeansCentroids(base, numCentroids, kmeansIters)
      else base.orderBy("nid").limit(numCentroids)
        .select(col("nid").as("cid"), col("ne").as("ce"), col("nn").as("cn")))
    val centsDf = cents.toSeq.toDF("cid", "ce", "cn")
    // inverted lists, assigned map-side; [[buildIvfIndex]] is the
    // write-once materialization of exactly this frame
    val assigned = assignToCentroids(base, cents)
    scoreProbed(assigned, probeLists(embeddings.where(col("vec_id") < numQueries), centsDf, nprobe), k)
  }

  /** Materialize the IVF index as the write-once artifact: inverted lists
    * cid-PARTITIONED on disk (so queries prune to their probed partitions)
    * plus the centroid table. The partitionBy write clusters rows by cid —
    * the one shuffle any cid-partitioned layout costs, paid once at build
    * time; assignment itself is map-side ([[assignToCentroids]]).
    */
  def buildIvfIndex(embeddings: DataFrame, dir: String, numCentroids: Int = 16,
                    numQueries: Int = 5, kmeansIters: Int = 0): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val cents = collectCentroids(
      if (kmeansIters > 0) kmeansCentroids(base, numCentroids, kmeansIters)
      else base.orderBy("nid").limit(numCentroids)
        .select(col("nid").as("cid"), col("ne").as("ce"), col("nn").as("cn")))
    // rebuild over a previously-compacted dir: reset the generation
    // pointer + fold watermark or the fresh raw-path write is invisible
    graft.sources.ParquetCompactor.resetPointer(spark, s"$dir/lists")
    graft.sources.ParquetCompactor.deleteMarker(spark, ivfFoldMarker(dir))
    cents.toSeq.toDF("cid", "ce", "cn")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    // `b` (ingest batch) is a nested partition under cid from birth so
    // [[appendIvfBatch]] can land later batches in the same store —
    // partition discovery requires one consistent depth; cid stays the
    // top-level pruning key either way
    assignToCentroids(base, cents).withColumn("b", lit(0L))
      .write.partitionBy("cid", "b").mode("overwrite").parquet(s"$dir/lists")
  }

  /** Incremental IVF maintenance: encode a NEW embedding batch with the
    * index's FROZEN stored centroids — map-side plan literals, zero corpus
    * shuffle, exactly [[buildIvfIndex]]'s assignment discipline — and land
    * it in the same cid-partitioned list store under `b=<batchId>`.
    * Dynamic partition overwrite makes a replayed batch overwrite ITSELF,
    * so at-least-once foreachBatch delivery yields exactly-once lists (the
    * ViewMaintenance.appendBatch contract); [[ivfTopKFromIndex]] still
    * prunes on the top-level cid and never notices `b`. Centroids are
    * frozen by design (the add-after-train contract every IVF library
    * keeps): additions never reshape clusters mid-flight, drift is
    * measured (assignment scores) and answered by retrain + rebuild.
    */
  private def ivfFoldMarker(dir: String): String = s"$dir/lists-folded-through"

  def appendIvfBatch(newEmbeddings: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = newEmbeddings.sparkSession
    // resolve the index-root generation first (see [[ivfTopKFromIndex]]):
    // appends must land in the CURRENT root's lists, against its centroids
    val root = graft.sources.ParquetCompactor.currentDir(spark, dir)
    // replay-after-compaction guard (the text index's contract): a batch
    // below the fold watermark is already in b=0 — re-landing it would
    // duplicate list rows
    if (graft.sources.ParquetCompactor.readMarker(spark, ivfFoldMarker(root))
        .exists(batchId < _)) return
    val cents = collectCentroids(spark.read.parquet(s"$root/centroids"))
    val base = newEmbeddings
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    // writer-scoped dynamic overwrite: a session-conf toggle would race
    // any concurrent write on the same SparkSession (two maintenance
    // streams), and the per-writer option needs no restore dance
    assignToCentroids(base, cents).withColumn("b", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cid", "b")
      .parquet(graft.sources.ParquetCompactor.currentDir(spark, s"$root/lists"))
  }

  /** COMPACTION round for a grown IVF index — the text index's story
    * applied to inverted lists: every `b=<batchId>` ingest generation
    * BELOW `beforeBatch` folds into `b=0`, shedding sliver files and
    * partition dirs while keeping the (cid, b) layout and cid-pruning;
    * generation-swap semantics via [[graft.sources.ParquetCompactor]]
    * (readers flip atomically, a crash keeps the old store, row-count
    * verified). The fold advances a watermark; replays of folded batches
    * no-op in [[appendIvfBatch]]. Pass the maintenance stream's committed
    * frontier — only CLOSED batches fold.
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                      beforeBatch: Long): String = {
    val root = graft.sources.ParquetCompactor.currentDir(spark, dir)
    val out = graft.sources.ParquetCompactor.compact(spark, s"$root/lists",
      partitionCols = Seq("cid", "b"),
      rewrite = df => df
        .withColumn("b", when(col("b") < beforeBatch, lit(0L)).otherwise(col("b")))
        .repartition(col("cid")))
    val prev = graft.sources.ParquetCompactor.readMarker(spark, ivfFoldMarker(root)).getOrElse(0L)
    graft.sources.ParquetCompactor.writeMarker(spark, ivfFoldMarker(root),
      math.max(prev, beforeBatch))
    out
  }

  /** Streaming IVF maintenance over an embeddings stream — each
    * micro-batch is encoded map-side and appended idempotently.
    */
  def startIvfMaintenance(embeddings: DataFrame, dir: String,
                          checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId 0 would collide with the build generation; offset by 1
        appendIvfBatch(batch, dir, batchId + 1)
        ()
      }
      .start()

  /** DRIFT-GATED IVF maintenance — the frozen-centroid contract's other
    * half, wired: the contract says additions never reshape clusters
    * mid-flight and "drift is measured and answered by retrain+rebuild".
    * This measures it ([[embeddingDrift]] between the index's stored
    * corpus and the incoming batch, whole-corpus group) and answers it:
    *
    *  - `shift_l2 ≤ tau` → [[appendIvfBatch]] with the FROZEN centroids
    *    (the undrifted fast path; returns "appended")
    *  - `shift_l2 > tau` → retrain centroids over stored ∪ batch and
    *    REBUILD into a fresh index-root generation (`<dir>-gN`, the
    *    [[graft.sources.ParquetCompactor.compact]] naming), then flip the
    *    root pointer atomically — readers resolve the pointer before
    *    opening centroids or lists ([[ivfTopKFromIndex]]), so they see
    *    the old or the new (centroids, lists) PAIR, never a mixed one;
    *    the superseded root is GC'd unless it is the raw `dir` (returns
    *    "rebuilt")
    *
    * Scale shape: the drift probe is the 49f cell protocol — vectors
    * never shuffle whole, the verdict is |dims| cells; the rebuild is the
    * one-time [[buildIvfIndex]] cost, paid only when the alarm fires.
    * An empty batch returns "empty" without touching the store; a batch
    * at or below the current root's fold watermark returns "replay"
    * (at-least-once delivery detected up front — never re-measured, since
    * drift against the post-rebuild blend could verdict differently).
    */
  def maintainIvfIndexWithDrift(newEmbeddings: DataFrame, dir: String,
                                batchId: Long, tau: Double,
                                numCentroids: Int = 16,
                                kmeansIters: Int = 0): String = {
    val spark = newEmbeddings.sparkSession
    import spark.implicits._
    if (newEmbeddings.isEmpty) return "empty"
    val root = graft.sources.ParquetCompactor.currentDir(spark, dir)
    // replay guard FIRST (the appendIvfBatch contract, hoisted): a batch
    // below the current root's fold watermark is already folded into its
    // b=0 lists — a rebuild replay would re-measure drift against the
    // POST-rebuild corpus (a blend, so the verdict can differ from the
    // original run) and either duplicate list rows or rebuild twice
    if (graft.sources.ParquetCompactor.readMarker(spark, ivfFoldMarker(root))
        .exists(batchId < _)) return "replay"
    val stored = graft.sources.ParquetCompactor.read(spark, s"$root/lists")
      .select(col("nid").as("vec_id"), col("ne").as("embedding"))
    val drift = embeddingDrift(
      stored.select(lit("corpus").as("g"), col("embedding")),
      newEmbeddings.select(lit("corpus").as("g"),
        col("embedding").cast("array<float>").as("embedding")), "g")
      .select("shift_l2").head()
    val shift = if (drift.isNullAt(0)) Double.PositiveInfinity else drift.getDouble(0)
    if (shift <= tau) {
      appendIvfBatch(newEmbeddings, dir, batchId)
      "appended"
    } else {
      // fresh root generation, monotonic counter from the current name
      val gen = if (root == dir) 1L
        else root.substring(root.lastIndexOf("-g") + 2).toLong + 1L
      val out = s"$dir-g$gen"
      // anti-join before the union: if any of the batch's ids are already
      // stored (a replay interleaving the append path's dynamic-overwrite
      // partitions), the rebuild must not duplicate them
      buildIvfIndex(
        stored.join(newEmbeddings.select("vec_id"), Seq("vec_id"), "left_anti")
          .unionByName(newEmbeddings.select(col("vec_id"),
            col("embedding").cast("array<float>").as("embedding"))),
        out, numCentroids, numQueries = 0, kmeansIters = kmeansIters)
      // the rebuild FOLDED this batch into the new root's b=0 lists:
      // advance the new root's fold watermark BEFORE the flip so an
      // at-least-once replay of the same batch no-ops at this function's
      // entry guard (and in appendIvfBatch's, for direct callers); a
      // crash before the flip replays the rebuild itself, which is
      // deterministic — same artifact, same flip
      graft.sources.ParquetCompactor.writeMarker(spark, ivfFoldMarker(out),
        batchId + 1)
      graft.sources.ParquetCompactor.flipPointer(spark, dir, out)
      // DEFERRED GC: the just-superseded root is unreachable from the
      // pointer but may still be mid-scan by a reader that resolved it
      // before the flip (ivfTopKFromIndex resolves once, then opens
      // centroids + lists lazily) — deleting it now can fail that reader
      // mid-query. Retain ONE superseded generation and GC the one
      // before it (any reader of gen N-2 has had a full rebuild cycle to
      // finish); `dir` itself is never deleted (the compact() GC rule).
      // Single-writer assumption: concurrent maintainers would race the
      // pointer CAS and this GC — serialize maintenance per index root.
      if (root != dir) {
        val prevGen = root.substring(root.lastIndexOf("-g") + 2).toLong - 1L
        if (prevGen >= 1L) {
          val stale = new org.apache.hadoop.fs.Path(s"$dir-g$prevGen")
          val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(stale)) fs.delete(stale, true)
        }
      }
      "rebuilt"
    }
  }

  /** Streaming drift-gated maintenance: [[maintainIvfIndexWithDrift]] per
    * micro-batch (batchId offset past the build generation, the
    * [[startIvfMaintenance]] convention).
    */
  def startIvfMaintenanceWithDrift(embeddings: DataFrame, dir: String,
                                   checkpointDir: String, tau: Double,
                                   numCentroids: Int = 16,
                                   kmeansIters: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainIvfIndexWithDrift(batch, dir, batchId + 1, tau,
          numCentroids, kmeansIters)
        ()
      }
      .start()

  /** Query the materialized index — the base table is never touched. The
    * probed cid set is collected (bounded: ≤ queries·nprobe values) into an
    * `isin` predicate on the PARTITION column, so the list scan opens only
    * nprobe/numCentroids of the store (AnnSpec asserts the plan reads only
    * probed partitions); candidates then score against the broadcast probe
    * set exactly like the inline path.
    */
  def ivfTopKFromIndex(queries: DataFrame, dir: String, nprobe: Int = 4, k: Int = 5,
                       excludeSelf: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    // the index ROOT itself resolves through a generation pointer first:
    // a drift-triggered retrain ([[maintainIvfIndexWithDrift]]) rebuilds
    // centroids AND lists together into a fresh root and flips the
    // pointer atomically — resolving it here means a reader sees the old
    // or the new (centroids, lists) PAIR, never a mixed one. A
    // never-rebuilt index resolves to `dir` (back-compat).
    val root = graft.sources.ParquetCompactor.currentDir(spark, dir)
    val centroids = spark.read.parquet(s"$root/centroids")
    val probes = probeLists(queries, centroids, nprobe)
    val probedCids = probes.select("cid").distinct().collect().map(_.getLong(0)).sorted
    // EMPTY-index totality (the engine's empty-input doctrine): a build
    // over zero vectors writes a schema-bearing centroid table but NO
    // list part files (a zero-row partitioned write leaves none), so an
    // empty probe set must return the schema-stable empty answer instead
    // of tripping parquet schema inference on the bare lists dir
    if (probedCids.isEmpty)
      return spark.range(0).select(col("id").as("qid"), col("id").as("nid"),
        lit(0.0d).as("cosine"), col("id").as("rk"))
    // lists resolve through the compactor's generation pointer (a never-
    // compacted store resolves to the original dir)
    val lists = graft.sources.ParquetCompactor.read(spark, s"$root/lists")
      .where(col("cid").isin(probedCids.toIndexedSeq: _*))
    scoreProbed(lists, probes, k, excludeSelf)
  }

  /** Random-hyperplane sign-bit bucket key — the readable Column-expression
    * REFERENCE formulation. Hyperplane h_i components are derived
    * deterministically from (table, i, dim) via xxhash64 → uniform in
    * [-0.5, 0.5): reproducible with zero stored state. Distinct `table`
    * values give independent hash tables for multi-probe recall
    * compounding. Hot paths use the bit-identical native
    * [[graft.functions.LshKeys.signKeys]] (this tree is numTables×bits×dim
    * multiply nodes — past what codegen handles well); LshKeysSpec pins the
    * two against each other bit-for-bit.
    */
  def lshKey(e: Column, dim: Int, bits: Int, table: Int = 0): Column = {
    def planeComponent(i: Int, d: Int): Column =
      (xxhash64(lit(s"plane:$table:$i:$d")).cast("double") / lit(Long.MaxValue.toDouble) / 2.0d)
    val bitCols = (0 until bits).map { i =>
      val dot = (0 until dim).map(d => get(e, lit(d)).cast("double") * planeComponent(i, d)).reduce(_ + _)
      when(dot >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat_ws("", bitCols: _*)
  }

  /** Embedding-cosine near-duplicate pairs: multi-table random-hyperplane
    * LSH. Each of `numTables` independent sign-bit keys buckets the base;
    * candidate pairs are the union of within-bucket pairs across tables,
    * deduplicated BEFORE scoring (a pair sharing 3 tables' buckets is scored
    * once, not 3×). The embedding leg of the dedup family (SURVEY §2 #24-27
    * cover text; this covers representations) — same bounded-bucket join
    * shape as minhash LSH banding, so candidate cost is Σ bucket² per table,
    * never n², and recall compounds as 1−(1−p^bits)^numTables.
    *
    * Scoring uses the native double cosine ([[cosFast]] — left-to-right
    * accumulation, bit-identical to the HOF fold, deterministic) rounded
    * to 12 dp — this path is verified against brute force in AnnSpec
    * rather than a SQL oracle, so the decimal-exact machinery of
    * [[bruteForceTopK]] isn't needed in the hot loop.
    *
    * Shuffle shape (the 100 TB property): candidate generation shuffles
    * (vec_id, bucket) longs ONLY — 16 bytes/row regardless of embedding
    * width or numTables. The full embeddings cross the wire exactly once
    * per join side, fetched back by vec_id for scoring, instead of riding
    * numTables exploded copies through the bucket self-join (which would
    * shuffle ~2·numTables× the corpus).
    */
  def embeddingNearDupPairs(embeddings: DataFrame, dim: Int = 64, bits: Int = 8,
                            numTables: Int = 8, threshold: Double = 0.4,
                            bucketCap: Int = 10000): DataFrame = {
    val candidates = lshCandidatePairs(embeddings, dim, bits, numTables, bucketCap)
    val base = embeddings.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    candidates
      .join(base.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na")), "vec_a")
      .join(base.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(cosFast(col("ea"), col("eb"), col("na"), col("nb")), 12).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** Multi-table LSH candidate pairs — the shared candidate generator of
    * [[embeddingNearDupPairs]] and [[knnGraphLsh]]: each of `numTables`
    * independent sign-bit keys buckets the corpus; candidates are the
    * union of within-bucket pairs across tables, deduplicated BEFORE any
    * scoring. Shuffles (vec_id, bucket) longs only — 16 bytes/row
    * regardless of embedding width or numTables.
    */
  private[operators] def lshCandidatePairs(embeddings: DataFrame, dim: Int, bits: Int,
                                           numTables: Int, bucketCap: Int): DataFrame = {
    val keys = graft.functions.LshKeys.signKeys(col("embedding"), dim, bits, numTables)
    val allKeyed = embeddings.select(col("vec_id"), explode(keys).as("bucket"))
    // Hot-bucket cap, same valve as minhashLsh: a degenerate sign-bit
    // bucket (mass near-identical embeddings — common in real corpora)
    // would quadratically explode one join group; its pairs are
    // boilerplate-dup anyway. Partial-agg counts + broadcast anti-join;
    // dropped buckets' members usually still pair through their OTHER
    // numTables−1 keys unless those are equally degenerate.
    val hotBuckets = allKeyed.groupBy("bucket")
      .agg(count(lit(1)).as("n")).where(col("n") > bucketCap).select("bucket")
    val keyed = allKeyed.join(broadcast(hotBuckets), Seq("bucket"), "left_anti")
    // candidate pairs, deduped across tables before the expensive dot product
    keyed.as("a")
      .join(keyed.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
  }

  /** Exact k-nearest-neighbor GRAPH: every vector's top-k neighbors by
    * cosine among all OTHER vectors — the corpus-curation artifact behind
    * SemDeDup-style analyses, cluster quality checks, and
    * label-propagation over representations. This is the brute-force
    * baseline/oracle: all-pairs scoring is O(n²) BY DEFINITION (every
    * pair's cosine is demanded), so it exists for exactness and for
    * verifying [[knnGraphLsh]] — cap the node set via `maxId` when the
    * corpus is larger than n²-affordable. Scoring reuses the decimal-exact
    * dot + 12-dp rounding convention of [[bruteForceTopK]] (cross-engine
    * deterministic, DuckDB-oracle-checkable); ranking is the bounded-heap
    * [[rankTopK]], so the post-score shuffle carries k·n rows, not n².
    */
  def knnGraph(embeddings: DataFrame, k: Int = 5, maxId: Long = Long.MaxValue): DataFrame =
    rankTopK(allPairsScored(embeddings, maxId), k)

  /** Exact all-pairs (qid, nid, cosine) over the id-capped node set —
    * the shared O(n²)-by-definition baseline behind [[knnGraph]] and
    * [[contrastivePairs]]. The capped node frame is tiny (often one input
    * split), but the pair frame it drives is n² — the probe side spreads
    * across the cluster so the all-pairs scoring parallelizes instead of
    * riding the source file's partitioning (measured 5.2s → ~1s at n=300
    * on local[32]).
    */
  private def allPairsScored(embeddings: DataFrame, maxId: Long): DataFrame = {
    val spread = embeddings.where(col("vec_id") < maxId)
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
    val base = spread
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val q = base.select(col("nid").as("qid"), col("ne").as("qe"), col("nn").as("qn"))
    base.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine"))
  }

  /** CONTRASTIVE-pair mining: per anchor, its POSITIVES (cosine ≥ `tau` —
    * the near-dup band, semantically same content) and its HARD NEGATIVES
    * (the top-k highest-cosine vectors BELOW `tau` — close enough to
    * confuse the model, which is what makes them worth training on;
    * random negatives are trivially separable). The training-data op that
    * turns the corpus's own geometry into (anchor, pos, neg) triplets for
    * embedding-model finetuning — the mining step of every
    * contrastive/triplet pipeline.
    *
    * This exact form scores the id-capped all-pairs baseline (the
    * [[knnGraph]] oracle shape); the 100 TB path swaps in the LSH
    * candidate generator unchanged — hard negatives are by definition
    * HIGH-cosine pairs, exactly the band LSH bucketing recalls (a
    * low-cosine pair lost by bucketing was never a hard negative). Both
    * roles rank through the bounded-heap [[rankTopK]], so the output is
    * ≤ 2k rows per anchor and the final shuffle carries answers, not
    * candidates.
    */
  def contrastivePairs(embeddings: DataFrame, k: Int = 5, tau: Double = 0.9,
                       maxId: Long = Long.MaxValue): DataFrame = {
    val scored = allPairsScored(embeddings, maxId)
      .localCheckpoint(true) // feeds both role splits
    val pos = rankTopK(scored.where(col("cosine") >= tau), k)
      .withColumn("role", lit("pos"))
    val neg = rankTopK(scored.where(col("cosine") < tau), k)
      .withColumn("role", lit("neg"))
    pos.unionByName(neg).orderBy("qid", "role", "rk")
  }

  /** Approximate kNN graph — the 100 TB spelling of [[knnGraph]]:
    * candidates come from the multi-table LSH buckets
    * ([[lshCandidatePairs]] — Σ bucket² per table, never n²), each
    * surviving pair is scored ONCE with the native double cosine, then
    * symmetrized (a pair feeds both endpoints' neighbor lists) and ranked
    * by the bounded-heap [[rankTopK]]. Zero-norm vectors score with
    * nobody and are absent, as in [[knnGraph]]. Recall is the LSH
    * compound 1−(1−p^bits)^numTables per true neighbor — AnnSpec measures
    * it against the exact graph on planted clusters; output invariants
    * (no self edges, ≤k per node, rank order) are exact.
    */
  def knnGraphLsh(embeddings: DataFrame, dim: Int = 64, bits: Int = 8,
                  numTables: Int = 8, k: Int = 5,
                  bucketCap: Int = 10000): DataFrame = {
    val candidates = lshCandidatePairs(embeddings, dim, bits, numTables, bucketCap)
    val base = embeddings
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .where(col("nrm") > 0)
    val scored = candidates
      .join(base.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na")), "vec_a")
      .join(base.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(cosFast(col("ea"), col("eb"), col("na"), col("nb")), 12).as("cosine"))
    val sym = scored.select(col("vec_a").as("qid"), col("vec_b").as("nid"), col("cosine"))
      .unionByName(scored.select(col("vec_b").as("qid"), col("vec_a").as("nid"), col("cosine")))
    rankTopK(sym, k)
  }

  /** Multiprobe LSH top-k: the base is bucketed ONCE (exactly like
    * [[lshTopK]]) and each query probes its own bucket PLUS the
    * `extraProbes` buckets reached by flipping its lowest-|margin| sign
    * bits — the buckets a near-boundary neighbor most likely landed in.
    * This is the standard multiprobe trade: recall compounds like extra
    * hash tables WITHOUT duplicating the corpus — the probe fan-out rides
    * the (tiny) query side, the base never re-shuffles and holds one
    * bucket entry per vector. Margins come from the same deterministic
    * hyperplanes as the key ([[lshKey]]'s component family); the per-bit
    * dot products are computed query-side only, so the interpreted HOF
    * cost is queries×bits×dim — negligible.
    */
  def lshTopKMultiprobe(embeddings: DataFrame, dim: Int = 64, bits: Int = 8,
                        numQueries: Int = 5, k: Int = 5,
                        extraProbes: Int = 4): DataFrame = {
    def planeComponent(i: Int, d: Int): Column =
      (xxhash64(lit(s"plane:0:$i:$d")).cast("double") / lit(Long.MaxValue.toDouble) / 2.0d)
    val keyed = embeddings.select(col("vec_id"), col("embedding"),
      get(graft.functions.LshKeys.signKeys(col("embedding"), dim, bits, 1), lit(0)).as("bucket"))
    val base = keyed.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"), col("bucket"))
      .where(col("nn") > 0)
    // per-bit margins: |dot with hyperplane i|, ordered ascending — the
    // flip targets. (abs, i) struct sort gives the deterministic order.
    val dots = (0 until bits).map { i =>
      (0 until dim).map(d => get(col("qe"), lit(d)).cast("double") * planeComponent(i, d)).reduce(_ + _)
    }
    val margins = array_sort(array(dots.zipWithIndex.map { case (dot, i) =>
      struct(abs(dot).as("m"), lit(i).as("i"))
    }: _*))
    // native key layout ([[graft.functions.LshImpl.signKeys]]): one long,
    // (table << bits) | signBits with plane i at bit (bits−1−i) — so
    // probing the flip of plane i is a XOR with that bit's mask
    val flipMasks = typedlit((0 until bits).map(i => 1L << (bits - 1 - i)).toArray)
    val q = keyed.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), norm(col("embedding")).as("qn"), col("bucket"))
      .where(col("qn") > 0)
      .withColumn("probes", array_union(
        array(col("bucket")).cast("array<long>"),
        transform(slice(margins, 1, extraProbes), m =>
          col("bucket").bitwiseXOR(element_at(flipMasks, m.getField("i") + 1)))
          .cast("array<long>")))
      .select(col("qid"), col("qe"), col("qn"), explode(col("probes")).as("bucket"))
    val scored = base.join(broadcast(q), "bucket")
      .select(col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine"))
      .dropDuplicates("qid", "nid") // a neighbor can match via several probes
    rankTopK(scored, k)
  }

  def lshTopK(embeddings: DataFrame, dim: Int = 64, bits: Int = 8,
              numQueries: Int = 5, k: Int = 5): DataFrame = {
    val keyed = embeddings.select(col("vec_id"), col("embedding"),
      get(graft.functions.LshKeys.signKeys(col("embedding"), dim, bits, 1), lit(0)).as("bucket"))
    val q = keyed.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), norm(col("embedding")).as("qn"), col("bucket"))
      .where(col("qn") > 0)
    val base = keyed.where(col("vec_id") >= numQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"), col("bucket"))
      .where(col("nn") > 0)
    val scored = base.join(broadcast(q), "bucket")
      .select(col("qid"), col("nid"),
        round(dotDecimal(col("qe"), col("ne")).cast("double") / (col("qn") * col("nn")), 12).as("cosine"))
    rankTopK(scored, k)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): k-means-cluster the
    * embedding space, then inside each cluster drop every member of a
    * semantic-duplicate group (pairwise cosine ≥ tau) except its min-id
    * representative. Near-dup detection never compares across clusters —
    * that is the point: candidate generation is cluster-keyed, so the pair
    * join's cost is Σ|cluster|², not |corpus|².
    *
    * Composition of the engine's own parts, with the established shuffle
    * discipline at every stage:
    *  1. centroids: [[kmeansCentroids]] (deterministic; at 100 TB train on
    *     a [[Sampling.hashSample]] gate — the artifact is broadcast-sized);
    *  2. assignment: MAP-SIDE ([[assignToCentroids]], zero corpus shuffle);
    *  3. candidate pairs: cid-keyed self-join over (nid, cid) LONGS — 16
    *     bytes/row like [[embeddingNearDupPairs]]; embeddings are fetched
    *     back by id only for in-cluster scoring. Degenerate clusters above
    *     `clusterCap` are dropped by the same partial-agg + broadcast
    *     anti-join valve (their pairs are boilerplate; raise numCentroids
    *     or pre-shard them instead of letting one reducer own the square);
    *  4. groups: [[Dedup.dupClusters]] label propagation (labels are
    *     group-minimal ids, so the representative IS the label);
    *  5. verdict: every input vector gets (group_id, keep) — unpaired
    *     vectors (incl. zero-norm ones, which score with nobody) keep.
    *
    * Rows-only on the driver gate (k-means is engine-specific); AnnSpec
    * proves planted-cluster behavior, representative choice, and
    * repartition invariance.
    */
  def semanticDedup(embeddings: DataFrame, numCentroids: Int = 16, tau: Double = 0.7,
                    kmeansIters: Int = 4, clusterCap: Int = 10000): DataFrame = {
    val base = embeddings
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val cents = collectCentroids(kmeansCentroids(base, numCentroids, kmeansIters))
    val assigned = assignToCentroids(base, cents).select(col("nid"), col("cid"))
    val hot = assigned.groupBy("cid")
      .agg(count(lit(1)).as("n")).where(col("n") > clusterCap).select("cid")
    val keyed = assigned.join(broadcast(hot), Seq("cid"), "left_anti")
    val candidates = keyed.as("a")
      .join(keyed.as("b"), col("a.cid") === col("b.cid") && col("a.nid") < col("b.nid"))
      .select(col("a.nid").as("vec_a"), col("b.nid").as("vec_b"))
    val emb = embeddings.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val pairs = candidates
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb")), "vec_b")
      .where(round(cosFast(col("ea"), col("eb"), col("na"), col("nb")), 12) >= tau)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val groups = Dedup.dupClusters(pairs).withColumnRenamed("doc_id", "vec_id")
    embeddings.select(col("vec_id"))
      .join(groups, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("group_id"),
        (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id")).as("keep"))
      .orderBy("vec_id")
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions — the
    * dimensionality-reduction bridge in front of the ANN stack (project
    * once, then brute-force/LSH/IVF the short vectors at outDim/dim the
    * scan cost). The matrix is the Achlioptas ±1/√m sign matrix (which
    * satisfies the JL distortion guarantee like Gaussian entries, without
    * float-precision variance in generation), drawn DETERMINISTICALLY from
    * `seed` via java.util.Random's spec-fixed LCG — same seed, same matrix,
    * on any JVM, so projected corpora are reproducible artifacts.
    *
    * Scale shape: the outDim×dim matrix rides the plan as typed literals
    * (the centroids-as-literals discipline of [[assignToCentroids]] — an
    * implicit broadcast), each output component is one codegen'd
    * [[graft.functions.VecOps.dotFloat]] kernel, and the whole operator is
    * MAP-ONLY: zero shuffles, zero driver round-trips beyond the plan
    * itself. Distortion: ‖proj(x)−proj(y)‖ ≈ ‖x−y‖·(1±ε) w.h.p. for
    * outDim = O(log n / ε²) — AnnSpec measures it on planted data.
    */
  def randomProject(embeddings: DataFrame, dim: Int = 64, outDim: Int = 16,
                    seed: Long = 42L, vecCol: String = "embedding",
                    outCol: String = "rp"): DataFrame = {
    require(outDim >= 1 && dim >= 1, s"bad dims: $dim -> $outDim")
    val rnd = new java.util.Random(seed)
    val scale = (1.0 / math.sqrt(outDim.toDouble)).toFloat
    val rows: IndexedSeq[Array[Float]] =
      IndexedSeq.fill(outDim)(Array.fill(dim)(if (rnd.nextBoolean()) scale else -scale))
    embeddings.withColumn(outCol,
      array(rows.map(r =>
        graft.functions.VecOps.dotFloat(col(vecCol), typedlit(r)).cast("float")): _*))
  }

  /** Greedy k-CENTER (farthest-point) diversity sample: pick the corpus
    * vector set that COVERS the embedding space — the curation complement
    * of dedup (dedup removes the redundant; this keeps the spread). The
    * classic 2-approximation: start from the min-id vector, then k−1 times
    * pick the vector farthest (min max-cosine) from everything chosen so
    * far, ties to the smallest vec_id.
    *
    * Each round is ONE map pass: the running `best` column (max cosine to
    * any chosen center) updates against only the round's NEW center — a
    * single codegen'd [[cosFast]] kernel against a plan-literal vector —
    * so total work is O(k·n) kernels, not O(k²·n); the argmin is a 1-row
    * orderBy-limit probe; lineage is cut per round ([[Checkpoints.cut]]).
    * At 100 TB you run this over a [[Sampling.hashSample]] slice (k passes
    * over the full corpus is the textbook cost of exact greedy k-center;
    * the sample-then-cover composition is the standard answer) — the
    * operator itself stays shuffle-free either way.
    *
    * Output: (rank, vec_id, gap_cosine) in pick order — gap_cosine is the
    * picked vector's max cosine to the PREVIOUSLY chosen set (null for the
    * seed pick); the sequence is non-decreasing (coverage tightens), and
    * cutting it at a cosine threshold reads off the k needed for a target
    * radius.
    */
  def kCenterSample(embeddings: DataFrame, k: Int,
                    checkpointDir: Option[String] = None,
                    checkpointEvery: Int = 5): DataFrame = {
    require(k >= 1, s"k < 1: $k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings
      .select(col("vec_id").as("nid"), col("embedding").as("ne"), norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
    val first = base.select(col("nid"), col("ne"), col("nn"))
      .orderBy("nid").limit(1)
      .as[(Long, Array[Float], Double)].collect().headOption
    first match {
      case None =>
        Seq.empty[(Long, Long, Option[Double])].toDF("rank", "vec_id", "gap_cosine")
      case Some((id0, e0, n0)) =>
        var chosen = Vector[(Long, Option[Double])]((id0, None))
        var cur = Checkpoints.cut(
          base.withColumn("best",
            round(cosFast(col("ne"), typedlit(e0), col("nn"), lit(n0)), 12)), 0,
          checkpointDir, checkpointEvery).persist()
        var caches = List(cur)
        var iter = 0
        var exhausted = false
        while (chosen.size < k && !exhausted) {
          iter += 1
          val pick = cur.where(!col("nid").isin(chosen.map(_._1): _*))
            .orderBy(col("best").asc, col("nid").asc).limit(1)
            .as[(Long, Array[Float], Double, Double)].collect().headOption
          pick match {
            case None => exhausted = true // fewer distinct vectors than k
            case Some((nid, ne, nn, gap)) =>
              chosen = chosen :+ ((nid, Some(gap)))
              if (chosen.size < k) {
                cur = Checkpoints.cut(
                  cur.withColumn("best", greatest(col("best"),
                    round(cosFast(col("ne"), typedlit(ne), col("nn"), lit(nn)), 12))),
                  iter, checkpointDir, checkpointEvery).persist()
                caches = cur :: caches
              }
          }
        }
        caches.foreach(_.unpersist())
        chosen.zipWithIndex
          .map { case ((id, gap), i) => ((i + 1).toLong, id, gap) }
          .toDF("rank", "vec_id", "gap_cosine")
    }
  }

  /** EMBEDDING-SPACE OUTLIER scores — the representation-space triage a
    * curation pipeline runs before clustering or dedup trusts the
    * embeddings at all: vectors far from the corpus centroid are the
    * corrupt decodes, wrong-modality rows, and genuinely anomalous
    * documents ([[kCenterSample]] SEEKS the extremes for coverage; this
    * FLAGS them for audit — same geometry, opposite use). Per vector:
    * cosine distance to the global centroid (per-dimension DECIMAL mean,
    * order-independent → bit-deterministic, the [[kmeansCentroids]] sum
    * rule) and its z-score against the corpus distance distribution
    * (exact decimal moment sums, the [[graft.operators.Profiler]]
    * doctrine); `z > zThreshold` flags. Distances and z round to 12 dp —
    * repartition/rerun-stable, though cross-engine float parity is not
    * claimed (rows-only key, like the rest of the ANN family).
    *
    * Scale shape: the base frame is read twice off one localCheckpoint
    * (centroid agg + scoring scan); the centroid agg shuffles ≤ dim
    * partial-sum rows and collects ≤ dim rows; the centroid rides the
    * task closure as a plan literal (the [[assignToCentroids]] pattern,
    * no join); the moment agg is 3 driver doubles; scoring is map-only.
    * Zero-norm vectors are excluded (the NaN doctrine); zero distance
    * spread (all vectors identical) emits z = null, flags nothing.
    */
  def outlierScores(embeddings: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        norm(col("embedding")).as("nn"))
      .where(col("nn") > 0)
      .localCheckpoint(true) // feeds the centroid agg AND the scoring scan
    val sums = base.select(posexplode(col("ne")))
      .groupBy("pos")
      .agg(sum(col("col").cast("decimal(28,18)")).as("s"), count(lit(1)).as("n"))
      .collect() // bounded: ≤ dim rows
    if (sums.isEmpty)
      return Seq.empty[(Long, Double, Option[Double], Boolean)]
        .toDF("vec_id", "dist", "z", "is_outlier")
    val cent = new Array[Float](sums.map(_.getInt(0)).max + 1)
    sums.foreach { r =>
      cent(r.getInt(0)) = (r.getDecimal(1).doubleValue() / r.getLong(2)).toFloat
    }
    val cn = math.sqrt(cent.map(v => v.toDouble * v).sum)
    if (cn == 0.0) // degenerate: centroid at the origin, no cosine defined
      return base.select(col("nid").as("vec_id"), lit(null).cast("double").as("dist"),
        lit(null).cast("double").as("z"), lit(false).as("is_outlier"))
        .orderBy("vec_id")
    val scored = base.select(col("nid"),
        round(lit(1.0) - cosFast(col("ne"), typedlit(cent), col("nn"), lit(cn)), 12)
          .as("dist"))
      .localCheckpoint(true) // feeds the moment agg AND the final projection
    val m = scored.agg(
      sum(col("dist").cast("decimal(28,14)")).as("s1"),
      sum((col("dist") * col("dist")).cast("decimal(28,16)")).as("s2"),
      count(lit(1)).as("n")).head()
    val n = m.getLong(2)
    val mean = m.getDecimal(0).doubleValue() / n
    val variance = math.max(0.0, m.getDecimal(1).doubleValue() / n - mean * mean)
    val std = math.sqrt(variance)
    val z =
      if (std == 0.0) lit(null).cast("double")
      else round((col("dist") - lit(mean)) / lit(std), 12)
    scored.withColumn("z", z)
      .select(col("nid").as("vec_id"), col("dist"), col("z"),
        coalesce(col("z") > zThreshold, lit(false)).as("is_outlier"))
      .orderBy("vec_id")
  }

  /** Per-dimension STANDARDIZATION of an embedding corpus — z = (x−μ)/σ
    * per dim — the feature-scaling pass before k-means/IVF training or
    * distance-based outlier scoring trusts the geometry (a dimension with
    * 100× the variance owns every Euclidean distance until this runs).
    * The first ORACLE-CHECKED member of the vector family, on an EXACT
    * INTEGER protocol (the temperature-mix grain rule): elements quantize
    * as xq = floor(x·2^20) — EXACT in double (a float's 24-bit mantissa
    * times 2^20 is a ≤44-bit integer; decimal(28,18) casts of raw doubles
    * are NOT cross-engine: Spark rounds the shortest string repr, DuckDB
    * the exact binary value, and the 1e-17 tails collide with round-12
    * boundaries at corpus scale — measured, not theorized). Moments are
    * then exact integer/decimal sums; z = (n·xq − Σxq)/√(n·Σxq² − (Σxq)²)
    * — algebraically (xq−μ)/σ — takes ONE double cast + IEEE sqrt +
    * division (the burstiness discriminant rule) and rounds 12 dp. The
    * ~1e-6 quantization is invisible next to σ and documented. σ=0 dims
    * emit NULL (a constant dimension has no z-score — loud beats a
    * divide-by-zero convention).
    *
    * Scale shape: the explode is MAP-SIDE (no shuffle carries vectors);
    * per-dim moments are ONE partial agg whose output is |dims| rows —
    * broadcast back to the exploded frame (plan-literal-sized, AQE picks
    * it). The output IS the exploded (vec_id, dim, z) frame — writers
    * that want arrays re-assemble with a collect_list keyed by vec_id.
    */
  def standardizeEmbeddings(embeddings: DataFrame): DataFrame = {
    val ex = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        floor(col("xf").cast("double") * lit(1048576.0d)).cast("long").as("xq"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val stats = ex.groupBy("dim").agg(
      count(lit(1)).as("n"),
      sum(col("xq")).as("s1"),
      sum(d38(col("xq")) * d38(col("xq"))).as("s2"))
    // D = n·Σxq² − (Σxq)² ≥ 0 exactly; one double cast + IEEE sqrt
    val disc = (d38(col("n")) * col("s2") - d38(col("s1")) * d38(col("s1")))
      .cast("double")
    ex.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        when(disc > 0,
          round((d38(col("n")) * d38(col("xq")) - d38(col("s1"))).cast("double")
            / sqrt(disc), 12)).as("z"))
      .orderBy("vec_id", "dim")
  }

  /** EMBEDDING-distribution drift between two corpus snapshots — the
    * vector-side companion to [[Profiler.psiDrift]]/[[Profiler.ksDrift]]:
    * per group, the L2 SHIFT of the mean embedding ‖μ_new − μ_old‖₂
    * (in original vector units) plus the dimension that moved most —
    * the "did the encoder/corpus change under me" alarm an embedding
    * store checks before mixing a refreshed snapshot into ANN indexes
    * or dedup clusters (a centroid that walked invalidates IVF lists
    * and semantic-dup thresholds alike).
    *
    * Exactness protocol ([[standardizeEmbeddings]]'s): components
    * quantize as xq = floor(x·2²⁰) — EXACT double arithmetic for float
    * inputs — and all sums/differences stay integer/decimal; with both
    * snapshots' counts constant across dims within a group, the per-dim
    * mean difference shares one denominator, so
    * shift = √(Σ_d (s_new·n_old − s_old·n_new)²) / (n_old·n_new·2²⁰)
    * takes ONE IEEE sqrt + ONE division (round 12 — the burstiness
    * discriminant rule: no rounding of large-magnitude intermediates).
    * The per-dim difference is bounded to decimal(19) before squaring
    * (documented envelope: |Σxq·n| < 10¹⁹ — holds to ~10⁹ unit-scale
    * vectors per group). Groups on only one side emit NULL shift (the
    * ksDrift one-sided rule: a silent 0 or ∞ would fake an answer).
    *
    * Scale shape: each snapshot collapses map-side to (group, dim,
    * count, Σxq) partial aggs — vectors never shuffle whole; the join
    * and final rollup run on |groups|·|dims| rows.
    */
  def embeddingDrift(oldDf: DataFrame, newDf: DataFrame,
                     groupCol: String): DataFrame = {
    def side(df: DataFrame, nc: String, sc: String): DataFrame =
      df.select(col(groupCol).as("grp"),
          posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("grp"), col("dim").cast("long").as("dim"),
          floor(col("xf").cast("double") * lit(1048576.0d)).cast("long").as("xq"))
        .groupBy("grp", "dim")
        .agg(count(lit(1)).as(nc), sum(col("xq")).as(sc))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cell = side(oldDf, "n_old", "s_old")
      .join(side(newDf, "n_new", "s_new"), Seq("grp", "dim"), "full_outer")
    // ENVELOPE GUARD on the decimal(19) narrowing: beyond |s·n| < 10¹⁹
    // Spark's non-ANSI cast silently NULLs the overflowing cell — which
    // would understate shift_l2 and skew top_shift_dim while the DuckDB
    // oracle ERRORS on the same cast. Out-of-envelope inputs must fail
    // as loudly here as they do in the oracle, so the narrowing raises
    // instead of nulling (the wide difference itself is safe: two
    // long-bounded factors keep |s·n| < 8.6e37 < decimal(38)).
    val dwide = d38(col("s_new")) * d38(col("n_old")) -
      d38(col("s_old")) * d38(col("n_new"))
    val d19max = lit(new java.math.BigDecimal("9999999999999999999")) // 10¹⁹−1
    val dnum = when(abs(dwide) > d19max, raise_error(concat(
        lit("embeddingDrift: |s_new*n_old - s_old*n_new| exceeds the "),
        lit("decimal(19,0) envelope (~1e9 unit-scale vectors/group) for group "),
        col("grp").cast("string"))))
      .otherwise(dwide.cast("decimal(19,0)"))
    cell
      .groupBy("grp")
      .agg(
        max(col("n_old")).as("n_old"), // constant across dims in the group
        max(col("n_new")).as("n_new"),
        sum(dnum * dnum).as("l2q"),
        max_by(col("dim"), struct(abs(dnum), -col("dim"))).as("top_shift_dim"))
      .select(col("grp").as(groupCol), col("n_old"), col("n_new"),
        when(col("n_old").isNotNull && col("n_new").isNotNull,
          round(sqrt(col("l2q").cast("double")) /
            (d38(col("n_old")) * d38(col("n_new")) * lit(1048576L)).cast("double"),
            12)).as("shift_l2"),
        when(col("n_old").isNotNull && col("n_new").isNotNull,
          col("top_shift_dim")).as("top_shift_dim"))
      .orderBy(groupCol)
  }
}
