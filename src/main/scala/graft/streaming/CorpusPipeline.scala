package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the LLM-data curation pipeline: documents arrive as an
  * unbounded stream (crawl output, log tailing) and flow through the SAME
  * rule chains the batch operators use — quality + repetition curate →
  * watermarked cross-batch exact dedup → append sink / rolling per-source
  * stats. Mirrors how `EventPipeline` streams the indexer side.
  *
  * Scale design: curate is stateless map-only (the batch kernels compose in
  * unchanged via `TextMetrics.withQuality`/`withRepetition` — sorts are the
  * only batch-ism, and the `with*` forms carry none). Dedup state is keyed
  * by an 8-byte content hash and bounded by the watermark:
  * `dropDuplicatesWithinWatermark` evicts keys once they age out, so state
  * is O(docs-per-watermark-window), not O(corpus) — the unbounded-state
  * trap of plain `dropDuplicates` on a non-event-time key. A duplicate
  * arriving later than the watermark delay re-enters the corpus; the batch
  * `Dedup.exact` backfill is the periodic ground-truth sweep, exactly the
  * lambda split the reference runs for its staging imports.
  */
object CorpusPipeline {

  /** Stateless curate stage: appends `keep` + first-failing-rule `reason`
    * (quality rules first, then repetition — same precedence a batch caller
    * composing the two filters would get). Keeps every input column; drop
    * decisions stay rows so sinks can audit them.
    */
  def curate(docs: DataFrame,
             minChars: Int = 100, minWords: Int = 20,
             maxAvgWordLen: Double = 4.95, maxPunctRatio: Double = 0.3,
             maxDupWordFrac: Double = 0.6, maxTopBigramFrac: Double = 0.08,
             maxWordRun: Long = 2L): DataFrame = {
    val reason = coalesce(
      graft.operators.TextMetrics.qualityReason(
        minChars, minWords, maxAvgWordLen, maxPunctRatio),
      graft.operators.TextMetrics.repetitionReason(
        maxDupWordFrac, maxTopBigramFrac, maxWordRun))
    graft.operators.TextMetrics.withRepetition(
        graft.operators.TextMetrics.withQuality(docs))
      .withColumn("keep", reason.isNull)
      .withColumn("reason", coalesce(reason, lit("ok")))
  }

  /** Kept docs only, exact-deduped across micro-batches on the content
    * hash, state bounded by the watermark (see object doc). `ingest_ts` is
    * the stream's event-time column.
    */
  def dedupKept(curated: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    curated
      .where(col("keep"))
      .withColumn("text_hash", xxhash64(col("text")))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Rolling per-(source, window) corpus stats over the curated stream —
    * the live "dataset card": arrivals, kept docs, kept whitespace tokens.
    * Watermarked tumbling window, so the agg state closes and the sink can
    * run in append mode.
    */
  def sourceStats(curated: DataFrame, windowDur: String = "1 hour",
                  watermarkDelay: String = "1 hour"): DataFrame =
    curated
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(col("source"), window(col("ingest_ts"), windowDur))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("keep").cast("long")).as("kept"),
        sum(when(col("keep"), size(split(col("text"), " ")).cast("long"))
          .otherwise(0L)).as("kept_tokens"))
      .select(col("source"), col("window.start").as("window_start"),
        col("docs"), col("kept"), col("kept_tokens"))

  /** Rolling per-(source, window) drift monitor: PSI of each window's
    * `n_chars` length profile against a static batch REFERENCE corpus —
    * the streaming twin of [[graft.operators.Profiler.psiDrift]] (24c/49d
    * family), alarming live when a source's incoming distribution walks
    * away from the profile it was admitted under. Identical protocol to
    * the batch operator (clamped integral-DIV buckets, full-grid Laplace
    * smoothing, per-term round-12), so a window's PSI equals the batch
    * `psiDrift(reference, windowDocs)` row exactly — spec-pinned.
    *
    * Streaming shape: ONE watermarked tumbling-window agg whose state row
    * per (source, window) is nBuckets conditional counts (a streaming agg
    * cannot feed a second agg in append mode — the per-bucket rollup is
    * spelled as nBuckets conditional sums in the SAME agg); the reference
    * profile is collected ONCE at plan time (bounded: sources × nBuckets
    * longs) and rides the projection as a map literal (the
    * centroids-as-literals pattern) — no stream-static join after the
    * agg, which append mode would reject. The PSI fold is a fixed-order
    * 10-term decimal sum in the post-agg projection, stateless.
    */
  def driftStats(stream: DataFrame, reference: DataFrame,
                 windowDur: String = "1 hour", watermarkDelay: String = "1 hour",
                 bucketWidth: Long = 200L, nBuckets: Int = 10): DataFrame = {
    require(bucketWidth > 0 && nBuckets >= 2, "need bucketWidth>0, nBuckets>=2")
    def bucketOf(c: org.apache.spark.sql.Column) =
      least(greatest(expr(s"CAST(n_chars AS BIGINT) DIV ${bucketWidth}L"), lit(0L)),
        lit(nBuckets - 1).cast("long"))
    // bounded driver artifact: per-source reference bucket counts
    val refRows = reference
      .select(col("source"), bucketOf(col("n_chars")).as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
      .collect()
    val refMap: Map[String, Seq[Long]] = refRows.groupBy(_.getString(0)).map {
      case (s, rows) =>
        val a = Array.fill(nBuckets)(0L)
        rows.foreach(r => a(r.getLong(1).toInt) = r.getLong(2))
        s -> a.toSeq
    }.toMap
    val refLit = typedlit[Map[String, Seq[Long]]](refMap)
    val counts = stream
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(col("source"), window(col("ingest_ts"), windowDur))
      .agg(
        count(lit(1)).as("n_new"),
        (0 until nBuckets).map(i =>
          sum(when(bucketOf(col("n_chars")) === i, 1L).otherwise(0L))
            .as(s"b$i")): _*)
    val refArr = element_at(refLit, col("source"))
    val refTot = (0 until nBuckets)
      .map(i => coalesce(element_at(refArr, i + 1), lit(0L)))
      .reduce(_ + _)
    val b = lit(nBuckets.toLong)
    val terms = (0 until nBuckets).map { i =>
      val p = (coalesce(element_at(refArr, i + 1), lit(0L)) + 1).cast("double") /
        (refTot + b).cast("double")
      val q = (col(s"b$i") + 1).cast("double") / (col("n_new") + b).cast("double")
      round((p - q) * log(p / q), 12).cast("decimal(28,14)")
    }
    counts.select(col("source"), col("window.start").as("window_start"),
      round(terms.reduce(_ + _).cast("double"), 12).as("psi"),
      col("n_new"), refTot.as("n_ref"))
  }

  /** Rolling per-(group, window) EMBEDDING drift monitor — the [[driftStats]]
    * pattern (windowed agg, reference profile as plan literal) applied to
    * [[graft.operators.Ann.embeddingDrift]]'s (dim, n, Σxq) cell protocol:
    * per window, the L2 shift of the window's mean embedding against a
    * static batch REFERENCE corpus, alarming live when an encoder or
    * upstream corpus walks under a serving index. BIT-EQUAL to the batch
    * row (spec-pinned): same xq = floor(x·2²⁰) quantization, same exact
    * integer/decimal cell algebra, same decimal(19) envelope raise, same
    * round-12 spelling.
    *
    * Streaming shape: `dim` is a fixed deployment knob, so the per-dim
    * sums spell as `dim` element_at sums in ONE watermarked tumbling agg
    * (a streaming agg cannot feed a second agg in append mode — the
    * driftStats rule); state per (group, window) is dim+1 longs. The
    * reference profile collects ONCE at plan time (bounded:
    * groups·(dim+1) longs) and rides the projection as map literals; the
    * dnum/l2/argmax fold is stateless post-agg projection. Vectors never
    * shuffle whole. Groups absent from the reference emit NULL shift
    * (the batch one-sided rule).
    */
  def embeddingDriftStats(stream: DataFrame, reference: DataFrame, dim: Int,
                          windowDur: String = "1 hour",
                          watermarkDelay: String = "1 hour"): DataFrame = {
    require(dim >= 1, s"dim < 1: $dim")
    val xqOf = (e: org.apache.spark.sql.Column) =>
      floor(e.cast("double") * lit(1048576.0d)).cast("long")
    // bounded driver artifact: per-group reference (n, per-dim Σxq)
    val refRows = reference
      .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("source"), col("dim"), xqOf(col("xf")).as("xq"))
      .groupBy("source", "dim")
      .agg(count(lit(1)).as("n"), sum("xq").as("s1"))
      .collect()
    val nOldMap: Map[String, Long] = refRows.groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.head.getLong(2) }
    val sOldMap: Map[String, Seq[Long]] = refRows.groupBy(_.getString(0))
      .map { case (s, rows) =>
        val a = Array.fill(dim)(0L)
        rows.foreach(r => if (r.getInt(1) < dim) a(r.getInt(1)) = r.getLong(3))
        s -> a.toSeq
      }
    val counts = stream
      .withWatermark("ingest_ts", watermarkDelay)
      .groupBy(col("source"), window(col("ingest_ts"), windowDur))
      .agg(
        count(lit(1)).as("n_new"),
        (0 until dim).map(i =>
          sum(xqOf(element_at(col("embedding"), i + 1))).as(s"s$i")): _*)
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val nOld = element_at(typedlit(nOldMap), col("source"))
    val sOldArr = element_at(typedlit(sOldMap), col("source"))
    val d19max = lit(new java.math.BigDecimal("9999999999999999999"))
    val dnums = (0 until dim).map { i =>
      val dwide = d38(col(s"s$i")) * d38(nOld) -
        d38(element_at(sOldArr, i + 1)) * d38(col("n_new"))
      // the batch envelope raise, mirrored — out-of-envelope cells must
      // fail as loudly here as in embeddingDrift and its oracle
      when(abs(dwide) > d19max, raise_error(concat(
        lit("embeddingDriftStats: cell exceeds the decimal(19,0) envelope for group "),
        col("source"))))
        .otherwise(dwide.cast("decimal(19,0)"))
    }
    val l2q = dnums.map(d => d * d).reduce(_ + _)
    // argmax |dnum| with smaller-dim tie-break == the batch
    // max_by(dim, struct(abs(dnum), -dim)): lexicographic struct greatest
    val topStructs = dnums.zipWithIndex.map { case (d, i) =>
      struct(abs(d).as("a"), lit(-i).as("nd"), lit(i.toLong).as("dim"))
    }
    // greatest() analysis-fails below 2 args — dim=1 (legal per the
    // require) has a trivially unique argmax, so take it directly
    val top = (if (topStructs.sizeIs >= 2) greatest(topStructs: _*)
               else topStructs.head).getField("dim")
    val bothSides = nOld.isNotNull && col("n_new").isNotNull
    counts.select(col("source"), col("window.start").as("window_start"),
      nOld.as("n_old"), col("n_new"),
      when(bothSides,
        round(sqrt(l2q.cast("double")) /
          (d38(nOld) * d38(col("n_new")) * lit(1048576L)).cast("double"),
          12)).as("shift_l2"),
      when(bothSides, top).as("top_shift_dim"))
  }

  // --- video corpus: the multimodal lifecycle --------------------------
  // decode → curate (decodability) → dedup-by-frame-dHash (cross-history
  // store + within-batch pairs) → append-only corpus store. The video
  // path composes with the curation stack exactly the way text does: the
  // batch kernels (BinaryPipeline.videoFrames / videoNearDupPairs) run
  // unchanged inside foreachBatch, and the cross-batch state is the SAME
  // manifest-committed seen-hash store the text dedup uses — holding
  // frame dHashes instead of content hashes.

  /** Distinct sampled-frame dHash signatures per video — the perceptual
    * fingerprint set (payloads never shuffle; only (media_id, 8-byte
    * hash) rows leave the map-only decode stage).
    */
  def videoSignatures(media: DataFrame, every: Int = 1): DataFrame =
    graft.multimodal.BinaryPipeline.videoFrames(media, every)
      .select(col("media_id"), col("dhash")).distinct()

  /** Near-dup frame hits of `sigs` against the STORED frame-sig history:
    * per video, how many of its distinct sampled frames near-match
    * (hamming ≤ `maxHamming`) ANY stored frame sig. Candidates come from
    * the 8×8-bit dHash pigeonhole equi-join (hamming ≤ 7 ⟹ one full
    * byte-chunk agrees — never all-pairs), then verify on the real
    * distance; the store stays a plain long-set ([[ViewMaintenance
    * .mergeSeenHashesBatch]] mechanics), so slicing-invariance and replay
    * no-ops are inherited. A re-encoded copy (different bytes, same
    * footage) hits on most frames; exact copies on all.
    */
  private def sigChunks(df: DataFrame, sigCol: String): DataFrame =
    df.select(col("*"), explode(array((0 until 8).map { c =>
      concat_ws(":", lit(c), shiftright(col(sigCol), c * 8).bitwiseAND(lit(0xffL)))
    }: _*)).as("chunk_key"))

  def videoStoreHits(sigs: DataFrame, seen: DataFrame,
                     maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    sigChunks(sigs.select(col("media_id"), col("dhash")), "dhash")
      .join(sigChunks(seen.select(col("h")), "h"), "chunk_key")
      .where(bit_count(col("dhash").bitwiseXOR(col("h"))) <= maxHamming)
      .select("media_id", "dhash").distinct() // one vote per batch frame
      .groupBy("media_id").agg(count(lit(1)).as("hit_frames"))
  }

  /** Within-batch near-dup pairs over an already-computed sig frame —
    * [[graft.multimodal.BinaryPipeline.videoNearDupPairs]]'s join without
    * its second full decode pass (the merge batch already holds the
    * sigs); votes are DISTINCT earlier-video sigs (the store gate's
    * convention — a repeated still counts once, same pigeonhole
    * soundness).
    */
  def videoBatchDupPairs(sigs: DataFrame, maxHamming: Int = 6,
                         minShared: Int = 2): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    val ch = sigChunks(sigs.select(col("media_id"), col("dhash")), "dhash")
    ch.as("a")
      .join(ch.as("b"), col("a.chunk_key") === col("b.chunk_key") &&
        col("a.media_id") < col("b.media_id"))
      .where(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= maxHamming)
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.dhash").as("da"))
      .distinct() // one vote per (pair, earlier-video sig)
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("shared_sigs"))
      .where(col("shared_sigs") >= minShared)
  }

  /** One micro-batch of the video corpus pipeline (exactly-once by
    * ordering: corpus append lands in its own `b=<batchId>` partition
    * FIRST, the store merge commits LAST, and a batchId at or below the
    * store's committed version skips entirely — so a replay after any
    * crash point either redoes identical work or is a detected no-op).
    *
    * Verdicts, one row per batch video (the text-curate convention: drop
    * decisions stay rows so sinks can audit them):
    *   - `undecodable`    — no frame decodes (container or codec
    *     quarantine; [[graft.multimodal.BinaryPipeline.decodeVideos]] is
    *     the diagnostic surface)
    *   - `near_dup_store` — ≥ `minShared` distinct frames near-match the
    *     corpus HISTORY's frame sigs
    *   - `near_dup_batch` — later id of a within-batch near-dup pair
    *     ([[videoBatchDupPairs]] over the batch's already-computed sigs —
    *     no second decode pass; keep-min, the Dedup.exact rule)
    *   - `ok`, keep=true  — lands in the corpus, its frame sigs fold into
    *     the store (only KEPT videos feed the store: a dropped dup must
    *     not extend the history it was judged against)
    */
  def mergeVideoCorpusBatch(spark: SparkSession, batch: DataFrame,
                            corpusDir: String, storeDir: String, batchId: Long,
                            every: Int = 1, minShared: Int = 2,
                            maxHamming: Int = 6): Unit = {
    import graft.multimodal.BinaryPipeline
    val (_, lastBatch, _) = ViewMaintenance.readManifest(spark, storeDir)
    if (batchId <= lastBatch) return // fully-processed replay (merge commits last)
    val vids = batch.where(col("modality") === "video").persist()
    val sigs = videoSignatures(vids, every).persist()
    val seen = ViewMaintenance.readViewOr(spark, storeDir,
      sigs.select(col("dhash").as("h")))
    val storeDups = videoStoreHits(sigs, seen, maxHamming)
      .where(col("hit_frames") >= minShared)
      .select(col("media_id"), lit("near_dup_store").as("_r"))
    val undecodable = vids.select("media_id")
      .join(sigs.select("media_id").distinct(), Seq("media_id"), "left_anti")
      .select(col("media_id"), lit("undecodable").as("_r"))
    val survSigs = sigs
      .join(vids.join(storeDups.unionByName(undecodable), Seq("media_id"), "left_anti")
        .select("media_id"), Seq("media_id"), "left_semi")
    val batchDups = videoBatchDupPairs(survSigs, maxHamming, minShared)
      .select(col("media_b").as("media_id")).distinct()
      .select(col("media_id"), lit("near_dup_batch").as("_r"))
    val verdicts = storeDups.unionByName(undecodable).unionByName(batchDups)
    val corpusRows = vids.select("media_id", "ingest_ts")
      .join(BinaryPipeline.decodeVideos(vids).select("media_id", "n_frames"),
        Seq("media_id"), "left")
      .join(verdicts, Seq("media_id"), "left")
      .select(col("media_id"), col("n_frames"),
        col("_r").isNull.as("keep"), coalesce(col("_r"), lit("ok")).as("reason"),
        col("ingest_ts"))
    ViewMaintenance.appendBatch(corpusRows, corpusDir, batchId)
    val keptSigs = sigs
      .join(corpusRows.where(col("keep")).select("media_id"),
        Seq("media_id"), "left_semi")
      .select(col("dhash").as("h"))
    ViewMaintenance.mergeSeenHashesBatch(spark, keptSigs, storeDir,
      version = batchId)
    sigs.unpersist(); vids.unpersist()
  }

  /** Drive a media stream through the video corpus pipeline:
    * decode-curate → frame-dHash near-dup drop (history store +
    * within-batch) → audited append-only corpus at `corpusDir`, frame-sig
    * history at `storeDir`.
    */
  def startVideoCorpus(media: DataFrame, corpusDir: String, storeDir: String,
                       checkpointDir: String, every: Int = 1,
                       minShared: Int = 2, maxHamming: Int = 6): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeVideoCorpusBatch(batch.sparkSession, batch, corpusDir, storeDir,
          batchId, every, minShared, maxHamming)
        ()
      }
      .start()

  // --- image corpus: the still lifecycle --------------------------------
  // the 17e mechanics on single-signature items: one perceptual dHash per
  // image (the decodeRaster front door opens PPM/BMP/PNG/JPEG alike, so a
  // JPEG re-encode of a stored PNG drops with zero byte overlap). No
  // minShared vote — an image IS one signature, so one store near-match
  // decides; within-batch pairs keep-min. Completes the text/image/video/
  // audio corpus symmetry.

  /** Near-dup hits of a batch's image sigs against the STORED history —
    * one row per batch image that near-matches ANY stored dHash.
    */
  def imageStoreHits(sigs: DataFrame, seen: DataFrame,
                     maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    sigChunks(sigs.select(col("media_id"), col("dhash")), "dhash")
      .join(sigChunks(seen.select(col("h")), "h"), "chunk_key")
      .where(bit_count(col("dhash").bitwiseXOR(col("h"))) <= maxHamming)
      .select("media_id").distinct()
  }

  /** Within-batch near-dup pairs over the already-computed sig frame —
    * [[graft.multimodal.BinaryPipeline.imageNearDupPairs]]'s join without
    * its second decode pass.
    */
  def imageBatchDupPairs(sigs: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    val ch = sigChunks(sigs.select(col("media_id"), col("dhash")), "dhash")
    ch.as("a")
      .join(ch.as("b"), col("a.chunk_key") === col("b.chunk_key") &&
        col("a.media_id") < col("b.media_id"))
      .where(bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))) <= maxHamming)
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"))
      .distinct()
  }

  /** One micro-batch of the image corpus pipeline — the 17e/17f contract
    * (exactly-once by append-then-merge ordering; audited verdicts
    * `undecodable` / `near_dup_store` / `near_dup_batch` / `ok`; only
    * KEPT images' sigs fold into the store).
    */
  def mergeImageCorpusBatch(spark: SparkSession, batch: DataFrame,
                            corpusDir: String, storeDir: String, batchId: Long,
                            maxHamming: Int = 6): Unit = {
    import graft.multimodal.BinaryPipeline
    val (_, lastBatch, _) = ViewMaintenance.readManifest(spark, storeDir)
    if (batchId <= lastBatch) return // fully-processed replay (merge commits last)
    val imgs = batch.where(col("modality") === "image").persist()
    val hashes = BinaryPipeline.imageHashes(imgs).persist()
    val sigs = hashes.where(col("real_decode")).select("media_id", "dhash")
    val seen = ViewMaintenance.readViewOr(spark, storeDir,
      sigs.select(col("dhash").as("h")))
    val storeDups = imageStoreHits(sigs, seen, maxHamming)
      .select(col("media_id"), lit("near_dup_store").as("_r"))
    val undecodable = hashes.where(!col("real_decode"))
      .select(col("media_id"), lit("undecodable").as("_r"))
    val survSigs = sigs
      .join(storeDups.select("media_id"), Seq("media_id"), "left_anti")
    val batchDups = imageBatchDupPairs(survSigs, maxHamming)
      .select(col("media_b").as("media_id")).distinct()
      .select(col("media_id"), lit("near_dup_batch").as("_r"))
    val verdicts = storeDups.unionByName(undecodable).unionByName(batchDups)
    val corpusRows = imgs.select("media_id", "ingest_ts")
      .join(hashes.select("media_id", "dhash"), Seq("media_id"), "left")
      .join(verdicts, Seq("media_id"), "left")
      .select(col("media_id"), col("dhash"),
        col("_r").isNull.as("keep"), coalesce(col("_r"), lit("ok")).as("reason"),
        col("ingest_ts"))
    ViewMaintenance.appendBatch(corpusRows, corpusDir, batchId)
    val keptSigs = sigs
      .join(corpusRows.where(col("keep")).select("media_id"),
        Seq("media_id"), "left_semi")
      .select(col("dhash").as("h"))
    ViewMaintenance.mergeSeenHashesBatch(spark, keptSigs, storeDir,
      version = batchId)
    hashes.unpersist(); imgs.unpersist()
  }

  /** Drive a media stream through the image corpus pipeline. */
  def startImageCorpus(media: DataFrame, corpusDir: String, storeDir: String,
                       checkpointDir: String,
                       maxHamming: Int = 6): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeImageCorpusBatch(batch.sparkSession, batch, corpusDir, storeDir,
          batchId, maxHamming)
        ()
      }
      .start()

  // --- audio corpus: the clip lifecycle ---------------------------------
  // the video-corpus (17e) store mechanics composed with the
  // Haitsma–Kalker window prints (34e): decode → curate (decodability) →
  // dedup-by-window-print (cross-HISTORY seen-print store + within-batch
  // pairs) → audited append-only corpus. Cross-batch state is the SAME
  // manifest-committed long-set store — holding 64-bit audio fingerprints
  // instead of frame dHashes — so slicing-invariance, replay no-ops and
  // generation compaction are all inherited unchanged.

  /** Distinct per-clip window fingerprints (media_id, fp) — payloads never
    * shuffle; only 8-byte prints leave the map-only decode stage.
    */
  def audioSignatures(media: DataFrame, windowMs: Int = 250): DataFrame =
    graft.multimodal.BinaryPipeline.audioFingerprints(media, windowMs)
      .select(col("media_id"), col("fp")).distinct()

  /** Near-dup print hits of a batch's clips against the STORED print
    * history — [[videoStoreHits]]'s pigeonhole equi-join + exact-hamming
    * verify, on audio fingerprints: per clip, how many of its distinct
    * windows near-match ANY stored print. A requantized/gain-changed copy
    * of stored material hits on most windows with ZERO byte overlap.
    */
  def audioStoreHits(sigs: DataFrame, seen: DataFrame,
                     maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    sigChunks(sigs.select(col("media_id"), col("fp")), "fp")
      .join(sigChunks(seen.select(col("h")), "h"), "chunk_key")
      .where(bit_count(col("fp").bitwiseXOR(col("h"))) <= maxHamming)
      .select("media_id", "fp").distinct() // one vote per batch window print
      .groupBy("media_id").agg(count(lit(1)).as("hit_windows"))
  }

  /** Within-batch near-dup pairs over the already-computed print frame —
    * [[graft.multimodal.BinaryPipeline.audioNearDupPairs]]'s join without
    * its decode pass; votes are DISTINCT earlier-clip prints (the store
    * gate's convention — a repeated flat window counts once).
    */
  def audioBatchDupPairs(sigs: DataFrame, maxHamming: Int = 6,
                         minShared: Int = 2): DataFrame = {
    require(maxHamming <= 7, "8x8-bit pigeonhole is sound up to hamming 7")
    val ch = sigChunks(sigs.select(col("media_id"), col("fp")), "fp")
    ch.as("a")
      .join(ch.as("b"), col("a.chunk_key") === col("b.chunk_key") &&
        col("a.media_id") < col("b.media_id"))
      .where(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= maxHamming)
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.fp").as("fa"))
      .distinct() // one vote per (pair, earlier-clip print)
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("shared_windows"))
      .where(col("shared_windows") >= minShared)
  }

  /** One micro-batch of the audio corpus pipeline — exactly-once by the
    * video pipeline's ordering (corpus append lands in its own
    * `b=<batchId>` partition FIRST, the print-store merge commits LAST,
    * and a batchId at or below the store's committed version skips
    * entirely). Verdicts per batch clip:
    *   - `undecodable`    — no window prints (WAV quarantine or < 17
    *     samples/window; decodeAudio is the diagnostic surface)
    *   - `near_dup_store` — ≥ `minShared` distinct window prints
    *     near-match the corpus HISTORY (catches requantized / re-encoded
    *     copies of stored takes with zero byte overlap)
    *   - `near_dup_batch` — later id of a within-batch near-dup pair
    *   - `ok`, keep=true  — lands in the corpus; only KEPT clips' prints
    *     fold into the store (a dropped dup must not extend the history
    *     it was judged against)
    */
  def mergeAudioCorpusBatch(spark: SparkSession, batch: DataFrame,
                            corpusDir: String, storeDir: String, batchId: Long,
                            windowMs: Int = 250, minShared: Int = 2,
                            maxHamming: Int = 6): Unit = {
    val (_, lastBatch, _) = ViewMaintenance.readManifest(spark, storeDir)
    if (batchId <= lastBatch) return // fully-processed replay (merge commits last)
    val clips = batch.where(col("modality") === "audio").persist()
    val prints = graft.multimodal.BinaryPipeline
      .audioFingerprints(clips, windowMs).persist()
    val sigs = prints.select(col("media_id"), col("fp")).distinct()
    val seen = ViewMaintenance.readViewOr(spark, storeDir,
      sigs.select(col("fp").as("h")))
    val storeDups = audioStoreHits(sigs, seen, maxHamming)
      .where(col("hit_windows") >= minShared)
      .select(col("media_id"), lit("near_dup_store").as("_r"))
    val undecodable = clips.select("media_id")
      .join(sigs.select("media_id").distinct(), Seq("media_id"), "left_anti")
      .select(col("media_id"), lit("undecodable").as("_r"))
    val survSigs = sigs
      .join(clips.join(storeDups.unionByName(undecodable), Seq("media_id"), "left_anti")
        .select("media_id"), Seq("media_id"), "left_semi")
    val batchDups = audioBatchDupPairs(survSigs, maxHamming, minShared)
      .select(col("media_b").as("media_id")).distinct()
      .select(col("media_id"), lit("near_dup_batch").as("_r"))
    val verdicts = storeDups.unionByName(undecodable).unionByName(batchDups)
    // n_windows from the SAME print pass — never a second decode
    val corpusRows = clips.select("media_id", "ingest_ts")
      .join(prints.groupBy("media_id").agg(count(lit(1)).as("n_windows")),
        Seq("media_id"), "left")
      .join(verdicts, Seq("media_id"), "left")
      .select(col("media_id"), col("n_windows"),
        col("_r").isNull.as("keep"), coalesce(col("_r"), lit("ok")).as("reason"),
        col("ingest_ts"))
    ViewMaintenance.appendBatch(corpusRows, corpusDir, batchId)
    val keptSigs = sigs
      .join(corpusRows.where(col("keep")).select("media_id"),
        Seq("media_id"), "left_semi")
      .select(col("fp").as("h"))
    ViewMaintenance.mergeSeenHashesBatch(spark, keptSigs, storeDir,
      version = batchId)
    prints.unpersist(); clips.unpersist()
  }

  /** Drive a media stream through the audio corpus pipeline: decode-curate
    * → window-print near-dup drop (history store + within-batch) →
    * audited append-only corpus at `corpusDir`, print history at
    * `storeDir`.
    */
  def startAudioCorpus(media: DataFrame, corpusDir: String, storeDir: String,
                       checkpointDir: String, windowMs: Int = 250,
                       minShared: Int = 2, maxHamming: Int = 6): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeAudioCorpusBatch(batch.sparkSession, batch, corpusDir, storeDir,
          batchId, windowMs, minShared, maxHamming)
        ()
      }
      .start()

  /** Per-(batch, reason) YIELD AUDIT over an audited append-only corpus
    * store — the live twin of [[graft.operators.TextMetrics.curationFunnel]]
    * for the streaming pipelines (17b/e/f/h all write verdict ROWS by
    * contract, so the funnel is a query, not extra state): items and kept
    * counts per micro-batch per drop reason, the "what did batch N cost
    * me and why" report an operator reads after every incident. One scan
    * of the store partition-pruned nowhere (it's an audit), one partial
    * agg; output is |batches|·|reasons| rows.
    */
  def corpusAudit(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir)
      .groupBy(col("b").as("batch_id"), col("reason"))
      .agg(count(lit(1)).as("n"),
        sum(col("keep").cast("long")).as("kept"))
      .orderBy("batch_id", "reason")

  /** Drive curate→dedup into an append-mode parquet corpus store. */
  def start(docs: DataFrame, corpusDir: String, checkpointDir: String,
            watermarkDelay: String = "1 hour"): StreamingQuery =
    dedupKept(curate(docs), watermarkDelay)
      .select(col("doc_id"), col("text"), col("source"), col("ingest_ts"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", corpusDir)
      .start()
}
