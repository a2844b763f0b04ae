package graft.streaming

import org.apache.spark.sql.DataFrame
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
