package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Structured-Streaming re-expression of the reference's live pipeline.
  *
  * Reference flow (`Indexer.cs:107`, README "How it works"):
  * `[BlockSource] → download → classify → extract → staging → import`.
  * The Akka stream polls/pushes block numbers, classifies each transaction,
  * appends to duplicate-tolerant staging tables, and periodically runs the
  * idempotent `import_from_staging()` (dedup + insert, Serializable txn);
  * a websocket broadcasts each imported batch's tx hashes
  * (`Api/TransactionHashBroadcastService.cs`).
  *
  * Spark-first equivalents used here:
  *  - BlockSource            → any streaming DataFrame source (file source
  *    picking up new parquet drops, rate source, or Kafka in production).
  *  - classify+extract       → the SAME batch expressions (Classify.*) —
  *    Structured Streaming runs identical declarative plans incrementally.
  *  - staging dedup          → `withWatermark` + `dropDuplicates(event_id)`:
  *    state-bounded exactly-once dedup instead of staging tables.
  *  - import_from_staging    → `foreachBatch` sink keyed by (batchId): the
  *    sink write is idempotent per batch, which under Spark's at-least-once
  *    batch replay yields exactly-once table contents — the same
  *    staging→confirmed contract the reference builds by hand.
  *  - websocket broadcast    → each micro-batch's imported ids are exposed to
  *    a caller-supplied callback in `foreachBatch` (transport-agnostic).
  *  - reorg delete+reimport  → [[reimportFrom]]: dynamic partition overwrite
  *    of the affected block range, then the stream re-reads from the source.
  *
  * Scale: stateful stages are keyed by event_id with a watermark — state size
  * is bounded by (watermark window × event rate), independent of total data;
  * the sink write is append-only parquet partitioned by a time bucket so
  * reorg rewrites touch only affected partitions.
  */
object EventPipeline {

  /** The reference broadcasts this magic "hash" to websocket subscribers
    * when a reorg invalidates previously-announced transactions
    * (README "Websocket server"). Callers of [[reimportFrom]] should emit it
    * through the same channel as [[startImport]]'s onImported ids.
    */
  val ReorgMagicHash = "0xdeadbeef00000000000000000000000000000000000000000000000000000000"

  /** Incremental classify+extract over a streaming events frame. The plan is
    * the batch `Classify.classify` minus the global sort (streams cannot
    * sort; ordering is the sink's concern).
    */
  def classifyStream(events: DataFrame): DataFrame = {
    val flagCols = Classify.eventFlags.map { case (name, pred) => when(pred, lit(name)) }
    events.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"),
      coalesce(nullif(concat_ws(",", flagCols: _*), lit("")), lit("Unknown")).as("classification")
    )
  }

  /** Watermarked dedup — the staging-tables contract (duplicates in, unique
    * rows out) with bounded state.
    */
  def dedupStream(classified: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    classified
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id")

  /** Tumbling-window throughput (the streaming twin of
    * StateOps.windowedCounts / reference `Statistics.cs`).
    */
  def windowedThroughput(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Built-in session windows (the simple case; `Sessionizer` is the
    * custom-state path for semantics this can't express). State per
    * (user, open window), merged on overlap, reaped by the watermark.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(min("event_id").as("session_start_id"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_start_id"), col("n_events"))

  /** Default `onImported`: a named no-op so [[startImport]] can tell "nobody
    * is listening" apart from a real subscriber and skip id materialization
    * entirely.
    */
  val NoOpOnImported: (Long, Iterator[Long]) => Unit = (_, _) => ()

  /** Idempotent micro-batch import: write the batch to `tableDir` (append,
    * partitioned by day), then surface the imported ids — the
    * `import_from_staging` + websocket-broadcast step. `onImported` receives
    * (batchId, importedEventIds) as a driver-side iterator fed one partition
    * at a time (`toLocalIterator`), so peak driver memory is O(largest
    * partition's ids), not O(batch) — a backfill micro-batch of millions of
    * rows never materializes on the driver. When no callback is supplied the
    * id job is skipped altogether.
    */
  def startImport(
      deduped: DataFrame,
      tableDir: String,
      checkpointDir: String,
      onImported: (Long, Iterator[Long]) => Unit = NoOpOnImported
  ) =
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val withDay = batch.withColumn("day", to_date(col("ts")))
        withDay.write.mode("append").partitionBy("day").parquet(tableDir)
        if (onImported ne NoOpOnImported) {
          import scala.jdk.CollectionConverters._
          val ids = batch.select("event_id").toLocalIterator().asScala.map(_.getLong(0))
          onImported(batchId, ids)
        }
        ()
      }
      .start()

  /** Post-import gap monitor (`Sources/GapSource.cs:14`): after imports,
    * diff the imported key sequence against its contiguous span and hand the
    * missing ranges to a re-request callback — the reference re-emits these
    * block numbers into the download pipeline. Uses the scalable anti-join
    * gap operator, not a global window.
    */
  def checkGaps(spark: SparkSession, tableDir: String)(reRequest: Array[(Long, Long)] => Unit): Unit = {
    val imported = spark.read.parquet(tableDir).select("event_id")
    val gaps = graft.operators.Integrity.gaps(imported, "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (gaps.nonEmpty) reRequest(gaps)
  }

  /** Reorg handling (`Sources/ReorgSource.cs` + README "Reorgs"): delete all
    * data from the reorged key onward and let re-ingest repopulate. With a
    * day-partitioned table this is a partition-scoped overwrite, not a table
    * rewrite.
    */
  def reimportFrom(spark: SparkSession, tableDir: String, fromEventId: Long): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val current = spark.read.parquet(tableDir)
    // Partitions holding any reorged row. Collecting *days* is a bounded
    // driver-side list (≈ reorg depth), not data.
    val affectedDays = current.where(col("event_id") >= fromEventId)
      .select(col("day").cast("string")).distinct().collect().map(_.getString(0))
    if (affectedDays.isEmpty) return
    val survivors = current
      .where(col("day").cast("string").isin(affectedDays.toSeq: _*) && col("event_id") < fromEventId)
      .cache()
    val survivorDays = survivors.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    // Dynamic overwrite rewrites only partitions present in `survivors`...
    survivors.write.mode("overwrite").partitionBy("day").parquet(tableDir)
    // ...so partitions whose every row was reorged away must be dropped
    // explicitly (a metadata-only FS delete).
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    affectedDays.filterNot(survivorDays).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/day=$d"), true)
    }
    survivors.unpersist()
    ()
  }
}
