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

  /** Ids per `onImported` call — each chunk is MATERIALIZED before the
    * callback fires, so peak driver memory is O(chunk), and the handed-over
    * iterator stays valid after the callback returns (a deferring
    * subscriber, e.g. a websocket broadcast queue, may retain it; nothing
    * references the batch DataFrame). A batch larger than one chunk means
    * several calls with the same batchId.
    */
  val IdChunkSize = 65536

  private def broadcastIds(batch: DataFrame, batchId: Long, key: String,
                           onImported: (Long, Iterator[Long]) => Unit): Unit =
    if (onImported ne NoOpOnImported) {
      import scala.jdk.CollectionConverters._
      batch.select(key).toLocalIterator().asScala.map(_.getLong(0))
        .grouped(IdChunkSize)
        .foreach(chunk => onImported(batchId, chunk.iterator))
    }

  /** Idempotent micro-batch import: write the batch to `tableDir` (append,
    * partitioned by day), then surface the imported ids — the
    * `import_from_staging` + websocket-broadcast step. `onImported` receives
    * (batchId, importedEventIds) in bounded chunks (≤ [[IdChunkSize]] per
    * call, each safe to consume after the callback returns — see
    * [[broadcastIds]]); a backfill micro-batch of millions of rows never
    * materializes on the driver. When no callback is supplied the id job is
    * skipped altogether.
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
        // feed BEFORE table: a crash between the two replays the batch and
        // re-broadcasts the same ids (feed dedups on (batch_id, id)); the
        // reverse order would lose the batch's ids when the replay finds
        // the rows already appended (see ImportFeed's replay-safety doc)
        broadcastIds(batch, batchId, "event_id", onImported)
        val withDay = batch.withColumn("day", to_date(col("ts")))
        withDay.write.mode("append").partitionBy("day").parquet(tableDir)
        ()
      }
      .start()

  // ---- complete-block-gated import (import_from_staging step 1.1) --------

  /** Latest committed staging snapshot version under `stagingDir` (dirs
    * named `v=<batchId>`, committed iff their _SUCCESS marker exists).
    */
  private def latestStagingVersion(spark: SparkSession, stagingDir: String): Option[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(stagingDir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(s"$stagingDir/v=$v/_SUCCESS")))
      .sorted.lastOption
  }

  /** One micro-batch of the complete-block-gated import — the reference's
    * full `import_from_staging()` contract (Persistence/ImportProcedure.cs):
    *
    *  1.1 only rows whose group is COMPLETE import (distinct `key` count
    *      reaches the group's declared total — the staging→block_total
    *      check); incomplete groups are HELD BACK, not half-imported;
    *  1.2 already-imported keys are skipped (anti-join against the main
    *      table), so replays insert nothing twice;
    *  2   the held-back remainder becomes the next staging snapshot and
    *      re-enters consideration when later batches complete its groups.
    *
    * Exposed standalone so specs and batch backfills can drive it without
    * streaming machinery; [[startGatedImport]] wires it into foreachBatch.
    *
    * Idempotent under Spark's at-least-once batch replay: a replayed batch
    * re-derives the same complete groups and the main-table anti-join
    * discards everything already appended. Staging snapshots are
    * write-new-then-prune, never overwrite-in-place — a crash mid-write
    * leaves the previous `v=` snapshot committed (no _SUCCESS on the torn
    * one), so held-back rows can never be lost.
    *
    * Scale: every join is keyed (group key / row key); the main-table
    * anti-join reads only the `key` column (parquet column pruning), and at
    * 100 TB would be bounded further by partition-pruning the key frontier
    * (recent days), as the reference bounds its NOT EXISTS with the staging
    * block range.
    */
  def importGatedBatch(batch: DataFrame, batchId: Long, tableDir: String,
      stagingDir: String, key: String = "event_id", groupCol: String,
      declaredCol: String,
      onImported: (Long, Iterator[Long]) => Unit = NoOpOnImported,
      onGroupsImported: (Long, Iterator[Long]) => Unit = NoOpOnImported): Unit = {
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val staged = latestStagingVersion(spark, stagingDir) match {
      case Some(v) => spark.read.schema(batch.schema).parquet(s"$stagingDir/v=$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    }
    val combined = batch.unionByName(staged).persist()
    try {
      val completeKeys = combined.groupBy(col(groupCol))
        .agg(count_distinct(col(key)).as("_n"), max(col(declaredCol)).as("_declared"))
        .where(col("_n") === col("_declared"))
        .select(groupCol)
      val candidates = combined.join(completeKeys, Seq(groupCol), "left_semi")
        .dropDuplicates(key)
      // bound the already-imported check to this batch's key range, like
      // the reference bounds its NOT EXISTS to the staging block range
      // (ImportProcedure.cs): keys outside [lo, hi] cannot collide, and the
      // range predicate pushes down to the parquet scan (row-group pruning)
      // so the anti-join never reads the whole key frontier
      val bounds = combined.agg(min(col(key)).as("lo"), max(col(key)).as("hi")).collect()(0)
      val mainKeys =
        if (fs.exists(new org.apache.hadoop.fs.Path(tableDir)) && !bounds.isNullAt(0))
          Some(spark.read.schema(batch.schema).parquet(tableDir)
            .where(col(key).between(bounds.get(0), bounds.get(1)))
            .select(key))
        else None
      val toImport = mainKeys.fold(candidates)(mk =>
        candidates.join(mk, Seq(key), "left_anti"))
      // Both writes below are staged OUTSIDE the table first: the anti-joins
      // read tableDir, and appending to a path a live plan reads refreshes
      // its cached file index mid-flight (the relation was resolved against
      // the pre-write partition layout — Spark then fails the scan). Every
      // tableDir-reading plan therefore executes BEFORE the append.
      val spillImport = s"$stagingDir/_import_spill"
      val spillHeld = s"$stagingDir/_held_spill"
      toImport.write.mode("overwrite").parquet(spillImport)
      val stable = spark.read.schema(batch.schema).parquet(spillImport)
      // held = rows of incomplete groups, minus anything already imported
      // (the reference purges imported staging rows — a re-received copy of
      // an imported row must not sit in staging forever; its siblings live
      // in main, so its group can never complete from staging alone)
      val held = combined.join(completeKeys, Seq(groupCol), "left_anti")
        .dropDuplicates(key)
      mainKeys.fold(held)(mk => held.join(mk, Seq(key), "left_anti"))
        .write.mode("overwrite").parquet(spillHeld)
      // feed BEFORE the table append: a crash anywhere after this line
      // replays the batch, re-derives the same toImport set (or an empty
      // one if the append landed) — either way the feed already holds the
      // batch's ids, and a re-broadcast only adds dedupable duplicates.
      // Broadcasting AFTER the append would open the loss window the feed
      // contract forbids (append lands → crash → replay broadcasts nothing)
      broadcastIds(stable, batchId, key, onImported)
      // append AFTER the staging spill is on disk: if we crash here, the
      // previous v= snapshot is still committed and a replay re-derives
      // everything (the main anti-join discards what the append landed)
      stable.withColumn("day", to_date(col("ts")))
        .write.mode("append").partitionBy("day").parquet(tableDir)
      // the groups whose rows just LANDED — the per-block "written" signal
      // (Statistics.cs:24 TrackBlockWritten). Bounded: distinct groups of
      // one micro-batch. Fired after the append so the duration covers the
      // full enter→written arc; replays re-fire, which the consumer's
      // remove-once semantics absorb.
      if (onGroupsImported ne NoOpOnImported) {
        val groups = stable.select(col(groupCol).cast("long"))
          .distinct().collect().map(_.getLong(0))
        if (groups.nonEmpty) onGroupsImported(batchId, groups.iterator)
      }
      // commit the new snapshot by rename (atomic), then prune older ones
      val committed = new org.apache.hadoop.fs.Path(s"$stagingDir/v=$batchId")
      fs.delete(committed, true) // replay leftovers
      fs.rename(new org.apache.hadoop.fs.Path(spillHeld), committed)
      fs.listStatus(new org.apache.hadoop.fs.Path(stagingDir)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .filter(_.getPath.getName.stripPrefix("v=").toLong < batchId)
        .foreach(s => fs.delete(s.getPath, true))
      fs.delete(new org.apache.hadoop.fs.Path(spillImport), true)
      ()
    } finally { combined.unpersist(); () }
  }

  /** Streaming wrapper for [[importGatedBatch]] — the micro-batch twin of
    * the reference's poll-loop `import_from_staging()` call.
    */
  def startGatedImport(
      deduped: DataFrame,
      tableDir: String,
      stagingDir: String,
      checkpointDir: String,
      groupCol: String,
      declaredCol: String,
      key: String = "event_id",
      onImported: (Long, Iterator[Long]) => Unit = NoOpOnImported,
      onGroupsImported: (Long, Iterator[Long]) => Unit = NoOpOnImported
  ) =
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        importGatedBatch(batch, batchId, tableDir, stagingDir, key, groupCol,
          declaredCol, onImported, onGroupsImported)
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

  /** Does `dir` hold at least one COMMITTED parquet part file (recursing
    * into partition dirs; in-flight temp/hidden files don't count)? The
    * nothing-imported-yet probe for [[reimportFrom]] and the import loop's
    * resume frontier: a reorg can land while the FIRST append is still in
    * flight, leaving the dir with only temp files and no committed footer.
    * Probing the FS directly (instead of catching AnalysisException off
    * the read) keeps a genuinely unreadable/corrupt table LOUD — the r12
    * ADVICE find: the broad catch silenced corruption during a reorg and
    * served stale reorged rows with no signal.
    */
  private[graft] def committedParquetExists(spark: SparkSession, dir: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return false
    // manual walk SKIPPING _/. entries: a recursive listFiles would descend
    // into a live writer's _temporary dirs, whose files vanish mid-listing
    // (a probe racing an append must never throw on the writer's scratch)
    val stack = scala.collection.mutable.Stack(root)
    while (stack.nonEmpty) {
      val children =
        try fs.listStatus(stack.pop())
        catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
      children.foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) stack.push(st.getPath)
          else if (name.endsWith(".parquet")) return true
        }
      }
    }
    false
  }

  /** Reorg handling (`Sources/ReorgSource.cs` + README "Reorgs"): delete all
    * data from the reorged key onward and let re-ingest repopulate. With a
    * day-partitioned table this is a partition-scoped overwrite, not a table
    * rewrite.
    */
  def reimportFrom(spark: SparkSession, tableDir: String, fromEventId: Long,
                   keyCol: String = "event_id"): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // nothing committed means nothing to truncate; anything else that makes
    // the table unreadable must THROW, not silently keep stale reorged rows
    if (!committedParquetExists(spark, tableDir)) return
    val current = spark.read.parquet(tableDir)
    // Partitions holding any reorged row. Collecting *days* is a bounded
    // driver-side list (≈ reorg depth), not data.
    val affectedDays = current.where(col(keyCol) >= fromEventId)
      .select(col("day").cast("string")).distinct().collect().map(_.getString(0))
    if (affectedDays.isEmpty) return
    val survivors = current
      .where(col("day").cast("string").isin(affectedDays.toSeq: _*) && col(keyCol) < fromEventId)
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

  /** delete_incomplete_blocks (0.0.64.sql:1652): find the oldest group whose
    * imported child count is short of its declared total
    * ([[graft.operators.Integrity.firstIncomplete]]), then truncate every
    * stored table from that key onward so re-ingest repopulates a clean
    * prefix — the reference's cross-table DELETE cascade, expressed as one
    * [[reimportFrom]] (partition-scoped overwrite, never a table rewrite)
    * per store. Returns the cut, or None when every group is complete
    * (no-op, like the procedure's null `first_corrupt_block`).
    *
    * Note the complete-block GATED import makes this cleanup largely
    * preventive here (incomplete blocks never reach main); the procedure
    * exists for stores populated by the ungated path, exactly as in the
    * reference.
    */
  def deleteIncompleteBlocks(spark: SparkSession, tableDirs: Seq[String],
      children: DataFrame, groupCol: String, declaredCol: String): Option[Long] = {
    val cut = graft.operators.Integrity
      .firstIncomplete(children, groupCol, declaredCol).collect()(0) // 1 row
    if (cut.isNullAt(0)) None
    else {
      val c = cut.getLong(0)
      tableDirs.foreach(reimportFrom(spark, _, c, keyCol = groupCol))
      Some(c)
    }
  }
}
