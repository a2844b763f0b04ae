package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The queryable "recently imported" feed — the Spark-native stand-in for
  * the reference's websocket broadcast surface (the indexer NOTIFYs every
  * imported tx hash and a broadcast service fans it out to subscribers:
  * DbMigrations/0.0.64.sql:2384 `publish_event` +
  * CirclesLand.BlockchainIndexer.Api/TransactionHashBroadcastService.cs).
  *
  * A push socket doesn't fit a batch engine, but the CONTRACT does: a
  * subscriber must be able to ask "which ids landed since I last looked?"
  * and get exactly the imported set, replay-safe. [[subscriber]] adapts the
  * existing `onImported` hook ([[EventPipeline.startImport]] /
  * `importGatedBatch`) into a tiny append-only parquet log partitioned by
  * batch (`b=<batchId>`); [[recentlyImported]] serves the poll with the
  * batch cut pushed down to partition pruning.
  *
  * Replay safety: Structured Streaming re-runs a failed micro-batch under
  * the SAME batchId, so a torn write leaves a partial `b=` partition that
  * the replay completes — the read side dedups on (batch_id, event_id),
  * making the feed exactly the imported set under at-least-once delivery.
  * (The log is ids-only; a duplicate pair is the only possible anomaly.)
  *
  * Scale shape: each append is one chunk of ≤ [[EventPipeline.IdChunkSize]]
  * ids (the hook's bound) — an 8-byte column, trivially small; readers prune
  * to the polled batch range before the dedup shuffle, so a years-deep feed
  * costs what the poll window covers. Many small files accumulate by
  * design; [[graft.sources.ParquetCompactor]] is the standing answer, and
  * [[prune]] drops partitions older than a retention horizon (subscribers
  * that far behind re-sync from the table itself, like a websocket client
  * that reconnects after a long outage re-reads state).
  */
object ImportFeed {

  /** An `onImported` subscriber that appends each id chunk to `dir`.
    * Pass directly as the `onImported` argument of
    * [[EventPipeline.startImport]] or `importGatedBatch`.
    */
  def subscriber(spark: SparkSession, dir: String): (Long, Iterator[Long]) => Unit =
    (batchId, ids) => {
      import spark.implicits._
      // chunk is already materialized by the hook (≤ IdChunkSize), so this
      // toSeq is bounded; the write is one small append into b=<batchId>
      ids.toSeq.toDF("event_id")
        .withColumn("b", lit(batchId))
        .repartition(1)
        .write.mode("append").partitionBy("b").parquet(dir)
    }

  /** The poll: ids imported in batches ≥ `sinceBatch` (exclusive cut via
    * `sinceBatch + 1`). The `b` predicate prunes partitions before any IO;
    * dedup makes replayed/torn chunks invisible.
    */
  def recentlyImported(spark: SparkSession, dir: String,
                       sinceBatch: Long = Long.MinValue): DataFrame =
    spark.read.parquet(dir)
      .where(col("b") >= sinceBatch)
      .select(col("b").as("batch_id"), col("event_id"))
      .dropDuplicates("batch_id", "event_id")

  /** Retention: drop feed partitions with batchId < `beforeBatch`. */
  def prune(spark: SparkSession, dir: String, beforeBatch: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(root)) fs.listStatus(root).foreach { s =>
      val name = s.getPath.getName
      if (s.isDirectory && name.startsWith("b=") &&
          name.stripPrefix("b=").toLong < beforeBatch)
        fs.delete(s.getPath, true)
    }
  }
}
