package graft

import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import java.nio.file.Files

case class GatedRow(event_id: Long, ts: Timestamp, block: Long, declared: Long, payload: String)

/** Complete-block gating (reference ImportProcedure.cs step 1.1): a
  * micro-batch imports ONLY rows whose group is complete; incomplete groups
  * stay staged until later batches complete them.
  */
class GatedImportSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def row(id: Long, block: Long, declared: Long) =
    GatedRow(id, ts("2024-01-01 10:00:00"), block, declared, s"p$id")

  test("streaming: partial groups are held back, then import once completed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GatedRow]
    val tableDir = Files.createTempDirectory("graft-gated-table").toString
    val stagingDir = Files.createTempDirectory("graft-gated-staging").toString
    val ckpt = Files.createTempDirectory("graft-gated-ckpt").toString

    var broadcasts = Vector.empty[(Long, Set[Long])]
    val q = EventPipeline.startGatedImport(mem.toDF(), tableDir, stagingDir, ckpt,
      groupCol = "block", declaredCol = "declared",
      onImported = (bid, ids) => broadcasts :+= (bid, ids.toSet))

    // batch 1: block 100 complete (2/2), block 101 partial (1/2)
    mem.addData(row(1, 100, 2), row(2, 100, 2), row(3, 101, 2))
    q.processAllAvailable()
    assert(spark.read.parquet(tableDir).select("event_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L), "only the complete block imports")

    // batch 2: block 101's missing row arrives (plus a duplicate of an
    // already-imported row, which the main anti-join must discard)
    mem.addData(row(4, 101, 2), row(1, 100, 2))
    q.processAllAvailable()
    q.stop()

    val imported = spark.read.parquet(tableDir).select("event_id").as[Long].collect().sorted.toSeq
    assert(imported == Seq(1L, 2L, 3L, 4L), "held-back group imports exactly once on completion")
    assert(broadcasts.flatMap(_._2).toSet == Set(1L, 2L, 3L, 4L))
    // the completed group's rows left staging
    val stagedNow = spark.read.schema(mem.toDF().schema)
      .parquet(s"$stagingDir/v=1").count()
    assert(stagedNow == 0, "staging snapshot is empty once every group completed")
  }

  test("batch replay is idempotent: same batch twice appends nothing twice") {
    val tableDir = Files.createTempDirectory("graft-gated2-table").toString
    val stagingDir = Files.createTempDirectory("graft-gated2-staging").toString
    val batch = Seq(row(1, 100, 2), row(2, 100, 2), row(3, 101, 2)).toDF

    EventPipeline.importGatedBatch(batch, 0L, tableDir, stagingDir,
      groupCol = "block", declaredCol = "declared")
    EventPipeline.importGatedBatch(batch, 0L, tableDir, stagingDir,
      groupCol = "block", declaredCol = "declared") // replay after crash-before-checkpoint

    assert(spark.read.parquet(tableDir).select("event_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    val staged = spark.read.schema(batch.schema).parquet(s"$stagingDir/v=0")
      .select("event_id").as[Long].collect().toSeq
    assert(staged == Seq(3L), "incomplete group still staged after replay")
  }

  test("empty micro-batches are harmless no-ops at any point in the flow") {
    val tableDir = Files.createTempDirectory("graft-gated4-table").toString
    val stagingDir = Files.createTempDirectory("graft-gated4-staging").toString
    val empty = Seq.empty[GatedRow].toDF
    // empty batch against an empty table
    EventPipeline.importGatedBatch(empty, 0L, tableDir, stagingDir,
      groupCol = "block", declaredCol = "declared")
    // real batch, then another empty one
    EventPipeline.importGatedBatch(Seq(row(1, 100, 2), row(2, 100, 2), row(3, 101, 2)).toDF,
      1L, tableDir, stagingDir, groupCol = "block", declaredCol = "declared")
    EventPipeline.importGatedBatch(empty, 2L, tableDir, stagingDir,
      groupCol = "block", declaredCol = "declared")
    assert(spark.read.parquet(tableDir).select("event_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
    // the held row survived both empty batches
    val staged = spark.read.schema(empty.schema).parquet(s"$stagingDir/v=2")
      .select("event_id").as[Long].collect().toSeq
    assert(staged == Seq(3L))
  }

  test("ImportFeed: subscriber poll sees exactly the imported ids per batch, replay-safe") {
    import graft.streaming.ImportFeed
    val tableDir = Files.createTempDirectory("graft-feed-table").toString
    val stagingDir = Files.createTempDirectory("graft-feed-staging").toString
    val feedDir = Files.createTempDirectory("graft-feed-log").toString + "/feed"
    val sub = ImportFeed.subscriber(spark, feedDir)

    // batch 0: block 100 complete, block 101 partial → feed gets {1,2}
    EventPipeline.importGatedBatch(Seq(row(1, 100, 2), row(2, 100, 2), row(3, 101, 2)).toDF,
      0L, tableDir, stagingDir, groupCol = "block", declaredCol = "declared",
      onImported = sub)
    // replay of batch 0 (crash before checkpoint): gated import appends
    // nothing, so the subscriber gets no ids — but even a feed-side torn
    // write would dedup away because the partition key is the batch id
    EventPipeline.importGatedBatch(Seq(row(1, 100, 2), row(2, 100, 2), row(3, 101, 2)).toDF,
      0L, tableDir, stagingDir, groupCol = "block", declaredCol = "declared",
      onImported = sub)
    // batch 1 completes block 101 → feed gets {3,4}
    EventPipeline.importGatedBatch(Seq(row(4, 101, 2)).toDF,
      1L, tableDir, stagingDir, groupCol = "block", declaredCol = "declared",
      onImported = sub)

    val feed = ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().toSet
    assert(feed == Set((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)),
      "feed is exactly the per-batch imported sets")
    // a torn chunk replayed under the same batch id dedups away
    sub(1L, Iterator(3L, 4L))
    assert(ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().toSet == feed, "duplicate chunk is invisible")
    // the since-cut serves the poll and prunes old batches
    assert(ImportFeed.recentlyImported(spark, feedDir, sinceBatch = 1L)
      .as[(Long, Long)].collect().toSet == Set((1L, 3L), (1L, 4L)))
    // retention: pruned batches disappear; newer feed rows survive
    ImportFeed.prune(spark, feedDir, beforeBatch = 1L)
    assert(ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().toSet == Set((1L, 3L), (1L, 4L)))
  }

  test("ImportFeed: feed leads the table — a crash in the subscriber loses no ids") {
    import graft.streaming.ImportFeed
    val tableDir = Files.createTempDirectory("graft-feedord-table").toString + "/t"
    val stagingDir = Files.createTempDirectory("graft-feedord-staging").toString
    val feedDir = Files.createTempDirectory("graft-feedord-log").toString + "/feed"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

    // a subscriber that crashes BEFORE writing: because broadcastIds runs
    // before the table append, the batch must abort with NOTHING appended —
    // the old after-append ordering would have left the rows in the table
    // and the replay would then broadcast nothing (permanent feed loss)
    intercept[RuntimeException] {
      EventPipeline.importGatedBatch(Seq(row(1, 100, 2), row(2, 100, 2)).toDF,
        0L, tableDir, stagingDir, groupCol = "block", declaredCol = "declared",
        onImported = (_, _) => sys.error("subscriber crash"))
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tableDir)),
      "crash in the feed hook must abort before the table append")
    // replay under the same batch id with a working subscriber: both the
    // table and the feed see the batch — no loss, no duplicates
    EventPipeline.importGatedBatch(Seq(row(1, 100, 2), row(2, 100, 2)).toDF,
      0L, tableDir, stagingDir, groupCol = "block", declaredCol = "declared",
      onImported = ImportFeed.subscriber(spark, feedDir))
    assert(spark.read.parquet(tableDir).select("event_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    assert(ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().toSet == Set((0L, 1L), (0L, 2L)))
  }

  test("ImportFeed: empty/pruned/foreign dirs are a schema-stable empty feed") {
    import graft.streaming.ImportFeed
    val feedDir = Files.createTempDirectory("graft-feedempty").toString + "/feed"
    // nonexistent dir
    assert(ImportFeed.recentlyImported(spark, feedDir).collect().isEmpty)
    assert(ImportFeed.recentlyImported(spark, feedDir).columns.toSeq
      == Seq("batch_id", "event_id"))
    // a foreign/stray entry is ignored by both poll and prune
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$feedDir/b=notanumber"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$feedDir/stray"))
    ImportFeed.prune(spark, feedDir, beforeBatch = Long.MaxValue) // must not throw
    assert(ImportFeed.recentlyImported(spark, feedDir).collect().isEmpty)
    // real data, then prune EVERYTHING: the poll degrades to empty, not to
    // a schema-inference failure on a partitionless root
    ImportFeed.subscriber(spark, feedDir)(0L, Iterator(1L, 2L))
    assert(ImportFeed.recentlyImported(spark, feedDir).count() == 2)
    ImportFeed.prune(spark, feedDir, beforeBatch = Long.MaxValue)
    assert(ImportFeed.recentlyImported(spark, feedDir).collect().isEmpty)
  }

  test("ImportFeed + ParquetCompactor: compaction preserves the poll, GCs slivers") {
    import graft.streaming.ImportFeed
    val feedDir = Files.createTempDirectory("graft-feedcomp").toString + "/feed"
    val sub = ImportFeed.subscriber(spark, feedDir)
    // 3 batches × several chunk appends each → many sliver files
    for (b <- 0L to 2L; c <- 0 until 3)
      sub(b, Iterator(b * 10 + c * 2, b * 10 + c * 2 + 1))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def partFiles(b: Long) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$feedDir/b=$b"))
        .count(_.getPath.getName.startsWith("part-"))
    assert(partFiles(0L) == 3 && partFiles(1L) == 3)
    val before = ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().toSet
    // compact everything below the live frontier (batch 2 still appending)
    ImportFeed.compact(spark, feedDir, beforeBatch = 2L)
    assert(partFiles(0L) == 1 && partFiles(1L) == 1, "slivers folded")
    assert(partFiles(2L) == 3, "the live partition is untouched")
    assert(ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().toSet == before,
      "poll identical across compaction")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$feedDir/_compact")),
      "tmp generation GC'd")
    // crash-mid-swap recovery: a verified copy in _compact whose partition
    // is missing is renamed into place by the next poll
    val p0 = new org.apache.hadoop.fs.Path(s"$feedDir/b=0")
    val tmp = new org.apache.hadoop.fs.Path(s"$feedDir/_compact/b=0")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$feedDir/_compact"))
    org.apache.hadoop.fs.FileUtil.copy(fs, p0, fs, tmp, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(p0, true) // the crash window: partition gone, copy pending
    assert(ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().toSet == before,
      "mid-swap crash recovered on poll")
    assert(fs.exists(p0) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$feedDir/_compact")))

    // retention vs mid-swap crash: prune must complete the pending swap
    // BEFORE deleting, or the next poll's recovery would resurrect a
    // partition retention already dropped
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$feedDir/_compact"))
    org.apache.hadoop.fs.FileUtil.copy(fs, p0, fs, tmp, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(p0, true) // crash window again: b=0 pending in _compact
    ImportFeed.prune(spark, feedDir, beforeBatch = 1L) // retention takes b=0
    assert(ImportFeed.recentlyImported(spark, feedDir)
      .as[(Long, Long)].collect().forall(_._1 >= 1L),
      "pruned partition must not resurrect from a pending compaction copy")
  }

  test("deleteIncompleteBlocks: truncates every store from the oldest incomplete group") {
    import graft.operators.Integrity
    import org.apache.spark.sql.functions.{col, to_date}
    // blocks 100 (complete 2/2), 101 (INCOMPLETE 1/2), 102 (complete 1/1):
    // the cut is 101 and must also take complete-but-later 102 with it
    val rows = Seq(row(1, 100, 2), row(2, 100, 2), row(3, 101, 2), row(5, 102, 1))
    val tableA = Files.createTempDirectory("graft-dib-a").toString + "/t"
    val tableB = Files.createTempDirectory("graft-dib-b").toString + "/t"
    rows.toDF.withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(tableA)
    rows.toDF.withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").parquet(tableB)

    val cut = EventPipeline.deleteIncompleteBlocks(spark, Seq(tableA, tableB),
      spark.read.parquet(tableA), groupCol = "block", declaredCol = "declared")
    assert(cut.contains(101L))
    for (t <- Seq(tableA, tableB))
      assert(spark.read.parquet(t).select("event_id").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L), s"$t truncated from block 101 onward")

    // all groups complete → no-op, stores untouched
    val cut2 = EventPipeline.deleteIncompleteBlocks(spark, Seq(tableA, tableB),
      spark.read.parquet(tableA), groupCol = "block", declaredCol = "declared")
    assert(cut2.isEmpty)
    assert(spark.read.parquet(tableA).count() == 2)

    // the standalone view: 1-row min over the short groups
    val fi = Integrity.firstIncomplete(rows.toDF, "block", "declared")
      .as[Option[Long]].collect().toSeq
    assert(fi == Seq(Some(101L)))
  }

  test("a torn staging snapshot (no _SUCCESS) is ignored; held rows survive") {
    val tableDir = Files.createTempDirectory("graft-gated3-table").toString
    val stagingDir = Files.createTempDirectory("graft-gated3-staging").toString

    EventPipeline.importGatedBatch(Seq(row(3, 101, 2)).toDF, 0L, tableDir, stagingDir,
      groupCol = "block", declaredCol = "declared")
    // simulate a crash mid-write of the NEXT snapshot: v=1 exists without
    // its _SUCCESS marker — the committed snapshot is still v=0
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$stagingDir/v=1"))

    // the replayed batch completes block 101 together with the held row
    EventPipeline.importGatedBatch(Seq(row(4, 101, 2)).toDF, 1L, tableDir, stagingDir,
      groupCol = "block", declaredCol = "declared")
    assert(spark.read.parquet(tableDir).select("event_id").as[Long].collect().sorted.toSeq
      == Seq(3L, 4L), "held-back row was not lost to the torn snapshot")
  }
}
