package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.hadoop.fs.{FileSystem, Path}

/** Incremental maintenance of the derived-view layer (the reference's
  * `import_from_staging` refreshes its cache_* tables inside the same
  * transaction; Spark-side, each micro-batch merges its delta into the
  * stored view).
  *
  * The stored view is hash-bucketed on the merge key and MANIFEST-COMMITTED:
  *
  *  - data lives in immutable generation dirs
  *    `viewDir/data/g=<version>/bucket=<b>/…`;
  *  - a manifest file `viewDir/manifest-<version>` maps every bucket to the
  *    generation that last wrote it; the CURRENT view is defined by the
  *    highest-numbered manifest, nothing else;
  *  - a merge writes its touched buckets into a NEW generation, then
  *    publishes a new manifest via write-temp + atomic rename. Readers
  *    compose the view by reading, per bucket, exactly the generation the
  *    manifest names ([[readView]]).
  *
  * This closes the torn-merge window a multi-directory dynamic overwrite
  * has: a crash at ANY point before the manifest rename leaves the previous
  * manifest current — the half-written generation is invisible — and a
  * replay re-merges from the pre-batch state. A crash AFTER the rename is
  * detected on replay by version (`latest manifest ≥ this batch` → the
  * batch is already committed → no-op), so the non-idempotent
  * history_count accumulation can never double-add. Unreferenced
  * generations are garbage-collected after each successful commit.
  *
  * A micro-batch still
  *   1. reduces to its delta (one partial-aggregable shuffle over the batch),
  *   2. reads ONLY the buckets its keys fall in, each from its manifest
  *      generation (directory-level pruning — the untouched view is never
  *      opened),
  *   3. writes ONLY those buckets into the new generation.
  * Maintenance cost is O(batch + touched-buckets), independent of total
  * view size. `numBuckets` must stay fixed for the lifetime of a view
  * directory; size it so view_size/numBuckets fits an executor.
  *
  * The trust view merges associatively: for each edge,
  *   limit        ← the side with the greater last_change wins
  *   history_count← sum of both sides
  */
/** The ONE atomicity primitive the view store needs: atomically make
  * `viewDir/manifest-<version>` exist with `content`, returning false when
  * another attempt already published that version — the lost race. The
  * store's correctness reduces to this exchange: data generations are
  * invisible until a manifest names them, so whichever protocol can
  * create-exclusively (rename on HDFS/POSIX/ABFS/GCS, conditional PUT on
  * S3) carries the whole crash/replay story.
  *
  * Operating assumption (same as the reference's single Postgres writer):
  * ONE live writer per view directory — foreachBatch guarantees it per
  * query. The committer defends against the crash-replay races that
  * single writer still has (zombie retry of an already-committed version,
  * stale manifest listing on an eventually-consistent store): the loser
  * returns false and the caller treats the batch as already merged. A
  * truly concurrent second writer additionally needs writer-unique
  * generation prefixes (or a versioned bucket) so its pre-commit data
  * writes can't collide — out of scope here, documented constraint.
  */
trait ManifestCommitter {
  def commit(fs: FileSystem, viewDir: String, version: Long, content: String): Boolean
}

/** write-tmp → hsync → rename: atomic exactly where rename is atomic
  * (HDFS, local/POSIX, ABFS, GCS). The pre-rename existence check is the
  * lost-race detector; on HDFS rename-onto-existing also fails on its
  * own, local POSIX rename would silently replace — hence the check.
  */
object RenameCommitter extends ManifestCommitter {
  def commit(fs: FileSystem, viewDir: String, version: Long, content: String): Boolean = {
    val tmp = new Path(s"$viewDir/_manifest_tmp_$version")
    val out = fs.create(tmp, true)
    try { out.write(content.getBytes("UTF-8")); out.hsync() } finally out.close()
    val committed = new Path(s"$viewDir/manifest-$version")
    if (fs.exists(committed)) { fs.delete(tmp, false); false }
    else fs.rename(tmp, committed)
  }
}

/** Conditional-PUT pointer, the S3 shape (`PUT If-None-Match: *` — the
  * manifest object is written DIRECTLY, no rename): on S3 the PUT is
  * all-or-nothing and the precondition failure is the lost race. Locally
  * the exclusive `create(path, overwrite=false)` simulates exactly the
  * race semantics (O_EXCL), which is what the lost-race spec exercises;
  * an S3 deployment swaps the FileSystem, not this logic.
  */
object ConditionalPutCommitter extends ManifestCommitter {
  def commit(fs: FileSystem, viewDir: String, version: Long, content: String): Boolean = {
    val committed = new Path(s"$viewDir/manifest-$version")
    val out =
      try fs.create(committed, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
        case _: java.io.IOException if fs.exists(committed) => return false
      }
    try { out.write(content.getBytes("UTF-8")); out.hsync() } finally out.close()
    true
  }
}

object ViewMaintenance {

  val DefaultNumBuckets = 64

  private def fsOf(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** (version, lastBatch, bucket → generation) of the newest committed
    * manifest, or (-1, -1, empty) for a fresh view dir. Manifest files are
    * `manifest-<version>`: a `batch <id>` header (the last merged batch —
    * replay detection is by BATCH id, so compaction can bump the manifest
    * version without masking the next batch) followed by one
    * `<bucket> <generation>` pair per line. Atomic-rename creation means
    * existence ⇒ complete.
    */
  def readManifest(spark: SparkSession, viewDir: String): (Long, Long, Map[Int, Long]) = {
    val fs = fsOf(spark)
    val dir = new Path(viewDir)
    if (!fs.exists(dir)) return (-1L, -1L, Map.empty)
    val versions = fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toLong)
    if (versions.isEmpty) return (-1L, -1L, Map.empty)
    val v = versions.max
    val in = fs.open(new Path(s"$viewDir/manifest-$v"))
    val content = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val lines = content.linesIterator.filter(_.nonEmpty).toSeq
    val lastBatch = lines.headOption.filter(_.startsWith("batch "))
      .map(_.stripPrefix("batch ").toLong).getOrElse(-1L)
    val mapping = lines.filterNot(_.startsWith("batch ")).map { line =>
      val Array(b, g) = line.split(" ")
      b.toInt -> g.toLong
    }.toMap
    (v, lastBatch, mapping)
  }

  /** Serialize + publish a manifest through the chosen [[ManifestCommitter]]
    * (rename by default; conditional PUT for S3-shaped stores — see the
    * trait's scaladoc for the durability story). Returns the committer's
    * verdict: false = lost race, the caller must NOT treat its generation
    * as published.
    */
  private def writeManifest(spark: SparkSession, viewDir: String, version: Long,
                            lastBatch: Long, mapping: Map[Int, Long],
                            committer: ManifestCommitter): Boolean = {
    val content = (s"batch $lastBatch" +:
      mapping.toSeq.sorted.map { case (b, g) => s"$b $g" }).mkString("\n")
    committer.commit(fsOf(spark), viewDir, version, content)
  }

  /** Drop generations no manifest-current bucket references, and manifests
    * older than the current one (metadata-only deletes; crash-safe — GC'd
    * state is unreachable from the latest manifest by construction).
    */
  private def gc(spark: SparkSession, viewDir: String, version: Long,
                 mapping: Map[Int, Long]): Unit = {
    val fs = fsOf(spark)
    val referenced = mapping.values.toSet
    val dataDir = new Path(s"$viewDir/data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("g="))
        .filter { s =>
          val g = s.getPath.getName.stripPrefix("g=").toLong
          g < version && !referenced.contains(g)
        }
        .foreach(s => fs.delete(s.getPath, true))
    }
    fs.listStatus(new Path(viewDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && n.stripPrefix("manifest-").toLong < version)
      .foreach(n => fs.delete(new Path(s"$viewDir/$n"), false))
  }

  /** The current view as defined by the newest manifest: per distinct
    * generation, one pruned read of exactly the buckets mapped to it
    * (≤ numBuckets reads total, usually a handful after GC+compaction).
    */
  def readView(spark: SparkSession, viewDir: String): DataFrame = {
    val (_, _, mapping) = readManifest(spark, viewDir)
    val byGen = mapping.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    byGen.map { case (g, buckets) =>
      spark.read.parquet(s"$viewDir/data/g=$g")
        .where(col("bucket").isin(buckets.map(Int.box): _*))
    }.reduceOption(_.unionByName(_))
      .getOrElse(spark.emptyDataFrame)
  }

  /** [[readView]] with a schema-stable empty result: a store that has never
    * committed a generation has no schema on disk, so readView degrades to a
    * zero-column frame and breaks downstream selects. `prototype` is any
    * frame with the view's serve-side columns (callers pass the batch
    * pipeline that feeds the merge); only its schema is used.
    */
  def readViewOr(spark: SparkSession, viewDir: String, prototype: DataFrame): DataFrame = {
    val v = readView(spark, viewDir)
    if (v.schema.isEmpty) prototype.limit(0) else v
  }

  /** Merge a batch of trust-detail rows (hash, user, can_send_to, limit)
    * into the stored view at `viewDir`, writing only the buckets the
    * batch's keys fall in and committing via manifest rename.
    *
    * `version` must increase per batch (foreachBatch's batchId); the
    * default −1 auto-assigns latest+1 for batch/backfill callers. A replay
    * of an already-committed version is a detected no-op.
    */
  def mergeTrustBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                      numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                      maxGenerations: Int = DefaultMaxGenerations,
                      committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir,
      graft.operators.CirclesViews.currentTrust(batch), "user",
      (existing, delta) => {
        val e = existing.select(
          col("user"), col("can_send_to"),
          struct(col("last_change"), col("limit")).as("st_a"),
          col("history_count").as("hc_a"))
        val d = delta.select(
          col("user"), col("can_send_to"),
          struct(col("last_change"), col("limit")).as("st_b"),
          col("history_count").as("hc_b"))
        e.join(d, Seq("user", "can_send_to"), "full_outer")
          .select(
            col("user"), col("can_send_to"),
            greatest(col("st_a"), col("st_b")).getField("limit").as("limit"),
            (coalesce(col("hc_a"), lit(0L)) + coalesce(col("hc_b"), lit(0L))).as("history_count"),
            greatest(col("st_a"), col("st_b")).getField("last_change").as("last_change"))
      },
      numBuckets, version, maxGenerations, committer)

  /** SCD-2 trust-history maintenance: the stored view is the UNCOLLAPSED
    * interval table ([[graft.operators.CirclesViews.scdEventIntervals]] —
    * every change event retained; (limit, valid_from, hash) IS the
    * original event). A batch of change events (user, can_send_to, limit,
    * number, hash) merges by replaying the touched buckets' stored rows
    * as events, unioned with the delta, through the same window core.
    * Because the stored form preserves the full event set, incremental ==
    * one-shot under ANY batch slicing including out-of-order arrival
    * (spec'd); the COLLAPSED presentation form would not survive this —
    * a discarded re-state (50@1, 50@3) can't be re-split when 80@2
    * arrives late — which is why collapse happens only at serve time
    * ([[readTrustScdView]]). The as-of range consumption
    * (`CirclesViews.trustAtBlock`) answers identically on the raw stored
    * intervals, no collapse needed. Rewrite cost is O(touched edges'
    * histories), not O(view).
    */
  def mergeTrustScdBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                         numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                         maxGenerations: Int = DefaultMaxGenerations,
                         committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir,
      graft.operators.CirclesViews.scdEventIntervals(
        batch.select("user", "can_send_to", "limit", "number", "hash")), "user",
      (existing, delta) => {
        def asEvents(df: DataFrame): DataFrame = df
          .select(col("user"), col("can_send_to"), col("limit"),
            col("valid_from").as("number"), col("hash"))
        graft.operators.CirclesViews.scdEventIntervals(
          asEvents(existing).unionByName(asEvents(delta)))
      },
      numBuckets, version, maxGenerations, committer)

  /** Serve the maintained SCD store in the batch view's collapsed form:
    * replay stored intervals as events through the presentation collapse.
    * One window shuffle over the (bucket-pruned) read slice; consumers
    * that only need as-of answers skip this and range-filter the raw
    * store directly.
    */
  def readTrustScdView(spark: SparkSession, viewDir: String): DataFrame = {
    val stored = readView(spark, viewDir)
    val events =
      if (stored.schema.isEmpty) {
        // never-committed store (all merge batches were empty): readView
        // degrades to a zero-column frame — rebuild the serve schema so
        // downstream selects stay total (the readViewOr contract, without
        // needing a caller-supplied prototype)
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("user", StringType), StructField("can_send_to", StringType),
            StructField("limit", LongType), StructField("number", LongType),
            StructField("hash", StringType))))
      } else stored.select(col("user"), col("can_send_to"), col("limit"),
        col("valid_from").as("number"), col("hash"))
    graft.operators.CirclesViews.scdFromEvents(events)
  }

  /** SCD-store compaction under BOUNDED LATENESS: the store keeps
    * re-states so late events can split them ([[mergeTrustScdBatch]]) —
    * but a re-state whose interval opens below `safeBelow` (the
    * reorg-safe frontier; the reference re-checks only the last ~16-18
    * blocks, and everything below the last-valid watermark is final) can
    * never be split any more, so the collapse that is unsound in general
    * is sound there. One full rewrite (O(view), like [[compact]]) drops
    * exactly the finalized re-states; rows at or above the horizon stay
    * uncollapsed, keeping later out-of-order merges exact. The SERVED
    * view is invariant under this compaction (serve-side collapse would
    * have dropped the same rows — spec'd); what shrinks is the store.
    * A late event below the horizon is out of contract — the reorg path
    * (delete + re-import) owns those, exactly as in the reference.
    */
  def compactTrustScdStore(spark: SparkSession, viewDir: String, safeBelow: Long,
                           committer: ManifestCommitter = RenameCommitter): Unit = {
    val (curVer, lastBatch, mapping) = readManifest(spark, viewDir)
    if (mapping.isEmpty) return
    val v = curVer + 1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user", "can_send_to").orderBy("number", "hash")
    val kept = readView(spark, viewDir)
      .select(col("user"), col("can_send_to"), col("limit"),
        col("valid_from").as("number"), col("hash"), col("bucket"))
      .withColumn("prev_limit", lag(col("limit"), 1).over(w))
      .where(col("prev_limit").isNull || col("prev_limit") =!= col("limit") ||
             col("number") >= safeBelow)
      .withColumn("valid_to", lead(col("number"), 1).over(w))
      .select(col("user"), col("can_send_to"), col("limit"),
        col("number").as("valid_from"), col("valid_to"), col("hash"), col("bucket"))
    kept.repartition(col("bucket")).write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$viewDir/data/g=$v")
    val newMapping = mapping.keys.map(_ -> v).toMap
    if (writeManifest(spark, viewDir, v, lastBatch, newMapping, committer))
      gc(spark, viewDir, v, newMapping)
  }

  /** Streaming twin: change events → maintained SCD store. */
  def startTrustScdView(trustEvents: DataFrame, viewDir: String,
                        checkpointDir: String,
                        numBuckets: Int = DefaultNumBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery =
    trustEvents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeTrustScdBatch(batch.sparkSession, batch, viewDir, numBuckets,
          version = batchId)
      }
      .start()

  /** Balances-view maintenance (the cache_crc_balances_by_safe_and_token
    * family): per-(safe, token) RUNNING DECIMAL sums over the transfer
    * stream, (hash, token, from, to, value) per row. Addition is
    * associative and the stored form stays decimal(38,4), so ANY
    * micro-batch slicing converges bit-exactly to the batch recompute —
    * a double store would drift by merge order. Serve-side casts to
    * double exactly like the batch view (spec-asserted equal).
    */
  def mergeBalancesBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                         numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                         maxGenerations: Int = DefaultMaxGenerations,
                         committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir, balancesDelta(batch), "safe_address",
      (existing, d) => {
        val e = existing.select(col("safe_address"), col("token"),
          col("balance").as("bal_a"), col("last_change_at").as("lc_a"))
        val dd = d.select(col("safe_address"), col("token"),
          col("balance").as("bal_b"), col("last_change_at").as("lc_b"))
        e.join(dd, Seq("safe_address", "token"), "full_outer")
          .select(col("safe_address"), col("token"),
            (coalesce(col("bal_a"), lit(0).cast("decimal(38,4)")) +
              coalesce(col("bal_b"), lit(0).cast("decimal(38,4)")))
              .cast("decimal(38,4)").as("balance"), // stable schema across generations
            greatest(col("lc_a"), col("lc_b")).as("last_change_at"))
      },
      numBuckets, version, maxGenerations, committer)

  /** The per-batch (safe, token) delta [[mergeBalancesBatch]] folds into the
    * store — also the serve-side schema prototype for [[readViewOr]].
    */
  def balancesDelta(batch: DataFrame): DataFrame =
    batch.select(explode(array(
        struct(col("to").as("safe_address"), col("token"), col("value").as("delta"), col("hash")),
        struct(col("from").as("safe_address"), col("token"), (-col("value")).as("delta"), col("hash"))
      )).as("m")).select("m.*")
      .groupBy("safe_address", "token")
      .agg(sum(col("delta").cast("decimal(18,4)")).cast("decimal(38,4)").as("balance"),
        max("hash").as("last_change_at"))

  /** The shared manifest-committed merge flow (crash/replay/GC/compaction
    * semantics documented on the object): `delta` arrives reduced per key
    * with no bucket column; `mergeFn(existing, delta)` combines the
    * touched slice of the stored view with it. `bucketKey` must stay
    * fixed for the view directory's lifetime.
    */
  private def mergeBatchGeneric(spark: SparkSession, viewDir: String,
      delta: DataFrame, bucketKey: String,
      mergeFn: (DataFrame, DataFrame) => DataFrame,
      numBuckets: Int, version: Long, maxGenerations: Int,
      committer: ManifestCommitter = RenameCommitter): Unit = {
    val (curVer, lastBatch, mapping) = readManifest(spark, viewDir)
    val batchId = if (version >= 0) version else lastBatch + 1
    if (lastBatch >= batchId) return // replay of a committed batch: already merged
    val v = curVer + 1 // generation AND manifest version for this merge
    def bucketed(df: DataFrame): DataFrame = df.withColumn("bucket",
      pmod(xxhash64(col(bucketKey)), lit(numBuckets.toLong)).cast("int"))
    val deltaB = bucketed(delta)
    // the touched-bucket set is bounded by numBuckets — a small, safe collect
    val touched = deltaB.select("bucket").distinct().collect().map(_.getInt(0))
    if (touched.isEmpty) return
    val existingTouched = touched.toSeq
      .flatMap(b => mapping.get(b).map(g => (g, b)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .map { case (g, buckets) =>
        spark.read.parquet(s"$viewDir/data/g=$g")
          .where(col("bucket").isin(buckets.map(Int.box): _*))
      }
      .reduceOption(_.unionByName(_))
    val merged = existingTouched match {
      case None => deltaB
      case Some(existing) =>
        bucketed(mergeFn(existing.drop("bucket"), delta))
    }
    // write the new generation (invisible until the manifest names it) …
    // repartition by bucket first: without it every shuffle task writes a
    // sliver of every touched bucket (tasks × buckets tiny files per
    // generation — the small-files problem that kills listing/GC/read at
    // scale); with it each bucket is exactly one file
    merged.repartition(col("bucket")).write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$viewDir/data/g=$v")
    // … then commit: every touched bucket now lives in generation v
    val newMapping = mapping ++ touched.map(_ -> v)
    if (!writeManifest(spark, viewDir, v, batchId, newMapping, committer)) {
      // Lost race: another attempt (a zombie retry of this same batch, or
      // a stale-listing replay) already published version v. Under the
      // single-writer assumption the winner merged the SAME batch into the
      // same generation, so this is the replay no-op: do NOT delete g=v
      // (the winner's manifest references it) and do NOT gc/compact (the
      // winner did). The next invocation re-reads the manifest and the
      // lastBatch check above short-circuits.
      return
    }
    gc(spark, viewDir, v, newMapping)
    // bound read fragmentation: a reader unions one pruned scan per
    // distinct generation, so fold the view back into a single generation
    // once the mapping spreads too far
    if (newMapping.values.toSet.size > maxGenerations) compact(spark, viewDir)
  }

  val DefaultMaxGenerations = 8

  /** Right-to-erasure over a stored state view: drop every row whose
    * `bucketKey` is in `keys`, rewriting ONLY the buckets those keys hash
    * to — O(deletion set), not O(view). The reference serves user data
    * out of Postgres where DELETE is native; an immutable bucketed store
    * needs this explicit rewrite path, and at 100 TB rewriting the whole
    * view for a handful of subjects is not an option.
    *
    * Mechanics mirror a merge: the filtered buckets land in a fresh
    * generation that stays invisible until the manifest names it, so a
    * crash mid-rewrite leaves the old state served; a lost manifest race
    * leaves the winner's state intact (the orphan generation is GC'd by
    * the next successful commit). Untouched buckets keep their existing
    * generation pointers — their files are never read or rewritten
    * (spec-asserted). A bucket whose rows are ALL deleted leaves the
    * mapping entirely. The batch header carries over, so replay detection
    * of the next data batch is unaffected.
    *
    * Returns the number of rows deleted (the audit-trail number a GDPR
    * workflow records).
    */
  def deleteKeys(spark: SparkSession, viewDir: String, bucketKey: String,
                 keys: Seq[String], numBuckets: Int = DefaultNumBuckets,
                 committer: ManifestCommitter = RenameCommitter): Long = {
    import spark.implicits._
    val (curVer, lastBatch, mapping) = readManifest(spark, viewDir)
    if (mapping.isEmpty || keys.isEmpty) return 0L
    // bucket of each key via the SAME hash the merge path uses (a
    // driver-side reimplementation could drift); keys are a bounded
    // deletion request, so this collect is deletion-set-sized
    val touched = keys.toDF("k")
      .select(pmod(xxhash64(col("k")), lit(numBuckets.toLong)).cast("int").as("b"))
      .distinct().as[Int].collect().toSeq
      .filter(mapping.contains)
    if (touched.isEmpty) return 0L
    val existing = touched
      .map(b => (mapping(b), b))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .map { case (g, buckets) =>
        spark.read.parquet(s"$viewDir/data/g=$g")
          .where(col("bucket").isin(buckets.map(Int.box): _*))
      }
      .reduce(_.unionByName(_))
      .persist() // three actions below (deleted count, survivors, write)
    try {
      val hit = col(bucketKey).isInCollection(keys)
      val deleted = existing.where(hit).count()
      if (deleted == 0L) return 0L
      val remaining = existing.where(!hit)
      // buckets with survivors get rewritten into g=v; fully-erased
      // buckets leave the mapping (an empty parquet partition would
      // otherwise make the generation unreadable)
      val survivorBuckets =
        remaining.select("bucket").distinct().as[Int].collect().toSeq
      val v = curVer + 1
      if (survivorBuckets.nonEmpty) {
        remaining.repartition(col("bucket")) // one file per bucket
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$viewDir/data/g=$v")
      }
      val newMapping =
        (mapping -- touched) ++ survivorBuckets.map(_ -> v)
      if (!writeManifest(spark, viewDir, v, lastBatch, newMapping, committer))
        return 0L // lost race: nothing published from this attempt
      gc(spark, viewDir, v, newMapping)
      deleted
    } finally existing.unpersist()
  }

  /** Fold every bucket into ONE fresh generation and commit a manifest
    * mapping all of them to it — an O(view) rewrite that resets
    * [[readView]]'s per-generation union to a single pruned scan.
    * Crash-safe by the same mechanism as a merge: the rewrite is invisible
    * until the manifest rename, and the batch header is carried over so
    * replay detection is unaffected.
    */
  def compact(spark: SparkSession, viewDir: String,
              committer: ManifestCommitter = RenameCommitter): Unit = {
    val (curVer, lastBatch, mapping) = readManifest(spark, viewDir)
    if (mapping.isEmpty || mapping.values.toSet.size <= 1) return
    val v = curVer + 1
    readView(spark, viewDir)
      .repartition(col("bucket")) // one file per bucket, see mergeBatchGeneric
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$viewDir/data/g=$v")
    val newMapping = mapping.keys.map(_ -> v).toMap
    if (writeManifest(spark, viewDir, v, lastBatch, newMapping, committer))
      gc(spark, viewDir, v, newMapping)
  }

  def startTrustView(trustDetails: DataFrame, viewDir: String, checkpointDir: String,
                     numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    trustDetails.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeTrustBatch(batch.sparkSession, batch, viewDir, numBuckets, batchId)
        ()
      }
      .start()

  def startBalancesView(transfers: DataFrame, viewDir: String, checkpointDir: String,
                        numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    transfers.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBalancesBatch(batch.sparkSession, batch, viewDir, numBuckets, batchId)
        ()
      }
      .start()

  /** Incremental maintenance of the HLL sketch table
    * ([[graft.operators.Analytics.hllSketchTable]]): each micro-batch's
    * per-group sketches fold into the stored view by `hll_union` —
    * sketch-union is associative/commutative like the balances sum, so any
    * micro-batch slicing converges to the batch build (estimates equal;
    * ApproxAggSpec pins it). Buckets key on the FIRST groupBy column.
    *
    * This is the distinct-count dashboard at 100 TB: the store holds one
    * fixed-size sketch per finest group, readers union to any coarser
    * grouping ([[graft.operators.Analytics.distinctFromSketches]]), and
    * ingest touches only the buckets the batch's groups fall in.
    */
  def mergeSketchesBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                         keyCol: String, byCols: Seq[String], lgK: Int = 12,
                         numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                         maxGenerations: Int = DefaultMaxGenerations,
                         committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir,
      graft.operators.Analytics.hllSketchTable(batch, keyCol, byCols, lgK),
      byCols.head,
      (existing, delta) => {
        val e = existing.select(byCols.map(col) :+ col("sketch").as("sk_a")
          :+ col("n_rows").as("nr_a"): _*)
        val d = delta.select(byCols.map(col) :+ col("sketch").as("sk_b")
          :+ col("n_rows").as("nr_b"): _*)
        e.join(d, byCols, "full_outer")
          .select(byCols.map(col) :+
            (when(col("sk_a").isNull, col("sk_b"))
              .when(col("sk_b").isNull, col("sk_a"))
              .otherwise(hll_union(col("sk_a"), col("sk_b")))).as("sketch") :+
            (coalesce(col("nr_a"), lit(0L)) + coalesce(col("nr_b"), lit(0L))).as("n_rows"): _*)
      },
      numBuckets, version, maxGenerations, committer)

  def startSketchView(events: DataFrame, viewDir: String, checkpointDir: String,
                      keyCol: String, byCols: Seq[String], lgK: Int = 12,
                      numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeSketchesBatch(batch.sparkSession, batch, viewDir, keyCol, byCols,
          lgK, numBuckets, batchId)
        ()
      }
      .start()

  /** Incremental maintenance of the Count-Min frequency sketch table
    * ([[graft.operators.Analytics.freqSketchTable]]): each micro-batch's
    * per-group sketches fold into the stored view by element-wise sum
    * ([[graft.functions.CmsOps.cmsUnion2]]) — an EXACT commutative monoid,
    * so unlike HLL's approximate convergence, any micro-batch slicing
    * yields a byte-identical artifact (CmsOpsSpec pins it). Buckets key on
    * the FIRST groupBy column, like the HLL store.
    */
  def mergeFreqSketchesBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                             itemCol: String, byCols: Seq[String],
                             depth: Int = graft.functions.CmsOps.DefaultDepth,
                             width: Int = graft.functions.CmsOps.DefaultWidth,
                             numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                             maxGenerations: Int = DefaultMaxGenerations,
                             committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir,
      graft.operators.Analytics.freqSketchTable(batch, itemCol, byCols, depth, width),
      byCols.head,
      (existing, delta) => {
        val e = existing.select(byCols.map(col) :+ col("sketch").as("sk_a")
          :+ col("n_rows").as("nr_a"): _*)
        val d = delta.select(byCols.map(col) :+ col("sketch").as("sk_b")
          :+ col("n_rows").as("nr_b"): _*)
        e.join(d, byCols, "full_outer")
          .select(byCols.map(col) :+
            (when(col("sk_a").isNull, col("sk_b"))
              .when(col("sk_b").isNull, col("sk_a"))
              .otherwise(graft.functions.CmsOps.cmsUnion2(col("sk_a"), col("sk_b")))).as("sketch") :+
            (coalesce(col("nr_a"), lit(0L)) + coalesce(col("nr_b"), lit(0L))).as("n_rows"): _*)
      },
      numBuckets, version, maxGenerations, committer)

  def startFreqSketchView(items: DataFrame, viewDir: String, checkpointDir: String,
                          itemCol: String, byCols: Seq[String],
                          depth: Int = graft.functions.CmsOps.DefaultDepth,
                          width: Int = graft.functions.CmsOps.DefaultWidth,
                          numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    items.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeFreqSketchesBatch(batch.sparkSession, batch, viewDir, itemCol, byCols,
          depth, width, numBuckets, batchId)
        ()
      }
      .start()

  /** Per-(event_type, day) COUNT store — the simplest additive instance of
    * the manifest-merge family, maintaining the frame the trending/
    * per-day dashboards window over ([[graft.operators.Behavior
    * .trendingFromCounts]]) so serving never rescans raw events. Merge is
    * exact long addition per (type, day) key — commutative/associative,
    * so any micro-batch slicing converges to the one-shot aggregate
    * bit-for-bit. Bucket key = event_type (the window's partition key:
    * a served read feeds the window without re-shuffling when bucket
    * pruning applies).
    */
  def dayCountsDelta(batch: DataFrame): DataFrame =
    batch.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))

  def mergeDayCountsBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                          numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                          maxGenerations: Int = DefaultMaxGenerations,
                          committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir, dayCountsDelta(batch), "event_type",
      (existing, d) => {
        val e = existing.select(col("event_type"), col("day"), col("n").as("n_a"))
        val dd = d.select(col("event_type"), col("day"), col("n").as("n_b"))
        e.join(dd, Seq("event_type", "day"), "full_outer")
          .select(col("event_type"), col("day"),
            (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n"))
      },
      numBuckets, version, maxGenerations, committer)

  def startDayCountsView(events: DataFrame, viewDir: String, checkpointDir: String,
                         numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeDayCountsBatch(batch.sparkSession, batch, viewDir, numBuckets, batchId)
        ()
      }
      .start()

  /** Per-customer RFM ROLLUP store — the maintained moments behind
    * [[graft.operators.Behavior.rfmSegments]]'s quintile scoring, so the
    * segmentation never rescans order history: each batch folds
    * (greatest recency, long-added frequency, decimal-added monetary)
    * per customer. All three merges are commutative/associative, so any
    * micro-batch slicing converges to the one-shot rollup bit-for-bit
    * (monetary as exact decimal(38,4) — the balances-instance rule).
    * Bucket key = custkey (the scoring reads per-customer rows).
    */
  def rfmRollupDelta(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey").as("custkey"))
      .agg(max(unix_micros(col("o_orderdate").cast("timestamp"))).as("recency_us"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("decimal(38,4)").as("monetary_d"))

  def mergeRfmRollupBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                          numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                          maxGenerations: Int = DefaultMaxGenerations,
                          committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir, rfmRollupDelta(batch), "custkey",
      (existing, d) => {
        val e = existing.select(col("custkey"), col("recency_us").as("r_a"),
          col("frequency").as("f_a"), col("monetary_d").as("m_a"))
        val dd = d.select(col("custkey"), col("recency_us").as("r_b"),
          col("frequency").as("f_b"), col("monetary_d").as("m_b"))
        e.join(dd, Seq("custkey"), "full_outer")
          .select(col("custkey"),
            greatest(col("r_a"), col("r_b")).as("recency_us"),
            (coalesce(col("f_a"), lit(0L)) + coalesce(col("f_b"), lit(0L)))
              .as("frequency"),
            (coalesce(col("m_a"), lit(0).cast("decimal(38,4)")) +
              coalesce(col("m_b"), lit(0).cast("decimal(38,4)")))
              .cast("decimal(38,4)").as("monetary_d"))
      },
      numBuckets, version, maxGenerations, committer)

  def startRfmRollupView(orders: DataFrame, viewDir: String, checkpointDir: String,
                         numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    orders.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeRfmRollupBatch(batch.sparkSession, batch, viewDir, numBuckets, batchId)
        ()
      }
      .start()

  /** SEEN-HASH dedup store — incremental cross-run exact dedup, the shape
    * a 100 TB crawl pipeline actually needs: every ingest batch must be
    * deduped against ALL previously ingested content, not just a
    * watermark window (which is the deliberate bound of
    * [[CorpusPipeline.dedupKept]]'s `dropDuplicatesWithinWatermark`
    * state). The store holds one 8-byte xxhash64 per distinct content
    * hash ever seen — O(corpus) state, but ON DISK, hash-bucketed, and a
    * merge touches only the buckets the batch's hashes fall in (the
    * manifest-generation mechanics shared with every other view here:
    * torn writes invisible, committed-version replays no-ops). Merge is
    * SET UNION — associative, commutative, idempotent — so any
    * micro-batch slicing converges to the batch build exactly.
    *
    * `batch` must carry `hashCol` (callers hash text with the same
    * xxhash64 the gate uses — [[graft.operators.Dedup.exactByHash]]'s
    * key; 64-bit collisions are the accepted trade of that twin, proven
    * result-identical to text keys on real corpora by its oracle row).
    */
  def mergeSeenHashesBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                           hashCol: String = "h",
                           numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                           maxGenerations: Int = DefaultMaxGenerations,
                           committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir,
      batch.select(col(hashCol).as("h")).distinct(), "h",
      (existing, delta) =>
        existing.select("h").unionByName(delta.select("h")).distinct(),
      numBuckets, version, maxGenerations, committer)

  def startSeenHashView(hashes: DataFrame, viewDir: String, checkpointDir: String,
                        hashCol: String = "h",
                        numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    hashes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeSeenHashesBatch(batch.sparkSession, batch, viewDir, hashCol,
          numBuckets, batchId)
        ()
      }
      .start()

  /** The serving gate over a [[mergeSeenHashesBatch]] store: rows of
    * `docs` whose `textCol` hash is NOT in the store, one row per distinct
    * new hash (min `idCol` — [[graft.operators.Dedup.exact]]'s keep rule),
    * i.e. "which of these candidate documents are genuinely new".
    *
    * Scale shape: candidates partial-agg on the 8-byte hash (within-batch
    * dedup collapses map-side), then ONE anti-join against the store —
    * both sides keyed on the hash. ([[readView]] prunes each generation
    * read to its mapped buckets; candidate-driven bucket pruning would buy
    * nothing here — uniform hashes touch every bucket for any non-tiny
    * batch.) Text never shuffles — only (hash, id) pairs.
    */
  def newDocsAgainstSeen(docs: DataFrame, seen: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame =
    docs.select(xxhash64(col(textCol)).as("_h"), col(idCol))
      .groupBy("_h").agg(min(col(idCol)).as(idCol))
      .join(seen.select(col("h").as("_h")), Seq("_h"), "left_anti")
      .select(idCol)

  /** NEAR-dup twin of the seen-hash store: the stored set holds LSH BAND
    * hashes ([[graft.operators.Dedup.bandHashKeys]] — numBands longs per
    * doc ever ingested) instead of content hashes, so the gate can answer
    * "is this doc a NEAR duplicate of anything in the corpus's entire
    * history" — the state neither the watermark-bounded streaming dedup
    * nor the exact seen-hash store holds. Identical docs collide on every
    * band (the exact-dup case is subsumed); near-identical docs collide
    * on most bands (the LSH curve: P[≥1 collision] = 1−(1−s^r)^b for
    * signature similarity s). Same store mechanics as
    * [[mergeSeenHashesBatch]] (it IS that store — set union of longs,
    * bucketed, manifest-committed), so slicing-invariance and replay
    * no-ops are inherited.
    */
  def mergeBandHashesBatch(spark: SparkSession, batchDocs: DataFrame, viewDir: String,
                           numHashes: Int = 32, rowsPerBand: Int = 2,
                           numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                           maxGenerations: Int = DefaultMaxGenerations,
                           committer: ManifestCommitter = RenameCommitter): Unit =
    mergeSeenHashesBatch(spark,
      graft.operators.Dedup.bandHashKeys(batchDocs, numHashes, rowsPerBand).select("h"),
      viewDir, "h", numBuckets, version, maxGenerations, committer)

  def startBandHashView(docs: DataFrame, viewDir: String, checkpointDir: String,
                        numHashes: Int = 32, rowsPerBand: Int = 2,
                        numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBandHashesBatch(batch.sparkSession, batch, viewDir, numHashes, rowsPerBand,
          numBuckets, batchId)
        ()
      }
      .start()

  /** The serving gate over a [[mergeBandHashesBatch]] store: every doc in
    * `docs` verdicted (doc_id, maybe_near_dup) — flagged iff ANY of its
    * band hashes is already in the store. A probabilistic gate by design
    * (like [[graft.functions.BloomOps]]' contamination gate): no false
    * negatives for exact duplicates of folded content (all bands match),
    * near-dups caught at the LSH collision rate, rare false positives
    * from band-hash collisions — the standard crawl-ingest trade where
    * flagged docs go to a verification queue, not straight to /dev/null.
    *
    * Scale shape: docs expand to numBands (doc_id, hash) longs map-side,
    * ONE semi-join against the store, partial-agg distinct back to doc
    * ids; text never shuffles.
    */
  def nearDupAgainstSeen(docs: DataFrame, seen: DataFrame,
                         numHashes: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    val flagged = graft.operators.Dedup.bandHashKeys(docs, numHashes, rowsPerBand)
      .join(seen.select(col("h")), Seq("h"), "left_semi")
      .select("doc_id").distinct().withColumn("_hit", lit(true))
    docs.select(col("doc_id"))
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("_hit"), lit(false)).as("maybe_near_dup"))
  }

  /** Quantile twin of [[mergeSketchesBatch]]: per-group bottom-k value
    * sketches (functions.QuantileSketchOps) folded into the manifest store
    * by pairwise union. Bottom-k union is an EXACT semilattice — any
    * micro-batch slicing converges to the byte-identical artifact a batch
    * build produces (stronger than the HLL path's estimate-level
    * convergence; ViewMaintenanceSpec asserts byte equality).
    */
  def mergeQuantileSketchesBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                                 keyCol: String, valueCol: String, byCols: Seq[String],
                                 k: Int = 512,
                                 numBuckets: Int = DefaultNumBuckets, version: Long = -1L,
                                 maxGenerations: Int = DefaultMaxGenerations,
                                 committer: ManifestCommitter = RenameCommitter): Unit =
    mergeBatchGeneric(spark, viewDir,
      graft.operators.Analytics.quantileSketchTable(batch, keyCol, valueCol, byCols, k),
      byCols.head,
      (existing, delta) => {
        val e = existing.select(byCols.map(col) :+ col("sketch").as("sk_a")
          :+ col("n_rows").as("nr_a"): _*)
        val d = delta.select(byCols.map(col) :+ col("sketch").as("sk_b")
          :+ col("n_rows").as("nr_b"): _*)
        e.join(d, byCols, "full_outer")
          .select(byCols.map(col) :+
            (when(col("sk_a").isNull, col("sk_b"))
              .when(col("sk_b").isNull, col("sk_a"))
              .otherwise(graft.functions.QuantileSketchOps.sketchUnion2(
                col("sk_a"), col("sk_b"), k))).as("sketch") :+
            (coalesce(col("nr_a"), lit(0L)) + coalesce(col("nr_b"), lit(0L))).as("n_rows"): _*)
      },
      numBuckets, version, maxGenerations, committer)

  def startQuantileSketchView(events: DataFrame, viewDir: String, checkpointDir: String,
                              keyCol: String, valueCol: String, byCols: Seq[String],
                              k: Int = 512,
                              numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeQuantileSketchesBatch(batch.sparkSession, batch, viewDir, keyCol,
          valueCol, byCols, k, numBuckets, batchId)
        ()
      }
      .start()

  // --- append-only views (the timeline / ledger family) ------------------

  /** Idempotent append for APPEND-ONLY derived views: the batch's rows
    * land in partition `b=<batchId>` via dynamic partition overwrite, so a
    * replayed batch overwrites ITSELF — at-least-once foreachBatch
    * delivery yields exactly-once content with no merge, no manifest, and
    * O(batch) work (no other batch's files are read or rewritten). Rows of
    * a final block never change, which is what makes the timeline/ledger
    * views append-only in the reference too.
    */
  def appendBatch(batch: DataFrame, viewDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try batch.withColumn("b", lit(batchId))
      .write.mode("overwrite").partitionBy("b").parquet(viewDir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  def readAppendView(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(viewDir).drop("b")

  /** The timeline rows ONE receipts micro-batch contributes: the batch's
    * own new signups feed the one-time CrcSignup self rows, while every
    * participant leg joins the FULL maintained `registry` (a
    * slowly-changing dimension, re-read per batch — late signups affect
    * only future batches, exactly like evaluating the catalog view
    * incrementally). Grouping inside the legs is per transaction hash and
    * a receipt's logs arrive in one row, so batch slicing can't split a
    * leg's group.
    */
  def timelineOfBatch(receipts: DataFrame, registry: DataFrame): DataFrame = {
    import graft.operators.{CirclesViews, ReceiptClassifier => RC}
    def dec(c: org.apache.spark.sql.Column) =
      RC.hexLong(substring(c, 3, 64)).cast("string")
    val newSignups = CirclesViews.allSignups(
      RC.extractSignups(receipts), RC.extractOrgSignups(receipts))
    CirclesViews.safeTimeline(
      newSignups,
      RC.extractTrusts(receipts),
      RC.extractHubTransfers(receipts)
        .withColumn("value", dec(col("value_hex"))).drop("value_hex"),
      RC.extractErc20Transfers(receipts)
        .withColumn("value", dec(col("value_hex"))).drop("value_hex"),
      RC.extractEthTransfers(receipts),
      RC.extractSafeEthTransfers(receipts),
      joinRegistry = Some(registry))
  }

  /** Streaming timeline maintenance over a receipts stream. `registry`
    * is a thunk so each batch sees the registry AS OF that batch (e.g.
    * the maintained signups view).
    */
  def startTimelineView(receipts: DataFrame, registry: () => DataFrame,
                        viewDir: String, checkpointDir: String): StreamingQuery =
    receipts.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(timelineOfBatch(batch, registry()), viewDir, batchId)
        ()
      }
      .start()

  /** Streaming double-entry ledger over a transfer stream (flat rows
    * (hash, token, from, to, value)): per-batch [[CirclesViews.ledger]]
    * rows appended idempotently. Ledger grouping is per (hash, side) and
    * a tx's transfers share its receipt row, so batch slicing never
    * splits a group.
    */
  def startLedgerView(transfers: DataFrame, signups: () => DataFrame,
                      viewDir: String, checkpointDir: String): StreamingQuery =
    transfers.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(graft.operators.CirclesViews.ledger(batch, signups()), viewDir, batchId)
        ()
      }
      .start()
}
