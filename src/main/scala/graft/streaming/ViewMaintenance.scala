package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental maintenance of the derived-view layer (the reference's
  * `import_from_staging` refreshes its cache_* tables inside the same
  * transaction; Spark-side, each micro-batch merges its delta into the
  * stored view).
  *
  * The stored view is hash-bucketed on the merge key: parquet partitioned by
  * `bucket = pmod(xxhash64(user), numBuckets)`. A micro-batch
  *   1. reduces to its delta (one partial-aggregable shuffle over the batch),
  *   2. reads ONLY the buckets its keys fall in (directory-level partition
  *      pruning — the untouched view is never opened),
  *   3. merges and rewrites ONLY those buckets (dynamic partition
  *      overwrite).
  * Maintenance cost is therefore O(batch + touched-buckets), independent of
  * total view size: a batch touching one key reads and rewrites one bucket.
  * `numBuckets` must stay fixed for the lifetime of a view directory (it
  * defines the layout); size it so view_size/numBuckets fits an executor.
  *
  * The trust view merges associatively: for each edge,
  *   limit        ← the side with the greater last_change wins
  *   history_count← sum of both sides
  * The streaming checkpoint guards replays at batch granularity (committed
  * batches are not re-run; an interrupted overwrite is replayed whole, and
  * rewriting a bucket from the same pre-batch state is idempotent only if
  * the failure happened before any bucket commit — a table format with
  * multi-partition atomic commit closes that window in production).
  */
object ViewMaintenance {

  val DefaultNumBuckets = 64

  private def bucketOf(numBuckets: Int) =
    pmod(xxhash64(col("user")), lit(numBuckets.toLong)).cast("int")

  /** Merge a batch of trust-detail rows (hash, user, can_send_to, limit)
    * into the stored view at `viewDir`, rewriting only the buckets the
    * batch's keys fall in.
    */
  def mergeTrustBatch(spark: SparkSession, batch: DataFrame, viewDir: String,
                      numBuckets: Int = DefaultNumBuckets): Unit = {
    val delta = graft.operators.CirclesViews.currentTrust(batch)
      .withColumn("bucket", bucketOf(numBuckets))
    // the touched-bucket set is bounded by numBuckets — a small, safe collect
    val touched = delta.select("bucket").distinct().collect().map(_.getInt(0))
    if (touched.isEmpty) return
    val existingTouched =
      try
        spark.read.parquet(viewDir) // partitioned by bucket → pruned scan
          .where(col("bucket").isin(touched.map(Int.box): _*))
      catch { case _: Throwable => spark.emptyDataFrame }
    val merged =
      if (existingTouched.isEmpty) delta
      else {
        val e = existingTouched.select(
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
          .withColumn("bucket", bucketOf(numBuckets))
      }
    // dynamic overwrite replaces exactly the bucket directories present in
    // `merged` — the touched set — and leaves every other bucket's files alone
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(viewDir)
  }

  def startTrustView(trustDetails: DataFrame, viewDir: String, checkpointDir: String,
                     numBuckets: Int = DefaultNumBuckets): StreamingQuery =
    trustDetails.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeTrustBatch(batch.sparkSession, batch, viewDir, numBuckets)
        ()
      }
      .start()
}
