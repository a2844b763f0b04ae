package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Integrity

/** The end-to-end reorg loop (`Sources/ReorgSource.cs:64` + README
  * "Reorgs"): periodically re-read the newest N keys from the authoritative
  * source, recompute each fingerprint, compare against what the table
  * stored, and on any mismatch delete everything from the OLDEST mismatched
  * key onward and re-import it from the source.
  *
  * Spark decomposition, all pieces scale-bounded by `lastN`, never the
  * table:
  *   1. stored tail fingerprints — [[Integrity.reorgFingerprints]], a
  *      sort-limit top-K (per-partition top-K then merge, no full sort);
  *   2. the authoritative rows for those SAME keys — a broadcast semi-join
  *      of the (≤ lastN)-row key set against the source;
  *   3. oldest mismatch — a ≤ lastN-row join + 1-row min aggregate
  *      (a stored key the source no longer has, or a changed fingerprint,
  *      both count as mismatched, like a vanished vs rewritten block);
  *   4. repair — [[EventPipeline.reimportFrom]] (partition-scoped truncate)
  *      then an append of the source's corrected rows, the same
  *      day-partitioned layout [[EventPipeline.startImport]] writes.
  */
object ReorgLoop {

  /** One round of the loop. Returns the oldest mismatched key after
    * repairing, or None when all fingerprints still match (the common case —
    * cost then is one top-K scan + a lastN-row compare).
    *
    * `onReorg` is the websocket-broadcast hook: the reference announces
    * [[EventPipeline.ReorgMagicHash]] so subscribers drop cached state.
    */
  def checkAndRepair(
      spark: SparkSession,
      tableDir: String,
      authoritative: DataFrame,
      lastN: Int = 16,
      onReorg: Long => Unit = _ => ()
  ): Option[Long] = {
    val stored = Integrity.reorgFingerprints(spark.read.parquet(tableDir), lastN)
    val fresh = authoritative
      .join(broadcast(stored.select("event_id")), Seq("event_id"), "left_semi")
      .select(col("event_id"), Integrity.rowFingerprint.as("fresh_fingerprint"))
    val oldestMismatch = stored
      .join(fresh, Seq("event_id"), "left_outer")
      .where(col("fresh_fingerprint").isNull || col("fresh_fingerprint") =!= col("fingerprint"))
      .agg(min("event_id").as("oldest"))
      .collect()(0)
    if (oldestMismatch.isNullAt(0)) None
    else {
      val from = oldestMismatch.getLong(0)
      EventPipeline.reimportFrom(spark, tableDir, from)
      authoritative
        .where(col("event_id") >= from)
        .withColumn("day", to_date(col("ts")))
        .write.mode("append").partitionBy("day").parquet(tableDir)
      onReorg(from)
      Some(from)
    }
  }
}
