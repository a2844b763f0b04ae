package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the Structured Streaming
  * feature class the rest of the streaming surface doesn't exercise
  * (ViewMaintenance joins stream→static registry; this joins two
  * unbounded streams). The reference's indexer never joins two live
  * streams, but its consumers do ("which hub transfer follows which
  * trust change within the hour" is the streaming twin of the timeline
  * view's cross-event reasoning); batch-side the same semantics are
  * [[graft.operators.RangeJoin.pointInInterval]] / AsOf.
  *
  * Why the shape matters: an unconstrained stream-stream join needs
  * UNBOUNDED state (every left row might match a future right row).
  * Watermarks on BOTH inputs plus a two-sided event-time range in the
  * join condition are exactly what lets Spark prove a row can never
  * match again and evict it — state is O(horizon × arrival rate), not
  * O(stream). Both conditions are structural requirements here, not
  * options (Spark rejects append-mode stream-stream joins without them).
  *
  * At scale the join is hash-partitioned on the equi-key like any batch
  * join; the interval rides as a post-shuffle residual — the same
  * cell-free shape RangeJoin documents, because the equi-key (not the
  * time axis) carries the partitioning.
  */
object StreamJoins {

  /** Events attributed to the anchor they follow: for each (key) pair,
    * emit (key, anchor_ts, event_ts) when
    * `anchor_ts <= event_ts <= anchor_ts + horizonMs`. Inner append-mode
    * join; rows later than `delay` behind the max event time seen are
    * dropped by the watermark (late-data policy, spec'd).
    *
    * Works identically on batch frames (watermarks no-op there) — the
    * parity the spec asserts.
    */
  def attributeWithin(
      events: DataFrame,
      anchors: DataFrame,
      key: String,
      horizonMs: Long,
      delay: String = "10 minutes"): DataFrame = {
    val e = events
      .select(col(key), col("ts").as("event_ts"))
      .withWatermark("event_ts", delay)
    val a = anchors
      .select(col(key).as("a_key"), col("ts").as("anchor_ts"))
      .withWatermark("anchor_ts", delay)
    e.join(a,
      col(key) === col("a_key") &&
        col("event_ts") >= col("anchor_ts") &&
        col("event_ts") <= col("anchor_ts") + expr(s"interval ${horizonMs} milliseconds"))
      .select(col(key), col("anchor_ts"), col("event_ts"))
  }
}
