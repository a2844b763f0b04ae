package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Health + throughput surface for the streaming pipeline.
  *
  * The reference exposes a /health endpoint (Persistence/HealthCheck.cs —
  * 200 iff the import loop advanced recently) and Prometheus counters for
  * blocks/tx per interval (Statistics.cs). Spark's StreamingQuery already
  * tracks the equivalents; this condenses them into one transport-agnostic
  * status row a caller can serve over HTTP/metrics.
  */
object PipelineHealth {

  case class Status(
      running: Boolean,
      healthy: Boolean,
      batchesCompleted: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      lastBatchDurationMs: Long,
      exception: Option[String])

  /** healthy == running with no exception (the reference's health check is
    * the same liveness test); throughput numbers ride along as
    * informational — bursty micro-batches make rate ratios meaningless as a
    * health gate.
    */
  def status(q: StreamingQuery, lagFactor: Double = 2.0): Status = {
    val progress = q.recentProgress.toSeq
    val last = progress.lastOption
    val inRps = last.map(_.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0)
    val procRps = last.map(_.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0)
    Status(
      running = q.isActive,
      healthy = q.isActive && q.exception.isEmpty,
      batchesCompleted = progress.size.toLong,
      inputRowsPerSecond = inRps,
      processedRowsPerSecond = procRps,
      lastBatchDurationMs = last.map(_.batchDuration).getOrElse(0L),
      exception = q.exception.map(_.getMessage))
  }
}
