package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING first/last-touch attribution — the live twin of
  * `operators.Behavior.touchAttribution`: per-user keyed state carries the
  * earliest and the most recent non-conversion touch; every conversion
  * event emits an attributed record the moment its micro-batch lands,
  * instead of waiting for a batch re-scan of history. The channel rollup
  * (counts + decimal value per model) is then an ordinary streaming agg
  * over this feed — state here is the per-USER part the windowed engine
  * cannot express (a touch seen in January must still credit a June
  * conversion).
  *
  * State per user = (channel, ts, event_id) for each of the two slots:
  * bounded regardless of event volume; `idleDays` reaps users silent past
  * the attribution window via event-time timeout (the watermark bounds
  * total state — the Sessionizer contract). Ordering matches the batch
  * twin exactly: events fold in (ts, event_id) order and both slots
  * compare (ts, event_id) lexicographically, so a same-microsecond
  * touch/conversion pair resolves identically to the batch window's
  * 1-PRECEDING row frame. Across batches a late touch (within the
  * watermark) still lands in the right slot; the only divergence from
  * the batch twin is a touch arriving after the conversion it should
  * have credited was already emitted — the price of streaming emission,
  * stated loudly.
  */
object Attribution {

  case class TouchState(firstCh: String, firstTsUs: Long, firstId: Long,
                        lastCh: String, lastTsUs: Long, lastId: Long)
  case class AttributedConversion(user_id: Long, event_id: Long,
                                  first_touch: String, last_touch: String,
                                  value: Double)

  def attribute(
      events: DataFrame,
      conversionType: String = "purchase",
      watermarkDelay: String = "1 hour",
      idleDays: Int = 30
  ): Dataset[AttributedConversion] = {
    val idleMs = idleDays.toLong * 86400000L
    implicit val st = Encoders.product[TouchState]
    implicit val out = Encoders.product[AttributedConversion]

    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"), unix_micros(col("ts")).as("ts_us"))

    typed
      .groupByKey(r => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroupsWithState[TouchState, AttributedConversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[org.apache.spark.sql.Row],
         state: GroupState[TouchState]) =>
          def before(ts: Long, id: Long, t: Long, i: Long): Boolean =
            ts < t || (ts == t && id < i)
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r =>
              (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
            val outB = Seq.newBuilder[AttributedConversion]
            var s = state.getOption
            var maxTs = Long.MinValue
            sorted.foreach { r =>
              val t = r.getAs[Long]("ts_us")
              val id = r.getAs[Long]("event_id")
              maxTs = math.max(maxTs, t)
              if (r.getAs[String]("event_type") == conversionType) {
                outB += AttributedConversion(userId, id,
                  s.filter(p => before(p.firstTsUs, p.firstId, t, id))
                    .map(_.firstCh).getOrElse("direct"),
                  s.filter(p => before(p.lastTsUs, p.lastId, t, id))
                    .map(_.lastCh).getOrElse("direct"),
                  r.getAs[Double]("value"))
              } else {
                val ch = r.getAs[String]("event_type")
                s = s match {
                  case None => Some(TouchState(ch, t, id, ch, t, id))
                  case Some(p) =>
                    val first =
                      if (before(t, id, p.firstTsUs, p.firstId)) (ch, t, id)
                      else (p.firstCh, p.firstTsUs, p.firstId)
                    val last =
                      if (before(p.lastTsUs, p.lastId, t, id)) (ch, t, id)
                      else (p.lastCh, p.lastTsUs, p.lastId)
                    Some(TouchState(first._1, first._2, first._3,
                      last._1, last._2, last._3))
                }
              }
            }
            s.foreach { v =>
              state.update(v)
              // reap the user once the watermark passes last activity + idle
              state.setTimeoutTimestamp(
                math.max(maxTs, v.lastTsUs) / 1000L + idleMs)
            }
            outB.result().iterator
          }
      }
  }
}
