package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via flatMapGroupsWithState — the
  * engine's example of arbitrary keyed state (SURVEY §2 #15/#16), mirroring
  * the reference's live-source activity tracking.
  *
  * State per user = the open session (start id, last activity, count).
  * An event beyond the gap closes the session and emits it; event-time
  * timeout flushes sessions for users that go silent (bounded state: one
  * small struct per active user, reaped by the watermark).
  *
  * The batch twin is `operators.StateOps.sessionize` (same output shape);
  * `session_window` covers the built-in case — this operator exists for
  * semantics the built-in can't express (e.g. emitting partial session
  * updates or custom close conditions).
  */
object Sessionizer {

  case class SessionEvent(event_id: Long, user_id: Long, ts_us: Long)
  case class OpenSession(startId: Long, firstTsUs: Long, lastTsUs: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start_id: Long, n_events: Long, duration_ms: Long)

  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"
  ): Dataset[ClosedSession] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val se = Encoders.product[SessionEvent]
    implicit val cs = Encoders.product[ClosedSession]
    implicit val osEnc = Encoders.product[OpenSession]

    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id"), col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))

    typed
      .groupByKey(r => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[org.apache.spark.sql.Row], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.startId, s.n, (s.lastTsUs - s.firstTsUs) / 1000))
          } else {
            val sorted = rows.map(r => SessionEvent(
              r.getAs[Long]("event_id"), userId, r.getAs[Long]("ts_us")
            )).toSeq.sortBy(e => (e.ts_us, e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_us - s.lastTsUs <= gapUs =>
                  open = Some(s.copy(lastTsUs = e.ts_us, n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(userId, s.startId, s.n, (s.lastTsUs - s.firstTsUs) / 1000)
                  open = Some(OpenSession(e.event_id, e.ts_us, e.ts_us, 1))
                case None =>
                  open = Some(OpenSession(e.event_id, e.ts_us, e.ts_us, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the open session once the watermark passes last+gap
              state.setTimeoutTimestamp((s.lastTsUs + gapUs) / 1000)
            }
            closed.result().iterator
          }
      }
  }
}
