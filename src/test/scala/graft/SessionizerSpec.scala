package graft

import graft.streaming.Sessionizer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long)

  test("built-in session_window agrees with the custom sessionizer on session starts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = graft.streaming.EventPipeline.sessionWindows(mem.toDF())
      .writeStream.format("memory").queryName("sw").outputMode("complete").start()
    mem.addData(
      Ev(0L, ts("2024-01-01 10:00:00"), 1L),
      Ev(1L, ts("2024-01-01 10:10:00"), 1L),
      Ev(2L, ts("2024-01-01 12:00:00"), 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sw").select("user_id", "session_start_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L), (1L, 2L, 1L)))
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap and emits them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = Sessionizer.sessionize(mem.toDF(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()

    mem.addData(
      Ev(0L, ts("2024-01-01 10:00:00"), 1L),
      Ev(1L, ts("2024-01-01 10:10:00"), 1L),
      // a second burst much later (> 30min gap) closes the first session...
      Ev(2L, ts("2024-01-01 12:00:00"), 1L),
      // ...and another user's lone event far ahead to push the watermark
      Ev(3L, ts("2024-01-01 15:00:00"), 2L)
    )
    q.processAllAvailable()
    // one more batch so the watermark (15:00 - 1h delay = 14:00) time-outs
    // user 1's open session (last activity 12:00 + 30min < 14:00)
    mem.addData(Ev(4L, ts("2024-01-01 15:01:00"), 2L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess")
      .select("user_id", "session_start_id", "n_events", "duration_ms")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 0L, 2L, 600000L))) // 10:00-10:10 closed by gap
    assert(got.contains((1L, 2L, 1L, 0L))) // 12:00 session closed by timeout
  }
}
