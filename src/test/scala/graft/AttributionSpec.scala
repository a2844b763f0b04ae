package graft

import graft.streaming.Attribution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming first/last-touch attribution: cross-batch state, direct
  * backfill, and batch-twin parity on an in-order feed.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  test("conversions credit first/last touches across micro-batches; direct when none") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Attribution.attribute(mem.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    // batch 1: u1 touches click→view, no conversion yet; u2 converts bare
    mem.addData(
      Ev(0L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Ev(1L, ts("2024-01-01 11:00:00"), 1L, "view", 1.0),
      Ev(2L, ts("2024-01-01 10:30:00"), 2L, "purchase", 5.0))
    q.processAllAvailable()
    // batch 2: u1 converts — the January touches must still credit it
    mem.addData(
      Ev(3L, ts("2024-01-02 09:00:00"), 1L, "purchase", 10.0),
      // u1 converts AGAIN after another touch: last moves, first sticks
      Ev(4L, ts("2024-01-02 10:00:00"), 1L, "error", 1.0),
      Ev(5L, ts("2024-01-02 11:00:00"), 1L, "purchase", 3.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr")
      .as[(Long, Long, String, String, Double)].collect().toSet
    assert(got == Set(
      (2L, 2L, "direct", "direct", 5.0),
      (1L, 3L, "click", "view", 10.0),
      (1L, 5L, "click", "error", 3.0)))
  }

  test("in-order feed matches the batch twin's per-conversion credits") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(7)
    val types = Seq("click", "view", "error", "purchase")
    val evs = (0L until 200L).map { i =>
      Ev(i, new Timestamp(1704067200000L + i * 60000L), rng.nextInt(5).toLong,
        types(rng.nextInt(4)), (rng.nextInt(100) + 1).toDouble)
    }
    val mem = MemoryStream[Ev]
    val q = Attribution.attribute(mem.toDF())
      .writeStream.format("memory").queryName("attr2").outputMode("append").start()
    evs.grouped(50).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("attr2")
      .as[(Long, Long, String, String, Double)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    // batch twin re-derived per conversion (the operator's window logic)
    val expected = evs.groupBy(_.user_id).flatMap { case (_, ue) =>
      val sorted = ue.sortBy(e => (e.ts.getTime, e.event_id))
      sorted.zipWithIndex.collect { case (e, i) if e.event_type == "purchase" =>
        val prior = sorted.take(i).filter(_.event_type != "purchase")
        e.event_id -> ((prior.headOption.map(_.event_type).getOrElse("direct"),
          prior.lastOption.map(_.event_type).getOrElse("direct")))
      }
    }
    assert(streamed == expected)
  }
}
