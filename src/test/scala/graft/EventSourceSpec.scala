package graft

import graft.sources.EventSource
import org.apache.spark.sql.types._

class EventSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("block", LongType),
    StructField("hash", StringType)))

  test("json parse quarantines malformed and schema-less payloads, never throws") {
    val raw = Seq(
      (0L, """{"block": 7, "hash": "0xabc"}"""),       // clean
      (1L, """{"block": 8}"""),                          // partial: valid, hash null
      (2L, """not json at all"""),                       // malformed → quarantine
      (3L, """{"other": true}"""),                       // parses, matches nothing → quarantine
      (4L, """{"block": "not-a-number", "hash": "0x1"}""") // bad field type → field null, hash ok
    ).toDF("id", "payload")
    val r = EventSource.parseJson(raw, schema)
      .select("id", "valid", "block", "hash", "payload")
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(1), Option(x.get(2)), Option(x.get(3))))).toMap
    assert(r(0L) == ((true, Some(7L), Some("0xabc"))))
    assert(r(1L) == ((true, Some(8L), None)))
    assert(r(2L) == ((false, None, None)))
    assert(r(3L) == ((false, None, None)))
    assert(r(4L) == ((true, None, Some("0x1"))))
    // quarantined rows keep their raw payload for replay/debugging
    val quarantined = EventSource.parseJson(raw, schema)
      .where(!$"valid").select("payload").as[String].collect().toSet
    assert(quarantined == Set("not json at all", """{"other": true}"""))
  }

  test("json parse is streaming-safe (stateless map)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val q = EventSource.parseJson(
        mem.toDF().toDF("id", "payload"), schema)
      .writeStream.format("memory").queryName("jsonq").outputMode("append").start()
    mem.addData((0L, """{"block": 1, "hash": "0x0"}"""), (1L, "garbage"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("jsonq").select("id", "valid")
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(0L -> true, 1L -> false))
  }
}
