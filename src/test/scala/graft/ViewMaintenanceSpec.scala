package graft

import graft.streaming.ViewMaintenance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

case class TrustEv(hash: String, user: String, can_send_to: String, limit: Long)

class ViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("trust view merges micro-batch deltas: latest wins, history accumulates") {
    implicit val sqlCtx = spark.sqlContext
    val viewDir = Files.createTempDirectory("graft-trustview").toString + "/view"
    val ckpt = Files.createTempDirectory("graft-trustview-ckpt").toString

    val mem = MemoryStream[TrustEv]
    val q = ViewMaintenance.startTrustView(mem.toDF(), viewDir, ckpt)

    mem.addData(
      TrustEv("0xa1", "u1", "v1", 50L),
      TrustEv("0xa2", "u2", "v1", 100L))
    q.processAllAvailable()
    val v1 = spark.read.parquet(viewDir)
      .select("user", "can_send_to", "limit", "history_count")
      .as[(String, String, Long, Long)].collect().toSet
    assert(v1 == Set(("u1", "v1", 50L, 1L), ("u2", "v1", 100L, 1L)))

    // batch 2: update u1's edge + a brand-new edge
    mem.addData(
      TrustEv("0xa3", "u1", "v1", 75L),
      TrustEv("0xa4", "u3", "v2", 10L))
    q.processAllAvailable()
    q.stop()
    val v2 = spark.read.parquet(viewDir)
      .select("user", "can_send_to", "limit", "history_count")
      .as[(String, String, Long, Long)].collect().toSet
    assert(v2 == Set(
      ("u1", "v1", 75L, 2L), // updated limit, accumulated history
      ("u2", "v1", 100L, 1L), // untouched edge preserved
      ("u3", "v2", 10L, 1L))) // new edge
  }
}
