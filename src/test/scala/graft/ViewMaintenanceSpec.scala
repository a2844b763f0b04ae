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

  test("a batch touching one key rewrites one bucket, not the view") {
    import graft.streaming.ViewMaintenance.mergeTrustBatch
    val viewDir = Files.createTempDirectory("graft-bucketed").toString + "/view"
    // seed: 32 users spread over the bucket space
    val seed = (1 to 32).map(i => TrustEv(f"0xs$i%02d", s"u$i", "v", 10L))
    mergeTrustBatch(spark, seed.toDF, viewDir, numBuckets = 16)

    def fileState(): Map[String, Long] = {
      val root = new java.io.File(viewDir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.startsWith("part-"))
        .map(f => f.getPath.stripPrefix(viewDir) -> f.lastModified()).toMap
    }
    val before = fileState()
    val buckets = before.keys.map(_.split("/")(1)).toSet
    assert(buckets.size > 1, s"seed must span several buckets, got $buckets")

    mergeTrustBatch(spark, Seq(TrustEv("0xzz", "u1", "v", 99L)).toDF, viewDir, numBuckets = 16)

    val after = fileState()
    val changedBuckets = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
      .map(_.split("/")(1))
    assert(changedBuckets.size == 1, s"expected 1 rewritten bucket, got $changedBuckets")
    // and the merge is still correct: u1 updated, everyone else intact
    val v = spark.read.parquet(viewDir)
      .select("user", "limit", "history_count")
      .as[(String, Long, Long)].collect().map { case (u, l, h) => u -> (l, h) }.toMap
    assert(v("u1") == (99L, 2L) && v("u2") == (10L, 1L) && v.size == 32)
  }
}
