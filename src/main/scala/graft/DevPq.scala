package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timings of the PQ/IVF-PQ keys at a given sfDir —
  * training (driver lloyd) vs encode/list build vs scoring.
  * Usage: runMain graft.DevPq [sfDir]
  */
object DevPq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerAll(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[devpq] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val emb = Tables.embeddings(spark, sfDir)
    emb.count() // warmup scan
    System.err.println(s"[devpq] embeddings rows = ${emb.count()}")
    val cb = time("trainCodebooks(3 iters)") {
      operators.Pq.trainCodebooks(emb.where(col("vec_id") >= 5), 64, 8, 16, 3)
    }
    time("encode (noop)") {
      operators.Pq.encode(emb, 64, cb).write.mode("overwrite").format("noop").save()
    }
    time("pqTopK full (noop)") {
      operators.Pq.pqTopK(emb, iters = 3).write.mode("overwrite").format("noop").save()
    }
    time("pqTopK again (warm)") {
      operators.Pq.pqTopK(emb, iters = 3).write.mode("overwrite").format("noop").save()
    }
    time("ivfPqResidualTopK (noop)") {
      operators.Pq.ivfPqResidualTopK(emb, iters = 3).write.mode("overwrite").format("noop").save()
    }
    time("ivfPqResidualTopK again") {
      operators.Pq.ivfPqResidualTopK(emb, iters = 3).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
