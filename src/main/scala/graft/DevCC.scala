package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: round counts + phase timings of the dupClusters family at a
  * given sfDir (which dominates — pair generation or label propagation?).
  * Usage: runMain graft.DevCC [sfDir]
  */
object DevCC {
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
      System.err.println(f"[devcc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    // warmup
    try Tables.documents(spark, sfDir).count() catch { case _: Throwable => () }

    // doc near-dup pairs → clusters (q_dup_clusters shape)
    val docs = Tables.documents(spark, sfDir)
    val pairs = time("ngramJaccardPairsIndexed") {
      val p = operators.Dedup.ngramJaccardPairsIndexed(docs, threshold = 0.5,
        blockBySource = false).localCheckpoint(true)
      System.err.println(s"[devcc] pairs rows = ${p.count()}")
      p
    }
    val (cl, rounds) = time("dupClusters(doc pairs)") {
      val (c, r) = operators.Dedup.dupClustersWithRounds(pairs)
      c.write.mode("overwrite").format("noop").save(); (c, r)
    }
    System.err.println(s"[devcc] doc cluster rounds = $rounds")

    // trust edges → connected components (q_trust_components shape)
    val ev = Tables.events(spark, sfDir)
    val trusts = operators.ReceiptClassifier.extractTrusts(
      operators.ReceiptClassifier.demoReceipts(ev)).localCheckpoint(true)
    val tEdges = trusts.select(col("user").as("doc_a"), col("can_send_to").as("doc_b"))
      .where(col("doc_a") =!= col("doc_b"))
    val (_, tr) = time("dupClusters(trust edges)") {
      val (c, r) = operators.Dedup.dupClustersWithRounds(tEdges)
      c.write.mode("overwrite").format("noop").save(); (c, r)
    }
    System.err.println(s"[devcc] trust component rounds = $tr")
    spark.stop()
  }
}
