package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cost of the shared demo-receipt construction + extractor
  * legs that dozens of keys re-derive per invocation.
  * Usage: runMain graft.DevRc [sfDir]
  */
object DevRc {
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
      System.err.println(f"[devrc] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val ev = Tables.events(spark, sfDir)
    ev.count() // warmup
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("events scan only") { noop(ev) }
    time("demoReceipts") { noop(operators.ReceiptClassifier.demoReceipts(ev)) }
    time("demoReceipts again") { noop(operators.ReceiptClassifier.demoReceipts(ev)) }
    val r = operators.ReceiptClassifier.demoReceipts(ev)
    time("extractTrusts") { noop(operators.ReceiptClassifier.extractTrusts(r)) }
    time("currentTrust(extractTrusts)") {
      noop(operators.CirclesViews.currentTrust(operators.ReceiptClassifier.extractTrusts(r)))
    }
    time("demoSignups") { noop(operators.ReceiptClassifier.demoSignups(ev)) }
    // HOF-cost probes: logs passthrough vs one interpreted filter vs the
    // classify 5-subset layer
    val rr = operators.ReceiptClassifier.demoReceipts(ev)
    time("logs passthrough") { noop(rr.select(col("hash"), col("logs"))) }
    for (r <- 1 to 2) {
      time(s"one filter HOF (trust) r$r") {
        noop(rr.select(col("hash"),
          filter(col("logs"), l => operators.ReceiptClassifier.isCrcTrustLog(l))))
      }
      time(s"one filter kernel (trust) r$r") {
        noop(rr.select(col("hash"), functions.LogOps.filterLogs(col("logs"),
          operators.ReceiptClassifier.CrcTrustTopic,
          Some(operators.ReceiptClassifier.DefaultHubAddress), 3, Some((0L, 100L)))))
      }
    }
    for (r <- 1 to 2)
      time(s"classify run$r") { noop(operators.ReceiptClassifier.classify(rr)) }
    spark.stop()
  }
}
