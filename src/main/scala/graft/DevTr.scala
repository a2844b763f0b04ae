package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q_temporal_reach phase breakdown (feeder vs loop rounds).
  * Usage: runMain graft.DevTr [sfDir]
  */
object DevTr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.registerAll(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[devtr] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val ev = Tables.events(spark, sfDir)
    ev.count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (r <- 1 to 3) {
      val edges = operators.CirclesViews.formattedView(
          SparkEntry.Demo.hubStr(operators.ReceiptClassifier.demoReceipts(ev)),
          operators.ReceiptClassifier.demoBlocks(ev))
        .select(col("from").as("src"), col("to").as("dst"),
          col("ts_us").as("ts"))
      val seeds = ev.where(col("event_type") === "signup" && col("user_id") % 17 === 0)
        .select(graft.functions.HexUtils.hexPadLower(col("user_id"), 40).as("node"))
      time(s"run$r edges noop") { noop(edges) }
      time(s"run$r seeds noop") { noop(seeds) }
      val (out, rounds) = time(s"run$r temporalReach build+loop") {
        operators.Graph.temporalReachWithRounds(edges, seeds, startTs = 0L)
      }
      System.err.println(s"[devtr] rounds=$rounds")
      time(s"run$r result noop") { noop(out) }
    }
    spark.stop()
  }
}
