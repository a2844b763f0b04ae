package graft
import org.apache.spark.sql.SparkSession

/** Dev experiment: print Exchange/Sort/Expand/Window counts for the named
  * query keys' physical plans at sf0.001 — raw material for PlanShapeSpec's
  * exact-count guards. Not part of the driver contract.
  */
object DevPlanCount {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.registerAll(spark)
    args.foreach { key =>
      try {
        val df = SparkEntry.queries(key)(spark, sf)
        val plan = df.queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        println(s"[plan] $key exchanges=${c("Exchange")} sorts=${c("Sort \\[")} " +
          s"expands=${c("Expand")} windows=${c("Window \\[")} " +
          s"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")}")
      } catch { case e: Throwable => println(s"[plan] $key FAILED ${e.getMessage}") }
    }
    spark.stop()
  }
}
