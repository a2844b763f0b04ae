package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: surface codegen-compile failures for a query (Janino errors
  * make WholeStageCodegen fall back to interpreted mode SILENTLY at WARN).
  * Usage: runMain graft.DevCg <query> [sfDir]
  */
object DevCg {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q_receipt_classify")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerAll(spark)
    SparkEntry.queries(q)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    spark.stop()
  }
}
