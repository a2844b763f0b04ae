package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: do the r15 kernels stay inside WholeStageCodegen? */
object DevCg2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(10).select(col("id"))
    println("=== hexPad only ===")
    df.select(graft.functions.HexUtils.hexPadLower(col("id"), 40).as("a"))
      .explain("formatted")
    println("=== logs + filterLogs ===")
    val logs = array(struct(lit("0xaddr").as("address"),
      array(lit("0xt1")).as("topics"), lit("0x00").as("data")))
    df.select(logs.as("logs"))
      .select(graft.functions.LogOps.filterLogs(col("logs"), "0xt1").as("f"))
      .explain("formatted")
    println("=== demoReceipts ===")
    operators.ReceiptClassifier.demoReceipts(
      Tables.events(spark, "/root/testdata/sf0.001")).explain("formatted")
    spark.stop()
  }
}
