package graft
import org.apache.spark.sql.SparkSession

/** Dev experiment: time a subset of `SparkEntry.queries` by substring —
  * `runMain graft.DevTimer scc kcore` times every key containing an
  * argument, same harness shape as [[Bench]] (noop sink, warmup). Not part
  * of the driver contract.
  */
object DevTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.registerAll(spark)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()
    li.limit(100).write.mode("overwrite").format("noop").save()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.contains) }
    for (r <- 1 to runs; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[dev] run$r $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      } catch { case e: Throwable =>
        println(s"[dev] run$r $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
