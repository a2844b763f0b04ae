package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: in-JVM interleaved A/B of the editDistancePairs verification
  * variants (full DP / threshold DP / length-bucket + threshold DP) —
  * isolates the join-sweep cost from JVM-launch noise.
  * Usage: runMain graft.DevLev [sfDir] [reps]
  */
object DevLev {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerAll(spark)
    val maxDist = 2
    val b = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("k"), col("p_name").as("txt"),
        col("p_brand").as("blk"))
      .where(col("k").isNotNull && col("txt").isNotNull && col("blk").isNotNull)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    def out(j: DataFrame): DataFrame = j
      .select(col("a.k").as("key_a"), col("b.k").as("key_b"),
        levenshtein(col("a.txt"), col("b.txt"), maxDist).cast("long").as("dist"))
      .orderBy("key_a", "key_b")
    val full = out(b.as("a").join(b.as("b"),
      col("a.blk") === col("b.blk") && col("a.k") < col("b.k") &&
        abs(length(col("a.txt")) - length(col("b.txt"))) <= maxDist &&
        levenshtein(col("a.txt"), col("b.txt")) <= maxDist))
    val thr = out(b.as("a").join(b.as("b"),
      col("a.blk") === col("b.blk") && col("a.k") < col("b.k") &&
        abs(length(col("a.txt")) - length(col("b.txt"))) <= maxDist &&
        levenshtein(col("a.txt"), col("b.txt"), maxDist) >= 0))
    val w = maxDist + 1
    val bb = b.withColumn("bkt", (length(col("txt")) / w).cast("int"))
    val probes = bb.select(col("k"), col("txt"), col("blk"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("pbkt"))
    val bkt = out(probes.as("a").join(bb.as("b"),
      col("a.blk") === col("b.blk") && col("a.pbkt") === col("b.bkt") &&
        col("a.k") < col("b.k") &&
        abs(length(col("a.txt")) - length(col("b.txt"))) <= maxDist &&
        levenshtein(col("a.txt"), col("b.txt"), maxDist) >= 0))
    val variants = Seq("full" -> full, "thr" -> thr, "bkt+thr" -> bkt)
    // parity first
    val counts = variants.map { case (n, df) => n -> df.count() }
    System.err.println(s"[devlev] counts: $counts")
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    variants.foreach { case (_, df) => noop(df) } // warmup all codegen paths
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (n, df) <- variants) {
      val t0 = System.nanoTime()
      noop(df)
      times(n) = ((System.nanoTime() - t0) / 1e9) :: times.getOrElse(n, Nil)
    }
    variants.foreach { case (n, _) =>
      val xs = times(n).sorted
      System.err.println(f"[devlev] $n%-8s med ${xs(xs.size / 2)}%.3fs  all ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
