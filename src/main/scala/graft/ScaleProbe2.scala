package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p2] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    time("shingle-hash-scan") {
      docs.select(col("doc_id"),
        graft.functions.SetOps.sortedShingleHashes(Dedup.shingles(col("text"))).as("sh"))
        .agg(sum(size(col("sh")))).collect()(0).getLong(0)
    }
    time("ngram-naive-1")(Dedup.ngramJaccardPairsBalanced(docs, 0.1, 1).count())
    time("ngram-balanced-4")(Dedup.ngramJaccardPairsBalanced(docs, 0.1, 4).count())
    time("ngram-balanced-8")(Dedup.ngramJaccardPairsBalanced(docs, 0.1, 8).count())
    time("ngram-no-orderby") {
      val d = docs.select(col("doc_id"), col("source"),
        graft.functions.SetOps.sortedShingleHashes(Dedup.shingles(col("text"))).as("sh"))
      d.as("a").join(d.as("b"),
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .select(graft.functions.SetOps.jaccardSorted(col("a.sh"), col("b.sh")).as("j"))
        .where(col("j") >= 0.1).count()
    }
    spark.stop()
  }
}
