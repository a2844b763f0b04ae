package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * The reference leans on Postgres btree indexes to make its hash/fk joins
  * cheap; the Spark-native equivalent at 100 TB is bucketing: write fact
  * tables bucketed (and sorted) by their join key so repeated joins on that
  * key skip BOTH the shuffle and the sort — the scan itself satisfies the
  * join's distribution requirement. For a table joined every batch (e.g.
  * lineitem⋈orders on orderkey, or transfers⋈transactions on tx hash), the
  * one-time bucketed write amortizes across every downstream query.
  *
  * BucketedStoreSpec proves the plan effect: the bucketed join runs with
  * zero join-side Exchanges vs two for the plain-parquet join.
  */
object BucketedStore {

  /** Write `df` as a bucketed, sorted external table at `path`. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      bucketCol: String,
      numBuckets: Int = 32
  ): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)
}
