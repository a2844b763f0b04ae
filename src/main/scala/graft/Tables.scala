package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Each loader is a plain parquet scan: schemas stay dynamic (DataFrame), and
  * because every downstream operator is declarative, Catalyst prunes columns
  * and pushes filters into the scan (verify via `.explain`: `ReadSchema` /
  * `PushedFilters`). At cluster scale the same code reads a partitioned
  * directory tree; nothing here assumes single-file layout.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations, so the decode branches on the LOADED schema rather than
    * assuming either:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so we keep
    *    `nanosAsLong` set (inert for other encodings) and the column arrives
    *    as raw LongType nanos → truncate to µs with integral `div` (ns values
    *    ~1.7e18 exceed double's 2^53 exact range; float division would
    *    silently corrupt timestamps) and rebuild via `timestamp_micros`.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ →
    *    cast to session-zoned TimestampType. All entry points pin
    *    `spark.sql.session.timeZone=UTC`, so the wall-clock is preserved and
    *    matches both the old nanos path and DuckDB's naive-timestamp read.
    *  - already TimestampType: pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
