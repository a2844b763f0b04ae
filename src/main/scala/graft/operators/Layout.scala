package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Multi-dimensional data layout for scan pruning: write a table
  * clustered by the Morton key of two filter columns so parquet min/max
  * skipping works on EITHER column (a single-column sort gives pruning
  * on that column and nothing on the other — the layout decision every
  * 100 TB table faces before the first query runs).
  *
  * The shape: two tiny min/max aggregates bound each dimension, values
  * min-max-normalize to 16-bit lanes with integral arithmetic
  * (`div` — exact, no float floor), the lanes interleave via
  * [[graft.functions.ZOrder]] (all codegen'd built-ins), and the write
  * is `repartitionByRange` on the key (range exchange = contiguous
  * curve segments per file) + an in-partition sort (tight row-group
  * boxes inside each file). Normalization tolerates ranges up to
  * 2^47 (the 65535 multiply must stay under 2^63); epoch-ms, block
  * numbers, and id spaces all fit.
  *
  * [[fileBoxes]] reads the written files' per-file min/max back and
  * [[pruningStats]] turns them into the measurable claim — what
  * fraction of files a 2-d box predicate must actually read — which is
  * the spec'd contract (LayoutSpec: z-order prunes both axes, a linear
  * sort prunes only its own).
  */
object Layout {

  /** Append a `zkey` Morton column over min-max-normalized (c1, c2). */
  def withZKey(df: DataFrame, c1: String, c2: String): DataFrame = {
    val b = df.agg(
      min(col(c1)).cast("long"), max(col(c1)).cast("long"),
      min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
    require(!b.isNullAt(0) && !b.isNullAt(2), "cannot z-order an empty frame")
    def norm(c: String, lo: Long, hi: Long) =
      if (hi == lo) lit(0L)
      else expr(s"(($c - ${lo}L) * 65535L) div ${hi - lo}L")
    df.withColumn("zkey",
      ZOrder.morton16(
        norm(c1, b.getLong(0), b.getLong(1)),
        norm(c2, b.getLong(2), b.getLong(3))))
  }

  /** Write `df` to `path` clustered by the Morton key of (c1, c2). */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
                  numFiles: Int): Unit =
    withZKey(df, c1, c2)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("zkey")
      .write.mode("overwrite").parquet(path)

  /** The single-column baseline layout (what pruning looks like without
    * the curve): range-clustered and sorted by `c1` alone.
    */
  def linearWrite(df: DataFrame, c1: String, path: String,
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(c1))
      .sortWithinPartitions(c1)
      .write.mode("overwrite").parquet(path)

  /** Per-file [min,max] boxes of (c1, c2) for a written table — exactly
    * the statistics a footer-pruning reader consults.
    */
  def fileBoxes(spark: SparkSession, path: String, c1: String,
                c2: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c1)).as("min1"), max(col(c1)).as("max1"),
        min(col(c2)).as("min2"), max(col(c2)).as("max2"))

  /** How many files a box predicate `[lo1,hi1] × [lo2,hi2]` must read
    * under the layout at `path`: files whose stats box intersects the
    * query box. Returns (files_total, files_read).
    */
  def pruningStats(spark: SparkSession, path: String, c1: String, c2: String,
                   lo1: Long, hi1: Long, lo2: Long, hi2: Long): (Long, Long) = {
    val boxes = fileBoxes(spark, path, c1, c2)
      .select(count(lit(1)).as("total"),
        sum(when(col("min1") <= hi1 && col("max1") >= lo1 &&
          col("min2") <= hi2 && col("max2") >= lo2, 1L).otherwise(0L)).as("read"))
      .head()
    (boxes.getLong(0), boxes.getLong(1))
  }
}
