package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's block-source family, Spark-first.
  *
  * `Sources/BulkSource.cs` (backfill), `IntervalSource.cs` (poll),
  * `LiveSource.cs` (push) all emit block numbers into the same downstream
  * pipeline; only the arrival mode differs. Spark's equivalent split:
  *
  *  - [[bulk]]    — plain batch read of everything already landed (the
  *    backfill path; partition-parallel, no state).
  *  - [[live]]    — Structured Streaming file source on the same directory:
  *    new files are discovered per micro-batch (the poll/push path; swap in
  *    Kafka by changing the format, nothing downstream changes).
  *  - gaps/reorgs — `streaming.EventPipeline.checkGaps` / `reimportFrom`
  *    (GapSource/ReorgSource equivalents) run against the imported table.
  *
  * The point: ONE declarative pipeline (classify → extract → import) serves
  * both arrival modes, where the reference maintains parallel Akka graphs.
  */
object EventSource {

  def bulk(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Streaming file source. `maxFilesPerTrigger` bounds batch size the same
    * way the reference caps parallel block downloads (Settings.cs
    * MAX_PARALLEL_BLOCK_DOWNLOADS).
    */
  def live(spark: SparkSession, dir: String, schema: StructType,
           maxFilesPerTrigger: Int = 24): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Typed parse of a raw JSON payload column with QUARANTINE semantics —
    * the RPC-ingest front door (the reference deserializes node JSON in
    * its sources; a malformed payload there throws and wedges the block):
    * `from_json` in PERMISSIVE mode never throws, rows that fail to parse
    * keep their raw text with `valid = false`, and — the from_json
    * subtlety — JSON that parses but matches NO schema field (all-null
    * struct) is quarantined too, not passed through as an empty row.
    * Map-only, codegen'd, works identically on batch and streaming frames.
    */
  def parseJson(df: DataFrame, schema: StructType,
                jsonCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.functions._
    val parsed = from_json(col(jsonCol), schema,
      Map("mode" -> "PERMISSIVE"))
    val anyField = schema.fieldNames
      .map(f => parsed.getField(f).isNotNull)
      .reduce(_ || _)
    df.withColumn("parsed", parsed)
      .withColumn("valid", col("parsed").isNotNull && anyField)
      .select(col("*") +: schema.fieldNames.toIndexedSeq.map(f =>
        when(col("valid"), col("parsed").getField(f)).as(f)): _*)
      .drop("parsed")
  }
}
