package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for LLM pretraining — the concat-and-split layout:
  * documents are concatenated in doc_id order into one global token stream
  * and split into fixed-length training sequences; a document's placement
  * is determined by its global token OFFSET. The layout answer per doc is
  * (offset, first sequence, last sequence) — what a data loader needs to
  * materialize any shard of sequences without touching the others.
  *
  * The global prefix sum is the scale problem: a bare
  * `Window.orderBy(doc_id)` has no partition key, so Spark collapses the
  * corpus into ONE task. This implementation is the classic two-phase
  * distributed scan instead:
  *
  *  1. bucket docs by id range (`numBuckets` ordered buckets);
  *  2. per-bucket token totals — a partial-aggregated shuffle of
  *     ≤ numBuckets rows — prefix-summed on the driver (bounded collect)
  *     into per-bucket BASE offsets, which ride the plan as a map literal;
  *  3. within each bucket, a PARTITIONED window cumsum (distributed) plus
  *     the bucket base.
  *
  * At 100 TB: numBuckets scales with the cluster (buckets ≈ tasks); the
  * only global data movement is the per-bucket totals. Offsets use
  * integral `DIV`, so block ids stay exact at any stream length (a double
  * division would lose exactness past 2^53 tokens).
  */
object Packing {

  /** Per-document packing layout at `seqLen` tokens per training sequence.
    * `tokenCount` defaults to whitespace tokens (swap in
    * [[graft.functions.BpeOps.bpeCount]] for trained-tokenizer packing —
    * same layout machinery).
    */
  def packLayout(documents: DataFrame, seqLen: Int = 512, numBuckets: Int = 64,
                 tokenCount: Column = size(split(col("text"), " ")).cast("long")): DataFrame = {
    val t = documents.select(col("doc_id"), tokenCount.as("n_tok"))
    val maxIdRow = t.agg(max("doc_id")).head()
    if (maxIdRow.isNullAt(0))
      return t.select(col("doc_id"), col("n_tok"),
        lit(0L).as("tok_offset"), lit(0L).as("start_seq"), lit(0L).as("end_seq"))
        .where(lit(false))
    val width = maxIdRow.getLong(0) / numBuckets + 1
    val b = t.withColumn("bucket", expr(s"doc_id DIV $width"))
    // phase 2: ≤ numBuckets totals, prefix-summed driver-side
    val totals = b.groupBy("bucket").agg(sum("n_tok").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // each bucket's base offset = sum of all PRIOR buckets' totals
    val cum = totals.scanLeft(0L) { case (acc, (_, tot)) => acc + tot }
    val baseMap: Map[Long, Long] = totals.map(_._1).zip(cum).toMap
    // phase 3: distributed per-bucket scan + literal base
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    b.withColumn("tok_offset",
        coalesce(sum("n_tok").over(w), lit(0L)) + element_at(typedlit(baseMap), col("bucket")))
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        expr(s"tok_offset DIV $seqLen").as("start_seq"),
        expr(s"(tok_offset + n_tok - 1) DIV $seqLen").as("end_seq"))
      .orderBy("doc_id")
  }

  /** Per-sequence fan-in: how many documents contribute tokens to each
    * training sequence (boundary-straddlers count on both sides) — the
    * packing-quality stat (high fan-in = fragmenting seqLen, fan-in 1 =
    * giant docs dominating). One explode of per-doc spans (bounded by
    * n_tok/seqLen per doc) + a partial-agg count.
    */
  def seqFanIn(documents: DataFrame, seqLen: Int = 512, numBuckets: Int = 64): DataFrame =
    packLayout(documents, seqLen, numBuckets)
      .select(explode(sequence(col("start_seq"), col("end_seq"))).as("seq"))
      .groupBy("seq").agg(count(lit(1)).as("n_docs"))
      .orderBy("seq")

  /** Shuffled-shard assignment — the LAST layout step of a pretraining
    * pipeline: after curation/mixture/packing, the corpus must be written
    * as N shard files whose concatenation is a DETERMINISTIC global
    * shuffle of the rows (training reads shards sequentially, so any
    * order correlation — by source, by crawl date, by duplicate cluster —
    * becomes curriculum bias). Shard = 56 bits of md5(key ∥ salt) mod N,
    * within-shard order = the full hash: reproducible on any cluster
    * size, any partitioning, any engine (same md5 convention as
    * [[Sampling]]'s gates — the DuckDB oracle re-derives the exact
    * layout), unlike `repartition(N)`+`sample`-style shuffles whose
    * output depends on task layout. `salt` yields independent reshuffles
    * (a new training run's epoch order) without touching the data.
    *
    * For an [[Sampling.epochExpand]]'ed frame, pass a key that includes
    * the epoch (e.g. `concat(doc_id, '#', epoch)` projected to a column)
    * so a document's repeated copies scatter across shards instead of
    * co-locating — the composition epochExpand's doc promises.
    */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
                  salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards < 1: $nShards")
    df.withColumn("shuffle_key",
        md5(concat(col(keyCol).cast("string"), lit("|shard|" + salt))))
      .withColumn("shard",
        pmod(graft.functions.HashConv.hexPrefixLong(col("shuffle_key")),
          lit(nShards.toLong)).cast("int"))
  }

  /** Materialize [[shardAssign]]: one shuffle keyed on the shard id, rows
    * sorted by shuffle_key within each shard (parquet preserves row
    * order, so a sequential reader sees the deterministic shuffle), one
    * file per `shard=` dir. Returns the output row count.
    */
  def writeShards(df: DataFrame, keyCol: String, dir: String, nShards: Int,
                  salt: String = ""): Long = {
    val assigned = shardAssign(df, keyCol, nShards, salt)
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    assigned.sparkSession.read.parquet(dir).count()
  }
}
