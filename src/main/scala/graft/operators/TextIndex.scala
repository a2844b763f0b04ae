package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-once INVERTED INDEX for lexical retrieval — the text twin of the
  * IVF vector index ([[Ann.buildIvfIndex]]): tokenize/count ONCE, store
  * posting lists partitioned by a term-hash bucket, and serve every later
  * BM25 query from the partition-pruned store instead of re-exploding the
  * corpus (TextMetrics.bm25TopK's one-shot shape re-reads and re-tokenizes
  * every document per query — right for ad-hoc, wrong for a serving path).
  *
  * Layout under `dir`:
  *  - `postings/tb=<bucket>/` — (term, doc_id, tf, dl) rows, partitioned
  *    by `tb = pmod(xxhash64(term), numBuckets)`: a query's terms map to
  *    a handful of buckets, so the scan prunes to |Q| partitions of
  *    term-sized posting lists (plan-asserted in TextIndexSpec). `dl` is
  *    denormalized onto each posting at build time — no corpus-wide
  *    lengths join at query time (the one-shot operator's same trade,
  *    made durable).
  *  - `stats/` — one row (n_docs, total_len): the corpus constants BM25
  *    needs; reading it is a 1-row scan, not an aggregate over anything.
  *
  * Query-time parity: [[bm25FromIndex]] recomputes df from the pruned
  * postings exactly as the one-shot operator derives it from its tf frame
  * (df of a term = its posting count — identical by construction), then
  * applies the same Robertson k1/b scoring with the same 12-dp rounding
  * and decimal-sum discipline, so index-served results are IDENTICAL to
  * [[TextMetrics.bm25TopK]] on the same corpus (spec-asserted, and the
  * driver gate runs the same DuckDB oracle against both).
  *
  * Scale: the build is the corpus pass (one explode + one partial-agg
  * shuffle on (term, doc_id) — the same cost ONE ad-hoc query pays); a
  * query touches |Q| partitions, broadcasts a ≤|Q|-row df frame, and
  * top-k is TakeOrderedAndProject. Incremental growth would follow the
  * IVF index's `b=<batchId>` append discipline; rebuild-on-compact is the
  * posting store's compaction story (ParquetCompactor mechanics).
  */
object TextIndex {

  val DefaultNumBuckets = 64

  /** One corpus pass → POSITIONAL posting lists + corpus stats.
    * Tokenization is the engine's whitespace convention (identical to
    * bm25TopK). Each posting carries the term's sorted token positions —
    * what [[phraseDocsFromIndex]] intersects; BM25 ignores them (the
    * standard Lucene trade: positions roughly double the posting bytes
    * and buy phrase/proximity queries).
    */
  private def batchPostings(documents: DataFrame, numBuckets: Int): DataFrame = {
    val words = split(col("text"), " ")
    documents
      .select(col("doc_id"), size(words).cast("long").as("dl"),
        posexplode(words))
      .groupBy(col("col").as("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(numBuckets)))
  }

  private def batchStats(documents: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    documents.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(words).cast("long")), lit(0L)).as("total_len"))
  }

  def buildTextIndex(documents: DataFrame, dir: String,
                     numBuckets: Int = DefaultNumBuckets): Unit = {
    // a REBUILD over a previously-compacted dir must reset the generation
    // pointer (and the fold watermark) first — the fresh raw-path write
    // would otherwise be invisible behind the stale pointer
    graft.sources.ParquetCompactor.resetPointer(documents.sparkSession, s"$dir/postings")
    graft.sources.ParquetCompactor.deleteMarker(documents.sparkSession, foldMarker(dir))
    // numBuckets is part of the store's layout — persisted WITH the store
    // (the IVF index stores its centroids for the same reason): a query or
    // append run with a different bucket count would prune to the WRONG
    // partitions and silently drop documents, so readers take the stored
    // value and callers never re-supply it
    batchStats(documents).withColumn("b", lit(0L))
      .withColumn("num_buckets", lit(numBuckets))
      .coalesce(1).write.mode("overwrite").partitionBy("b").parquet(s"$dir/stats")
    // `b` (ingest batch) is a nested partition under tb from birth so
    // [[appendTextBatch]] can land later batches in the same store —
    // partition discovery needs one consistent depth; tb stays the
    // top-level pruning key either way (the IVF lists discipline)
    batchPostings(documents, numBuckets).withColumn("b", lit(0L))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb", "b").parquet(s"$dir/postings")
  }

  /** Incremental index growth — the IVF `b=<batchId>` discipline applied
    * to posting lists: a batch of NEW documents (the contract: a doc_id
    * appears in exactly one batch, so per-(term, doc) postings stay
    * disjoint and df/tf remain exact) is tokenized alone and landed under
    * `b=<batchId>` leaf partitions; dynamic partition overwrite makes a
    * replayed batch overwrite ITSELF, so at-least-once foreachBatch
    * delivery yields exactly-once postings. The stats table accretes one
    * row per batch — readers SUM it (n and avgdl drift with each append,
    * exactly like a Lucene segment merge updating collection stats).
    */
  private def foldMarker(dir: String): String = s"$dir/postings-folded-through"

  def appendTextBatch(newDocuments: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = newDocuments.sparkSession
    // replay-after-compaction guard: a batch below the fold watermark was
    // already folded into b=0 — re-landing it under its b= partition would
    // DUPLICATE postings (dynamic overwrite can only replace, not dedup,
    // once the original partition is gone). The no-op keeps at-least-once
    // delivery exactly-once across compactions.
    if (graft.sources.ParquetCompactor.readMarker(spark, foldMarker(dir))
        .exists(batchId < _)) return
    val numBuckets = readStatsRow(spark, dir)._3
    // writer-scoped dynamic overwrite: the session conf would race any
    // concurrent write on the same SparkSession (two maintenance streams)
    batchStats(newDocuments).withColumn("b", lit(batchId))
      .withColumn("num_buckets", lit(numBuckets))
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("b").parquet(s"$dir/stats")
    batchPostings(newDocuments, numBuckets).withColumn("b", lit(batchId))
      .repartition(col("tb"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tb", "b")
      .parquet(graft.sources.ParquetCompactor.currentDir(spark, s"$dir/postings"))
  }

  /** Postings resolve through the compactor's generation pointer — readers
    * see the pre- or post-compaction store, never a half-written one.
    */
  private def readPostings(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ParquetCompactor.read(spark, s"$dir/postings")

  /** COMPACTION round for a grown index: every `b=<batchId>` ingest
    * generation BELOW `beforeBatch` folds into `b=0`, shedding the
    * accumulated sliver files and partition dirs while keeping the
    * (tb, b) layout — the [[graft.sources.ParquetCompactor]] generation
    * swap, so readers flip atomically and a crash keeps the old store.
    * Per-(term, doc) postings are disjoint across batches (the append
    * contract), so the fold is a pure relabel — row-count-verified.
    *
    * Replay safety: the fold ADVANCES a watermark marker; a later replay
    * of any folded batch no-ops in [[appendTextBatch]] (its content is
    * already in b=0 — re-landing it would duplicate). Pass the
    * maintenance stream's committed frontier as `beforeBatch` so only
    * CLOSED batches fold — the ImportFeed.compact discipline.
    */
  def compactIndex(spark: SparkSession, dir: String, beforeBatch: Long): String = {
    val out = graft.sources.ParquetCompactor.compact(spark, s"$dir/postings",
      partitionCols = Seq("tb", "b"),
      rewrite = df => df
        .withColumn("b", when(col("b") < beforeBatch, lit(0L)).otherwise(col("b")))
        .repartition(col("tb")))
    val prev = graft.sources.ParquetCompactor.readMarker(spark, foldMarker(dir)).getOrElse(0L)
    graft.sources.ParquetCompactor.writeMarker(spark, foldMarker(dir),
      math.max(prev, beforeBatch))
    out
  }

  /** Streaming index maintenance — each micro-batch of new docs appended
    * idempotently (batchId 0 would collide with the build generation;
    * offset by 1).
    */
  def startTextIndexMaintenance(documents: DataFrame, dir: String,
                                checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    documents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendTextBatch(batch, dir, batchId + 1)
        ()
      }
      .start()

  /** Collection stats SUMMED over the build + every appended batch (one
    * tiny row per batch — reading them is a batches-sized scan), plus the
    * store's persisted bucket count.
    */
  private def readStatsRow(spark: SparkSession, dir: String): (Long, Long, Int) = {
    val row = spark.read.parquet(s"$dir/stats")
      .agg(coalesce(sum("n_docs"), lit(0L)), coalesce(sum("total_len"), lit(0L)),
        max("num_buckets")).head()
    (row.getLong(0), row.getLong(1), row.getInt(2))
  }

  /** BM25 top-k served FROM the index: |Q| pruned partitions in, the same
    * scores [[TextMetrics.bm25TopK]] computes, out.
    */
  def bm25FromIndex(spark: SparkSession, dir: String, queryTerms: Seq[String],
                    topK: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (n, totLen, numBuckets) = readStatsRow(spark, dir)
    // an empty build wrote no posting files — schema-stable empty result
    // (total op, the engine's empty-input doctrine)
    if (n == 0L)
      return spark.range(0).select(col("id").as("doc_id"),
        lit(0.0d).as("score"), lit(0L).as("matched_terms"))
    val avgdl = totLen.toDouble / n
    // bucket set computed from the same hash the build used (a |Q|-row
    // local-relation job — no table scan) — the partition filter then
    // prunes the postings scan before any IO
    import spark.implicits._
    val buckets = queryTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(numBuckets)).as("tb"))
      .as[Long].collect().distinct.toSeq
    val tf = readPostings(spark, dir)
      .where(col("tb").isInCollection(buckets) && col("term").isInCollection(queryTerms))
      .select("term", "doc_id", "tf", "dl")
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0d) + (lit(n.toDouble) - col("df") + 0.5d) / (col("df") + 0.5d))
    val termScore = round(
      idf * (col("tf") * (k1 + 1.0d)) /
        (col("tf") + lit(k1) * (lit(1.0d - b) + lit(b) * col("dl") / avgdl)), 12)
    tf.join(broadcast(dfreq), "term")
      .groupBy("doc_id")
      .agg(
        round(sum(termScore.cast("decimal(28,14)")).cast("double"), 12).as("score"),
        count(lit(1)).as("matched_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** PHRASE search served from the positional index: documents containing
    * the exact consecutive token sequence, with the token-level occurrence
    * count. The classic positional-intersection algorithm — start from the
    * first term's position list, then for term i intersect with that
    * term's positions shifted back by i — expressed as a chain of
    * |phrase|−1 doc_id-keyed joins over PRUNED postings with map-side
    * `array_intersect`/`transform` (each join's both sides are
    * query-term-sized posting lists, never the corpus, and the candidate
    * set only shrinks). Repeated terms in the phrase work naturally (the
    * same position list joins twice with different shifts). Overlapping
    * occurrences are counted — positions, not string re-scan semantics.
    */
  def phraseDocsFromIndex(spark: SparkSession, dir: String,
                          phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val (n, _, numBuckets) = readStatsRow(spark, dir)
    if (n == 0L)
      return spark.range(0).select(col("id").as("doc_id"), lit(0L).as("n_occurrences"))
    import spark.implicits._
    val distinctTerms = phrase.distinct
    val buckets = distinctTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(numBuckets)).as("tb"))
      .as[Long].collect().distinct.toSeq
    val posts = readPostings(spark, dir)
      .where(col("tb").isInCollection(buckets) && col("term").isInCollection(distinctTerms))
      .select("term", "doc_id", "positions")
    def termPositions(w: String) = posts.where(col("term") === w)
    val init = termPositions(phrase.head)
      .select(col("doc_id"), col("positions").as("cand"))
    val folded = phrase.zipWithIndex.drop(1).foldLeft(init) { case (acc, (w, i)) =>
      acc.join(termPositions(w).select(col("doc_id"), col("positions").as("p")), "doc_id")
        .select(col("doc_id"),
          array_intersect(col("cand"), transform(col("p"), x => x - i)).as("cand"))
        .where(size(col("cand")) > 0)
    }
    folded
      .select(col("doc_id"), size(col("cand")).cast("long").as("n_occurrences"))
      .orderBy("doc_id")
  }

  /** BOOLEAN retrieval from the index — the Lucene BooleanQuery member of
    * the retrieval stack (BM25 ranks, phrase/proximity position-match;
    * this is the filter algebra): documents containing ALL `must` terms
    * and NONE of the `mustNot` terms, ranked by how many DISTINCT `should`
    * terms they also contain (then doc_id). With `must` empty, candidates
    * are docs matching ≥1 `should` term (the standard pure-OR query).
    *
    * Scale shape: one pruned postings read covering all three clauses'
    * buckets, then set algebra on (term, doc_id) pairs — a count-distinct
    * partial agg for must/should, an anti-join for mustNot; posting
    * payloads (positions) never load (column pruning) and the corpus is
    * never re-tokenized. Fully oracle-checkable: exact set semantics over
    * the engine's whitespace tokenization.
    */
  def booleanDocsFromIndex(spark: SparkSession, dir: String,
                           must: Seq[String], should: Seq[String] = Nil,
                           mustNot: Seq[String] = Nil): DataFrame = {
    require(must.nonEmpty || should.nonEmpty, "need at least one must/should term")
    val mustD = must.distinct
    val shouldD = should.distinct
    val notD = mustNot.distinct
    require((mustD ++ notD).distinct.size == mustD.size + notD.size,
      "a term cannot be both must and mustNot")
    val (n, _, numBuckets) = readStatsRow(spark, dir)
    if (n == 0L)
      return spark.range(0).select(col("id").as("doc_id"), lit(0L).as("n_should"))
    import spark.implicits._
    val allTerms = (mustD ++ shouldD ++ notD).distinct
    val buckets = allTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(numBuckets)).as("tb"))
      .as[Long].collect().distinct.toSeq
    val posts = readPostings(spark, dir)
      .where(col("tb").isInCollection(buckets) && col("term").isInCollection(allTerms))
      .select("term", "doc_id")
    val candidates =
      if (mustD.nonEmpty)
        posts.where(col("term").isInCollection(mustD))
          .groupBy("doc_id")
          .agg(count_distinct(col("term")).as("_nm"))
          .where(col("_nm") === mustD.size)
          .select("doc_id")
      else
        posts.where(col("term").isInCollection(shouldD)).select("doc_id").distinct()
    val excluded =
      if (notD.isEmpty) candidates
      else candidates.join(
        posts.where(col("term").isInCollection(notD)).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    val shouldN =
      if (shouldD.isEmpty) excluded.select(col("doc_id"), lit(0L).as("n_should"))
      else excluded.join(
          posts.where(col("term").isInCollection(shouldD))
            .groupBy("doc_id").agg(count_distinct(col("term")).as("_ns")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("_ns"), lit(0L)).as("n_should"))
    shouldN.orderBy(col("n_should").desc, col("doc_id"))
  }

  /** PROXIMITY (NEAR) search from the positional index: documents where
    * `termA` and `termB` occur within `window` tokens of each other, with
    * the matching position-pair count. One doc_id-keyed join of the two
    * terms' pruned posting lists, then a map-side nested-HOF pair count —
    * the slop-query member of the retrieval stack (phrase = window 1 with
    * order; this is unordered distance). Oracle-checked: the pair count
    * equals DuckDB's |p−q| ≤ window join over the same tokenization.
    */
  def proximityDocsFromIndex(spark: SparkSession, dir: String,
                             termA: String, termB: String,
                             window: Int): DataFrame = {
    require(window >= 1, s"window < 1: $window")
    require(termA != termB, "use phrase/self-counts for a single term")
    val (n, _, numBuckets) = readStatsRow(spark, dir)
    if (n == 0L)
      return spark.range(0).select(col("id").as("doc_id"), lit(0L).as("n_pairs"))
    import spark.implicits._
    val buckets = Seq(termA, termB).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(numBuckets)).as("tb"))
      .as[Long].collect().distinct.toSeq
    val posts = readPostings(spark, dir)
      .where(col("tb").isInCollection(buckets) && col("term").isin(termA, termB))
      .select("term", "doc_id", "positions")
    posts.where(col("term") === termA)
      .select(col("doc_id"), col("positions").as("pa"))
      .join(posts.where(col("term") === termB)
        .select(col("doc_id"), col("positions").as("pb")), "doc_id")
      .select(col("doc_id"),
        aggregate(
          transform(col("pa"), p =>
            size(filter(col("pb"), q => abs(p - q) <= window))),
          lit(0), (acc, x) => acc + x).cast("long").as("n_pairs"))
      .where(col("n_pairs") > 0)
      .orderBy("doc_id")
  }
}
