package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: quality scoring, token
  * counting, language ID, document fingerprinting. All map-only projections
  * built from codegen'd native functions — they run at scan speed at any
  * scale, and column pruning reduces the parquet read to (doc_id, text).
  */
object TextMetrics {

  private val wsWords: Column => Column = t => split(t, " ")

  /** Quality metrics: length, word count, mean word length, punctuation
    * ratio, stopword ratio. Ratios are integer-derived double divisions —
    * deterministic across engines (IEEE ops on exactly-representable ints).
    */
  def quality(documents: DataFrame): DataFrame =
    withQuality(documents).select(col("doc_id"), col("n_chars"), col("n_words"),
      col("avg_word_len"), col("punct_ratio"), col("stopword_ratio"))
      .orderBy("doc_id")

  /** The metric columns of [[quality]] APPENDED to the input frame — no
    * projection-away, no ordering, so it composes into streaming stages
    * (sorts are illegal on unbounded frames) and into pipelines that still
    * need the text downstream.
    */
  def withQuality(documents: DataFrame): DataFrame = {
    val words = wsWords(col("text"))
    val nWords = size(words)
    val nChars = length(col("text"))
    val nPunct = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    val nStop = size(filter(words, w => w === "the" || w === "a"))
    documents
      .withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("avg_word_len",
        (nChars - nWords + 1).cast("double") / nWords.cast("double"))
      .withColumn("punct_ratio", nPunct.cast("double") / nChars.cast("double"))
      .withColumn("stopword_ratio", nStop.cast("double") / nWords.cast("double"))
  }

  /** Distributed BPE merge training — real tokenizer training over the
    * corpus, not a heuristic:
    *
    *  1. ONE corpus pass builds the weighted pre-token VOCAB
    *     (word → frequency) — the classic BPE-on-vocabulary reduction:
    *     every later step is vocab-sized, independent of corpus size;
    *  2. per merge round: adjacent-symbol pair weights (vocab-sized
    *     partial agg), deterministic argmax (weight desc, then pair
    *     lexicographic), then the merge applied to the vocab symbols via
    *     a left-to-right fold (HOF — acceptable off the corpus hot path;
    *     vocab rows are short) with eager localCheckpoint per round (the
    *     iterative-lineage rule).
    *
    * Returns the rank-ordered merge list; stops early when no pair
    * repeats. At 100 TB the vocab table (~1e7 pre-tokens) stays
    * distributed and the corpus is still touched exactly once.
    */
  def trainBpe(documents: DataFrame, numMerges: Int = 16,
               samplePermille: Int = 1000, idCol: String = "doc_id"): Seq[(String, String)] = {
    // Hash-gated sampling, not limit(): limit's row choice depends on
    // partition layout on a cluster, so the trained merges would differ
    // run-to-run. The md5 gate picks the same docs on any partitioning
    // (spec'd: merges invariant under repartition(7)).
    var vocab = (if (samplePermille >= 1000) documents
                 else Sampling.hashSample(documents, idCol, samplePermille, salt = "bpe"))
      .select(explode(filter(wsWords(col("text")), w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 0 until numMerges if !exhausted) {
      val best = vocab.select(col("freq"), explode(
          when(size(col("syms")) < 2, array().cast("array<struct<a:string,b:string>>"))
            .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(element_at(col("syms"), i + 1).as("a"),
                element_at(col("syms"), i + 2).as("b"))))).as("p"))
        .groupBy("p").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("p.a"), col("p.b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(1) < 2) exhausted = true
      else {
        val p = best.head.getStruct(0)
        val (a, b) = (p.getString(0), p.getString(1))
        merges += ((a, b))
        val mergedSyms = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, s) => when(size(acc) > 0 &&
              element_at(acc, -1) === a && s === b,
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(s))))
        // LAZY checkpoint: the merge projection materializes inside the
        // NEXT round's pair-count job instead of paying its own eager
        // job — one job per merge round, not two (results identical: the
        // plan is deterministic and later rounds read the cached blocks)
        vocab = vocab.select(mergedSyms.as("syms"), col("freq")).localCheckpoint(false)
      }
    }
    merges.toSeq
  }

  /** Token counts under a trained BPE merge list — whitespace pre-tokens,
    * greedy lowest-rank merges, via the codegen'd
    * [[graft.functions.BpeOps.bpeCount]] kernel (the merge table rides the
    * expression to every task). Map-only at any scale.
    */
  def bpeTokenCounts(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    documents.select(
      col("doc_id"),
      size(wsWords(col("text"))).cast("long").as("ws_tokens"),
      graft.functions.BpeOps.bpeCount(col("text"), merges).cast("long").as("bpe_tokens")
    ).orderBy("doc_id")

  /** Per-source corpus statistics — the "dataset card" numbers a training
    * pipeline publishes per slice: doc and token volume, length
    * distribution, language spread. One partial-aggregable pass; exact
    * medians here (the sketch path for 100 TB is #37b's
    * percentile_approx, same shape).
    */
  /** LEXICAL DIVERSITY per source — the type/token accounting beside
    * [[corpusStats]]'s volumes and [[zipfSlope]]'s shape: total tokens,
    * distinct types, hapax legomena (types seen exactly once), TTR
    * (types/tokens — crashes toward 0 for template/boilerplate sources)
    * and hapax share (the long-tail health: natural text keeps ~40-60%
    * of its vocabulary as one-offs; deduped boilerplate loses the tail).
    * Whitespace tokens (empties dropped) — the corpus-wide convention.
    *
    * Parity: counts are exact longs; the two ratios are single IEEE
    * divisions rounded 12 dp. Scale: ONE (source, term) partial-agg
    * count (hot terms collapse map-side), then a |vocabulary|-row
    * rollup — text never shuffles, terms do once.
    */
  def lexicalDiversity(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        explode(filter(wsWords(col("text")), w => length(w) > 0)).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .groupBy("source").agg(
        sum("tf").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 12)
          .as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types").cast("double"), 12)
          .as("hapax_ratio"))
      .orderBy("source")

  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        sum(size(wsWords(col("text"))).cast("long")).as("total_tokens"),
        round(percentile(length(col("text")).cast("double"), lit(0.5)), 4).as("median_chars"),
        countDistinct(col("lang")).as("n_langs")
      )
      .orderBy("source")

  /** ZIPF rank-frequency SLOPE per source — the dataset-card shape signal
    * next to [[corpusStats]]'s volumes: natural text follows freq ∝
    * rank^s with s ≈ −1; a source whose slope drifts toward 0 is
    * boilerplate/template-heavy (flat head), one far below −1 is
    * degenerate repetition — the one-scalar "does this source read like
    * language" check. OLS of y = ln(freq) on x = ln(rank) over the top-N
    * terms per source: s = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²).
    *
    * Parity: ln values round to 12 dp (O(10) magnitude — safe per the
    * large-magnitude round doctrine, [[graft.operators.Behavior
    * .interEventStats]]) and recover EXACTLY as decimal(16,12); all
    * cross-products multiply in DECIMAL (exact (33,24)s — never a rounded
    * large double) and sum exactly; the final combine is a fixed-order
    * double expression over identical inputs, rounded 12 (O(1) slope).
    * Sources with one term have zero x-variance → null slope.
    *
    * Scale shape: one (source, term) partial-agg count; the top-N cut is
    * the `row_number() <= N` spelling, which Spark's WindowGroupLimit
    * pushdown bounds MAP-SIDE (verified in the plan: a partial
    * WindowGroupLimit sits below the exchange, so ≤ N rows per source per
    * partition shuffle — never the vocabulary); the OLS rollup sees ≤ N
    * rows per source.
    */
  def zipfSlope(documents: DataFrame, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 2, s"topN < 2: $topN")
    val cnts = documents
      .select(col("source"), explode(wsWords(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("source").orderBy(col("cnt").desc, col("term").asc)
    val ranked = cnts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
    val xd = round(log(col("rank").cast("double")), 12).cast("decimal(16,12)")
    val yd = round(log(col("cnt").cast("double")), 12).cast("decimal(16,12)")
    val agg = ranked.select(col("source"), xd.as("x"), yd.as("y"))
      .groupBy("source").agg(
        count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val nd = col("n_terms").cast("double")
    def d(c: String) = col(c).cast("double")
    val den = nd * d("sxx") - d("sx") * d("sx")
    agg.select(col("source"), col("n_terms"),
        when(den > 0,
          round((nd * d("sxy") - d("sx") * d("sy")) / den, 12)).as("zipf_slope"))
      .orderBy("source")
  }

  /** C4/Gopher-style keep/drop decision composed from [[quality]] — the
    * FILTER stage a training-data pipeline runs after scoring: map-only,
    * `keep` plus the FIRST failing rule as the drop reason (the audit
    * shape quality dashboards consume). Thresholds are caller knobs;
    * defaults split the driver testdata non-trivially (its synthetic docs
    * carry no punctuation, so the punct rule exists but won't fire there).
    */
  def qualityFilter(documents: DataFrame, minChars: Int = 100, minWords: Int = 20,
                    maxAvgWordLen: Double = 4.95, maxPunctRatio: Double = 0.3,
                    minStopwordRatio: Double = 0.0): DataFrame =
    withQuality(documents)
      .select(col("doc_id"),
        qualityReason(minChars, minWords, maxAvgWordLen, maxPunctRatio,
          minStopwordRatio).isNull.as("keep"),
        coalesce(qualityReason(minChars, minWords, maxAvgWordLen,
          maxPunctRatio, minStopwordRatio), lit("ok")).as("reason"))
      .orderBy("doc_id")

  /** The [[qualityFilter]] rule chain over [[withQuality]] columns: the
    * FIRST failing rule, null when all pass — shared by the batch filter
    * and the streaming curate stage.
    */
  def qualityReason(minChars: Int = 100, minWords: Int = 20,
                    maxAvgWordLen: Double = 4.95, maxPunctRatio: Double = 0.3,
                    minStopwordRatio: Double = 0.0): Column =
    when(col("n_chars") < minChars, "too_short")
      .when(col("n_words") < minWords, "too_few_words")
      .when(col("avg_word_len") > maxAvgWordLen, "gibberish_words")
      .when(col("punct_ratio") > maxPunctRatio, "too_much_punct")
      .when(col("stopword_ratio") < minStopwordRatio, "low_stopword")

  /** Longest run of equal adjacent elements in an array — a single
    * left-to-right fold with (prev, run, best) struct state. Used on the raw
    * word sequence (max repeated-word run) and on a SORTED n-gram array
    * (where the longest equal-adjacent run IS the top n-gram's frequency —
    * sorting groups equal grams, so no per-doc groupBy/shuffle is needed).
    */
  private def maxAdjacentRun(arr: Column): Column =
    aggregate(arr,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, w) => {
        val run = when(acc.getField("prev") === w, acc.getField("run") + 1L).otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Gopher-style repetition metrics — the signals repetition filters cut
    * on: duplicate-word mass, the top bigram's share of all bigrams, and the
    * longest same-word run. Map-only, no shuffle at any scale: the counts
    * come from the one-pass codegen'd
    * [[graft.functions.TextHashes.repetitionStats]] kernel ([[repetitionHof]]
    * is the readable reference formulation it must match — interpreted
    * ArrayAggregate folds, ~10× slower per scan). Ratios are
    * integer-derived double divisions (deterministic cross-engine);
    * single-word docs have no bigrams → null top_bigram_frac, like the
    * SQL twin.
    */
  def repetition(documents: DataFrame): DataFrame =
    withRepetition(documents).select(col("doc_id"), col("n_words"),
      col("dup_word_frac"), col("max_word_run"), col("top_bigram_frac"))
      .orderBy("doc_id")

  /** [[repetition]]'s metric columns APPENDED to the input frame — the
    * streaming-safe/composable form, like [[withQuality]].
    */
  def withRepetition(documents: DataFrame): DataFrame = {
    val st = graft.functions.TextHashes.repetitionStats(col("text"))
    val nWords = st.getField("n_words")
    documents
      .withColumn("n_words", nWords)
      .withColumn("dup_word_frac",
        round(lit(1.0) - st.getField("n_distinct").cast("double") / nWords.cast("double"), 6))
      .withColumn("max_word_run", st.getField("max_run"))
      .withColumn("top_bigram_frac",
        when(nWords < 2, lit(null).cast("double"))
          .otherwise(round(st.getField("top_bigram").cast("double") /
            (nWords - 1).cast("double"), 6)))
  }

  /** The HOF reference formulation of [[repetition]] — the semantic oracle
    * the native kernel is spec'd against (the top-bigram count spelled as
    * the longest equal-adjacent run of the SORTED bigram array). NOT a hot
    * path: ArrayAggregate folds are interpreted per row.
    */
  def repetitionHof(documents: DataFrame): DataFrame = {
    val ws = wsWords(col("text"))
    val nWords = size(ws).cast("long")
    val bigrams = when(size(ws) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
    documents.select(
      col("doc_id"),
      nWords.as("n_words"),
      round(lit(1.0) - size(array_distinct(ws)).cast("double") / nWords.cast("double"), 6)
        .as("dup_word_frac"),
      maxAdjacentRun(ws).as("max_word_run"),
      when(size(ws) < 2, lit(null).cast("double"))
        .otherwise(round(maxAdjacentRun(array_sort(bigrams)).cast("double") /
          (nWords - 1).cast("double"), 6)).as("top_bigram_frac")
    ).orderBy("doc_id")
  }

  /** Repetition keep/drop filter over [[repetition]] — the Gopher rules'
    * composition shape, mirroring [[qualityFilter]]: `keep` plus the FIRST
    * failing rule as the audit reason. Defaults split the driver testdata
    * non-trivially (word-soup docs repeat heavily).
    */
  def repetitionFilter(documents: DataFrame, maxDupWordFrac: Double = 0.6,
                       maxTopBigramFrac: Double = 0.08,
                       maxWordRun: Long = 2L): DataFrame =
    withRepetition(documents)
      .select(col("doc_id"),
        repetitionReason(maxDupWordFrac, maxTopBigramFrac, maxWordRun)
          .isNull.as("keep"),
        coalesce(repetitionReason(maxDupWordFrac, maxTopBigramFrac, maxWordRun),
          lit("ok")).as("reason"))
      .orderBy("doc_id")

  /** The [[repetitionFilter]] rule chain over [[withRepetition]] columns:
    * first failing rule, null when all pass.
    */
  def repetitionReason(maxDupWordFrac: Double = 0.6,
                       maxTopBigramFrac: Double = 0.08,
                       maxWordRun: Long = 2L): Column =
    when(col("dup_word_frac") > maxDupWordFrac, "dup_words")
      .when(col("top_bigram_frac") > maxTopBigramFrac, "top_bigram")
      .when(col("max_word_run") > maxWordRun, "word_run")

  /** CURATION FUNNEL — per-stage yield accounting for the standard
    * curation chain (quality → repetition → language → exact-dedup): for
    * each stage, how many docs entered, how many it dropped, how many
    * survived, and the stage drop rate. The ops dashboard a corpus
    * curation run is judged by, and the audit trail for "where did my
    * tokens go" (the reference keeps the analogous per-stage throughput
    * counters in its pipeline stats, Statistics.cs:1).
    *
    * Each document is charged to the FIRST stage that rejects it — the
    * short-circuit order a real pipeline applies the filters in. The
    * exact-dedup stage dedups only among docs that survived the scalar
    * stages (a copy of a quality-rejected doc is charged to dedup only if
    * that copy itself passed the scalar stages); keeper = min doc_id, the
    * [[graft.operators.Dedup.exact]] convention.
    *
    * Scale shape: ONE scoring pass (the quality + repetition kernels and
    * the language argmax are all map-only) feeds ONE (stage, xxhash64)
    * partial agg — text never rides an exchange (the Dedup hash-twin
    * discipline), and the corpus is touched exactly once: a survivor
    * text-group of n copies drops n−1 to dedup whichever copy is kept, so
    * the census never needs the keeper join-back. The grouped frame
    * (≈ #distinct survivor texts) collapses to a 1-row census, and the
    * 4-row report is projected from it. All four stages always appear
    * (zero-drop stages report dropped=0).
    */
  def curationFunnel(documents: DataFrame, minChars: Int = 100,
                     minWords: Int = 20, maxAvgWordLen: Double = 4.95,
                     maxPunctRatio: Double = 0.3, minStopwordRatio: Double = 0.0,
                     maxDupWordFrac: Double = 0.6, maxTopBigramFrac: Double = 0.08,
                     maxWordRun: Long = 2L,
                     keepLangs: Seq[String] = Seq("en")): DataFrame = {
    val scored = withRepetition(withQuality(documents))
    val scalarStage =
      when(qualityReason(minChars, minWords, maxAvgWordLen, maxPunctRatio,
        minStopwordRatio).isNotNull, "1_quality")
        .when(repetitionReason(maxDupWordFrac, maxTopBigramFrac, maxWordRun)
          .isNotNull, "2_repetition")
        .when(!langPred(col("text")).isin(keepLangs: _*), "3_language")
    val grouped = scored
      .select(scalarStage.as("stage"), xxhash64(col("text")).as("h"))
      .groupBy("stage", "h").agg(count(lit(1)).as("n"))
    def dropsAt(stage: String) =
      coalesce(sum(when(col("stage") === stage, col("n"))), lit(0L))
    val census = grouped.agg(
      dropsAt("1_quality").as("d1"), dropsAt("2_repetition").as("d2"),
      dropsAt("3_language").as("d3"),
      coalesce(sum(when(col("stage").isNull, col("n") - 1L)), lit(0L)).as("d4"),
      coalesce(sum("n"), lit(0L)).as("total"))
    def stageRow(stage: String, entering: Column, dropped: Column) =
      struct(lit(stage).as("stage"), entering.as("entering"),
        dropped.as("dropped"))
    census
      .select(explode(array(
        stageRow("1_quality", col("total"), col("d1")),
        stageRow("2_repetition", col("total") - col("d1"), col("d2")),
        stageRow("3_language", col("total") - col("d1") - col("d2"), col("d3")),
        stageRow("4_exact_dup",
          col("total") - col("d1") - col("d2") - col("d3"), col("d4"))))
        .as("r"))
      .select(col("r.stage").as("stage"), col("r.entering").as("entering"),
        col("r.dropped").as("dropped"),
        (col("r.entering") - col("r.dropped")).as("surviving"),
        when(col("r.entering") > 0,
          round(col("r.dropped").cast("double") / col("r.entering").cast("double"), 6))
          .as("drop_rate"))
      .orderBy("stage")
  }

  /** Token counts: whitespace tokens + a BPE-ish regex tokenizer (letter
    * runs / single digits / single punctuation — the classic pre-tokenizer
    * shape). The regex is kept in the portable subset (character classes,
    * alternation) so Java regex (Spark) and RE2 (DuckDB) agree.
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(wsWords(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"), lit(0))).cast("long").as("re_tokens")
    ).orderBy("doc_id")

  /** Function-word language ID (n-gram-heuristic family): score = count of
    * language-specific function words, argmax wins, ties → "und". Word lists
    * are tiny broadcast-free literals inside the codegen'd projection.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu")
  )

  def langId(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), langPred(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** The [[langId]] prediction as a composable Column — shared by the
    * standalone view and [[curationFunnel]]'s language stage.
    */
  private[operators] def langPred(text: Column): Column = {
    val words = wsWords(lower(text))
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val cnt = size(filter(words, w => ms.map(m => w === m).reduce(_ || _)))
      struct(cnt.as("score"), lit(lang).as("lang"))
    }
    // argmax via array_max on (score, lang) structs; all-zero → "und"
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken's MOSS scheme): hash
    * every word k-gram, then keep the minimum hash of each sliding window of
    * `w` grams, distinct. Guarantees any shared run of ≥ w+k−1 words between
    * two documents shares a fingerprint — the position-robust dedup
    * signature (rolling-hash [[fingerprint]] breaks on any single edit;
    * winnowing localizes it). Runs on the one-pass native
    * [[graft.functions.TextHashes.winnowFingerprints]] kernel;
    * [[winnowHof]] is the readable reference formulation it must match.
    */
  def winnow(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    documents.select(
      col("doc_id"),
      graft.functions.TextHashes.winnowFingerprints(col("text"), k, w).as("fingerprints")
    ).orderBy("doc_id")

  /** The HOF reference formulation of [[winnow]] — kept as the native
    * kernel's semantic oracle (TextMetricsSpec pins them equal). NOT a hot
    * path: the windows lambda inlines the whole `grams` subtree, so every
    * window re-derives every gram interpreted (quadratic; 97s vs <1s at
    * sf0.01 when exploded).
    */
  def winnowHof(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    // empty tokens are dropped, matching the native kernel's tokenizer
    // (bare split(" ") keeps them: "a  b c" would make 3 grams instead of 1)
    val words = filter(wsWords(col("text")), t => length(t) > 0)
    // short docs degrade to one whole-text gram (ANSI: element_at past the
    // end is an error, so the branch is explicit)
    val grams = when(size(words) < k, array(xxhash64(col("text"))))
      .otherwise(transform(
        sequence(lit(0), size(words) - k),
        i => xxhash64(concat_ws(" ", (0 until k).map(j => element_at(words, i + j + 1)): _*))))
    val windows = transform(
      sequence(lit(0), greatest(size(grams) - w, lit(0))),
      i => array_min(slice(grams, i + 1, lit(w))))
    documents.select(
      col("doc_id"),
      array_sort(array_distinct(windows)).as("fingerprints")
    ).orderBy("doc_id")
  }

  /** Query surface for [[winnow]]: one scalar row per (doc_id, fingerprint).
    * The array form stays the programmatic API (set-intersection consumers
    * want it packed); the exploded form is what external result stores and
    * row-wise comparers consume — scalar columns only.
    */
  def winnowExploded(documents: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    winnow(documents, k, w)
      .select(col("doc_id"), explode(col("fingerprints")).as("fingerprint"))
      .orderBy("doc_id", "fingerprint")

  /** Polynomial rolling-hash fingerprint (Karp–Rabin) over words, mod the
    * Mersenne prime 2^31−1: h ← (h·31 + (xxhash64(word) mod p)) mod p.
    * Order-sensitive (unlike a bag-of-words hash), one pass, and the mod-p
    * reduction keeps every intermediate < 2^36 — no ANSI overflow at any
    * input size.
    */
  def fingerprint(documents: DataFrame): DataFrame = {
    val p = lit(2147483647L)
    documents.select(
      col("doc_id"),
      aggregate(wsWords(col("text")), lit(0L),
        (acc, w) => pmod(acc * 31L + pmod(xxhash64(w), p), p)).as("fingerprint")
    ).orderBy("doc_id")
  }

  /** Fixed-size overlapping chunks over the whitespace token sequence —
    * the context-window preparation step RAG indexing and long-doc
    * pretraining share (complementing [[graft.operators.Packing]]'s
    * concat-and-split layout: packing fills windows ACROSS documents,
    * chunking windows WITHIN one). Chunk i covers tokens
    * [i·stride, i·stride + chunkTokens), stride = chunkTokens − overlap;
    * the final chunk may run short rather than re-padding. Map-only
    * explode — no shuffle at any scale, 1→N like the frame sampler.
    */
  def chunk(documents: DataFrame, chunkTokens: Int = 64, overlap: Int = 8): DataFrame =
    chunkUnsorted(documents, chunkTokens, overlap).orderBy("doc_id", "chunk_idx")

  /** [[chunk]] minus the presentation sort — the map-only core for
    * consumers that aggregate right after ([[languageMix]]): keeps the
    * chunk text on the map side instead of pushing it through a range
    * exchange it doesn't need.
    */
  private def chunkUnsorted(documents: DataFrame, chunkTokens: Int,
                            overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val words = wsWords(col("text"))
    val nChunks = greatest(
      ceil((size(words) - lit(overlap)).cast("double") / stride).cast("int"), lit(1))
    documents.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(words, i * stride + 1, lit(chunkTokens)))).as(Seq("chunk_idx", "cw")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", col("cw")).as("chunk_text"),
        size(col("cw")).cast("long").as("n_tokens"))
  }

  /** Per-document LANGUAGE MIX — the code-switching / mixed-language
    * detector a monolingual-corpus curation stage needs beyond [[langId]]'s
    * single whole-doc vote (a half-English half-German page votes "en" or
    * "de" there and silently pollutes either corpus): the doc is cut into
    * non-overlapping `chunkTokens`-token windows ([[chunk]] with overlap 0),
    * each window gets the [[langPred]] vote, and the rollup reports
    * n_chunks, n_langs (distinct identified languages), primary_lang (the
    * chunk-mode language — identified languages outrank "und", ties to the
    * lexicographic min) and mix_ratio = 1 − primary-chunks / identified
    * chunks (0 = monolingual, → 1 = thoroughly mixed; null when nothing
    * identified). All counting is integer and the ratio one IEEE division
    * rounded 12 dp — fully oracle-checkable.
    *
    * Scale shape: ONE corpus scan → map-only 1→N chunk explode with the
    * language vote fused into the same projection (the chunk TEXT never
    * leaves the map side — only (doc_id, lang) pairs reach the exchange)
    * → one (doc_id, lang) partial-agg count → one per-doc partial agg
    * whose argmax is the `min(struct(und, -cnt, lang))` trick (no window,
    * no sort), ≤ |langs|+1 rows per doc entering it.
    */
  def languageMix(documents: DataFrame, chunkTokens: Int = 32): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens < 1: $chunkTokens")
    val chunkLang = chunkUnsorted(documents, chunkTokens, overlap = 0)
      .select(col("doc_id"), langPred(col("chunk_text")).as("lang"))
    val cnts = chunkLang.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("cnt"))
    cnts.groupBy("doc_id")
      .agg(
        sum("cnt").as("n_chunks"),
        sum(when(col("lang") =!= "und", col("cnt")).otherwise(0L))
          .as("n_lang_chunks"),
        count(when(col("lang") =!= "und", lit(1))).as("n_langs"),
        min(struct((col("lang") === "und").cast("int").as("u"),
          (-col("cnt")).as("nc"), col("lang").as("l"))).as("top"))
      .select(col("doc_id"), col("n_chunks"), col("n_langs"),
        col("top.l").as("primary_lang"),
        when(col("n_lang_chunks") > 0,
          round(lit(1.0) - (-col("top.nc")).cast("double") / col("n_lang_chunks"),
            12)).as("mix_ratio"))
      .orderBy("doc_id")
  }

  /** Unigram-LM surprisal per document — the CCNet-style quality signal:
    * score(doc) = mean over tokens of −ln p(w), with p(w) the corpus
    * unigram frequency. Low = head-like/common text, high = rare/garbled;
    * filters cut both tails. Scored on the training corpus itself, so
    * every token has mass (no OOV smoothing needed). Parity: a plain
    * double mean is summed in engine-specific order and CAN cross the
    * final rounding boundary (observed at sf0.01), so each per-token term
    * is rounded to 12 dp (portable: libm ln agrees far below that) and
    * summed EXACTLY as decimal — the engine's decimal-cast-sums rule.
    *
    * Same shape (and same materialization barrier) as [[tfidfTopTerms]]:
    * the token frame feeds both the frequency model and the scoring join,
    * so it is localCheckpointed — one corpus read. The model join shuffles
    * on term (AQE broadcasts a fitting vocab); scoring is a partial-agg
    * mean per doc.
    */
  def unigramLogProb(documents: DataFrame): DataFrame = {
    // r15 (guide §2.3 — shuffle keys, not payloads): the model and the
    // scoring join only ever compare tokens for EQUALITY, and no token
    // string reaches the output — so the checkpointed frame carries
    // xxhash64(term) longs instead of term strings (the Dedup 8-byte-key
    // precedent; counts, and therefore surprisals, are unchanged)
    val tok = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .select(col("doc_id"), xxhash64(col("term")).as("t"))
      .localCheckpoint(true)
    val total = tok.count()
    val freq = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
    val term = round(log(lit(total.toDouble)) - log(col("cnt")), 12)
      .cast("decimal(28,14)")
    tok.join(freq, "t")
      .groupBy("doc_id")
      .agg(
        round(sum(term).cast("double") / count(lit(1)), 12).as("surprisal"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** DSIR-style IMPORTANCE WEIGHTS for domain-targeted data selection
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS'23 — the hashed-n-gram variant of classic
    * importance sampling): weight(doc) = mean over tokens of
    * ln p_target(w) − ln p_raw(w), with both LMs add-one-smoothed
    * unigram models over the UNION vocabulary (every raw token scores —
    * no OOV holes; a token the target corpus favors pulls the weight up,
    * a raw-corpus-typical token pulls it down). Downstream, sampling ∝
    * exp(weight) — or just thresholding the weight — reshapes the raw
    * corpus toward the target domain; compose with [[graft.operators
    * .Sampling.weightedSample]] for the draw.
    *
    * Scale shape: the raw token frame is localCheckpointed (feeds the
    * count model and the scoring join — one corpus read, the
    * [[unigramLogProb]] barrier); the target corpus is touched once for
    * its counts; the per-term weight table is vocab-sized (full-outer
    * count join; AQE broadcasts it back when it fits) and its totals
    * come from ONE tiny agg over that table, not a corpus re-count.
    * Parity: per-term weights rounded to 12 dp and summed exactly as
    * decimal (the engine's decimal-cast-sums rule), mean rounded to 12.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame): DataFrame = {
    val rtok = raw
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .localCheckpoint(true)
    val vocab = rtok.groupBy("term").agg(count(lit(1)).as("rc"))
      .join(target.select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("tc")), Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
      .localCheckpoint(true) // feeds the totals agg AND the scoring join
    val totals = vocab.agg(coalesce(sum("rc"), lit(0L)),
      coalesce(sum("tc"), lit(0L)), count(lit(1))).first()
    val (tr, tt, v) = (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    val lw = round(
      log((col("tc") + 1L).cast("double") / lit((tt + v).toDouble)) -
        log((col("rc") + 1L).cast("double") / lit((tr + v).toDouble)), 12)
      .cast("decimal(28,14)")
    rtok.join(vocab.select(col("term"), lw.as("lw")), "term")
      .groupBy("doc_id")
      .agg(round(sum("lw").cast("double") / count(lit(1)), 12).as("imp_weight"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** BM25 retrieval — top-k documents for a bag-of-terms query (Robertson
    * k1/b form, Lucene's idf = ln(1 + (N−df+0.5)/(df+0.5))). The lexical
    * search leg of the retrieval stack (the embedding stack covers the
    * dense leg) — what "find training docs about X" and RAG-over-corpus
    * both run.
    *
    * Scale shape: doc length is a MAP-ONLY `size(split(...))` that rides
    * the explode as a carried column (max-folded in the tf aggregate — it
    * is constant per doc), so there is no corpus-wide lengths join and the
    * token frame is never materialized. The term filter applies right
    * after the explode, so the ONE (doc_id, term) shuffle carries only
    * query-term hits (|Q| terms of postings, not the corpus); df off that
    * tf frame is ≤|Q| rows and broadcasts back; N and total length are
    * bounded driver aggregates; the final top-k is `orderBy().limit()` →
    * TakeOrderedAndProject (per-partition heaps + driver merge of
    * k·partitions rows, never a global sort).
    *
    * Parity: each per-term score is rounded to 12 dp (libm ln last-ulp)
    * and summed exactly as decimal per the engine's decimal-cast-sums
    * rule; avgdl = Σlen/N is one IEEE division of exact integers. Ties on
    * the rounded score break by doc_id ascending.
    */
  def bm25TopK(documents: DataFrame, queryTerms: Seq[String], topK: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = split(col("text"), " ")
    val stats = documents
      .agg(count(lit(1)), coalesce(sum(size(words).cast("long")), lit(0L)))
      .first()
    val (n, totLen) = (stats.getLong(0), stats.getLong(1))
    val avgdl = totLen.toDouble / n
    val tf = documents
      .select(col("doc_id"), size(words).cast("long").as("dl"),
        explode(words).as("term"))
      .where(col("term").isInCollection(queryTerms))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"), max("dl").as("dl"))
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

  /** Interpolated bigram-LM surprisal — the sequence-aware upgrade of
    * [[unigramLogProb]] (CCNet scores with a 5-gram KenLM; a bigram model
    * with unigram backoff is the same signal family, trainable in-engine):
    *
    *   p(w2 | w1) = λ·c(w1 w2)/c(w1·) + (1−λ)·c(w2)/T
    *
    * with c(w1·) the count of w1 as a bigram LEFT context (so the
    * conditional is self-consistent: Σ_w2 p = λ + (1−λ)·Σc(w2)/T), c(w2)
    * the plain unigram count, T total tokens. Doc score = mean −ln p over
    * its bigrams; scored on the training corpus, so backoff mass only
    * smooths rare CONTINUATIONS (no OOV). Docs with < 2 tokens have no
    * bigrams and drop out.
    *
    * Scale shape: the token-array frame is materialized ONCE and feeds
    * token explode (unigram model, T) and adjacent-pair explode (bigram
    * model + scoring) — one corpus read. c(w1·) partial-aggregates OFF
    * the bigram counts (no third scan); model joins shuffle on term keys
    * (AQE broadcasts a fitting vocab); the per-doc mean is a partial agg.
    * Parity: per-bigram terms round to 12 dp (libm ln) and sum exactly as
    * decimal — the engine's decimal-cast-sums rule.
    */
  def bigramLogProb(documents: DataFrame, lambda: Double = 0.9): DataFrame = {
    // r15 (guide §2.3): every downstream groupBy/join keys on token
    // EQUALITY only and no token string reaches the output, so both
    // checkpointed frames carry xxhash64 longs — the bigram frame drops
    // from two strings to two longs per row (the Dedup 8-byte-key
    // precedent; counts, and therefore surprisals, are unchanged)
    val base = documents
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => length(t) > 0).as("toks"))
      .localCheckpoint(true)
    val tok = base.select(explode(col("toks")).as("term"))
      .select(xxhash64(col("term")).as("term"))
    val total = tok.count()
    val uni = tok.groupBy("term").agg(count(lit(1)).as("cu"))
    val big = base
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), xxhash64(col("bg.w1")).as("w1"),
        xxhash64(col("bg.w2")).as("w2"))
      .localCheckpoint(true) // feeds pair counts, left counts, and scoring
    val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val p = lit(lambda) * col("c12").cast("double") / col("c1").cast("double") +
      lit(1.0d - lambda) * col("cu").cast("double") / lit(total.toDouble)
    val term = round(negate(log(p)), 12).cast("decimal(28,14)")
    big.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(uni.withColumnRenamed("term", "w2"), Seq("w2"))
      .groupBy("doc_id")
      .agg(
        round(sum(term).cast("double") / count(lit(1)), 12).as("surprisal2"),
        count(lit(1)).as("n_bigrams"))
      .orderBy("doc_id")
  }

  /** TF-IDF top-k terms per document — the classic keyword/representation
    * stage (smooth idf: ln((N+1)/(df+1)) + 1). Scores are rounded to 12
    * decimals BEFORE ranking so the selected set is engine-portable (libm
    * `ln` may differ in the last ulp; an unrounded rank could then pick a
    * different boundary row), ties broken by term ascending.
    *
    * Scale shape: tf is one (doc_id, term) groupBy with map-side combine,
    * MATERIALIZED (localCheckpoint) because two consumers read it — without
    * the barrier Catalyst duplicates the subtree and the corpus is scanned
    * and tokenized TWICE (plan-audited); df then partial-aggregates off the
    * stored (doc_id, term, tf) rows. The tf×df join shuffles on term (AQE
    * broadcasts when the vocab fits); per-doc top-k goes through the
    * bounded-heap [[graft.functions.TopKAgg]], so the final shuffle carries
    * k rows per (doc, partition), not the whole scored frame, and N is a
    * single bounded driver aggregate.
    */
  def tfidfTopTerms(documents: DataFrame, topK: Int = 5): DataFrame = {
    val n = documents.count()
    val tf = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term").withColumn("score",
      round(col("tf") * (log((lit(n) + 1.0d) / (col("df") + 1.0d)) + 1.0d), 12))
    val item = struct(negate(col("score")).as("neg"),
      col("term"), col("tf"), col("score"))
    scored.groupBy("doc_id")
      .agg(graft.functions.TopKAgg.topK(item, topK).as("top"))
      .select(col("doc_id"), explode(col("top")).as("t"))
      .select(col("doc_id"), col("t.term").as("term"),
        col("t.tf").as("tf"), col("t.score").as("score"))
      .orderBy(col("doc_id"), col("score").desc, col("term"))
  }

  /** Distinct 56-bit md5 n-gram keys per carried column set — the
    * CROSS-ENGINE gram convention (the oracle re-derives exact keys,
    * unlike the minhash family's xxhash64 shingles), so everything
    * downstream shuffles 8-byte longs, never gram text. Dedup runs on the
    * HASHED value (an in-doc 56-bit collision collapses identically on
    * both engines); docs under n tokens contribute nothing. Shared by
    * novelty, source overlap, [[Dedup.containmentPairs]] and
    * [[Dedup.minhashLshExact]].
    *
    * Round 13: computed by the FUSED kernel
    * ([[graft.functions.Md5Text.gramKeys56]] — tokenize → gram-bytes →
    * md5 → 56-bit prefix → in-row dedup in one codegen'd pass;
    * Md5TextSpec pins bit-parity with the composed
    * transform/concat_ws/md5/conv spelling the oracle still runs). The
    * kernel dedups PER ROW, which equals the old global `.distinct()`
    * because `carry` always includes the corpus key (`doc_id` — one row
    * per document is the documents-table contract) — and drops the
    * per-gram string materialization that was the measured residual cost
    * across ~5 of the bench's top-10 keys.
    *
    * The closing `repartition(g)` carries the same 8-byte rows the old
    * distinct shuffled, and is load-bearing twice: (a) every consumer
    * localCheckpoints this frame, and without a shuffle the kernel would
    * materialize at the SCAN's partitioning — one task on a one-file
    * corpus slice (the r13 bench caught exactly that: q_canonical_docs
    * 1.6× while its inputs sat in two partitions); (b) the checkpoint
    * RETAINS HashPartitioning(g), so the df-count `groupBy("g")` and the
    * inverted-gram joins downstream reuse it instead of re-exchanging.
    */
  /** The kernel's per-row dedup equals a global distinct ONLY under the
    * one-row-per-doc contract (r13 ADVICE): duplicated doc rows would
    * inflate every downstream intersection count SILENTLY. The guard
    * makes a contract violation loud instead — off by default (it costs
    * one aggregation over the corpus), switched on by
    * `spark.graft.gramKeys.checkUnique=true` in debug/CI runs.
    */
  private def assertOneRowPerDoc(documents: DataFrame, carry: Seq[String]): Unit = {
    val keyCols = if (carry.contains("doc_id")) Seq("doc_id") else carry
    val dup = documents.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).where(col("n") > 1).limit(1).collect()
    if (dup.nonEmpty) throw new IllegalStateException(
      s"gramKeys: input violates the one-row-per-doc contract (duplicate " +
        s"${keyCols.mkString(",")} = ${dup.head.toSeq.dropRight(1).mkString(",")}); " +
        "per-row gram dedup would inflate similarity counts downstream")
  }

  private[graft] def gramKeys(documents: DataFrame, n: Int,
                                  carry: Seq[String]): DataFrame = {
    if (documents.sparkSession.conf
        .getOption("spark.graft.gramKeys.checkUnique").exists(_.toBoolean))
      assertOneRowPerDoc(documents, carry)
    documents.select(carry.map(col) :+
      explode(graft.functions.Md5Text.gramKeys56(col("text"), n)).as("g"): _*)
      .repartition(col("g"))
  }

  private def docGramKeys(documents: DataFrame, n: Int): DataFrame =
    gramKeys(documents, n, Seq("doc_id", "source"))

  /** N-gram NOVELTY per document: the share of a doc's distinct n-grams
    * that appear in NO other document — the "how much genuinely new text
    * does this doc add" curation signal (near-1 = fresh content, near-0 =
    * recombined boilerplate; the scoring complement of the dedup family's
    * binary keep/drop). One long-keyed partial-agg for document frequency
    * + one long-keyed joinback + a per-doc rollup; docs with no n-gram
    * (under n tokens) emit 0/0 with null novelty.
    */
  def noveltyScore(documents: DataFrame, n: Int = 3): DataFrame = {
    val grams = docGramKeys(documents, n).localCheckpoint(true) // df + joinback
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val perDoc = grams.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
    documents.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_shingles") > 0,
          round(col("n_novel").cast("double") / col("n_shingles"), 12))
          .as("novelty"))
      .orderBy("doc_id")
  }

  /** Cross-SOURCE n-gram overlap matrix: for every source pair, how many
    * distinct n-grams they share — the corpus-level contamination /
    * provenance-leak view ("how much of source A's text also flows in
    * through source B"). Grams collapse to distinct (source, hash) pairs
    * FIRST (map-side-combining partial agg), so the pair join fans out at
    * most C(|sources|, 2) rows per gram and shuffles only longs.
    */
  def sourceNgramOverlap(documents: DataFrame, n: Int = 3): DataFrame = {
    val sg = docGramKeys(documents, n).select("source", "g").distinct()
      .localCheckpoint(true) // both sides of the pair join
    sg.as("a").join(sg.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("source_a", "source_b")
  }

  /** COMPRESSION-ratio quality signal: deflate(text) / bytes(text) — the
    * model-free redundancy score production curation runs
    * (RefinedWeb/MassiveText-style gzip filters): template spam and
    * boilerplate compress far below prose (<0.3), random gibberish
    * barely compresses (≈1.0), natural text sits in a stable band — one
    * number catching BOTH tails, complementing [[entropy]] (which sees
    * symbol distribution but not LZ-style long-range structure).
    * MAP-ONLY via the codegen'd deflate kernel. Rows-only on the gate:
    * the byte count is zlib-version-specific, not a cross-engine
    * protocol — the SIGNAL is portable, the exact integer is not.
    */
  def compressionRatio(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        octet_length(col("text")).cast("long").as("raw_bytes"),
        graft.functions.TextHashes.deflateSize(col("text")).as("deflate_bytes"))
      .withColumn("ratio",
        when(col("raw_bytes") > 0,
          round(col("deflate_bytes").cast("double") / col("raw_bytes"), 6)))
      .orderBy("doc_id")

  /** Text NORMALIZATION — the canonicalization pass run before exact
    * dedup so trivially-variant copies (case, whitespace runs, control
    * chars) collapse to one key: lowercase → control characters become
    * spaces (deleting them would weld "a\tb" into "ab") → collapse
    * whitespace runs to single spaces → trim. Map-only, in the
    * portable regex subset (Java and RE2/DuckDB agree byte-for-byte —
    * the PII discipline); `changed` flags rows the pass altered (the
    * audit column curation stages carry). Composes in front of
    * [[Dedup.exact]]/[[Dedup.exactByHash]] by keying on `norm_text` —
    * a raw-text dedup calls "Hello  World" and "hello world" distinct.
    */
  def normalizeText(documents: DataFrame): DataFrame =
    documents
      .withColumn("norm_text",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[\\x00-\\x1f\\x7f]", " "),
          " +", " ")))
      .withColumn("changed", col("norm_text") =!= col("text"))

  /** Per-document Shannon ENTROPY (nats) at word and character
    * granularity — the degenerate-text signal the ratio metrics miss:
    * keyboard mash scores high char-entropy, single-token spam scores
    * ~0 word-entropy, natural prose sits in a stable band (the CCNet/
    * Gopher-style filters cut both tails). MAP-ONLY: the
    * [[graft.functions.TextHashes.sortedRunLengths]] kernel folds each
    * doc to its ≤|distinct| per-value counts in one codegen'd pass, and
    * the entropy arithmetic runs over that tiny array — the text is
    * touched once, nothing shuffles, column pruning reaches the scan.
    *
    * Cross-engine determinism (the oracle recomputes counts via GROUP
    * BY): H = round(round(ln n, 12) − st/n, 12) with
    * st = Σ round(c·ln c, 12) summed as DECIMAL — per-term 12-dp
    * rounding absorbs libm's last-ulp ln drift (the tfidf discipline)
    * and the decimal sum makes the total order-independent, so the
    * count-multiset (not its order) determines the score. Empty text:
    * word side is the [""] singleton (entropy 0, matching
    * string_split); char side has n=0 → NULL.
    */
  def entropy(documents: DataFrame): DataFrame = {
    def h(runs: Column): Column = {
      val n = aggregate(runs, lit(0L), (acc, c) => acc + c)
      val st = aggregate(runs, lit(java.math.BigDecimal.ZERO).cast("decimal(28,12)"),
        (acc, c) => (acc +
          round(c.cast("double") * log(c.cast("double")), 12).cast("decimal(28,12)"))
          .cast("decimal(28,12)")) // decimal + widens (28,12)→(29,12); pin the accumulator type
      when(n > 0,
        round(round(log(n.cast("double")), 12) - st.cast("double") / n.cast("double"), 12))
    }
    import graft.functions.TextHashes.sortedRunLengths
    documents
      .select(col("doc_id"),
        sortedRunLengths(col("text"), byChar = false).as("wr"),
        sortedRunLengths(col("text"), byChar = true).as("cr"))
      .select(col("doc_id"),
        aggregate(col("wr"), lit(0L), (acc, c) => acc + c).as("n_words"),
        h(col("wr")).as("word_entropy"),
        aggregate(col("cr"), lit(0L), (acc, c) => acc + c).as("n_chars"),
        h(col("cr")).as("char_entropy"))
      .orderBy("doc_id")
  }
}
