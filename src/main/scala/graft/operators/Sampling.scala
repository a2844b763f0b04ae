package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, hash-gated corpus sampling — the REPRODUCIBLE subset
  * machinery a training-data pipeline needs: the same rows are selected on
  * any cluster size, any partitioning, any rerun, and any engine (the
  * DuckDB oracle reproduces the exact sample), unlike RNG-seeded
  * `df.sample` whose output depends on partition layout.
  *
  * Gate: a row is sampled iff the first 8 hex digits of md5(key ∥ salt)
  * fall lexicographically under the rate's hex cutoff — hex strings of
  * equal length order exactly like their numeric values, so no base
  * conversion is needed on either engine and the comparison is
  * codegen-friendly. Cutoff = permille · ⌊2³²/1000⌋ (integer-only: bias
  * < 1e-6, exactness across engines guaranteed). Map-only, no shuffle;
  * the filter pushes into the scan where the key is a plain column.
  */
object Sampling {

  /** 8-hex-digit cutoff for a permille rate. 1000‰ maps to "g" — one past
    * every hex digit — so a full-rate gate keeps EVERY row (the integer
    * cutoff 1000·⌊2³²/1000⌋ < 2³²−1 would drop the ~7e-6 tail).
    */
  def cutoffHex(permille: Int): String = {
    require(permille >= 0 && permille <= 1000, s"permille out of range: $permille")
    if (permille == 1000) "g" else f"${permille.toLong * 4294967L}%08x"
  }

  private def gate(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** Keep ≈ permille/1000 of rows, chosen by key hash. `salt` yields
    * independent samples from the same corpus (disjointness is NOT
    * guaranteed between salts, but rerun-stability per salt is).
    */
  def hashSample(df: DataFrame, keyCol: String, permille: Int, salt: String = ""): DataFrame =
    df.where(gate(col(keyCol), salt) < lit(cutoffHex(permille)))

  /** Per-source weighted downsampling to a target mixture: source s keeps
    * `permille(s)` of its rows; unlisted sources are dropped (the mixture
    * is explicit). One map-only pass — the per-source cutoff is a
    * when-chain literal, no join, no shuffle.
    */
  def sourceMix(df: DataFrame, sourceCol: String, keyCol: String,
                permille: Map[String, Int], salt: String = ""): DataFrame = {
    val cutoff = permille.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (s, p)) => when(col(sourceCol) === s, lit(cutoffHex(p))).otherwise(acc)
    }
    df.withColumn("_cut", cutoff)
      .where(col("_cut").isNotNull && gate(col(keyCol), salt) < col("_cut"))
      .drop("_cut")
  }

  /** Deterministic train/val/test assignment — the split every corpus
    * needs before training. Row → split by where its hash gate lands:
    * [0, val) → "val", [val, val+test) → "test", rest → "train". The
    * same hash orders all three, so splits are DISJOINT and EXHAUSTIVE by
    * construction (unlike three independent hashSample calls), stable
    * under reruns/repartitioning, and a row keeps its split when the
    * corpus grows — an eval doc can never silently migrate into train,
    * which is the leakage property that matters. Map-only when-chain;
    * no shuffle, no join.
    */
  def stratifiedSplit(df: DataFrame, keyCol: String, valPermille: Int,
                      testPermille: Int, salt: String = ""): DataFrame = {
    require(valPermille + testPermille <= 1000,
      s"val+test > 1000 permille: $valPermille+$testPermille")
    val g = gate(col(keyCol), salt)
    df.withColumn("split",
      when(g < lit(cutoffHex(valPermille)), "val")
        .when(g < lit(cutoffHex(valPermille + testPermille)), "test")
        .otherwise("train"))
  }

  /** LEAK-FREE train/eval split: [[stratifiedSplit]]'s hash gate assigns
    * train/test, then any TEST doc whose exact text also appears in a
    * TRAIN doc is re-labeled `test_leaked` — content the model will see
    * in training must not score it at eval (the held-out-set hygiene
    * [[graft.operators.Dedup.decontaminate]] applies to near-matches,
    * here at exact-text strength with a DuckDB-checkable census). A
    * test-internal duplicate (no train copy) stays `test`: eval-side
    * dedup is a separate policy.
    *
    * Scale shape: the split gate is map-only; the leak check is ONE
    * shuffle on xxhash64(text) — an unordered window marks every
    * text-group containing a train member, so no join, no second corpus
    * pass, and text never rides the exchange beyond its 8-byte hash.
    */
  def leakFreeSplit(documents: DataFrame, keyCol: String = "doc_id",
                    testPermille: Int = 200, salt: String = ""): DataFrame = {
    val s = stratifiedSplit(documents, keyCol, 0, testPermille, salt)
      .select(col(keyCol), xxhash64(col("text")).as("h"), col("split"))
    val hasTrain = max(when(col("split") === "train", 1).otherwise(0))
      .over(org.apache.spark.sql.expressions.Window.partitionBy("h"))
    s.withColumn("has_train", hasTrain)
      .select(col(keyCol),
        when(col("split") === "test" && col("has_train") === 1, "test_leaked")
          .otherwise(col("split")).as("split"))
      .orderBy(keyCol)
  }

  /** EXACT-k deterministic sample: the k rows whose key hashes order
    * first — the reservoir-sampling answer without reservoir state.
    * [[hashSample]] gives a RATE (row count varies with corpus size);
    * this gives a COUNT. Same reproducibility doctrine: rerun-,
    * repartition- and growth-stable (a kept row is only ever displaced
    * by a new row hashing earlier), and samples NEST — sampleExactK(k₁)
    * ⊆ sampleExactK(k₂) for k₁ ≤ k₂, so growing a sample never
    * re-draws it (spec'd).
    *
    * Plan shape: `orderBy(hash).limit(k)` = TakeOrderedAndProject —
    * per-partition k-bounded heaps, driver merges partitions×k rows;
    * no global sort, no full shuffle, at any corpus size.
    */
  def sampleExactK(df: DataFrame, keyCol: String, k: Int,
                   salt: String = ""): DataFrame =
    df.orderBy(gate(col(keyCol), salt), col(keyCol)).limit(k)

  /** WEIGHTED sample without replacement (Efraimidis–Spirakis A-Res,
    * 2006): keep the k rows with the largest priority u^(1/w), where u is
    * a DETERMINISTIC uniform drawn from the md5-56 hash convention —
    * P(row in sample) follows the weights exactly as the randomized
    * algorithm, but the draw is a pure function of (key, salt): rerun-,
    * partition- and engine-stable, like every sampler in this family
    * (reservoir sampling's answer without reservoir state or RNG
    * nondeterminism). The quality-weighted corpus cut: w = a quality
    * score or token count, and high-weight docs are proportionally more
    * likely to survive — where [[hashSample]] is uniform and
    * [[budgetSelect]] is a deterministic greedy prefix, this is the
    * principled middle.
    *
    * Plan: one map pass computes priorities (u = (h+1)/2^56 ∈ (0,1];
    * priority rounds to 12 dp before ranking — libm `pow` may differ in
    * the last ulp and an unrounded rank could select a different
    * boundary row, the tfidf rule), then `orderBy().limit(k)` →
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    * Non-positive weights are excluded (they have no sampling mass).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    val h = graft.functions.HashConv.md5Long56(
      concat(col(keyCol).cast("string"), lit(salt)))
    val u = (h.cast("double") + lit(1.0d)) / lit(72057594037927936.0d)
    df.where(col(weightCol) > 0)
      .withColumn("priority",
        round(pow(u, lit(1.0d) / col(weightCol).cast("double")), 12))
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
  }

  /** Per-GROUP document cap: keep at most `cap` rows per group (the
    * standard "no domain may dominate the corpus" curation valve — cap
    * docs per domain/source before mixing). Selection is deterministic:
    * within a group, rows rank by md5(key∥":"∥salt) then key — the
    * engine's cross-engine hash-order convention (shared with
    * [[Packing.shardAssign]], DuckDB-reproducible, so the op is
    * oracle-checked), rerun- and partition-stable, and changing `salt`
    * redraws the survivors without touching group membership.
    *
    * Plan shape (the 100 TB property): NOT a row_number window — that
    * shuffles and sorts the whole corpus by group and serializes each hot
    * group through one reducer. Instead the per-group bounded heap
    * ([[graft.functions.TopKAgg]]) partial-aggs map-side, so the shuffle
    * carries ≤ cap·groups·partitions (rank, key) pairs — never text —
    * and the kept-key set joins back as a LEFT SEMI on the key (hot
    * groups cost cap keys, not |group| window rows).
    */
  def groupCap(df: DataFrame, groupCol: String, keyCol: String, cap: Int,
               salt: String = ""): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val rank = md5(concat(col(keyCol).cast("string"), lit(":"), lit(salt)))
    // the keep-set carries (group, key) PAIRS and the join-back matches
    // both: a key kept in one group must not resurrect same-key rows of
    // OTHER groups (keys are not required to be globally unique —
    // e.g. content hashes recurring across domains)
    val kept = df
      .select(col(groupCol), col(keyCol))
      .groupBy(groupCol)
      .agg(graft.functions.TopKAgg.topK(
        struct(rank.as("r"), col(keyCol).as("k")), cap).as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col(groupCol), col("t.k").as(keyCol))
    df.join(kept, Seq(groupCol, keyCol), "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*) // join-key reorder undone
  }

  /** TEMPERATURE mixture permilles: source s gets sampling mass ∝ c_s^α
    * (α=1 keeps natural proportions, α→0 flattens toward uniform — the
    * standard multilingual/multi-source rebalancing), scaled so the
    * EXPECTED total kept is `targetRows`, capped at keep-everything. All
    * boundary arithmetic is integer (weights floor to 1e-6 grains, the
    * permille is a BigInt floor-division), so the map is bit-reproducible
    * across engines; α=0.5 additionally makes the one floating step a
    * correctly-rounded IEEE sqrt, giving EXACT cross-engine parity (the
    * oracle's contract — general pow is last-ulp platform-dependent).
    * Oversubscribed sources (rate ≥ 1) cap at 1000 and the shortfall is
    * NOT redistributed — deliberate: redistribution would make every
    * source's rate depend on every other's saturation, breaking the
    * "adding a source never changes another source's sample" stability
    * that hash-gated selection exists to provide.
    */
  def temperatureMixPermille(counts: Map[String, Long], alpha: Double,
                             targetRows: Long): Map[String, Int] = {
    require(alpha >= 0.0, s"negative alpha: $alpha")
    require(targetRows >= 0, s"negative target: $targetRows")
    require(counts.values.forall(_ > 0), "empty sources must be absent")
    val weights = counts.toSeq.sortBy(_._1).map { case (s, c) =>
      val w = if (alpha == 0.5) math.sqrt(c.toDouble) else math.pow(c.toDouble, alpha)
      s -> BigInt(math.floor(w * 1e6).toLong)
    }
    val wsum = weights.map(_._2).sum
    weights.map { case (s, wt) =>
      val p = BigInt(1000) * BigInt(targetRows) * wt / (wsum * BigInt(counts(s)))
      s -> p.min(BigInt(1000)).toInt
    }.toMap
  }

  /** EPOCH/REPETITION budget plan — the standard pretraining data schedule:
    * each source s gets `weightPermille(s)`/1000 of `budgetTokens`, served
    * by REPEATING the source (epochs) when its corpus is smaller than its
    * share, capped at `maxEpochs` passes (beyond which repetition stops
    * helping and the shortfall is deliberately NOT redistributed — the
    * same "adding a source never changes another source's sample"
    * stability doctrine as [[temperatureMixPermille]]). Returns per
    * source: full passes over the corpus plus a hash-gated fractional
    * last pass in permille.
    *
    * All arithmetic is integer (BigInt floor divisions), so the plan is
    * bit-reproducible across engines — the DuckDB oracle re-derives the
    * identical plan with HUGEINT division.
    */
  def epochPlanPermille(tokenCounts: Map[String, Long],
                        weightPermille: Map[String, Int], budgetTokens: Long,
                        maxEpochs: Int = 3): Map[String, (Int, Int)] = {
    require(budgetTokens >= 0, s"negative budget: $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs < 1: $maxEpochs")
    require(tokenCounts.values.forall(_ > 0), "empty sources must be absent")
    weightPermille.collect { case (s, w) if tokenCounts.contains(s) =>
      val c = BigInt(tokenCounts(s))
      val target = BigInt(budgetTokens) * w / 1000
      val fullUncapped = target / c
      if (fullUncapped >= maxEpochs) s -> ((maxEpochs, 0))
      else {
        val full = fullUncapped.toInt
        val residual = (BigInt(1000) * (target - fullUncapped * c) / c)
          .min(BigInt(1000)).toInt
        s -> ((full, residual))
      }
    }
  }

  /** Materialize an epoch plan: every planned source row appears once per
    * full epoch (epoch = 0..full−1) plus, in the fractional last epoch
    * (epoch = full), iff its hash gate falls under the residual cutoff —
    * so the realized token count tracks the plan's target and the
    * fractional slice is the SAME deterministic subset on every rerun,
    * engine, and partitioning. Unplanned sources drop (explicit mixture).
    *
    * Plan shape: when-chain literals + one `explode(sequence(...))` —
    * map-only row amplification bounded by maxEpochs+1, no join, no
    * shuffle; the epoch column is what a downstream shuffled-shard writer
    * keys on so repeated copies don't co-locate.
    */
  def epochExpand(df: DataFrame, sourceCol: String, keyCol: String,
                  plan: Map[String, (Int, Int)], salt: String = ""): DataFrame = {
    val fullChain = plan.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (s, (f, _))) => when(col(sourceCol) === s, lit(f.toLong)).otherwise(acc)
    }
    val resChain = plan.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (s, (_, r))) => when(col(sourceCol) === s, lit(cutoffHex(r))).otherwise(acc)
    }
    df.withColumn("_full", fullChain)
      .withColumn("_rescut", resChain)
      .where(col("_full").isNotNull)
      .withColumn("epoch", explode(sequence(lit(0L), col("_full"))))
      .where(col("epoch") < col("_full") || gate(col(keyCol), salt) < col("_rescut"))
      .drop("_full", "_rescut")
  }

  /** [[epochExpand]] with the plan COMPUTED from observed per-source token
    * sums — one partial-agg count pass (collect bounded by #sources), then
    * the map-only expansion; at 100 TB table statistics substitute for the
    * counts pass, exactly as in [[temperatureMix]].
    */
  def epochMix(df: DataFrame, sourceCol: String, keyCol: String,
               tokenCol: String, weightPermille: Map[String, Int],
               budgetTokens: Long, maxEpochs: Int = 3,
               salt: String = ""): DataFrame = {
    val counts = df.groupBy(sourceCol).agg(sum(col(tokenCol)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    epochExpand(df, sourceCol, keyCol,
      epochPlanPermille(counts, weightPermille, budgetTokens, maxEpochs), salt)
  }

  /** [[sourceMix]] with the mixture COMPUTED by [[temperatureMixPermille]]
    * from the observed per-source counts: one partial-aggregated count
    * pass (collect bounded by the number of sources — a mixture has
    * dozens, not millions), then the same map-only when-chain gate. At
    * 100 TB the counts pass is the only corpus touch besides the gate
    * itself, and table statistics can substitute for it.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
                     alpha: Double, targetRows: Long, salt: String = ""): DataFrame = {
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sourceMix(df, sourceCol, keyCol,
      temperatureMixPermille(counts, alpha, targetRows), salt)
  }

  /** Quality-ranked TOKEN-BUDGET selection — the "best N tokens" cut a
    * compute-bound training run makes: rank documents by a quality score
    * (descending, doc_id tiebreak) and keep the prefix whose running
    * token total fits `budgetTokens`. Emits EVERY doc with its rank-order
    * running total and a `keep` verdict (the caller filters — the
    * rejected tail is the audit trail).
    *
    * Score = round(stopword_ratio − punct_ratio, 12) from
    * [[TextMetrics.withQuality]] — natural-prose likelihood minus symbol
    * noise, both ratios already oracle-parity-proven bit-identical, so
    * the ORDER (the only thing the cut depends on) is cross-engine exact.
    *
    * The global running total is [[graft.operators.Economics.orderedScan]]'s
    * two-phase distributed scan (never a bare unpartitioned window);
    * ranking ascends by −score, so the best docs rank first. Token
    * counts are whitespace tokens (swap a trained [[graft.functions.BpeOps]]
    * count in via the same column).
    */
  def budgetSelect(documents: DataFrame, budgetTokens: Long,
                   numBuckets: Int = 64): DataFrame = {
    require(budgetTokens >= 0, s"negative budget: $budgetTokens")
    val m = TextMetrics.withQuality(documents)
      .select(col("doc_id"), col("n_words").as("n_tok"),
        round(col("stopword_ratio") - col("punct_ratio"), 12).as("score"))
      .withColumn("neg_score", -col("score"))
    Economics.orderedScan(m, "neg_score", "doc_id", "n_tok", numBuckets)
      .select(col("doc_id"), col("n_tok"), col("score"),
        col("cum_w").cast("long").as("cum_tokens"),
        (col("cum_w") <= budgetTokens).as("keep"))
      .orderBy("doc_id")
  }
}
