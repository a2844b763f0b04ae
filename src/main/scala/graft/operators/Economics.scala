package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Wealth-distribution analytics over the indexed ledger — the
  * inequality dashboard a UBI deployment watches (the reference's
  * Postgres serves exactly this kind of ad-hoc aggregate over
  * `cache_crc_balances_by_safe_and_token`; a basic-income system's core
  * health question is "is the currency concentrating?").
  *
  * The shared primitive is a GLOBAL rank/prefix-scan in value order.
  * That is the classic Spark scale trap: `Window.orderBy(x)` with no
  * partition key collapses the table into ONE task. Every operator here
  * uses the two-phase distributed scan instead (the
  * [[Packing.packLayout]] machinery, generalized to value-ordered
  * ranks):
  *
  *  1. rows bucket by fixed-width value range (`numBuckets` ordered
  *     buckets; boundaries from a 1-row min/max agg);
  *  2. per-bucket row counts / weight totals — a partial-aggregated
  *     shuffle of ≤ numBuckets rows — prefix-summed on the driver
  *     (bounded collect) into per-bucket BASE offsets riding the plan
  *     as a map literal;
  *  3. within each bucket a PARTITIONED window (distributed) adds the
  *     local rank / running weight to the bucket base.
  *
  * At 100 TB: numBuckets scales with the cluster; the only global data
  * movement is the per-bucket totals. Value skew (many equal values)
  * concentrates a bucket — the boundaries could come from
  * `approxQuantile` instead of fixed width without touching the
  * algebra; fixed width keeps the demo deterministic.
  *
  * Cross-engine determinism: ranks are tie-broken by a unique key
  * column, weights sum as DECIMAL (the decimal-cast-sums parity rule),
  * every emitted ratio rounds to 12 dp.
  */
object Economics {

  /** `df` plus a 1..n global `rank` by (`valueCol`, `tieCol`) ascending
    * and the running `cum_w` = Σ `weightCol` through the current row in
    * that order (inclusive). `tieCol` must be unique per row; `weightCol`
    * should be an exact type (long / decimal) — it is summed as-is.
    */
  def orderedScan(df: DataFrame, valueCol: String, tieCol: String,
                  weightCol: String, numBuckets: Int = 64,
                  cutInput: Boolean = true): DataFrame = {
    val wd = col(weightCol).cast("decimal(38,6)")
    // the input frame feeds THREE consumers (the min/max probe, the
    // per-bucket totals, and the final per-bucket scan) — most callers
    // pass a derived aggregate, so without a cut it recomputed 3×
    // (measured: the wealth-frame rollup ran three times under q_lorenz).
    // One eager localCheckpoint; the frame is the caller's per-key
    // rollup, already far smaller than its raw input. A caller whose
    // input is ALREADY materialized (rfmFromRollup scans one cut frame
    // three times) passes cutInput = false to skip the redundant copy.
    val dfc = if (cutInput) df.localCheckpoint(true) else df
    val b = withRangeBucket(dfc, valueCol, numBuckets)
    if (b.isEmpty)
      return dfc.withColumn("rank", lit(0L))
        .withColumn("cum_w", wd).where(lit(false))
    val bucketed = b.get
    // phase 2: ≤ numBuckets (count, weight) totals, prefix-summed driver-side
    val totals = bucketed.groupBy("gr_bucket")
      .agg(count(lit(1)).as("n"), sum(wd).cast("decimal(38,6)").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
      .sortBy(_._1)
    val cumN = totals.scanLeft(0L) { case (acc, (_, n, _)) => acc + n }
    val zero = java.math.BigDecimal.ZERO
    val cumW = totals.scanLeft(zero) { case (acc, (_, _, w)) => acc.add(w) }
    val baseN: Map[Long, Long] = totals.map(_._1).zip(cumN).toMap
    val baseW: Map[Long, java.math.BigDecimal] = totals.map(_._1).zip(cumW).toMap
    // phase 3: distributed per-bucket scan + literal bases (row_number
    // rejects an explicit frame spec, so the two windows differ)
    val ord = Window.partitionBy("gr_bucket").orderBy(col(valueCol), col(tieCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("rank",
        row_number().over(ord).cast("long") +
          element_at(typedlit(baseN), col("gr_bucket")))
      .withColumn("cum_w",
        (sum(wd).over(run) +
          element_at(typedlit(baseW), col("gr_bucket"))).cast("decimal(38,6)"))
      .drop("gr_bucket")
  }

  /** `df` + an order-preserving `gr_bucket` (fixed-width on `valueCol`;
    * equal values never straddle a boundary). None when `df` is empty.
    */
  private def withRangeBucket(df: DataFrame, valueCol: String,
                              numBuckets: Int): Option[DataFrame] = {
    require(numBuckets >= 1, s"numBuckets < 1: $numBuckets")
    val mm = df.agg(min(col(valueCol)).cast("double"),
      max(col(valueCol)).cast("double")).head()
    if (mm.isNullAt(0)) return None
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / numBuckets
    val bucket =
      if (width <= 0) lit(0L) // all values equal (or one bucket)
      else least(floor((col(valueCol).cast("double") - lit(lo)) / lit(width)),
        lit(numBuckets - 1L)).cast("long")
    Some(df.withColumn("gr_bucket", bucket))
  }

  /** Gini coefficient of `valueCol` (non-negative wealth per row): one
    * row (n, total, gini) with
    * gini = 2·Σᵢ rankᵢ·xᵢ / (n·Σx) − (n+1)/n over the ascending-rank
    * order. Tie-robust: permuting ranks among equal x leaves Σ rank·x
    * unchanged, so the `tieCol` tiebreak never shows in the output.
    * Σ rank·x accumulates as DECIMAL(38,6) — exact far past 2^53, where
    * a double dot product would drift.
    */
  def gini(df: DataFrame, valueCol: String, tieCol: String,
           numBuckets: Int = 64): DataFrame = {
    val xd = col(valueCol).cast("decimal(18,4)")
    val ranked = orderedScan(
      df.withColumn("gr_w", xd), valueCol, tieCol, "gr_w", numBuckets)
    ranked.agg(
        count(lit(1)).as("n"),
        sum(xd).as("s"),
        sum((col("rank") * xd).cast("decimal(38,6)")).as("sr"))
      .select(col("n"),
        col("s").cast("double").as("total"),
        round(lit(2.0) * col("sr").cast("double")
            / (col("n").cast("double") * col("s").cast("double"))
          - (col("n") + 1).cast("double") / col("n").cast("double"),
          12).as("gini"))
  }

  /** Herfindahl–Hirschman concentration index over `valueCol` — HHI =
    * Σ sᵢ² for shares sᵢ = xᵢ/Σx, plus the effective number of
    * participants 1/HHI (the "how many equal-size holders would look
    * like this" reading): the antitrust-standard scalar completing the
    * inequality family — [[gini]] says "how unequal", concentration
    * says "how few capture a majority", HHI says "how lumpy overall".
    *
    * Shape: ONE partial-agg pass — no rank, no sort, no window (HHI is
    * permutation-invariant, so it skips the orderedScan the rest of the
    * family needs). Determinism: Σx and Σx² accumulate as exact
    * decimals (x as decimal(18,4), x² as decimal(38,8)); hhi =
    * Σx²/(Σx·Σx) and eff = 1/hhi are IEEE ops over the decimal-cast
    * doubles in one mirrored tree — NO round() anywhere (1/hhi can be
    * \|holders\|-magnitude, where round-12 is the documented
    * large-magnitude trap). Zero/empty totals yield null.
    */
  def hhi(df: DataFrame, valueCol: String): DataFrame = {
    val xd = col(valueCol).cast("decimal(18,4)")
    val t = col("s").cast("double")
    val raw = col("ss").cast("double") / (t * t)
    df.agg(
        count(lit(1)).as("n_holders"),
        sum(xd).cast("decimal(38,6)").as("s"),
        sum((xd * xd).cast("decimal(38,8)")).as("ss"))
      .select(col("n_holders"), t.as("total"),
        when(col("s") > 0, raw).as("hhi"),
        when(col("s") > 0, lit(1.0d) / raw).as("effective_holders"))
  }

  /** Lorenz curve at `buckets` quantile bins (deciles by default): per
    * bin the row count, wealth sum, wealth share, and cumulative share —
    * "the bottom 50% hold cum_share of the currency". Bin assignment is
    * the rank formula `(rank−1)·buckets DIV n` (exact integer math, no
    * NTILE remainder convention to match across engines); the
    * cumulative share reuses the running decimal `cum_w` from the scan,
    * so the only post-rank work is one ≤`buckets`-row aggregate.
    */
  def lorenz(df: DataFrame, valueCol: String, tieCol: String,
             buckets: Int = 10, numBuckets: Int = 64): DataFrame = {
    val ranked = orderedScan(
      df.withColumn("gr_w", col(valueCol).cast("decimal(18,4)")),
      valueCol, tieCol, "gr_w", numBuckets)
      .localCheckpoint(true) // feeds the 1-row total AND the bin agg
    val tot = ranked.agg(count(lit(1)).as("n"), sum("gr_w").as("t"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("bin", expr(s"((rank - 1) * $buckets) DIV n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        sum("gr_w").cast("double").as("wealth"),
        round(sum("gr_w").cast("double") / first("t").cast("double"), 12)
          .as("share"),
        round(max("cum_w").cast("double") / first("t").cast("double"), 12)
          .as("cum_share"))
      .orderBy("bin")
  }

  /** CONCENTRATION report: the NAKAMOTO COEFFICIENT (minimum number of
    * top holders whose combined balance is a strict majority — the
    * standard decentralization-health scalar of a token economy) plus
    * the top-`topK` holders' wealth share. The decision-relevant
    * complement of [[gini]]: Gini says "how unequal", Nakamoto says "how
    * few actors could capture it".
    *
    * Same two-phase [[orderedScan]] machinery, descending (rank on the
    * negated value; ties by `tieCol`). The majority test is EXACT decimal
    * algebra — `cum ≤ total − cum` (⟺ 2·cum ≤ total) never touches a
    * double, so the boundary holder cannot flip cross-engine; only the
    * emitted shares are doubles, rounded 12 dp. Zero/negative totals
    * yield null coefficients (no majority exists to capture).
    */
  def concentration(df: DataFrame, valueCol: String, tieCol: String,
                    topK: Int = 10, numBuckets: Int = 64): DataFrame = {
    val ranked = orderedScan(
      df.withColumn("gr_neg", negate(col(valueCol)))
        .withColumn("gr_w", col(valueCol).cast("decimal(18,4)")),
      "gr_neg", tieCol, "gr_w", numBuckets)
      .localCheckpoint(true) // feeds the 1-row total AND the report agg
    val tot = ranked.agg(count(lit(1)).as("n_holders"),
      sum("gr_w").cast("decimal(38,6)").as("t"))
    ranked.crossJoin(broadcast(tot))
      .groupBy("n_holders", "t")
      .agg(
        // count of prefixes still at-or-below half, +1 = first strict
        // majority rank (cum is non-decreasing, so the count IS the rank−1)
        (sum(when(col("cum_w") <= col("t") - col("cum_w"), 1L).otherwise(0L))
          + 1L).as("nk"),
        max(when(col("rank") <= topK, col("cum_w"))).as("topk_cum"))
      .select(col("n_holders"), col("t").cast("double").as("total"),
        when(col("t") > 0, col("nk")).as("nakamoto"),
        when(col("t") > 0,
          round(col("topk_cum").cast("double") / col("t").cast("double"), 12))
          .as("topk_share"))
  }

  /** Velocity of money per day over the indexed ERC-20 ledger: peer
    * transfer volume ÷ circulating supply (cumulative UBI issuance) —
    * "how hard does each minted unit work". `erc20Transfers` carries
    * (token, from, to, value, ts); only tokens registered in `signups`
    * count (the reference's registered-token discipline, 0.0.64.sql
    * crc_* views); mints are transfers FROM the zero address (the ERC-20
    * mint convention the reference's minting views filter on).
    *
    * Shape: one broadcast semi-join (registry ≪ ledger), one partial-agg
    * shuffle to per-day rows, then an unpartitioned cumulative window —
    * legal here because it runs on the POST-AGG frame (|days| rows), not
    * the ledger. Sums are decimal; the ratio rounds to 12 dp.
    */
  def moneyVelocity(erc20Transfers: DataFrame, signups: DataFrame): DataFrame = {
    val zero = "0x" + "0" * 40
    val reg = signups.where(col("token").isNotNull).select("token").distinct()
    val crct = erc20Transfers.join(broadcast(reg), Seq("token"), "left_semi")
    val perDay = crct
      .groupBy(col("ts").cast("date").as("day"))
      .agg(
        coalesce(sum(when(col("from") === zero, col("value"))
          .cast("decimal(18,4)")), lit(0).cast("decimal(18,4)")).as("minted_d"),
        coalesce(sum(when(col("from") =!= zero, col("value"))
          .cast("decimal(18,4)")), lit(0).cast("decimal(18,4)")).as("vol_d"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay
      .withColumn("supply_d", sum("minted_d").over(w))
      .select(col("day"),
        col("vol_d").cast("double").as("volume"),
        col("minted_d").cast("double").as("minted"),
        col("supply_d").cast("double").as("supply"),
        when(col("supply_d") > 0,
          round(col("vol_d").cast("double") / col("supply_d").cast("double"),
            12)).as("velocity"))
      .orderBy("day")
  }
}
