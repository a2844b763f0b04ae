package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stateful-view operators: latest-state-per-key, balances, running balance,
  * sessionization, windowed throughput.
  *
  * Reference semantics: the indexer's Postgres schema derives "current state"
  * views from the append-only event tables — e.g. the current trust limit is
  * the *latest* `crc_trust_2` row per (user, can_send_to), and an address's
  * balance is Σ credits − Σ debits over `erc20_transfer_2`
  * (README.md "Indexed events"; `Persistence/ImportProcedure.cs:30-39` lists
  * the final tables these views sit on).
  */
object StateOps {

  /** Deterministic epoch-milliseconds of a timestamp column (both Spark and
    * the DuckDB oracle truncate parquet ns → µs, then integer-divide).
    */
  def epochMs(c: Column): Column =
    floor(unix_micros(c.cast("timestamp")) / lit(1000.0d)).cast("long")

  /** Exact decimal sum rendered back as double: double addition is
    * order-dependent (parallel aggregation ⇒ nondeterministic last ulp), so
    * every oracle-checked aggregate sums DECIMAL(18,4) — exact, associative,
    * engine-independent — and casts the final value to double.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,4)"))

  /** Latest event per (user_id, event_type) — the "current trust state"
    * shape: last value wins, ordered by (ts, event_id).
    *
    * Spark-first: `max_by(x, struct(ts, event_id))` hash aggregation instead
    * of the classic row_number()-over-window-then-filter. Both shuffle once
    * on the group key, but the aggregation combines map-side partials and
    * never materializes a per-partition sort — at 100 TB the window variant
    * sort-spills, this doesn't. (event_id is unique ⇒ no ties ⇒
    * deterministic.)
    */
  def latestPerKey(events: DataFrame): DataFrame = {
    val ord = struct(col("ts"), col("event_id"))
    events
      .groupBy("user_id", "event_type")
      .agg(
        max_by(col("event_id"), ord).as("last_event_id"),
        max_by(col("value"), ord).as("last_value"),
        epochMs(max(col("ts"))).as("last_ts_ms")
      )
      .orderBy("user_id", "event_type")
  }

  /** Balance per account: Σ credits − Σ debits in ONE pass (conditional
    * aggregation), mirroring the crc_balances view. A naive per-type
    * scan+join would read the table twice and shuffle twice; this shuffles
    * compact partial aggregates on user_id only.
    */
  def balances(events: DataFrame): DataFrame = {
    val credit = when(col("event_type") === "purchase", col("value"))
    val debit = when(col("event_type") === "click", col("value"))
    events
      .groupBy("user_id")
      .agg(
        dsum(credit).as("credits_d"),
        dsum(debit).as("debits_d"),
        count(lit(1)).as("n_events")
      )
      .select(
        col("user_id"),
        coalesce(col("credits_d"), lit(0).cast("decimal(18,4)")).cast("double").as("credits"),
        coalesce(col("debits_d"), lit(0).cast("decimal(18,4)")).cast("double").as("debits"),
        (coalesce(col("credits_d"), lit(0).cast("decimal(18,4)"))
          - coalesce(col("debits_d"), lit(0).cast("decimal(18,4)"))).cast("double").as("balance"),
        col("n_events")
      )
      .orderBy("user_id")
  }

  /** Balance *history*: cumulative credit−debit per user over time. Window
    * partitioned by user_id — scales with users (each partition's state is
    * one running decimal), ordered by (ts, event_id) for determinism.
    */
  def runningBalance(events: DataFrame): DataFrame = {
    val delta = when(col("event_type") === "purchase", col("value"))
      .when(col("event_type") === "click", -col("value"))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .where(col("event_type").isin("purchase", "click"))
      .select(
        col("event_id"),
        col("user_id"),
        sum(delta.cast("decimal(18,4)")).over(w).cast("double").as("balance_after")
      )
      .orderBy("event_id")
  }

  /** TIME-WEIGHTED average balance over the trailing `windowDays` ending
    * at the data frontier (max ts — the aliveAccounts anchor; an event AT
    * the frontier contributes zero duration). The fair "how much did you
    * hold, for how long" measure an airdrop / demurrage / governance
    * snapshot needs — a point-in-time balance rewards last-second
    * deposits; the integral ∫ balance dt over the window does not.
    *
    * Shape: one partial-agg shuffle folds each user's PRE-window history
    * to a single opening-balance row (a years-deep ledger contributes one
    * row per user, and the ts < t0 predicate pushes to the scan), then
    * the opening rows UNION the in-window events and ONE per-user window
    * (the as-of union trick — [[resampleLocf]]'s discipline; per-user
    * in-window histories are human-scale) computes the running balance
    * and each segment's duration to the next change. Exactness: balances
    * are decimal sums; balance×duration products and their total stay
    * decimal end-to-end; only the final ratio is a double, rounded 6 dp.
    * Users with pre-window history but no in-window events get their flat
    * opening balance; users first active inside the window integrate an
    * implicit zero opening segment (no opening row needed — the cumsum
    * starts at their first event).
    */
  def timeWeightedBalance(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val delta = when(col("event_type") === "purchase", col("value"))
      .when(col("event_type") === "click", -col("value"))
    val e = events.where(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), epochMs(col("ts")).as("tms"), col("event_id"),
        delta.cast("decimal(18,4)").as("d"))
    val bounds = e.agg(max(col("tms")).as("t1"))
      .select(col("t1"), (col("t1") - lit(windowDays) * lit(86400000L)).as("t0"))
    val eb = e.crossJoin(broadcast(bounds)) // 1-row window anchors ride the plan
    val opening = eb.where(col("tms") < col("t0"))
      .groupBy("user_id", "t0", "t1")
      .agg(sum(col("d")).cast("decimal(18,4)").as("d"))
      .select(col("user_id"), col("t0").as("tms"), lit(-1L).as("event_id"),
        col("d"), col("t0"), col("t1"))
    val inWin = eb.where(col("tms") >= col("t0") && col("tms") <= col("t1"))
      .select(col("user_id"), col("tms"), col("event_id"), col("d"),
        col("t0"), col("t1"))
    val w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val seg = opening.unionByName(inWin)
      .withColumn("bal", sum(col("d")).over(w).cast("decimal(20,4)"))
      .withColumn("seg_ms",
        (coalesce(lead(col("tms"), 1).over(w), col("t1")) - col("tms"))
          .cast("decimal(12,0)"))
    seg.groupBy("user_id", "t0", "t1")
      .agg(sum((col("bal") * col("seg_ms")).cast("decimal(38,4)"))
        .cast("decimal(38,4)").as("wsum"))
      .select(col("user_id"),
        col("wsum").cast("double").as("balance_ms"),
        // 6 dp, not 12: twab's magnitude is balance-sized (1e2-1e3), so
        // 12 dp would demand ~15 significant digits — past the precision
        // where both engines' double round agrees on the last digit
        round(col("wsum").cast("double") /
          (col("t1") - col("t0")).cast("double"), 6).as("twab"))
      .orderBy("user_id")
  }

  /** NEAREST-event join: for every anchor-type event, the nearest
    * target-type event of the same user by absolute time distance,
    * looking BOTH directions — the attribution question as-of joins
    * answer only half of ([[AsOf]] finds the latest target BEFORE the
    * anchor; "which purchase belongs to this click" often sits just
    * after). Equal distances prefer the earlier target (deterministic,
    * and the convention the oracle mirrors).
    *
    * Shape: ONE user-keyed window sort over the two filtered event types
    * (pushdown-friendly isin at the scan) — the LOCF union discipline:
    * the previous/next target ride as IGNORE-NULLS last/first over
    * frames excluding the current row, so no range join and no second
    * shuffle; anchors with no target on either side keep a null match
    * (left semantics).
    */
  def nearestEvent(events: DataFrame, anchorType: String,
                   targetType: String): DataFrame = {
    val f = events.where(col("event_type").isin(anchorType, targetType))
      .select(col("user_id"), epochMs(col("ts")).as("tms"), col("event_id"),
        col("event_type"))
    val ord = Window.partitionBy("user_id").orderBy("tms", "event_id")
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val after = ord.rowsBetween(1, Window.unboundedFollowing)
    val tTs = when(col("event_type") === targetType, col("tms"))
    val tId = when(col("event_type") === targetType, col("event_id"))
    val withNbrs = f
      .withColumn("prev_ts", last(tTs, ignoreNulls = true).over(before))
      .withColumn("prev_id", last(tId, ignoreNulls = true).over(before))
      .withColumn("next_ts", first(tTs, ignoreNulls = true).over(after))
      .withColumn("next_id", first(tId, ignoreNulls = true).over(after))
      .where(col("event_type") === anchorType)
    val preferPrev = col("next_ts").isNull ||
      (col("prev_ts").isNotNull &&
        (col("tms") - col("prev_ts")) <= (col("next_ts") - col("tms")))
    withNbrs.select(col("user_id"), col("event_id").as("anchor_event_id"),
        col("tms").as("anchor_ms"),
        when(preferPrev, col("prev_id")).otherwise(col("next_id"))
          .as("target_event_id"),
        when(preferPrev, col("prev_ts") - col("tms"))
          .otherwise(col("next_ts") - col("tms")).as("delta_ms"))
      .orderBy("anchor_event_id")
  }

  /** Tumbling-window throughput stats (reference `Statistics.cs` tracks
    * blocks/tx per interval; the streaming twin lives in
    * streaming/EventPipeline). Batch form: date_trunc — partial-aggregated,
    * one shuffle on (hour, type).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("HOUR", col("ts")).as("hour"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).cast("double").as("sum_value"))
      .select(epochMs(col("hour")).as("hour_ms"), col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("hour_ms", "event_type")

  /** Gap-based sessionization: a session breaks after `gapMinutes` of
    * inactivity. Two windows over the same (user_id; ts, event_id) ordering —
    * Spark reuses the single shuffle+sort for both. Session id = first
    * event_id of the session (deterministic).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    val newSession = when(
      col("prev_ts_us").isNull || col("ts_us") - col("prev_ts_us") > gapUs, 1L
    ).otherwise(0L)
    events
      .select(col("user_id"), col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_ts_us", lag("ts_us", 1).over(w))
      .withColumn("is_new", newSession)
      .withColumn("session_idx", sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        min("event_id").as("session_start_id"),
        count(lit(1)).as("n_events"),
        floor((max("ts_us") - min("ts_us")) / lit(1000.0d)).cast("long").as("duration_ms")
      )
      .select("user_id", "session_start_id", "n_events", "duration_ms")
      .orderBy("user_id", "session_start_id")
  }

  /** Regular-grid resampling with last-observation-carried-forward — the
    * gap-filling step every time-series rollup needs before comparing
    * users/periods on a common clock (the reference's per-day stats views
    * implicitly assume a dense day grid; this makes any grid explicit).
    *
    * Per key: grid points every `stepMs` from the first on-grid tick at or
    * after its first event through its last event; each point carries the
    * latest value at-or-before it. Grid starts at the CEIL tick so no point
    * precedes the first observation — the output is total (no null arm).
    *
    * Spark-first shape:
    *  1. per-(key, ms) dedup via max_by(value, event_id) — ASOF semantics
    *     need one row per timestamp, and the window below would otherwise
    *     be tie-ambiguous; partial-aggregable shuffle on (key, ms).
    *  2. bounds + explode the grid (rows = Σ span/step per key — the
    *     caller sizes the step; the explode is map-only after the bounds
    *     agg).
    *  3. ONE union + ONE window per key ordered by (ts, isGrid):
    *     `last(value, ignoreNulls)` carries observations forward into grid
    *     rows; events sort before a same-ms grid point so "at or before"
    *     is exact. This is the as-of union trick (AsOf.scala) — no
    *     range-join explosion, one sort per key partition, bounded frame.
    *
    * Oracle: DuckDB ASOF JOIN against the same ceil-aligned grid.
    */
  def resampleLocf(events: DataFrame, stepMs: Long = 86400000L): DataFrame = {
    val e = events
      .select(col("user_id"), epochMs(col("ts")).as("tms"),
        col("value"), col("event_id"))
      .groupBy("user_id", "tms")
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val grid = e.groupBy("user_id")
      .agg(min("tms").as("lo"), max("tms").as("hi"))
      .select(col("user_id"),
        // integral div (the Tables.events `div` doctrine): epoch-ms values
        // are double-safe today but the operator shouldn't depend on it
        (expr(s"(lo + ${stepMs - 1L}) div ${stepMs}L") * stepMs).as("glo"), col("hi"))
      .where(col("glo") <= col("hi"))
      .select(col("user_id"), explode(sequence(col("glo"), col("hi"), lit(stepMs))).as("gts"))
    val tagged = e.select(col("user_id"), col("tms"), col("value"), lit(0).as("is_grid"))
      .unionByName(grid.select(col("user_id"), col("gts").as("tms"),
        lit(null).cast("double").as("value"), lit(1).as("is_grid")))
    val w = Window.partitionBy("user_id").orderBy("tms", "is_grid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("locf", last("value", ignoreNulls = true).over(w))
      .where(col("is_grid") === 1)
      .select(col("user_id"), col("tms").as("grid_ms"), col("locf").as("value"))
      .orderBy("user_id", "grid_ms")
  }
}
