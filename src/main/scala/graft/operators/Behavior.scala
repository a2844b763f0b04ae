package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream: ordered-step funnels and
  * retention cohorts — the product-analytics queries an indexer's Postgres
  * serves ad hoc once the events are in (the reference's per-day stats
  * views, DbMigrations/0.0.64.sql:1253, are the degenerate one-step case;
  * these add the cross-event sequencing).
  */
object Behavior {

  /** Ordered-step funnel: for a step sequence (s1, …, sk), a user reaches
    * depth i when the FIRST-OCCURRENCE CHAIN closes: t1 = min t of an s1
    * event; t_{i+1} = min t of an s_{i+1} event with t >= t_i (and, for
    * i >= 1, t <= t1 + horizon). Output: one row per step with the number
    * of users reaching it and the fraction of step-1 users retained.
    *
    * Scale shape: ONE shuffle. Events are filtered to the k funnel types
    * at the scan (pushdown-friendly isin), grouped per user into a sorted
    * (t, step-idx) array, and the chain is computed by a codegen'd
    * `aggregate` HOF fold — no per-user window sort, no k-join chain (the
    * naive spelling is k−1 shuffled joins). The greedy fold over the
    * sorted array computes exactly the chain-of-mins: ties sort (t, idx)
    * with earlier steps first, so an s_{i+1} event at t == t_i is seen
    * after the advance to depth i, matching the SQL `>=`. The per-step
    * rollup explodes depth into step rows — partial-aggregable, no window.
    * Per-user arrays are bounded by that user's funnel-event count; a bot
    * user at 100 TB is bounded by pre-deduping (user, type, t) — dedup
    * cannot change any min — before the collect.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             horizonMs: Long = 7L * 86400000L): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps)
    val k = steps.size
    val stepIdx = steps.zipWithIndex.tail.foldLeft(
      when(col("event_type") === steps.head, 0L)) {
      case (acc, (s, i)) => acc.when(col("event_type") === s, i.toLong)
    }
    val fe = events
      .where(col("event_type").isin(steps: _*))
      .select(col("user_id"),
        StateOps.epochMs(col("ts")).as("t"),
        stepIdx.as("idx"))
      .distinct() // (user, t, idx) dedup: mins are unchanged, arrays bounded
    val depth = fe.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("t"), col("idx")))).as("evs"))
      .select(col("user_id"), expr(
        s"""aggregate(evs,
           |  named_struct('d', 0L, 'cur', 0L, 'first', 0L),
           |  (a, e) -> IF(e.idx = a.d AND a.d < ${k}L
           |               AND (a.d = 0L OR (e.t >= a.cur
           |                    AND e.t <= a.first + ${horizonMs}L)),
           |    named_struct('d', a.d + 1L, 'cur', e.t,
           |      'first', IF(a.d = 0L, e.t, a.first)),
           |    a),
           |  a -> a.d)""".stripMargin).as("depth"))
      .where(col("depth") >= 1)
    val perStep = depth
      .select(explode(sequence(lit(1L), col("depth"))).as("step"))
      .groupBy("step").agg(count(lit(1)).as("users"))
      // ≤ k rows, but it feeds BOTH the output and the step-1 denominator
      // leg — without the barrier the whole depth pipeline (distinct +
      // collect_list + fold) runs twice per query
      .localCheckpoint(true)
    val first = perStep.where(col("step") === 1)
      .select(col("users").as("step1_users"))
    val stepName = steps.zipWithIndex.tail.foldLeft(
      when(col("step") === 1L, steps.head)) {
      case (acc, (s, i)) => acc.when(col("step") === (i + 1).toLong, s)
    }
    perStep.crossJoin(first)
      .select(col("step"),
        stepName.as("step_name"),
        col("users"),
        round(col("users").cast("double") / col("step1_users").cast("double"),
          12).as("pct_of_first"))
      .orderBy("step")
  }

  /** Robust outlier flagging over a per-bucket count series (median/MAD —
    * the breakdown-resistant alternative to mean/stddev, which one real
    * traffic spike corrupts): flags buckets where |x − median| > k·MAD.
    * Emits EVERY bucket with its scores so downstream can re-threshold
    * without recomputing.
    *
    * Scale shape: the input series is already the OUTPUT of a partial-agg
    * rollup (e.g. [[CirclesViews.perDayCounts]]) — calendar-bounded (one
    * row per day/hour), so the exact medians here run on a frame whose
    * size is independent of corpus volume; the two 1-row stat frames ride
    * back as broadcast-able cross joins. The 100 TB cost lives upstream
    * in the count rollup, where it belongs. MAD = 0 (over half the
    * buckets identical) degrades to flagging any deviation from the
    * median — the standard convention, spec'd.
    */
  def robustAnomalies(series: DataFrame, valueCol: String,
                      k: Double = 3.0): DataFrame = {
    val x = col(valueCol).cast("double")
    // the series frame feeds the median agg, the MAD agg AND the output
    // projection; callers pass a derived rollup (perDayCounts over the
    // receipt pipeline), so without the barrier the rollup runs three
    // times per query (the orderedScan input-materialization precedent) —
    // the frame is calendar-bounded, so the checkpoint is tiny
    val s = series.localCheckpoint(true)
    val med1 = s.agg(percentile(x, lit(0.5)).as("med"))
    val withMed = s.crossJoin(med1)
    val mad1 = withMed.agg(percentile(abs(x - col("med")), lit(0.5)).as("mad"))
    withMed.crossJoin(mad1)
      .withColumn("is_anomaly",
        when(col("mad") === 0.0d, x =!= col("med"))
          .otherwise(abs(x - col("med")) > lit(k) * col("mad")))
      .withColumn("med", round(col("med"), 4))
      .withColumn("mad", round(col("mad"), 4))
  }

  /** CUSUM CHANGEPOINT detection per event type — the sequential
    * level-shift detector that completes the monitoring trio:
    * [[robustAnomalies]] flags single outlier days, [[trendingEvents]]
    * flags day-over-trailing-baseline lifts, CUSUM accumulates SMALL
    * sustained deviations until a regime change is undeniable (a 20%
    * volume drop no single day makes anomalous trips the cumulative sum
    * within days — the Page 1954 chart every ops pipeline runs).
    *
    *   S⁺_i = max(0, S⁺_{i−1} + z_i − drift),  flag when S⁺ > threshold
    *   S⁻_i = max(0, S⁻_{i−1} − z_i − drift)   (two-sided)
    *
    * Shape: the raw stream collapses to ≤ |types|·|days| rows in ONE
    * partial-agg shuffle; per-type standardization stats are exact
    * integer moment sums; the inherently-sequential recursion then runs
    * as a per-type sorted-array fold (HOF) over the calendar-bounded
    * series — never a window or a loop over raw events (the
    * robustAnomalies discipline; a year is 365 elements).
    * Determinism: μ, σ, every z and every cusum step round to 12 dp in
    * the same order on both engines (the recursion is replayed by a
    * linear-depth RECURSIVE CTE in the oracle); σ=0 series emit z=0
    * (constant series have no changepoints); the variance is clamped at
    * 0 before the sqrt (FP cancellation on near-constant series would
    * otherwise NaN).
    */
  def cusumChangepoints(events: DataFrame, drift: Double = 0.5,
                        threshold: Double = 4.0): DataFrame =
    cusumFromCounts(events
      .select(col("event_type"), StateOps.epochMs(col("ts")).as("t"))
      .select(col("event_type"), expr("t div 86400000L").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")),
      drift, threshold)

  /** [[cusumChangepoints]] served from an ALREADY-AGGREGATED per-(type,
    * day) count frame — the entry point for counts maintained through the
    * view store ([[graft.streaming.ViewMaintenance.mergeDayCountsBatch]],
    * the same additive store that serves trending): the whole detector
    * runs over the ≤ |types|·|days| stored rows, never raw events. `day`
    * must be a LONG (epoch-ms or day index — any orderable integer
    * timeline; the fold's accumulator type is pinned to bigint).
    */
  def cusumFromCounts(perDayCounts: DataFrame, drift: Double = 0.5,
                      threshold: Double = 4.0): DataFrame = {
    val perDay = perDayCounts.select(col("event_type"), col("day"), col("n"))
    val stats = perDay.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("sx"),
        sum(col("n") * col("n")).as("sxx"))
      .select(col("event_type"),
        round(col("sx").cast("double") / col("nd").cast("double"), 12).as("mu"),
        round(sqrt(greatest(lit(0.0d),
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("nd").cast("double")) /
            col("nd").cast("double"))), 12).as("sigma"))
    val z = perDay.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        when(col("sigma") > 0.0d,
          round((col("n").cast("double") - col("mu")) / col("sigma"), 12))
          .otherwise(lit(0.0d)).as("z"))
    val sp = s"round(greatest(0.0d, acc.sp + x.z - $drift), 12)"
    val sn = s"round(greatest(0.0d, acc.sn - x.z - $drift), 12)"
    val step = s"""named_struct(
      | 'arr', concat(acc.arr, array(named_struct(
      |   'day', x.day, 'n', x.n, 'z', x.z, 'sp', $sp, 'sn', $sn))),
      | 'sp', $sp,
      | 'sn', $sn)""".stripMargin
    z.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("n"), col("z"))))
        .as("series"))
      .select(col("event_type"),
        explode(expr(
          s"""aggregate(series,
            | named_struct('arr',
            |   cast(array() as array<struct<day:bigint,n:bigint,z:double,
            |                               sp:double,sn:double>>),
            |   'sp', 0.0d, 'sn', 0.0d),
            | (acc, x) -> $step,
            | acc -> acc.arr)""".stripMargin)).as("c"))
      .select(col("event_type"), col("c.day"), col("c.n"), col("c.z"),
        col("c.sp"), col("c.sn"),
        (col("c.sp") > threshold || col("c.sn") > threshold).as("changepoint"))
      .orderBy("event_type", "day")
  }

  /** Weekly retention cohorts: cohort = the fixed-width time bucket of a
    * user's FIRST event, offset = how many buckets later they were active
    * again; cell value = distinct active users. The classic retention
    * triangle.
    *
    * Scale shape: the first-event frame is one partial-agg min per user;
    * the join back to events is on user_id — the agg output is already
    * hash-partitioned by user_id, so only the event side shuffles — and
    * the cell rollup is a two-phase distinct count over (cohort, offset,
    * user) triples. Bucket ids use integral `div` (exact past 2^53, the
    * engine's floordiv doctrine for non-negative epochs).
    */
  def retentionCohorts(events: DataFrame,
                       stepMs: Long = 7L * 86400000L): DataFrame = {
    val t = events.select(col("user_id"),
      StateOps.epochMs(col("ts")).as("t"))
    val firstBucket = t.groupBy("user_id")
      .agg(min(col("t")).as("t0"))
      .select(col("user_id"), expr(s"t0 div ${stepMs}L").as("cohort"))
    t.join(firstBucket, Seq("user_id"))
      .select(col("cohort"),
        (expr(s"t div ${stepMs}L") - col("cohort")).as("week_offset"),
        col("user_id"))
      .groupBy("cohort", "week_offset")
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort", "week_offset")
  }

  /** Per-day ACTIVE-user split: DAU, NEW users (first-ever-seen that day)
    * and RETURNING users — the growth dashboard's headline series, and
    * the daily-grain companion of [[retentionCohorts]] (cohorts bucket by
    * first week; this splits each single day's actives by whether today
    * IS their first day). The reference's per-day views count events;
    * this counts distinct people.
    *
    * Shape: the event stream collapses to distinct (user, day) pairs in
    * one partial-agg shuffle (a user's thousandth event that day dies
    * map-side); first-seen day is a min over each user's ≤|days| distinct
    * rows; the joinback is user-keyed and the final rollup partial-aggs
    * to ≤|days| rows. Day keys are epoch-ms integral `div` buckets (the
    * retention discipline — exact past 2^53, no calendar nulls).
    */
  def activeUsers(events: DataFrame): DataFrame = {
    val t = events.select(col("user_id"), StateOps.epochMs(col("ts")).as("t"))
      .select(col("user_id"), expr("t div 86400000L").as("day"))
    val days = t.distinct().localCheckpoint(true) // feeds first-seen AND rollup
    val first = days.groupBy("user_id").agg(min(col("day")).as("first_day"))
    days.join(first, Seq("user_id"))
      .groupBy("day")
      .agg(count(lit(1)).as("dau"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("new_users"))
      .select(col("day"), col("dau"), col("new_users"),
        (col("dau") - col("new_users")).as("returning"))
      .orderBy("day")
  }

  /** Event-type TRANSITION matrix — the first-order Markov view of user
    * behavior (which event follows which): per-user consecutive event
    * pairs counted into (from_type, to_type, n, p) where p is the row's
    * share of its from_type (the empirical transition probability).
    *
    * Scale shape: one user-keyed shuffle for the lead window (the
    * sessionizer's shape — per-user sort, bounded by a user's event
    * count), then a partial-agg count over ≤ |types|² keys and a tiny
    * from-type rollup joined back broadcast-size. Ordering ties on ts
    * break by event_id, so the pairing is deterministic cross-engine and
    * the op is oracle-checked. p = n/total as one IEEE division of exact
    * longs, rounded 12 dp.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy("from_type")
      .agg(sum("n_transitions").as("total_from"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") / col("total_from"), 12).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** SEASONAL anomaly flags per event type — each (type, day)'s count
    * against that type's DAY-OF-WEEK baseline: weekly periodicity is the
    * dominant cycle in human activity, and a whole-series detector
    * ([[robustAnomalies]], [[cusumChangepoints]]) reads every quiet
    * Sunday as an anomaly and every busy Monday as a spike. Standardizing
    * within (type, dow) removes exactly that cycle; what remains flagging
    * |z| > k is genuinely off-pattern.
    *
    * Shape: the same ≤ |types|·|days| partial-agg collapse; dow = the
    * pure integer `(day + 4) mod 7` over the epoch-day index (1970-01-01
    * was a Thursday) — no calendar function to disagree on across
    * engines; per-(type, dow) stats are exact integer moment sums (the
    * cusum spelling: clamped variance, 12-dp rounds, σ=0 → z=0).
    */
  def seasonalAnomalies(events: DataFrame, k: Double = 3.0): DataFrame = {
    val perDay = events
      .select(col("event_type"), StateOps.epochMs(col("ts")).as("t"))
      .select(col("event_type"), expr("t div 86400000L").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("pmod(day + 4, 7)"))
    val stats = perDay.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("sx"),
        sum(col("n") * col("n")).as("sxx"))
      .select(col("event_type"), col("dow"),
        round(col("sx").cast("double") / col("nd").cast("double"), 12).as("mu"),
        round(sqrt(greatest(lit(0.0d),
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("nd").cast("double")) /
            col("nd").cast("double"))), 12).as("sigma"))
    perDay.join(broadcast(stats), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dow"), col("n"),
        col("mu"), col("sigma"),
        when(col("sigma") > 0.0d,
          round((col("n").cast("double") - col("mu")) / col("sigma"), 12))
          .otherwise(lit(0.0d)).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > k)
      .orderBy("event_type", "day")
  }

  /** TOP event PATHS: the most common length-`n` consecutive event-type
    * sequences across users — the n-step generalization of
    * [[transitionMatrix]] (n=2) and the "what do people actually do"
    * view funnels presuppose (a funnel TESTS a hypothesized path; this
    * MINES the real ones to hypothesize from).
    *
    * Shape: one user-keyed shuffle for the lead windows (the
    * sessionizer's ordering, ties broken by event_id — deterministic
    * cross-engine), n−1 lead columns over the same window (one sort),
    * then a partial-agg count over ≤ |types|^n keys and a bounded top-k
    * (TakeOrderedAndProject). Paths render as '>'-joined type names.
    */
  def topPaths(events: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"path length < 2: $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = (1 until n).foldLeft(
      events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).withColumn("s0", col("event_type"))) {
      case (df, i) => df.withColumn(s"s$i", lead(col("event_type"), i).over(w))
    }
    steps.where(col(s"s${n - 1}").isNotNull)
      .groupBy(concat_ws(">", (0 until n).map(i => col(s"s$i")): _*).as("path"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
  }

  /** Trending detection per event type: each (type, day)'s count against
    * the mean of the `lookback` PRECEDING observed days — the
    * day-over-baseline lift an ops dashboard alerts on ("error events
    * are 2× their trailing week"). Days with fewer than `lookback`
    * predecessors emit a null baseline/lift (no partial-window
    * guessing); `trending` is lift ≥ `minLift`, false when unknowable.
    *
    * Scale shape: the raw stream collapses to ≤ |types|·|days| rows in
    * ONE partial-agg shuffle; the trailing window then runs PARTITIONED
    * by event_type over that tiny frame (never over raw events — the
    * [[robustAnomalies]] discipline). ROWS framing (observed days, not
    * calendar days) keeps the window frame exact on sparse types; the
    * baseline divides exact longs once and rounds 12 dp, the lift
    * divides by the already-rounded baseline (oracle-identical IEEE).
    */
  def trendingEvents(events: DataFrame, lookback: Int = 3,
                     minLift: Double = 1.5): DataFrame =
    trendingFromCounts(events
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n")), lookback, minLift)

  /** [[trendingEvents]] served from an ALREADY-AGGREGATED per-(type, day)
    * count frame — the entry point for counts maintained incrementally
    * through the view store ([[graft.streaming.ViewMaintenance
    * .mergeDayCountsBatch]]): the trailing window never touches raw
    * events, only the ≤ |types|·|days| stored rows.
    */
  def trendingFromCounts(perDay: DataFrame, lookback: Int = 3,
                         minLift: Double = 1.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-lookback, -1)
    perDay
      .withColumn("base_n", count(lit(1)).over(w))
      .withColumn("baseline",
        when(col("base_n") === lookback,
          round(sum("n").over(w).cast("double") / col("base_n"), 12)))
      .withColumn("lift",
        when(col("baseline") > 0,
          round(col("n").cast("double") / col("baseline"), 12)))
      .select(col("event_type"), col("day"), col("n"), col("baseline"),
        col("lift"),
        coalesce(col("lift") >= minLift, lit(false)).as("trending"))
      .orderBy("event_type", "day")
  }

  /** Per-user INTER-EVENT timing profile + BURSTINESS (Goh & Barabási
    * 2008): B = (σ−μ)/(σ+μ) over the user's inter-event gaps — B → −1 is
    * a metronome (bot-like regularity), B ≈ 0 Poisson-random, B → +1
    * heavy-tailed human burst-and-silence. The timing-signature complement
    * of [[graft.operators.StateOps.sessionize]] (which cuts on one gap
    * threshold; this summarizes the whole gap distribution) — the cheap
    * bot/sybil triage signal on an event stream.
    *
    * Parity contract — the large-magnitude round() trap, learned here:
    * `round(x, 12)` of a ≥1e4-magnitude double asks for more significant
    * digits than a double HAS, and the engines' round implementations
    * legitimately disagree in that no-man's-land (observed:
    * …730158**73** vs …730158**74** at sf0.01) — round-12 is only safe on
    * O(1)-normalized values (where every existing use of it lives). So
    * nothing here rounds a large double: gaps are exact integer ms (the
    * epoch-µs floor-div convention), moments accumulate as exact DECIMAL
    * sums (gap² multiplied as decimal(19,0)² — a long square of a
    * multi-day gap would overflow), the mean is an INTEGRAL µs division
    * `(Σgap·1000) DIV n`, σ comes from the exact integer discriminant
    * D = n·Σgap² − (Σgap)² via one double cast + IEEE sqrt + one fixed
    * `floor(·1000/n)` (identical inputs → identical doubles → identical
    * floor; no round() involved), and burstiness — the one O(1) value —
    * is (√D − Σgap)/(√D + Σgap), algebraically (σ−μ)/(σ+μ), rounded 12.
    * Users with a single event have no gaps and no row (the sessionize
    * convention); all-zero gaps → √D + Σgap = 0 → burstiness null.
    *
    * Scale shape: one user-keyed window sort (the lag) whose hash
    * partitioning the following groupBy REUSES (no second exchange), then
    * a partial decimal agg; (user, long) pairs only past the scan.
    */
  def interEventStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val d19 = (c: Column) => c.cast("decimal(19,0)")
    val gaps = events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .where(col("prev_us").isNotNull)
      .select(col("user_id"),
        floor((col("ts_us") - col("prev_us")) / lit(1000.0d)).cast("long")
          .as("gap_ms"))
    val agg = gaps.groupBy("user_id").agg(
      count(lit(1)).as("n_gaps"),
      sum(d19(col("gap_ms"))).as("s1"),
      sum(d19(col("gap_ms")) * d19(col("gap_ms"))).as("s2"))
    // D = n·Σg² − (Σg)² ≥ 0, exact in decimal(38,0); one cast to double
    val dd = (col("n_gaps") * col("s2") - col("s1") * col("s1"))
      .cast("decimal(38,0)").cast("double")
    val sq = sqrt(dd)
    val s1d = col("s1").cast("double")
    agg
      .withColumn("mean_gap_us",
        expr("CAST(CAST(s1 AS BIGINT) * 1000L AS BIGINT) DIV n_gaps"))
      .withColumn("std_gap_us",
        floor(sq * lit(1000.0d) / col("n_gaps")).cast("long"))
      .withColumn("burstiness",
        when(sq + s1d > 0, round((sq - s1d) / (sq + s1d), 12)))
      .select("user_id", "n_gaps", "mean_gap_us", "std_gap_us", "burstiness")
      .orderBy("user_id")
  }

  /** FIRST/LAST-touch conversion ATTRIBUTION — for every conversion event,
    * credit the channel (event_type) of the user's first-ever and most
    * recent non-conversion touches strictly before it; conversions with no
    * prior touch credit `direct`. Per-channel rollup carries the conversion
    * count and the attributed conversion value under both models — the
    * standard position-based attribution pair marketing analytics serves
    * from an event warehouse (Markov/removal-effect models start from this
    * same touch frame).
    *
    * Scale shape: ONE user-keyed window sort (the same hash partitioning
    * both IGNORE-NULLS frames reuse — one Exchange, one Sort in the plan),
    * then each conversion explodes into its two (model, channel) credits
    * MAP-SIDE and a SINGLE conditional partial agg rolls both models up
    * per channel — one pass over events, one agg shuffle bounded by
    * |event_type| rows, no second window scan and no outer join. Driver
    * never sees per-event rows. Attributed value uses the exact
    * decimal(18,4) sum protocol (order-independent, cross-engine).
    */
  def touchAttribution(events: DataFrame,
                       conversionType: String = "purchase"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= conversionType, col("event_type"))
    val conv = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"),
        coalesce(first(touch, ignoreNulls = true).over(w), lit("direct"))
          .as("first_touch"),
        coalesce(last(touch, ignoreNulls = true).over(w), lit("direct"))
          .as("last_touch"))
      .where(col("event_type") === conversionType)
    val credits = conv.select(col("value"),
        explode(array(
          struct(lit("first").as("model"), col("first_touch").as("channel")),
          struct(lit("last").as("model"), col("last_touch").as("channel"))))
          .as("mc"))
      .select(col("mc.model").as("model"), col("mc.channel").as("channel"),
        col("value"))
    def modelAgg(m: String, cnt: String, v: String): Seq[Column] = Seq(
      sum(when(col("model") === m, 1L).otherwise(0L)).as(cnt),
      coalesce(sum(when(col("model") === m, col("value").cast("decimal(18,4)")))
        .cast("double"), lit(0.0d)).as(v))
    val aggs = modelAgg("first", "first_touch_conversions", "first_touch_value") ++
      modelAgg("last", "last_touch_conversions", "last_touch_value")
    credits.groupBy("channel").agg(aggs.head, aggs.tail: _*)
      .orderBy("channel")
  }

  /** MARKOV-CHAIN attribution with REMOVAL EFFECTS — the data-driven
    * upgrade of [[touchAttribution]]'s positional models (Anderl et al.
    * 2016, the standard multi-touch framework): user journeys become a
    * first-order chain START → touches → CONV/NULL, a channel's removal
    * effect is how much total conversion probability dies when every
    * visit to it is redirected to NULL, and credit shares are the
    * normalized removal effects. Position models can't see that a middle
    * channel carries every converting path; this can.
    *
    * Journey construction: jid = conversions seen strictly before the
    * row (one running-count window), so each conversion closes its own
    * journey and trailing touches form an unconverted one. Transitions
    * come from TWO windows over the SAME (user, jid) partitioning —
    * lag(channel) for the incoming edge (START when first), lead-is-null
    * to close unconverted journeys at NULL — then ONE (from, to)
    * partial-agg count. The chain solve is DRIVER-SIDE ON PURPOSE: the
    * state space is |channels|+3 (bounded by event-type cardinality, the
    * transition-matrix precedent), so (I−Q)x = b is a ≤10×10 Gaussian
    * elimination on a bounded artifact — per-channel removal re-solves
    * shift counts, never touching the cluster again. Rows-only by design
    * (matrix-solve floats are library/order-specific); BehaviorSpec pins
    * hand-solved chains and the conservation invariants.
    */
  def markovAttribution(events: DataFrame,
                        conversionType: String = "purchase"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val marked = events.select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === conversionType, lit("CONV"))
          .otherwise(col("event_type")).as("ch"))
      .withColumn("jid",
        coalesce(sum(when(col("ch") === "CONV", 1L).otherwise(0L))
          .over(wAll.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wj = Window.partitionBy("user_id", "jid")
      .orderBy(col("ts"), col("event_id"))
    val edges = marked
      .withColumn("from", coalesce(lag("ch", 1).over(wj), lit("START")))
      .withColumn("next", lead("ch", 1).over(wj))
      .select(col("from"), col("ch"), col("next"))
    val trans = edges.select(col("from"), col("ch").as("to"))
      .unionAll(edges.where(col("next").isNull && col("ch") =!= "CONV")
        .select(col("ch").as("from"), lit("NULL").as("to")))
      .groupBy("from", "to").agg(count(lit(1)).as("n"))
    // bounded driver artifact: (|channels|+3)² transition counts
    val counts = trans.as[(String, String, Long)].collect()
    val channels = counts.flatMap(t => Seq(t._1, t._2))
      .filter(s => s != "START" && s != "CONV" && s != "NULL").distinct.sorted
    def solve(drop: Option[String]): Double = {
      val redirected = counts.map { case (f, t, n) =>
        if (drop.contains(t)) (f, "NULL", n) else (f, t, n)
      }.filterNot { case (f, _, _) => drop.contains(f) }
      val states = "START" +: channels.filterNot(drop.contains)
      val idx = states.zipWithIndex.toMap
      val outTot = redirected.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._3).sum }
      val m = states.length
      // (I − Q)x = b with b(s) = P(s→CONV); Gaussian elimination, m ≤ ~10
      val a = Array.tabulate(m, m) { (i, j) => if (i == j) 1.0 else 0.0 }
      val b = Array.fill(m)(0.0)
      redirected.foreach { case (f, t, n) =>
        idx.get(f).foreach { i =>
          val p = n.toDouble / outTot(f)
          if (t == "CONV") b(i) += p
          else idx.get(t).foreach { j => a(i)(j) -= p }
        }
      }
      for (col0 <- 0 until m) {
        val piv = (col0 until m).maxBy(r => math.abs(a(r)(col0)))
        if (math.abs(a(piv)(col0)) > 1e-12) {
          val (ta, tb) = (a(col0), b(col0)); a(col0) = a(piv); b(col0) = b(piv)
          a(piv) = ta; b(piv) = tb
          for (r <- col0 + 1 until m) {
            val f = a(r)(col0) / a(col0)(col0)
            if (f != 0.0) {
              for (c <- col0 until m) a(r)(c) -= f * a(col0)(c)
              b(r) -= f * b(col0)
            }
          }
        }
      }
      val x = Array.fill(m)(0.0)
      for (r <- m - 1 to 0 by -1) {
        if (math.abs(a(r)(r)) > 1e-12) {
          var s = b(r)
          for (c <- r + 1 until m) s -= a(r)(c) * x(c)
          x(r) = s / a(r)(r)
        }
      }
      x(idx("START"))
    }
    val pBase = if (counts.isEmpty) 0.0 else solve(None)
    val re = channels.map { c =>
      val pc = if (pBase > 0) solve(Some(c)) else 0.0
      c -> (if (pBase > 0) math.max(0.0, 1.0 - pc / pBase) else 0.0)
    }
    val total = re.map(_._2).sum
    val r12 = (d: Double) =>
      BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    re.map { case (c, e) =>
      (c, r12(pBase), r12(e), if (total > 0) r12(e / total) else 0.0)
    }.toSeq
      .toDF("channel", "p_conversion", "removal_effect", "attribution_share")
      .orderBy("channel")
  }

  /** RFM SEGMENTATION over an order history: per customer, Recency (latest
    * order date), Frequency (order count), Monetary (exact decimal spend),
    * each scored into quintiles 1..5 (5 = most recent / most frequent /
    * highest spend) and concatenated into the classic 3-digit RFM code.
    * The workhorse customer-value segmentation every warehouse serves; the
    * indexer analogue buckets safes by last activity / tx count / volume.
    *
    * Scale shape: the per-customer rollup is one partial agg off the orders
    * scan. Each quintile then needs a GLOBAL rank — the single-partition
    * `ntile` window is the classic scale trap, so all three ride
    * [[Economics.orderedScan]]'s two-phase protocol instead (range-bucket →
    * ≤numBuckets totals → per-bucket windows over value-disjoint buckets):
    * no stage ever holds more than a bucket. Scores derive from the exact
    * integer rank — `(rank-1)*5 DIV n` — so the quintile edges are
    * rerun-deterministic and the oracle's row_number spelling matches
    * bit-for-bit; ties break by custkey (the orderedScan convention).
    */
  def rfmSegments(orders: DataFrame, numBuckets: Int = 64): DataFrame =
    rfmFromRollup(
      orders.groupBy(col("o_custkey").as("custkey"))
        .agg(max(unix_micros(col("o_orderdate").cast("timestamp"))).as("recency_us"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("monetary")),
      numBuckets)

  /** Quintile scoring off an already-maintained (custkey, recency_us,
    * frequency, monetary) rollup — the serve-side half of [[rfmSegments]],
    * also fed by the incremental store
    * ([[graft.streaming.ViewMaintenance.mergeRfmRollupBatch]]): the
    * decimal-exact merges make the served rollup bit-identical to the
    * batch one, so the scores (and the oracle) are unchanged.
    */
  def rfmFromRollup(rollup: DataFrame, numBuckets: Int = 64): DataFrame = {
    val base = rollup
      .select(col("custkey"), col("recency_us"), col("frequency"),
        col("monetary"))
      .localCheckpoint(true) // feeds three ordered scans + the final join
    val n = lit(base.count())
    def score(valueCol: String, out: String): DataFrame =
      graft.operators.Economics.orderedScan(
          base.withColumn("osw", lit(0L)), valueCol, "custkey", "osw", numBuckets,
          cutInput = false) // base is already one materialized frame
        .select(col("custkey"),
          (((col("rank") - 1) * 5).cast("long") / n).cast("long").plus(1).as(out))
    base
      .join(score("recency_us", "r_score"), "custkey")
      .join(score("frequency", "f_score"), "custkey")
      .join(score("monetary", "m_score"), "custkey")
      .select(col("custkey"), col("recency_us"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
      .orderBy("custkey")
  }

  /** Truncated-EWMA forecast per event type — the smoothing companion of
    * the monitoring trio ([[robustAnomalies]]/[[trendingEvents]]/
    * [[cusumChangepoints]]): a geometric half-weight average of the last
    * `taps` daily counts, ewma_t = Σ_{j<taps} n_{t−j}/2^{j+1}
    * (zero-padded before history; weights sum to 1−2^{−taps}). The
    * standard one-line forecast for tomorrow's volume.
    *
    * Scale shape: the raw stream collapses to ≤ |types|·|days| rows in
    * ONE partial-agg shuffle (the cusum collapse), then a single per-type
    * window pass computes every lag — `taps` lag() calls share one
    * (type, day) sort. Determinism: the weighted numerator is an EXACT
    * BIGINT (Σ n_j·2^{taps−1−j}), and the one division by 2^taps is a
    * pure exponent shift — bit-exact in IEEE754, no rounding anywhere.
    * Missing calendar days are skipped, not zero-filled: the series is
    * the OBSERVED per-day sequence (the trendingEvents convention).
    */
  def ewmaForecast(events: DataFrame, taps: Int = 8): DataFrame = {
    require(taps >= 1 && taps <= 32, s"taps out of range: $taps")
    import org.apache.spark.sql.expressions.Window
    val perDay = events
      .select(col("event_type"), StateOps.epochMs(col("ts")).as("t"))
      .select(col("event_type"), expr("t div 86400000L").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val num = (0 until taps).map { j =>
      coalesce(lag(col("n"), j).over(w), lit(0L)) * lit(1L << (taps - 1 - j))
    }.reduce(_ + _)
    perDay
      .withColumn("ewma",
        num.cast("double") / lit((1L << taps).toDouble))
      .orderBy("event_type", "day")
  }

  /** Cohort LTV — cumulative revenue per signup cohort by age: cohort =
    * the week bucket of a user's FIRST event (the [[retentionCohorts]]
    * bucketing), revenue = purchase-event value attributed to the week it
    * happened, ltv = cumulative cohort revenue / cohort size. The
    * payback-curve view every growth team reads next to the retention
    * triangle.
    *
    * Scale shape: first-bucket is one partial-agg min per user; cohort
    * sizes partial-agg off that |users|-row frame; the purchase stream
    * joins user-keyed (the agg output is already hash-partitioned by
    * user_id, only the event side shuffles) and collapses to ≤ |cohorts|·
    * |offsets| cells before the cumulative window — which runs per-cohort
    * over that tiny grid, never over events. Determinism: revenue sums
    * ride decimal(28,10) (HALF_UP cast of the double values — the
    * token-balance protocol), the running sum is a decimal window agg
    * (exact), and ltv is one IEEE division of the decimal-cast-to-double
    * by an exact long.
    */
  def cohortLtv(events: DataFrame,
                stepMs: Long = 7L * 86400000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = events.select(col("user_id"), StateOps.epochMs(col("ts")).as("t"),
      col("event_type"), col("value"))
    val firstBucket = t.groupBy("user_id")
      .agg(min(col("t")).as("t0"))
      .select(col("user_id"), expr(s"t0 div ${stepMs}L").as("cohort"))
    val sizes = firstBucket.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_users"))
    val cells = t.where(col("event_type") === "purchase")
      .join(firstBucket, Seq("user_id"))
      .select(col("cohort"),
        (expr(s"t div ${stepMs}L") - col("cohort")).as("week_offset"),
        col("value").cast("decimal(28,10)").as("v"))
      .groupBy("cohort", "week_offset")
      .agg(sum(col("v")).as("rev"))
    val cum = Window.partitionBy("cohort").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev", sum(col("rev")).over(cum))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("week_offset"),
        col("rev").cast("double").as("revenue"),
        col("cum_rev").cast("double").as("cum_revenue"),
        col("cohort_users"),
        (col("cum_rev").cast("double") / col("cohort_users").cast("double"))
          .as("ltv"))
      .orderBy("cohort", "week_offset")
  }

  /** A/B conversion readout with a pooled two-proportion z-score:
    * variant = md5-parity of the user id (the walk-corpus md5-pick
    * protocol — deterministic, re-derivable by any engine, no sampler
    * state), exposure = the user's first `exposeType` event, conversion =
    * any `convertType` event strictly after it. One summary row:
    * per-variant exposed/converted counts, rates, and
    * z = (r1−r0)/√(p̂(1−p̂)(1/n0+1/n1)).
    *
    * Scale shape: one user-keyed partial agg computes first-exposure and
    * first-qualifying-conversion TOGETHER (min + conditional min — the
    * funnel's one-pass discipline, no join between the legs), then a
    * 2-row conditional rollup and a 1-row cross of the two variant rows.
    * Determinism: counts are exact longs; every double (rates, p̂, z)
    * derives from exact longs through ONE mirrored expression tree —
    * identical IEEE operation order on both engines.
    */
  def abTest(events: DataFrame, exposeType: String = "view",
             convertType: String = "purchase"): DataFrame = {
    val t = events.select(col("user_id"), StateOps.epochMs(col("ts")).as("t"),
      col("event_type"))
    val perUser = t.groupBy("user_id")
      .agg(min(when(col("event_type") === exposeType, col("t"))).as("t_exp"),
        max(when(col("event_type") === convertType, col("t"))).as("t_conv_max"))
      .where(col("t_exp").isNotNull)
      .select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2).as("variant"),
        (col("t_conv_max") > col("t_exp")).as("converted"))
    val byVariant = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("c"))
      // 2 rows feeding both variant legs — one materialization, or the
      // user-keyed rollup runs twice per query
      .localCheckpoint(true)
    val a = byVariant.where(col("variant") === 0)
      .select(col("n").as("n0"), col("c").as("c0"))
    val b = byVariant.where(col("variant") === 1)
      .select(col("n").as("n1"), col("c").as("c1"))
    val n0 = col("n0").cast("double"); val c0 = col("c0").cast("double")
    val n1 = col("n1").cast("double"); val c1 = col("c1").cast("double")
    val p = (c0 + c1) / (n0 + n1)
    // degenerate pools (nobody or everybody converted) have a zero
    // z-denominator: gate on the EXACT long counts (p̂=0 ⟺ c0+c1=0,
    // p̂=1 ⟺ c0+c1=n0+n1) — no double compared to zero, no ANSI
    // divide-by-zero, and the same two integer predicates in the oracle
    a.crossJoin(b)
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        (c0 / n0).as("rate0"), (c1 / n1).as("rate1"),
        when(col("c0") + col("c1") > 0 &&
            col("c0") + col("c1") < col("n0") + col("n1"),
          (c1 / n1 - c0 / n0) /
            sqrt(p * (lit(1.0d) - p) * (lit(1.0d) / n0 + lit(1.0d) / n1)))
          .as("z"))
  }
}
