package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.StateOps.{dsum, epochMs}

/** General analytics over the indexed store. The reference's value is the
  * queryable Postgres DB it maintains (README: balances, trust graph, tx
  * history views); these are the ad-hoc analytical shapes that DB serves,
  * expressed as Catalyst-optimizable DataFrame plans and used as the bench
  * headliners.
  *
  * Scale notes per query in each method's doc.
  */
object Analytics {

  /** Full-scan aggregation, TPC-H Q1 shape. Map-side partial aggregation on
    * a low-cardinality key: the shuffle moves O(groups), not O(rows).
    * Decimal-exact sums (see StateOps.dsum) keep the oracle hash-stable.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).cast("double").as("sum_qty"),
        dsum(col("l_extendedprice")).cast("double").as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** Selective join + agg + top-k, TPC-H Q3 shape. The customer side is
    * deliberately NOT force-broadcast: customer scales with SF, so pinning
    * it would OOM a 100 TB run — the segment filter + AQE pick broadcast
    * when it actually fits. Date filters push into both parquet scans.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir).where(col("c_mktsegment") === "AUTOMOBILE")
    val o = Tables.orders(spark, dir).where(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).where(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), epochMs(col("o_orderdate")).as("o_orderdate_ms"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Multi-way star join, TPC-H Q5 shape. nation/region are CONSTANT-size
    * (25/5 rows at any SF) → pinned broadcasts; supplier/customer scale
    * with SF → left to AQE (broadcast while small, shuffle when not). The
    * only unavoidable big shuffle is lineitem⋈orders on orderkey, then one
    * agg shuffle on n_name.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** Top-k per group via the custom bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]): map-side partial top-k caps the shuffle
    * at k rows per (group, partition) — the window/row_number formulation
    * (kept as [[topKPerGroupWindow]]) shuffles and sorts EVERY row. DESC
    * order is encoded by negating the price in the ordering prefix.
    */
  def topKPerGroup(part: DataFrame, k: Int = 3): DataFrame = {
    val item = struct(
      negate(col("p_retailprice")).as("neg_price"),
      col("p_partkey").as("p_partkey"),
      col("p_retailprice").as("p_retailprice")
    )
    part
      .groupBy("p_brand")
      .agg(graft.functions.TopKAgg.topK(item, k).as("top"))
      .select(col("p_brand"), posexplode(col("top")))
      .select(
        col("p_brand"),
        col("col.p_partkey").as("p_partkey"),
        col("col.p_retailprice").as("p_retailprice"),
        (col("pos") + 1).cast("long").as("rk")
      )
      .orderBy("p_brand", "rk")
  }

  /** Window/row_number reference formulation of [[topKPerGroup]] — identical
    * output, used by tests as the semantic oracle. Spark 3.5+'s
    * WindowGroupLimit softens the sort but still cannot partial-aggregate.
    */
  def topKPerGroupWindow(part: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    part
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), row_number().over(w).cast("long").as("rk"))
      .where(col("rk") <= k)
      .orderBy("p_brand", "rk")
  }

  /** Anti-join: customers with no order in 1995 (the reference's
    * requested-vs-imported frontier is this exact shape). Broadcast-able
    * when the distinct key side is small; hash anti-join otherwise.
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame = {
    val o95 = orders
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    customer
      .join(o95.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }

  /** Rollup with subtotals+grand total (the warehouse reporting shape served
    * by the reference's Postgres). rollup() expands to grouping sets in ONE
    * pass — partial aggregation applies per set; no per-level rescan.
    */
  def rollupOrders(orders: DataFrame): DataFrame = {
    val oYear = year(col("o_orderdate")).cast("long").as("o_year")
    orders
      .rollup(oYear, col("o_orderpriority"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).cast("double").as("total_price")
      )
      .select("o_year", "o_orderpriority", "gid", "n_orders", "total_price")
      .orderBy("gid", "o_year", "o_orderpriority")
  }

  /** Exact percentiles + distinct counts per segment (warehouse reporting;
    * the reference's Postgres serves percentile_cont the same way). Exact
    * `percentile` requires per-group sorted values — fine for bounded-group
    * reporting; at 100 TB switch to percentile_approx (t-digest, partial-
    * aggregable) and accept the error bound. Results rounded to 4 dp: the
    * linear-interpolation arithmetic differs in the last ulp across engines.
    */
  def segmentPercentiles(customer: DataFrame): DataFrame =
    customer
      .groupBy("c_mktsegment")
      .agg(
        round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"),
        round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_bal"),
        countDistinct(col("c_nationkey")).as("n_nations")
      )
      .orderBy("c_mktsegment")

  /** The 100 TB reporting path [[segmentPercentiles]]'s doc promises:
    * `percentile_approx` (a quantile sketch) is partial-aggregable, so the
    * shuffle carries one fixed-size sketch per (segment, partition) instead
    * of every value. `accuracy` trades sketch size for error
    * (1/accuracy relative rank error); the spec pins the result within
    * tolerance of the exact operator. Not oracle-checked: DuckDB's
    * approx_quantile is a different sketch, so only the exact twin has a
    * cross-engine contract.
    */
  def segmentPercentilesApprox(customer: DataFrame, accuracy: Int = 10000): DataFrame =
    customer
      .groupBy("c_mktsegment")
      .agg(
        round(expr(s"percentile_approx(c_acctbal, 0.5, $accuracy)"), 4).as("median_bal"),
        round(expr(s"percentile_approx(c_acctbal, 0.9, $accuracy)"), 4).as("p90_bal"),
        approx_count_distinct(col("c_nationkey")).as("n_nations_approx")
      )
      .orderBy("c_mktsegment")

  /** Mergeable distinct-count SKETCH TABLE — the 100 TB pattern for "how
    * many distinct X per Y" dashboards: aggregate once at the FINEST
    * grouping into fixed-size HLL sketches (DataSketches via the native
    * `hll_sketch_agg`, partial-aggregable like any agg), store that tiny
    * table, and answer every coarser rollup by UNIONING sketches — the raw
    * corpus is never rescanned. This is the distinct-count analogue of the
    * view catalog's pre-aggregated tables, and the artifact a streaming
    * foreachBatch can maintain incrementally (sketch-union is the same
    * OR-style merge as [[graft.functions.BloomAgg]]).
    */
  def hllSketchTable(events: DataFrame, keyCol: String, byCols: Seq[String],
                     lgK: Int = 12): DataFrame =
    events.groupBy(byCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Rollup served FROM the sketch table: union the stored sketches to any
    * coarser grouping and estimate. No raw-data scan; error is the HLL
    * bound for the build's lgK (~1.6% at lgK=12, spec-pinned at 5%).
    */
  def distinctFromSketches(sketches: DataFrame, byCols: Seq[String]): DataFrame =
    sketches.groupBy(byCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"),
        sum("n_rows").as("n_rows"))

  /** Sketch SET-ALGEBRA served from the stored sketch table: estimated
    * DISTINCT OVERLAP between every pair of groups by inclusion-exclusion
    * — |A∩B| ≈ est(A) + est(B) − est(A∪B), with the union estimated from
    * `hll_union` of the STORED sketches (exact for HLL: union is the
    * sketch's native operation; only the intersection arithmetic inherits
    * the additive error of its three terms). The audience-overlap /
    * shared-users question ("how many distinct users do purchase and
    * click share") answered without ever rescanning raw data — the same
    * serve-from-the-store contract as [[distinctFromSketches]], extended
    * from rollups to pairwise algebra.
    *
    * Shape: one union-agg collapses the stored table to one sketch per
    * group (fixed-size binaries), the pair join is |groups|² over
    * KB-sized rows (broadcast both sides at any corpus size), estimates
    * are the sketch's integer estimates, and the intersection clamps at 0
    * (inclusion-exclusion can go slightly negative at HLL error scale).
    */
  def distinctOverlapFromSketches(sketches: DataFrame, byCol: String): DataFrame = {
    val per = sketches.groupBy(col(byCol))
      .agg(hll_union_agg(col("sketch")).as("sk"))
      .localCheckpoint(true) // both sides of the pair join
    val est: Column => Column = s => hll_sketch_estimate(s) // long estimate
    per.as("a").join(per.as("b"), col(s"a.$byCol") < col(s"b.$byCol"))
      .select(col(s"a.$byCol").as("group_a"), col(s"b.$byCol").as("group_b"),
        est(col("a.sk")).as("distinct_a"), est(col("b.sk")).as("distinct_b"),
        est(hll_union(col("a.sk"), col("b.sk"))).as("distinct_union"))
      .withColumn("overlap_est",
        greatest(lit(0L),
          col("distinct_a") + col("distinct_b") - col("distinct_union")))
      .orderBy("group_a", "group_b")
  }

  /** Quantile twin of [[hllSketchTable]]: per-group value DISTRIBUTIONS
    * pre-aggregated once at the finest grouping into fixed-size mergeable
    * bottom-k sketches (functions.QuantileSketchOps), rollups served by
    * UNIONING sketches — and because bottom-k is an exact semilattice, the
    * united rollup sketch is byte-identical to a one-shot build (spec'd),
    * so micro-batch maintenance through the view store cannot drift.
    * `keyCol` must be a unique row id (it seeds the deterministic sample).
    */
  def quantileSketchTable(df: DataFrame, keyCol: String, valueCol: String,
                          byCols: Seq[String], k: Int = 512): DataFrame =
    df.groupBy(byCols.map(col): _*)
      .agg(graft.functions.QuantileSketchOps.sketchAgg(col(keyCol), col(valueCol), k).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Quantile rollup served FROM the sketch table — no raw-data rescan;
    * rank error is the sampling bound O(1/√k).
    */
  def quantilesFromSketches(sketches: DataFrame, byCols: Seq[String],
                            ps: Seq[Double] = Seq(0.5, 0.9), k: Int = 512): DataFrame = {
    val united = sketches.groupBy(byCols.map(col): _*)
      .agg(graft.functions.QuantileSketchOps.sketchUnionAgg(col("sketch"), k).as("sk"),
        sum("n_rows").as("n_rows"))
    val qCols = ps.map(p =>
      graft.functions.QuantileSketchOps.sketchQuantile(col("sk"), p)
        .as(s"p${(p * 100).round}_est"))
    united.select(byCols.map(col) ++ qCols :+ col("n_rows"): _*)
  }

  /** Frequency twin of [[hllSketchTable]]: per-group ITEM FREQUENCIES
    * pre-aggregated once at the finest grouping into fixed-size mergeable
    * Count-Min sketches ([[graft.functions.CmsOps]]) — point-lookup count
    * estimates for ARBITRARY probe keys, including keys far below any
    * heavy-hitter threshold (the gap [[HeavyHitters]]' exact two-pass
    * protocol leaves open). Element-wise-sum mergeability is exact, so
    * rollups united from stored sketches are byte-identical to a one-pass
    * build — micro-batch maintenance through the view store cannot drift
    * the artifact (CmsOpsSpec).
    */
  def freqSketchTable(df: DataFrame, itemCol: String, byCols: Seq[String],
                      depth: Int = graft.functions.CmsOps.DefaultDepth,
                      width: Int = graft.functions.CmsOps.DefaultWidth): DataFrame =
    df.groupBy(byCols.map(col): _*)
      // items hash via their CANONICAL STRING form so the string probes of
      // [[freqFromSketches]] hash identically for any item column type —
      // xxhash64(42L) != xxhash64("42") would otherwise return collision
      // noise presented as a frequency, silently
      .agg(graft.functions.CmsOps.cmsAgg(col(itemCol).cast("string"), depth, width).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Frequency rollup served FROM the sketch table: union stored sketches
    * to any coarser grouping and estimate each probe item's count — no
    * raw-data rescan. Output one row per (group, probe); `est_count` never
    * underestimates and overestimates by ≤ e/width · n_rows w.h.p.
    */
  def freqFromSketches(sketches: DataFrame, byCols: Seq[String],
                       probes: Seq[String],
                       depth: Int = graft.functions.CmsOps.DefaultDepth,
                       width: Int = graft.functions.CmsOps.DefaultWidth): DataFrame = {
    val united = sketches.groupBy(byCols.map(col): _*)
      .agg(graft.functions.CmsOps.cmsUnionAgg(col("sketch"), depth, width).as("sk"),
        sum("n_rows").as("n_rows"))
    united
      .select(byCols.map(col) ++ Seq(
        explode(typedLit(probes.sorted)).as("term"), col("sk"), col("n_rows")): _*)
      .select(byCols.map(col) ++ Seq(col("term"),
        graft.functions.CmsOps.cmsEstimate(col("sk"), col("term")).as("est_count"),
        col("n_rows")): _*)
  }

  /** Key-skew report — the diagnostic every shuffle-heavy operator in this
    * engine sizes its salting/bucket-cap valves with: group-size
    * distribution (count, max, mean, exact p50/p99 — percentiles over the
    * GROUP SIZES, a keys-sized frame, not the data) plus the top-k heaviest
    * keys via the bounded-heap aggregate. One partial-agg shuffle over the
    * data, then keys-sized work.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    val sizes = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
      // feeds the heavy-hitter heap AND the distribution stats — one
      // materialization, or the key-count rollup runs twice per query
      .localCheckpoint(true)
    val heavy = sizes.agg(graft.functions.TopKAgg.bottomK(
        struct(col("n"), col("key")), topK).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.key").as("key"), col("t.n").as("n"))
      .withColumn("rank", row_number().over(
        // ties by key DESC — the reverse-mode heap's own boundary order
        Window.orderBy(col("n").desc, col("key").desc)).cast("long"))
    val stats = sizes.agg(
      count(lit(1)).as("n_keys"), max("n").as("max_n"),
      round(avg("n"), 4).as("mean_n"),
      round(expr("percentile(n, 0.5)"), 4).as("p50_n"),
      round(expr("percentile(n, 0.99)"), 4).as("p99_n"))
    heavy.crossJoin(stats).orderBy("rank")
  }

  /** GLOBAL percentile-rank normalization — the rank-based feature
    * transform (quantile scaling) ML preprocessing applies before
    * training: each row's value mapped to its corpus-wide percent rank
    * (rank−1)/(n−1) ∈ [0, 1]. Rank transforms are the robust answer to
    * arbitrary feature distributions (outliers land at 1.0 instead of
    * stretching the scale).
    *
    * The 100 TB point: a bare `percent_rank() OVER (ORDER BY x)` collapses
    * the table into ONE task (row 39b's distribution windows are
    * per-SEGMENT — partitioned — so they dodge this); the global version
    * here rides [[Economics.orderedScan]]'s two-phase distributed scan
    * (range-bucket → ≤numBuckets totals → per-bucket windows + literal
    * bases). Ties break by `tieCol` so equal values get distinct
    * neighboring ranks — rerun-deterministic, and the oracle's
    * row_number spelling matches exactly; n=1 maps to 0 (the
    * percent_rank convention).
    */
  def percentileNormalize(df: DataFrame, valueCol: String, tieCol: String,
                          numBuckets: Int = 64): DataFrame = {
    val scanned = graft.operators.Economics.orderedScan(
        df.withColumn("gr_w", lit(0L)), valueCol, tieCol, "gr_w", numBuckets)
      .drop("gr_w", "cum_w")
    val n1 = df.agg(count(lit(1)).as("n"))
    scanned.crossJoin(broadcast(n1))
      .select(col(tieCol), col(valueCol),
        when(col("n") > 1,
          round((col("rank") - 1).cast("double") / (col("n") - 1).cast("double"), 12))
          .otherwise(lit(0.0d)).as("pct"))
      .orderBy(tieCol)
  }

  /** Market-BASKET affinity: for every item pair co-occurring in a basket,
    * the co-count plus the association measures (support, confidence a→b,
    * lift) — "bought together" over orders, "co-held tokens" over the
    * balance cache (which Circles tokens sit in the same safes — the
    * holdings-community view the trust graph only approximates).
    *
    * Scale shape: ONE shuffle keyed on the basket id collapses each basket
    * to its sorted distinct item array (partial-agg `collect_set`), then
    * the pair expansion is MAP-ONLY and bounded by basket size — never a
    * basket-side self-join (which would re-shuffle the fact table and
    * rebuild each basket per probe). Real baskets are human-scale
    * (a cart, a safe's token list); `basketCap` is the loud valve for
    * adversarial mega-baskets — above it the operator THROWS rather than
    * silently densifying toward |basket|² (raise the cap or pre-filter;
    * the kCore no-partial-answer doctrine; the oracle runs uncapped, so
    * the cap must be vacuous on the gate). Item counts partial-agg off the
    * same basket frame; the two count joinbacks are AQE-broadcastable
    * (|items| ≪ |pairs|). Association arithmetic on exact longs with one
    * double division each, rounded 12 dp (the cross-engine rule); pairs
    * below `minPairCount` drop (at 100 TB the singleton-pair tail is
    * ~all pairs and carries no signal — the same honesty rule as
    * snapshotDiff's unchanged class).
    */
  def basketAffinity(df: DataFrame, basketCol: String, itemCol: String,
                     minPairCount: Long = 2L, basketCap: Int = 1000): DataFrame = {
    val b = df.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .where(col("bk").isNotNull && col("item").isNotNull)
    val baskets = b.groupBy("bk")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .localCheckpoint(true) // feeds N, item counts AND the pair explosion
    val over = baskets.where(size(col("items")) > basketCap).limit(1).count()
    if (over > 0) sys.error(
      s"basketAffinity: basket over basketCap=$basketCap items — " +
        "a silent |basket|^2 pair explosion; raise the cap or pre-filter")
    val nBaskets = baskets.count() // 1-row probe, reused as a literal
    val items = baskets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_i"))
    // upper-triangle pairs via the codegen'd kernel — the nested-transform
    // HOF spelling is CodegenFallback (interpreted per element pair, one
    // slice copy per element); SetOpsSpec pins row parity
    val pairs = baskets.select(explode(
        graft.functions.SetOps.sortedPairs(col("items"))).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(items.select(col("item").as("item_a"), col("n_i").as("n_a")), "item_a")
      .join(items.select(col("item").as("item_b"), col("n_i").as("n_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / lit(nBaskets).cast("double"), 12)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 12)
          .as("confidence"),
        // doubles before the multiply: n_ab·N as longs overflows past ~3e9
        // baskets; the double product is the oracle's spelling too
        round(col("n_ab").cast("double") * lit(nBaskets).cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 12).as("lift"))
      .orderBy(col("n_ab").desc, col("item_a"), col("item_b"))
  }

  /** JSON payload decode (log `data`/`topics` parsing in the classifier):
    * get_json_object is codegen'd; the projection prunes to (event_id,
    * props) at the scan.
    */
  def jsonExtract(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k")
      )
      .withColumn("k_bucket", col("k") % 10)
      .orderBy("event_id")
}
