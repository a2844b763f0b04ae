package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.StateOps.{dsum, epochMs}

/** TPC-H-shape breadth pack, adapted to the driver testdata's reduced schema
  * (no partsupp, no commit/receipt dates, no comment/phone columns — each
  * adaptation keeps the SHAPE the original query exercises and swaps only the
  * unavailable column for an available proxy).
  *
  * These extend Analytics (Q1/Q3/Q5) with the remaining distinctive
  * distributed-plan shapes of the suite: OR-pair nation trade (Q7),
  * conditional-ratio market share (Q8), multi-join profit rollup (Q9),
  * returned-item top-k (Q10), ON-clause-filtered left outer + count
  * distribution (Q13), single-row conditional ratio (Q14), distinct-count
  * rollup over a derived relation (Q16), having-gated large-order join (Q18),
  * disjunctive join predicate (Q19), semi-join chain with threshold (Q20),
  * sole-late-supplier dual-correlated-exists (Q21, re-expressed as two-level
  * aggregation), and scalar-subquery + anti-join (Q22).
  *
  * Scale doctrine shared by all: region/nation are constant-size → pinned
  * broadcast; customer/supplier/part scale with SF → AQE decides; the only
  * unavoidable big shuffles are lineitem⋈orders on orderkey and the final
  * group-bys, all of which combine map-side partials. Every date/brand/size
  * filter is a deterministic literal so it pushes into the parquet scan.
  * All money sums go through [[StateOps.dsum]] (decimal-exact, then one cast
  * to double) so oracle hashes are stable cross-engine.
  */
object TpchShapes {

  private def vol: org.apache.spark.sql.Column =
    col("l_extendedprice") * (lit(1.0d) - col("l_discount"))

  /** Q7 shape: bilateral trade volume between two nations by year. The OR
    * pair ((n1,n2) or (n2,n1)) is ONE predicate applied after both nation
    * joins — not a UNION of two nearly-identical subplans, which would scan
    * lineitem twice. nation is broadcast (25 rows at any SF).
    */
  def nationVolume(spark: SparkSession, dir: String,
                   nationA: String = "NATION_3", nationB: String = "NATION_8"): DataFrame = {
    val n = Tables.nation(spark, dir)
    val lo = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
    lo.join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cn_key"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
             (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(vol).cast("double").as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8 shape: one nation's supplier share of a region's order volume per
    * year — the conditional-sum ratio computed in ONE aggregation pass
    * (numerator = sum gated by supplier nation, denominator = total), never
    * two scans. Both sums are decimal-exact; the division happens once on
    * the final tiny frame and is rounded to 6 dp for cross-engine parity.
    */
  def marketShare(spark: SparkSession, dir: String, region: String = "ASIA",
                  nation: String = "NATION_2", ptype: String = "PROMO"): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = broadcast(Tables.region(spark, dir).where(col("r_name") === region))
    val base = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).where(col("p_type") === ptype), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir).where(
              col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n.select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))),
            col("c_nationkey") === col("cn_key"))
      .join(r, col("cn_region") === col("r_regionkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
    base
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(when(col("supp_nation") === nation, vol).otherwise(lit(0.0d))).cast("double").as("nat_volume"),
           dsum(vol).cast("double").as("total_volume"))
      .withColumn("mkt_share", round(col("nat_volume") / col("total_volume"), 6))
      .orderBy("o_year")
  }

  /** Q9 shape (adapted: profit = discounted revenue; partsupp cost column
    * does not exist in this schema): profit by supplier nation and year over
    * parts whose name matches a token. The LIKE filter prunes part before
    * the join; the big join is lineitem⋈orders on orderkey.
    */
  def profitByNation(spark: SparkSession, dir: String, nameToken: String = "gear"): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).where(col("p_name").contains(nameToken)),
            col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(vol).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Q10 shape: top returned-item customers in a quarter. The returnflag and
    * date filters push into the scans; one orderkey join shuffle, one custkey
    * agg shuffle; top-k bounded by the final orderBy+limit.
    */
  def returnedTop(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir).where(
              col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(vol).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** Q12 shape (adapted: no shipmode column — the CASE-bucketed conditional
    * counts are the point): late-shipped lines (> 60 days after order date)
    * per linestatus, split by order priority class. count(CASE) not
    * SUM(CASE) so both engines emit BIGINT.
    */
  def lateLinesByPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1))).as("high_line_count"),
           count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1))).as("low_line_count"))
      .orderBy("l_linestatus")

  /** Q13 shape: distribution of orders-per-customer. The priority filter
    * lives in the JOIN CONDITION (not a WHERE after it) so customers whose
    * orders all fail the filter still appear with c_count = 0 — the exact
    * semantics that make Q13 a left-outer test. Two agg shuffles, both tiny
    * after partials (customers, then distinct counts).
    */
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame =
    orderCountDistributionFrames(Tables.customer(spark, dir), Tables.orders(spark, dir))

  def orderCountDistributionFrames(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.where(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q14 shape: promo revenue share in one month — single-row conditional
    * ratio. One join (part side prunable), one global agg.
    */
  def promoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
             col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg(dsum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0d))).cast("double").as("promo_revenue"),
           dsum(vol).cast("double").as("total_revenue"))
      .withColumn("promo_share", round(lit(100.0d) * col("promo_revenue") / col("total_revenue"), 6))

  /** Q16 shape (adapted: the part-supplier relation is DERIVED from lineitem
    * since partsupp doesn't exist): supplier count per (brand, type, size)
    * for a size list, excluding one brand. The derived distinct relation is
    * exactly the partsupp cardinality; count(DISTINCT) runs as Spark's
    * two-phase expand — both shuffles carry narrow keys.
    */
  def supplierCountByPart(spark: SparkSession, dir: String,
                          excludeBrand: String = "Brand#1",
                          sizes: Seq[Int] = Seq(1, 5, 9, 14, 23, 36, 45, 49)): DataFrame =
    // the selective part filter BROADCASTS onto the fact scan (map-side,
    // ~92% of pairs dropped before any exchange) and the one remaining
    // shuffle is the count_distinct partial agg itself — the old
    // pair-distinct exchange is redundant under count_distinct (duplicate
    // (partkey, suppkey) pairs collapse in the distinct aggregate), so
    // the plan goes 2 Exchange → 1 with identical output
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(Tables.part(spark, dir).where(col("p_brand") =!= excludeBrand &&
              col("p_size").isin(sizes.map(Integer.valueOf): _*))),
            col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** Q18 shape: large-volume orders — HAVING-gated aggregate feeding a join.
    * The qty rollup happens FIRST (partial-agg shuffle on orderkey, the
    * frame collapses to qualifying orders only) and the customer/orders
    * joins run on the tiny survivor set. Joining before aggregating would
    * shuffle the wide join output; this order never does.
    */
  def largeOrders(spark: SparkSession, dir: String, minQty: Double = 250.0d): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).cast("double").as("sum_qty"))
      .where(col("sum_qty") > minQty)
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              epochMs(col("o_orderdate")).as("o_orderdate_ms"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19 shape: disjunctive join predicate (brand × qty-band × size-band
    * arms). The disjunction is one join filter over the part join — Catalyst
    * extracts the common partkey equi-condition and pushes the per-arm
    * constants; a UNION-of-three-joins spelling would scan lineitem thrice.
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val arm1 = col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) && col("p_size").between(1, 5)
    val arm2 = col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
    val arm3 = col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) && col("p_size").between(1, 15)
    Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey") && (arm1 || arm2 || arm3))
      .agg(dsum(vol).cast("double").as("revenue"))
  }

  /** Q20 shape: semi-join chain with a threshold — suppliers that moved more
    * than `minQty` of matching parts in 1997. The per-supplier rollup gates
    * BEFORE touching the supplier table; supplier joins the tiny survivor
    * set (AQE broadcasts it).
    */
  def qualifiedSuppliers(spark: SparkSession, dir: String,
                         nameToken: String = "gear", minQty: Double = 380.0d): DataFrame = {
    val qualified = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(spark, dir).where(col("p_name").contains(nameToken)),
            col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(dsum(col("l_quantity")).cast("double").as("total_qty"))
      .where(col("total_qty") > minQty)
    Tables.supplier(spark, dir)
      .join(qualified, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_qty"))
      .orderBy("s_name")
  }

  /** Q21 shape (adapted: "late" = shipped > 60 days after order date, since
    * commit/receipt dates don't exist): suppliers who were the SOLE late
    * supplier on a multi-supplier 'F' order, weighted by their late lines.
    *
    * The classic spelling is a dual correlated EXISTS / NOT EXISTS self-join
    * on lineitem (the oracle runs exactly that); at scale that's two extra
    * shuffles of the fact table. Re-expressed Spark-first as TWO-LEVEL
    * aggregation: per-(order, supplier) late-line counts, then per-order
    * supplier/late-supplier counts — both combine map-side partials, lineitem
    * shuffles once on orderkey, and the sole-late filter is a plain predicate
    * on the aggregate row. Semantically identical (spec + oracle prove it).
    */
  def soleLateSupplier(spark: SparkSession, dir: String, k: Int = 25): DataFrame =
    soleLateSupplierFrames(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.supplier(spark, dir), k)

  def soleLateSupplierFrames(lineitem: DataFrame, orders: DataFrame,
                             supplier: DataFrame, k: Int = 25): DataFrame = {
    val base = lineitem
      .join(orders.where(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val perSupp = base.groupBy("l_orderkey", "l_suppkey")
      .agg(count(when(col("late"), lit(1))).as("late_lines"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("nsupp"),
           count(when(col("late_lines") > 0, lit(1))).as("nlate"),
           max_by(col("l_suppkey"), when(col("late_lines") > 0, col("late_lines"))).as("late_supp"),
           max(when(col("late_lines") > 0, col("late_lines"))).as("late_supp_lines"))
      .where(col("nsupp") > 1 && col("nlate") === 1)
    perOrder
      .groupBy(col("late_supp"))
      .agg(sum(col("late_supp_lines")).as("numwait"))
      .join(supplier, col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }

  /** Q22 shape (adapted: "idle" = no order in the final year of the data,
    * since every customer has some order; the scalar-average subquery +
    * anti-join structure is the point): customers with above-average
    * positive balance and no recent orders, rolled up by market segment.
    *
    * The average gate is computed WITHOUT division: `bal * n > total` over
    * exact decimals (cross-engine float division would drift); the 1-row
    * (total, n) frame rides a broadcast cross join. The anti-join prunes
    * the orders side to the date window before shuffling.
    */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val stats = c.where(col("c_acctbal") > 0.0d)
      .agg(dsum(col("c_acctbal")).as("tot"), count(lit(1)).as("n"))
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
      .select("o_custkey")
    c.crossJoin(broadcast(stats))
      .where(col("c_acctbal").cast("decimal(18,4)") * col("n") > col("tot"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** Q4 shape (adapted: "late" = shipped > 60 days after order date, the
    * pack's standing no-commit-date proxy): order counts per priority for
    * orders with at least one late line — an EXISTS expressed as LEFT SEMI
    * (one orderkey shuffle, the semi side collapses before the count).
    */
  def priorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
             col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    orders
      .join(Tables.lineitem(spark, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q6 shape: the pure scan-aggregate — one-row forecast revenue from a
    * discount band. Every predicate is a literal on a scanned column, so
    * the WHOLE query is a pushed-filter single pass with a map-side
    * partial sum (the plan every columnar engine should reduce this to).
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
             col("l_discount").between(0.05d, 0.07d) &&
             col("l_quantity") < 24.0d)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).cast("double").as("revenue"))

  /** Q15 shape: top supplier by quarterly revenue — the view + scalar-max
    * subquery: one suppkey partial-agg over the quarter, the 1-row max
    * broadcast back as an equality filter (ties all surface, per the
    * original's semantics), supplier joined last.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(vol).cast("double").as("total_revenue"))
    rev.join(broadcast(rev.agg(max(col("total_revenue")).as("mxr"))),
        col("total_revenue") === col("mxr"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q17 shape: small-quantity-order revenue — the correlated per-part
    * average DECORRELATED into one partial-agg frame joined back (the
    * standard rewrite; a correlated subquery would re-scan lineitem per
    * part). Parts prune by brand BEFORE either lineitem pass touches the
    * wire; avg is the engine's exact decimal-sum / count spelling.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String,
                           brand: String = "Brand#13"): DataFrame = {
    val parts = Tables.part(spark, dir).where(col("p_brand") === brand)
      .select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy("l_partkey")
      .agg((dsum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
      .select(col("l_partkey").as("ap_partkey"), col("avg_qty"))
    li.join(broadcast(avgQty), col("l_partkey") === col("ap_partkey"))
      .where(col("l_quantity") < lit(0.2d) * col("avg_qty"))
      .agg(round(dsum(col("l_extendedprice")).cast("double") / 7.0d, 12).as("avg_yearly"))
  }

  /** The derived part-supplier relation with a supply cost (partsupp doesn't
    * exist in the testdata, so Q2/Q11 derive it from lineitem exactly as Q16
    * derives its distinct pairs): supply_cost(p, s) = the pair's average unit
    * price, decimal-exact sums then ONE double division, rounded for
    * cross-engine hash stability. One partial-agg shuffle on the narrow
    * (partkey, suppkey) pair — at 100 TB this is the relation you'd
    * materialize once and bucket by partkey.
    */
  private def derivedPartsupp(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(round(dsum(col("l_extendedprice")).cast("double") /
                 dsum(col("l_quantity")).cast("double"), 6).as("supply_cost"))

  /** Q2 shape (adapted: partsupp derived per [[derivedPartsupp]]): the
    * min-cost supplier per part within a region. The original's correlated
    * `= (SELECT min(ps_supplycost) ... WHERE region)` is DECORRELATED into a
    * per-part min over the region-filtered pair relation, joined back on
    * (partkey, cost) — the standard rewrite that turns a per-part rescan
    * into one extra partial agg. Region/nation pin broadcast; the survivor
    * set is tiny so AQE broadcasts the supplier/part joins. Ties on min cost
    * all surface (the original's semantics); the ORDER BY key
    * (s_acctbal desc, n_name, s_name, p_partkey) is a total order because
    * (s_name, p_partkey) is unique per row, so LIMIT is deterministic.
    */
  def minCostSupplier(spark: SparkSession, dir: String,
                      regionName: String = "EUROPE", partType: String = "STANDARD",
                      size: Int = 15): DataFrame = {
    val regionNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === regionName)),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val regionSupp = Tables.supplier(spark, dir)
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"))
    // The correlated min is PER PART, so the highly selective (p_type,
    // p_size) filter commutes with it: semi-joining the filtered part keys
    // into the lineitem scan BEFORE the partsupp aggregation shrinks the
    // derived-pair rollup (and the min) to surviving parts only — the
    // classic "push the selective filter through the decorrelation". The
    // survivor pair frame feeds the min AND the joinback, so it is
    // localCheckpointed once instead of re-aggregating lineitem twice
    // (measured: two full scan+agg subtrees in the old plan).
    val keepParts = Tables.part(spark, dir).where(col("p_type") === partType &&
                                                  col("p_size") === size)
    val regionPairs = Tables.lineitem(spark, dir)
      .join(broadcast(keepParts.select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(round(dsum(col("l_extendedprice")).cast("double") /
                 dsum(col("l_quantity")).cast("double"), 6).as("supply_cost"))
      .join(regionSupp.select(col("s_suppkey")), col("ps_suppkey") === col("s_suppkey"))
      .drop("s_suppkey")
      // feeds the per-part min AND the joinback. Size valve (r14 VERDICT
      // item 9): grain is (surviving part × region supplier) pairs — the
      // selective (p_type, p_size) filter keeps ~1/200 of parts and the
      // region ~1/5 of suppliers, so at 100 TB this is ≈ |partsupp|/1000,
      // comfortably executor-storage-sized, but still data-proportional:
      // if the filters are widened, prefer persist(MEMORY_AND_DISK) (keep
      // lineage — executor loss recomputes the one scan+agg instead of
      // restarting the job; the subtree is shallow, so the plan-size cost
      // localCheckpoint exists to avoid is minor here).
      .localCheckpoint(true)
    val minCost = regionPairs.groupBy(col("ps_partkey").as("mc_partkey"))
      .agg(min(col("supply_cost")).as("min_cost"))
    regionPairs
      .join(minCost, col("ps_partkey") === col("mc_partkey") &&
                     col("supply_cost") === col("min_cost"))
      .join(keepParts, col("ps_partkey") === col("p_partkey"))
      .join(regionSupp, col("ps_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
              col("p_brand"), col("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q11 shape (adapted: stock value per part = the discounted revenue its
    * suppliers from one nation moved, standing in for supplycost*availqty):
    * parts whose value exceeds a FRACTION of the national total — the
    * scalar-subquery-in-HAVING shape. The 1-row total is computed from the
    * same per-part frame (decimal-exact, so both sides of the `>` are
    * engine-deterministic) and broadcast back as a cross-joined filter; the
    * per-part rollup shuffles once on partkey with map-side partials.
    */
  def importantStock(spark: SparkSession, dir: String,
                     nationName: String = "NATION_19",
                     fraction: Double = 0.0015d): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).where(col("n_name") === nationName)),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(spark, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(dsum(vol).cast("double").as("part_value"))
      // feeds the output AND the threshold agg — one materialization, or
      // the lineitem rollup runs twice per query
      .localCheckpoint(true)
    perPart
      .crossJoin(broadcast(perPart.agg(
        (dsum(col("part_value")) * lit(fraction)).cast("double").as("thr"))))
      .where(col("part_value") > col("thr"))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }
}
