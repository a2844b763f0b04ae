package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.StateOps.{dsum, epochMs}

/** Breadth of the ad-hoc SQL surface (the reference's users query its
  * Postgres with arbitrary SQL; an engine replacement must cover the same
  * shapes). Each method is one portable query family with a DuckDB oracle —
  * all deterministic under the SURVEY §3 parity rules.
  */
object SqlSurface {

  /** Correlated-aggregate filter: customers above their segment's average
    * balance. Decorrelated explicitly into an aggregate + broadcast-able
    * join (what a good optimizer does to the subquery form); the threshold
    * is decimal-sum / count rendered as double — cross-engine exact.
    */
  def aboveSegmentAverage(customer: DataFrame): DataFrame = {
    val avgBySeg = customer.groupBy("c_mktsegment")
      .agg((dsum(col("c_acctbal")).cast("double") / count(lit(1))).as("seg_avg"))
    customer.join(avgBySeg, "c_mktsegment")
      .where(col("c_acctbal") > col("seg_avg"))
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Window-function family: per-customer order sequence with lag/lead/
    * rank/running count. One shuffle on custkey; (date, orderkey) ordering
    * is unique ⇒ deterministic.
    */
  def orderSequences(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      epochMs(col("o_orderdate")).as("o_date_ms"),
      lag("o_orderkey", 1).over(w).as("prev_orderkey"),
      lead("o_orderkey", 1).over(w).as("next_orderkey"),
      row_number().over(w).cast("long").as("order_seq"),
      count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("orders_so_far")
    ).orderBy("o_custkey", "order_seq")
  }

  /** Set operations: urgent-priority customers vs 1995 customers —
    * INTERSECT and EXCEPT (both shuffle-dedup on the key).
    */
  def customerSetOps(orders: DataFrame): DataFrame = {
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val y1995 = orders.where(year(col("o_orderdate")) === 1995).select("o_custkey")
    urgent.intersect(y1995).withColumn("set_op", lit("both"))
      .unionAll(urgent.except(y1995).withColumn("set_op", lit("urgent_only")))
      .select("set_op", "o_custkey")
      .orderBy("set_op", "o_custkey")
  }

  /** Pivot shape: order counts per (year × priority) — conditional
    * aggregation, one pass, one shuffle on the year.
    */
  def ordersPivot(orders: DataFrame): DataFrame = {
    def cnt(p: String, alias: String) =
      count(when(col("o_orderpriority") === p, 1)).as(alias)
    orders.groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(cnt("1-URGENT", "n_urgent"), cnt("2-HIGH", "n_high"),
        cnt("3-MEDIUM", "n_medium"), cnt("4-NOT SPECIFIED", "n_notspec"),
        cnt("5-LOW", "n_low"))
      .orderBy("o_year")
  }

  /** Semi-join: orders containing at least one max-quantity line item. */
  def ordersWithBigLineitem(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(
        lineitem.where(col("l_quantity") >= 50.0d).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")

  /** String-function family over customer names (map-only projection). */
  def customerNameFeatures(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      upper(col("c_name")).as("name_upper"),
      length(col("c_name")).cast("long").as("name_len"),
      substring(col("c_name"), 1, 8).as("name_prefix"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded")
    ).orderBy("c_custkey")

  /** Distribution-window family — the second window shape class (the first,
    * [[orderSequences]], covers lag/lead/rank/running count): NTILE buckets,
    * percent_rank and cume_dist per segment. The ORDER BY key
    * (c_acctbal, c_custkey) is a total order, so every rank function is
    * deterministic and the peer groups cume_dist counts are single rows —
    * identical semantics in Spark and DuckDB. One shuffle on the segment
    * key; rank evaluation is a per-partition sort, no second exchange.
    */
  def balanceDistribution(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
    customer.select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
      ntile(4).over(w).cast("long").as("bal_quartile"),
      round(percent_rank().over(w), 12).as("bal_pct_rank"),
      round(cume_dist().over(w), 12).as("bal_cume_dist"))
  }

  /** CUBE rollup — all four grouping combinations of (priority, status) in
    * one pass. Spark plans this as a single Expand + hash aggregate (each
    * input row fans to the 4 grouping sets map-side, partials combine before
    * the one shuffle) — the same plan shape GROUPING SETS and ROLLUP
    * ([[Analytics.rollupOrders]]) lower to. grouping() flags disambiguate
    * real NULLs from subtotal rows, rendered as longs for the oracle hash.
    */
  def ordersCube(orders: DataFrame): DataFrame =
    orders.cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).cast("double").as("sum_price"),
           grouping(col("o_orderpriority")).cast("long").as("g_priority"),
           grouping(col("o_orderstatus")).cast("long").as("g_status"))
      .orderBy(col("g_priority"), col("g_status"), col("o_orderpriority"), col("o_orderstatus"))
}
