package graft

import graft.operators.TpchShapes
import org.apache.spark.sql.functions._

/** The TPC-H breadth pack's subtle semantics on hand data, plus an sf0.001
  * smoke over every query. The full-value check is the driver's DuckDB
  * oracle gate; these pin the two spots where a wrong-but-plausible
  * spelling would still produce rows: Q13's ON-clause left-join filter and
  * Q21's sole-late-supplier aggregation rewrite.
  */
class TpchShapesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q13: customers whose orders ALL fail the filter still count at zero") {
    val customer = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (10L, 1L, "1-URGENT"),   // cust 1: only urgent orders -> filtered in ON
      (11L, 1L, "1-URGENT"),
      (12L, 2L, "3-MEDIUM"),   // cust 2: two qualifying orders
      (13L, 2L, "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val r = TpchShapes.orderCountDistributionFrames(customer, orders)
      .as[(Long, Long)].collect().toMap
    // c_count 0 -> custs 1 and 3 (all-urgent and no-orders both at zero),
    // c_count 2 -> cust 2. A WHERE-after-join spelling would lose both zeros.
    assert(r == Map(0L -> 2L, 2L -> 1L))
  }

  private def q21Fixture = {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, "F", ts("1996-01-01")), // multi-supplier, only supp 10 late (twice)
      (2L, "F", ts("1996-01-01")), // multi-supplier, both late -> excluded
      (3L, "F", ts("1996-01-01")), // single-supplier late -> excluded
      (4L, "O", ts("1996-01-01"))  // not finished -> excluded
    ).toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val lineitem = Seq(
      (1L, 10L, ts("1996-06-01")), (1L, 10L, ts("1996-07-01")), (1L, 20L, ts("1996-01-15")),
      (2L, 10L, ts("1996-06-01")), (2L, 20L, ts("1996-06-01")),
      (3L, 30L, ts("1996-06-01")),
      (4L, 10L, ts("1996-06-01")), (4L, 20L, ts("1996-01-15"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((10L, "supp10"), (20L, "supp20"), (30L, "supp30"))
      .toDF("s_suppkey", "s_name")
    (lineitem, orders, supplier)
  }

  test("q21: sole-late-supplier aggregation counts late lines, excludes shared-blame and solo orders") {
    val (lineitem, orders, supplier) = q21Fixture
    val r = TpchShapes.soleLateSupplierFrames(lineitem, orders, supplier)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("supp10", 2L))) // order 1 only, both late lines counted
  }

  test("q21: aggregation rewrite == correlated EXISTS/NOT-EXISTS spelling") {
    val (lineitem, orders, supplier) = q21Fixture
    lineitem.createOrReplaceTempView("t21_lineitem")
    orders.createOrReplaceTempView("t21_orders")
    supplier.createOrReplaceTempView("t21_supplier")
    val classic = spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM t21_lineitem l1
        | JOIN t21_orders ON l1.l_orderkey = o_orderkey
        | JOIN t21_supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
        |  AND EXISTS (SELECT 1 FROM t21_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM t21_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val rewrite = TpchShapes.soleLateSupplierFrames(lineitem, orders, supplier)
      .as[(String, Long)].collect().toSeq
    assert(rewrite == classic)
  }

  test("every pack query returns rows at sf0.001 with sane invariants") {
    assert(TpchShapes.nationVolume(spark, dir).count() > 0)
    val q8 = TpchShapes.marketShare(spark, dir).collect()
    assert(q8.nonEmpty && q8.forall { r =>
      val share = r.getAs[Double]("mkt_share")
      share >= 0.0 && share <= 1.0 &&
        r.getAs[Double]("nat_volume") <= r.getAs[Double]("total_volume")
    })
    assert(TpchShapes.profitByNation(spark, dir).count() > 0)
    assert(TpchShapes.returnedTop(spark, dir).count() > 0)
    assert(TpchShapes.lateLinesByPriority(spark, dir).count() > 0)
    val q13 = TpchShapes.orderCountDistribution(spark, dir)
      .agg(sum("custdist")).as[Long].head()
    assert(q13 == Tables.customer(spark, dir).count()) // every customer in exactly one bucket
    val q14 = TpchShapes.promoShare(spark, dir).head()
    assert(q14.getAs[Double]("promo_share") >= 0.0 && q14.getAs[Double]("promo_share") <= 100.0)
    assert(TpchShapes.supplierCountByPart(spark, dir).count() > 0)
    assert(TpchShapes.largeOrders(spark, dir).count() > 0)
    assert(TpchShapes.disjunctiveRevenue(spark, dir).head().getAs[Double]("revenue") > 0.0)
    assert(TpchShapes.qualifiedSuppliers(spark, dir, minQty = 10.0).count() > 0)
    assert(TpchShapes.idleRichCustomers(spark, dir).count() > 0)
    assert(TpchShapes.priorityCheck(spark, dir).count() > 0)
    assert(TpchShapes.forecastRevenue(spark, dir).head().getAs[Double]("revenue") > 0.0)
    // Q15: every surfaced supplier ties at the global max revenue
    val q15 = TpchShapes.topSupplier(spark, dir).collect()
    assert(q15.nonEmpty &&
      q15.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
    val q17 = TpchShapes.smallQuantityRevenue(spark, dir, brand = "Brand#9").head()
    assert(!q17.isNullAt(0) && q17.getAs[Double]("avg_yearly") >= 0.0)
    // Q2 (the default size-15 filter has survivors at sf0.001 and sf0.01)
    val q2 = TpchShapes.minCostSupplier(spark, dir)
    val q2rows = q2.collect()
    assert(q2rows.nonEmpty)
    val perPartCosts = q2rows.groupBy(_.getAs[Long]("p_partkey"))
    assert(perPartCosts.forall { case (_, rs) =>
      rs.map(_.getAs[Double]("supply_cost")).distinct.length == 1
    }) // min-cost ties all share the one min value per part
    // Q11: every surfaced part's value exceeds the fraction threshold, and
    // a fraction of 1.0 (more than the whole) surfaces nothing
    val q11 = TpchShapes.importantStock(spark, dir, fraction = 0.001)
    assert(q11.count() > 0)
    assert(TpchShapes.importantStock(spark, dir, fraction = 1.0).count() == 0)
  }
}
