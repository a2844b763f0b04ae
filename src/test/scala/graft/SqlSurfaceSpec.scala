package graft

import graft.operators.SqlSurface

/** Hand-data semantics for the SQL-surface families whose full-value check
  * is the driver's DuckDB gate — these pin the spots where a plausible
  * wrong spelling still yields rows: NTILE's remainder distribution,
  * cume_dist's inclusive numerator, and CUBE's grouping-flag row classes.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("balanceDistribution: ntile remainder, percent_rank ends, cume_dist inclusive") {
    // one segment of 5 rows: ntile(4) buckets sized 2,1,1,1 (remainder to
    // the FIRST buckets, the SQL-standard rule)
    val customer = Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0), (4L, "A", 40.0),
      (5L, "A", 50.0), (6L, "B", 7.0)
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val r = SqlSurface.balanceDistribution(customer).collect()
      .map(x => x.getAs[Long]("c_custkey") ->
        ((x.getAs[Long]("bal_quartile"), x.getAs[Double]("bal_pct_rank"),
          x.getAs[Double]("bal_cume_dist")))).toMap
    assert(r(1L)._1 == 1L && r(2L)._1 == 1L && r(3L)._1 == 2L &&
           r(4L)._1 == 3L && r(5L)._1 == 4L)
    assert(r(1L)._2 == 0.0 && r(5L)._2 == 1.0)      // percent_rank = (rk-1)/(n-1)
    assert(r(1L)._3 == 0.2 && r(5L)._3 == 1.0)      // cume_dist counts self
    // singleton segment: percent_rank 0 by convention, cume_dist 1
    assert(r(6L) == ((1L, 0.0, 1.0)))
  }

  test("ordersCube: all four grouping-set classes present with consistent totals") {
    val orders = Seq(
      ("1-URGENT", "O", 10.0), ("1-URGENT", "F", 20.0),
      ("3-MEDIUM", "O", 40.0), ("3-MEDIUM", "O", 80.0)
    ).toDF("o_orderpriority", "o_orderstatus", "o_totalprice")
    val rows = SqlSurface.ordersCube(orders).collect()
    def cls(gp: Long, gs: Long) = rows.filter(r =>
      r.getAs[Long]("g_priority") == gp && r.getAs[Long]("g_status") == gs)
    // (0,0) detail: 3 distinct pairs; (0,1) by priority: 2; (1,0) by status: 2;
    // (1,1) grand total: 1
    assert(cls(0, 0).length == 3 && cls(0, 1).length == 2 &&
           cls(1, 0).length == 2 && cls(1, 1).length == 1)
    val grand = cls(1, 1).head
    assert(grand.getAs[Long]("n_orders") == 4L &&
           grand.getAs[Double]("sum_price") == 150.0)
    // every class's sums re-add to the grand total
    assert(cls(0, 1).map(_.getAs[Double]("sum_price")).sum == 150.0)
    assert(cls(1, 0).map(_.getAs[Double]("sum_price")).sum == 150.0)
  }

  test("percentileNormalize: hand ranks, tie determinism, scan invariance, n=1") {
    import spark.implicits._
    import graft.operators.Analytics
    val df = Seq((1L, 50.0), (2L, 10.0), (3L, 30.0), (4L, 10.0), (5L, 99.0))
      .toDF("id", "x")
    val r = Analytics.percentileNormalize(df, "x", "id")
      .as[(Long, Double, Double)].collect().map(x => x._1 -> x._3).toMap
    // order: (10,id2) (10,id4) (30) (50) (99) → ranks 1..5, pct (r−1)/4
    assert(r == Map(2L -> 0.0, 4L -> 0.25, 3L -> 0.5, 1L -> 0.75, 5L -> 1.0))
    val rep = Analytics.percentileNormalize(df.repartition(7), "x", "id",
      numBuckets = 3).as[(Long, Double, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(rep == r)
    val one = Analytics.percentileNormalize(Seq((9L, 42.0)).toDF("id", "x"), "x", "id")
      .as[(Long, Double, Double)].collect()
    assert(one.toSeq == Seq((9L, 42.0, 0.0)))
    assert(Analytics.percentileNormalize(df.limit(0), "x", "id").count() == 0)
  }
}
