package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RowNumberToPickRuleSpec extends SparkSpec {

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  private def hasPickAgg(df: DataFrame): Boolean = {
    val s = df.queryExecution.optimizedPlan.toString
    s.contains("min_by") || s.contains("max_by")
  }

  // same predicate as rn === 1 / rn <= k but a shape the rule leaves alone —
  // the unrewritten-window baseline for result comparison
  private def dodge(df: DataFrame, k: Int): DataFrame =
    df.where(col("rn") >= 1 && col("rn") <= k)

  test("rn=1 desc window becomes max_by; results match the unrewritten form") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val rn = events.withColumn("rn", row_number().over(w))
    val rewritten = rn.where(col("rn") === 1)
    assert(!hasWindow(rewritten), "window must be rewritten away")
    assert(hasPickAgg(rewritten))
    val baseline = dodge(rn, 1)
    assert(hasWindow(baseline), "baseline must keep the window")
    val a = rewritten.collect().map(_.toSeq).toSet
    val b = baseline.collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("rn=1 asc window becomes min_by; multi-key ordering preserved") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_linenumber"), col("l_quantity"))
    val rn = li.withColumn("rn", row_number().over(w))
    val rewritten = rn.where(col("rn") === 1)
    assert(!hasWindow(rewritten) && hasPickAgg(rewritten))
    assert(rewritten.collect().map(_.toSeq).toSet ==
      dodge(rn, 1).collect().map(_.toSeq).toSet)
  }

  test("rn<=k asc window becomes the bounded-heap top-k aggregate") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_linenumber"), col("l_quantity"))
    val rn = li.withColumn("rn", row_number().over(w))
    val rewritten = rn.where(col("rn") <= 3)
    assert(!hasWindow(rewritten), "window must be rewritten away")
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("graft_top_k"))
    val a = rewritten.collect().map(_.toSeq).toSet
    val b = dodge(rn, 3).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty, "top-3 results and ranks must match the window")
    // rn < k also fires (as <= k-1)
    val lt = rn.where(col("rn") < 3)
    assert(!hasWindow(lt))
    assert(lt.collect().map(_.toSeq).toSet == dodge(rn, 2).collect().map(_.toSeq).toSet)
  }

  test("rn<=k desc window uses the reversed heap; ranks match the window") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val rn = events.withColumn("rn", row_number().over(w))
    val rewritten = rn.where(col("rn") <= 3)
    assert(!hasWindow(rewritten), "desc top-k must rewrite via reverse mode")
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("graft_top_k"))
    val a = rewritten.collect().map(_.toSeq).toSet
    val b = dodge(rn, 3).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("conjunctive filter: rn=1 AND p rewrites with a residual filter on p") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val rn = events.withColumn("rn", row_number().over(w))
    val rewritten = rn.where(col("rn") === 1 && col("event_type") === "purchase")
    assert(!hasWindow(rewritten), "rank conjunct must still fire inside AND")
    assert(hasPickAgg(rewritten))
    val baseline = dodge(rn, 1).where(col("event_type") === "purchase")
    assert(rewritten.collect().map(_.toSeq).toSet ==
      baseline.collect().map(_.toSeq).toSet)
    // rn<=k inside a conjunction too
    val topk = rn.where(col("rn") <= 3 && col("event_type") === "view")
    assert(!hasWindow(topk))
    assert(topk.collect().map(_.toSeq).toSet ==
      dodge(rn, 3).where(col("event_type") === "view").collect().map(_.toSeq).toSet)
  }

  test("renaming Project between Filter and Window is traversed (subquery spelling)") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    s.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView("orders_v")
    // the spelling users actually write: subquery + outer WHERE, columns
    // renamed through the subquery's SELECT
    val sql = s.sql(
      """SELECT custkey, okey, rank FROM (
        |  SELECT o_custkey AS custkey, o_orderkey AS okey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rank
        |  FROM orders_v) t
        |WHERE rank = 1 AND custkey % 2 = 0""".stripMargin)
    assert(!hasWindow(sql), "filter-over-project-over-window must rewrite")
    assert(hasPickAgg(sql))
    val baseline = s.sql(
      """SELECT custkey, okey, rank FROM (
        |  SELECT o_custkey AS custkey, o_orderkey AS okey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rank
        |  FROM orders_v) t
        |WHERE rank >= 1 AND rank <= 1 AND custkey % 2 = 0""".stripMargin)
    assert(hasWindow(baseline))
    assert(sql.collect().map(_.toSeq).toSet == baseline.collect().map(_.toSeq).toSet)
    assert(sql.count() > 0)
  }

  test("conjunction guards: overlapping rank conjuncts stay correct, computed projections do not fire") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val rn = events.withColumn("rn", row_number().over(w))
    // overlapping rank conjuncts: Catalyst's own simplification (constant
    // propagation / constraint pruning) may reduce them to ONE rank
    // predicate before this rule runs — whether the rewrite then fires or
    // the both-conjunct guard keeps the window, results must equal the
    // window form
    assert(rn.where(col("rn") === 1 && col("rn") <= 3).collect().map(_.toSeq).toSet ==
      dodge(rn, 1).collect().map(_.toSeq).toSet)
    // residual mentioning rn: ConstantPropagation substitutes rn=1 into it
    // (making it rank-free) or the reference guard blocks — either way
    // results match the window form
    assert(rn.where(col("rn") === 1 && (col("rn") + col("event_id")) > 0)
      .collect().map(_.toSeq).toSet == dodge(rn, 1).collect().map(_.toSeq).toSet)
    // computed (non-renaming) projection between filter and window:
    // PushPredicateThroughProject moves the rank filter below the Project
    // before this rule runs, normalizing it into the fire-able shape — so
    // the rewrite still applies, and results must match the window form
    val computed = rn.select(col("user_id"), (col("event_id") * 2).as("eid2"), col("rn"))
      .where(col("rn") === 1)
    assert(!hasWindow(computed) && hasPickAgg(computed))
    val computedBaseline = dodge(rn, 1).select(col("user_id"), (col("event_id") * 2).as("eid2"), col("rn"))
    assert(computed.collect().map(_.toSeq).toSet ==
      computedBaseline.collect().map(_.toSeq).toSet)
    assert(computed.count() > 0)
  }

  test("rule does not fire on rn=2, mixed directions, global, non-default nulls") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("props"))
    def rn(w: org.apache.spark.sql.expressions.WindowSpec) =
      events.withColumn("rn", row_number().over(w))

    val byUser = Window.partitionBy("user_id")
    assert(hasWindow(rn(byUser.orderBy("event_id")).where(col("rn") === 2)))
    assert(hasWindow(rn(byUser.orderBy(col("event_id").asc, col("user_id").desc))
      .where(col("rn") === 1)))
    assert(hasWindow(rn(Window.orderBy("event_id")).where(col("rn") === 1)),
      "global window (empty partition) must not rewrite")
    assert(hasWindow(rn(byUser.orderBy(col("props").asc_nulls_last)).where(col("rn") === 1)),
      "non-default null placement must not rewrite")
  }

  test("rank()=1 / dense_rank()=1 keep ALL tied-best rows via the self-join rewrite") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    import s.implicits._
    // l_quantity repeats within an order → real tie groups: rank()=1 must
    // keep EVERY minimal-quantity line, which row_number()=1 would not
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_quantity"))
    for (fn <- Seq(rank(), dense_rank())) {
      val rk = li.withColumn("rn", fn.over(w))
      val rewritten = rk.where(col("rn") === 1)
      assert(!hasWindow(rewritten), "rank=1 window must be rewritten away")
      val a = rewritten.collect().map(_.toSeq).toSet
      val b = dodge(rk, 1).collect().map(_.toSeq).toSet
      assert(a == b && a.nonEmpty)
      // some group genuinely ties (else this test proves nothing)
      val perGroup = rewritten.groupBy("l_orderkey").count()
        .agg(max("count")).as[Long].head()
      assert(perGroup > 1, "fixture must contain a tied-best group")
    }
    // desc direction takes the max-key arm
    val wd = Window.partitionBy("l_orderkey").orderBy(col("l_quantity").desc)
    val rkd = li.withColumn("rn", rank().over(wd))
    val rewrittenD = rkd.where(col("rn") === 1)
    assert(!hasWindow(rewrittenD))
    assert(rewrittenD.collect().map(_.toSeq).toSet ==
      dodge(rkd, 1).collect().map(_.toSeq).toSet)
    // rank <= k (k>1) must NOT fire: gap semantics aren't a bounded heap
    val leq = rkd.where(col("rn") <= 2)
    assert(hasWindow(leq), "rank<=k must keep the window")
    // null partition values are ONE window group — the self-join is
    // null-safe, so the null group's tied best survives too
    val withNullGroup = Seq((Some("a"), 1L), (Some("a"), 1L), (Some("a"), 2L),
      (None, 5L), (None, 5L), (None, 7L)).toDF("g", "v")
    val wn = Window.partitionBy("g").orderBy(col("v"))
    val rkn = withNullGroup.withColumn("rn", rank().over(wn))
    val rew = rkn.where(col("rn") === 1)
    assert(!hasWindow(rew))
    assert(rew.collect().map(_.toSeq).toSet ==
      dodge(rkn, 1).collect().map(_.toSeq).toSet)
    assert(rew.where(col("g").isNull).count() == 2,
      "null group keeps both tied-best rows")
  }

  test("rank()=1 with residual conjunct and renaming Project still fires") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    val li = Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_quantity"))
    val rk = li.withColumn("rn", rank().over(w))
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_quantity").as("qty"), col("rn").as("r"))
    val rewritten = rk.where(col("r") === 1 && col("ln") % 2 === 1)
    assert(!hasWindow(rewritten), "rank=1 must fire through rename + residual")
    val baseline = rk.where(col("r") >= 1 && col("r") <= 1 && col("ln") % 2 === 1)
    assert(hasWindow(baseline))
    assert(rewritten.collect().map(_.toSeq).toSet ==
      baseline.collect().map(_.toSeq).toSet)
  }

  test("nullable order keys with default null placement: rewrite matches the window") {
    val s = SparkSpec.session.newSession()
    GraftExtensions.registerAll(s)
    import s.implicits._
    // unique (k, s) per group so both formulations are deterministic;
    // group 3 is a single all-null-key row
    val df = Seq(
      (1L, Some("b"), "r1"), (1L, Some("a"), "r2"), (1L, None: Option[String], "r3"),
      (2L, Some("x"), "r4"), (3L, None: Option[String], "r5")
    ).toDF("k", "s", "v")
    for (ord <- Seq(col("s").desc, col("s").asc)) {
      val w = Window.partitionBy("k").orderBy(ord)
      val rn = df.withColumn("rn", row_number().over(w))
      val rewritten = rn.where(col("rn") === 1)
      assert(hasPickAgg(rewritten), s"rule must fire for $ord")
      assert(rewritten.collect().map(_.toSeq).toSet ==
        dodge(rn, 1).collect().map(_.toSeq).toSet, s"ordering $ord")
    }
    // asc nulls-first top-2: the null row ranks 1 in group 1; desc
    // nulls-last top-2 (reverse heap): the null row ranks LAST
    for (ord <- Seq(col("s").asc, col("s").desc)) {
      val w = Window.partitionBy("k").orderBy(ord)
      val rn = df.withColumn("rn", row_number().over(w))
      val top2 = rn.where(col("rn") <= 2)
      assert(top2.collect().map(_.toSeq).toSet ==
        dodge(rn, 2).collect().map(_.toSeq).toSet, s"top-2 $ord")
    }
    // desc nulls-last: group 1's winner is "b", the null row never ranks 1
    val top = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy(col("s").desc)))
      .where(col("rn") === 1)
      .select("k", "s").as[(Long, Option[String])].collect().toMap
    assert(top(1L).contains("b") && top(3L).isEmpty)
  }
}
