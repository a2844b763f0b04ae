package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      // Tables.events' TIMESTAMP_NTZ branch depends on the UTC pin — every
      // entry point must set it or day columns shift on non-UTC hosts
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)

    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      val windows = plan.linesIterator.count(l => l.trim.startsWith("Window"))
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"[audit] $name: exchanges=$exchanges windows=$windows wscg=$wsc")
    }
    audit("para_dedup", Dedup.paragraphDedup(docs))
    audit("tfidf", TextMetrics.tfidfTopTerms(docs))
    val bloom = Dedup.buildContaminationBloom(docs.where(col("doc_id") % 10 === 0))
    audit("bloom_gate", Dedup.bloomGate(docs, bloom))
    val ev = Tables.events(spark, sf).withColumn("day", col("ts").cast("date"))
    audit("sketch_serve", Analytics.distinctFromSketches(
      Analytics.hllSketchTable(ev, "user_id", Seq("event_type", "day")), Seq("event_type")))
    // round-5b additions
    audit("substring_dedup", Dedup.substringDedup(docs))
    audit("stratified_split", graft.operators.Sampling.stratifiedSplit(docs, "doc_id", 100, 100))
    audit("quantile_sketch_serve", Analytics.quantilesFromSketches(
      Analytics.quantileSketchTable(docs, "doc_id", "n_chars", Seq("source", "lang")),
      Seq("source")))
    audit("q7_nation_volume", TpchShapes.nationVolume(spark, sf))
    audit("q13_order_dist", TpchShapes.orderCountDistribution(spark, sf))
    audit("q18_large_orders", TpchShapes.largeOrders(spark, sf))
    audit("q21_late_sole_supplier", TpchShapes.soleLateSupplier(spark, sf))
    // round-7 additions: the seen-hash gate (hash partial-agg + one keyed
    // anti-join), the shard layout (map-only + one shard-keyed shuffle at
    // write time), and the inline _2 capacity delta
    audit("seen_gate", graft.streaming.ViewMaintenance.newDocsAgainstSeen(
      docs, docs.limit(10).select(xxhash64(col("text")).as("h"))))
    audit("shard_assign", Packing.shardAssign(docs.select("doc_id"), "doc_id", 64))
    // round-7d additions: the ordered-scan family (expect 2 exchanges: the
    // bucket-totals partial agg + the per-bucket window shuffle), the gram
    // family (long-keyed df agg + joinback), trending (one partial agg +
    // one type-keyed window), assortativity (degree aggs + joinbacks into
    // ONE moment pass)
    val wealth = ev.groupBy(col("user_id").as("id"))
      .agg(StateOps.dsum(col("value")).cast("double").as("wealth"))
    audit("gini", Economics.gini(wealth, "wealth", "id"))
    audit("budget_select", Sampling.budgetSelect(docs, 1000L))
    audit("novelty", TextMetrics.noveltyScore(docs))
    audit("source_overlap", TextMetrics.sourceNgramOverlap(docs))
    audit("trending", Behavior.trendingEvents(Tables.events(spark, sf)))
    audit("assortativity", Graph.degreeAssortativity(
      ev.select(col("user_id").as("src"), ((col("user_id") * 7 + 13) % 150).as("dst"))))
    // round-7e additions: entropy must be map-only up to its orderBy
    // (expect 1 exchange: the range partition for the sort), containment
    // = gram df agg + pair join + size joinbacks, basket = ONE basket
    // shuffle + map-only pair explode + item joinbacks, TWAB = opening
    // partial agg + one per-user window, CUSUM = per-day partial agg +
    // per-type fold, active users = distinct + min + joinback + rollup,
    // HITS = per-half-iteration join/agg/joinback chain
    audit("entropy", TextMetrics.entropy(docs))
    audit("containment", Dedup.containmentPairs(docs))
    audit("basket_affinity", Analytics.basketAffinity(
      ev.select((col("event_id") % 1000L).as("bk"),
        (col("user_id") % 50L).as("item")), "bk", "item"))
    audit("twab", StateOps.timeWeightedBalance(Tables.events(spark, sf)))
    audit("cusum", Behavior.cusumChangepoints(Tables.events(spark, sf)))
    audit("active_users", Behavior.activeUsers(Tables.events(spark, sf)))
    audit("hits", Graph.hits(ev.select(col("user_id").as("src"),
      ((col("user_id") * 7 + 13) % 150).as("dst"), lit(1L).as("cap")), iters = 2))
    // print the interesting one in full
    println("==== tfidf formatted ====")
    TextMetrics.tfidfTopTerms(docs).explain("formatted")
    println("==== para_dedup formatted ====")
    Dedup.paragraphDedup(docs).explain("formatted")
    spark.stop()
  }
}
