package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-label row classification + 1→N detail extraction.
  *
  * Reference semantics: the indexer assigns each transaction a *set* of class
  * flags (reference `DetailExtractors/TransactionClassifier.cs:338` builds a
  * [Flags] enum from independent predicates, `Unknown` when none match) and
  * then emits 0..N typed detail rows per class
  * (`DetailExtractors/TransactionDetailExtractor.cs:10`).
  *
  * Spark-first re-expression: classification is a single codegen'd projection
  * (`concat_ws` over per-flag CASE expressions — `concat_ws` drops NULLs, so
  * the flag string assembles without an array allocation). Detail extraction
  * is a union of filtered projections. Both are map-only: no shuffle at any
  * scale, and the per-flag predicates are simple enough for parquet
  * filter/column pushdown to survive. At 100 TB this runs at scan speed.
  */
object Classify {

  /** Ordered flag definitions: (flagName, predicate). Mirrors the reference's
    * independent classifier predicates (value checks, type checks, payload
    * checks — cf. `IsEoaEthTransfer`, `IsErc20Transfer`).
    */
  def eventFlags: Seq[(String, Column)] = Seq(
    "HighValue" -> (col("value") > 100.0d),
    "Signup" -> (col("event_type") === "signup"),
    "Purchase" -> (col("event_type") === "purchase"),
    "Error" -> (col("event_type") === "error"),
    "EvenProp" -> (get_json_object(col("props"), "$.k").cast("int") % 2 === 0)
  )

  /** classification = comma-joined matching flags, "Unknown" if none. */
  def classify(events: DataFrame): DataFrame = {
    val flagCols = eventFlags.map { case (name, pred) => when(pred, lit(name)) }
    events
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        coalesce(nullif(concat_ws(",", flagCols: _*), lit("")), lit("Unknown"))
          .as("classification")
      )
      .orderBy("event_id")
  }

  /** Co-occurrence pattern per group: the reference's `IsCrcSignup`
    * (`TransactionClassifier.cs:25`) requires a Signup log AND a self-Trust
    * log AND a mint Transfer log within one transaction's receipt. Re-pressed
    * over `events`: users that have ≥1 signup AND ≥1 purchase AND ≥1 click.
    *
    * Scale: one hash aggregation with conditional counts — partial (map-side)
    * aggregation means the shuffle carries one row per (user, 3 counters),
    * not the raw events. Never collect-and-check per group.
    */
  def coOccurrence(events: DataFrame): DataFrame = {
    val cnt = (t: String) => count(when(col("event_type") === t, 1)).as(s"n_$t")
    events
      .groupBy("user_id")
      .agg(cnt("signup"), cnt("purchase"), cnt("click"))
      .where(col("n_signup") > 0 && col("n_purchase") > 0 && col("n_click") > 0)
      .select("user_id", "n_signup", "n_purchase", "n_click")
      .orderBy("user_id")
  }

  /** 1→N detail extraction: each row emits one detail row per matching class
    * (cf. `Erc20TransferDetailExtractor.cs` yielding one row per transfer
    * log). Union of filtered projections — map-only, each leg prunes to its
    * own columns.
    */
  def extractDetails(events: DataFrame): DataFrame = {
    def leg(t: String, amount: Column): DataFrame =
      events
        .where(col("event_type") === t)
        .select(
          col("event_id"),
          lit(t).as("detail_type"),
          col("user_id").as("subject"),
          amount.as("amount")
        )
    leg("purchase", col("value").cast("double"))
      .unionAll(leg("signup", lit(null).cast("double")))
      .unionAll(leg("error", lit(null).cast("double")))
      .orderBy("event_id", "detail_type")
  }
}
