package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each left row, the most recent right row with
  * right.ts <= left.ts within the same key — the canonical "state at time T"
  * lookup (the reference answers these against its indexed history tables,
  * e.g. "trust limit in effect when this transfer happened").
  *
  * Spark-first: NOT a range join (quadratic blowup) and NOT a per-row
  * subquery (driver loop). The union trick: tag both sides, sort within
  * (key) by (ts, side-rank, id) and carry the last-seen right row forward
  * with last_value(ignoreNulls) — one shuffle on the key, one partition-local
  * sort, linear in rows. Right rows sort BEFORE left rows at equal ts, so
  * ties resolve to "<=" semantics, matching DuckDB's ASOF JOIN.
  */
object AsOf {

  /** events flavor: each `purchase` event is joined to the user's most
    * recent prior-or-simultaneous `view` event.
    */
  def purchaseToLastView(events: DataFrame): DataFrame = {
    val tagged = events
      .where(col("event_type").isin("purchase", "view"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"),
        when(col("event_type") === "view", lit(0)).otherwise(lit(1)).as("side_rank"),
        when(col("event_type") === "view", col("event_id")).as("view_id_or_null")
      )
    val w = Window.partitionBy("user_id")
      .orderBy("ts", "side_rank", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_view_id", last("view_id_or_null", ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(
        col("event_id"),
        col("user_id"),
        col("value").cast("double").as("amount"),
        col("last_view_id")
      )
      .orderBy("event_id")
  }
}
