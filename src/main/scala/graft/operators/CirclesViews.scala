package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.operators.StateOps.dsum

/** The reference's derived-view layer (Indexer_ER_diagram.png bottom row):
  * the cache tables Postgres materializes over the indexed event tables.
  * Each is a declarative plan over detail frames — incremental-friendly
  * (all are partial-aggregable or latest-per-key shapes), so the 100 TB
  * version maintains them with the same code under foreachBatch.
  *
  * Input frames use the extractor schemas from [[ReceiptClassifier]]:
  *  - transfers: (hash, token, from, to, value) — value as long here
  *    (chain-scale uint256 stays decimal(38,0) in production; same plans).
  *  - trusts: (hash, user, can_send_to, limit) with a monotonic order col.
  *  - signups: (hash, user, token); orgSignups: (hash, organisation).
  */
object CirclesViews {

  /** cache_crc_current_trust: latest limit per edge + change history count
    * + last change marker. One max_by/count aggregation — no window sort.
    */
  def currentTrust(trusts: DataFrame, orderCol: String = "hash"): DataFrame =
    trusts
      .groupBy("user", "can_send_to")
      .agg(
        max_by(col("limit"), col(orderCol)).as("limit"),
        count(lit(1)).as("history_count"),
        max(col(orderCol)).as("last_change")
      )
      .orderBy("user", "can_send_to")

  /** cache_crc_balances_by_safe_and_token: Σ in − Σ out per (address,
    * token) + last movement marker. Two conditional passes would scan
    * twice; instead transfers are exploded once into ±delta rows (map-only)
    * and aggregated in one shuffle on (address, token).
    */
  def balancesBySafeAndToken(transfers: DataFrame): DataFrame = {
    val deltas = transfers.select(
      explode(array(
        struct(col("to").as("safe_address"), col("token"), col("value").as("delta"), col("hash")),
        struct(col("from").as("safe_address"), col("token"), (-col("value")).as("delta"), col("hash"))
      )).as("m")
    ).select("m.*")
    deltas
      .groupBy("safe_address", "token")
      .agg(
        dsum(col("delta")).cast("double").as("balance"),
        max("hash").as("last_change_at")
      )
      .orderBy("safe_address", "token")
  }

  /** cache_all_addresses: the distinct (type, address) registry across all
    * event kinds — union of narrow projections, one distinct shuffle.
    */
  def allAddresses(transfers: DataFrame, trusts: DataFrame,
                   signups: DataFrame, orgSignups: DataFrame): DataFrame = {
    def leg(df: DataFrame, typ: String, c: String) =
      df.select(lit(typ).as("type"), col(c).as("address"))
    leg(transfers, "transfer_from", "from")
      .unionAll(leg(transfers, "transfer_to", "to"))
      .unionAll(leg(trusts, "trust_user", "user"))
      .unionAll(leg(trusts, "trust_can_send_to", "can_send_to"))
      .unionAll(leg(signups, "signup_user", "user"))
      .unionAll(leg(orgSignups, "organisation", "organisation"))
      .distinct()
      .orderBy("type", "address")
  }

  /** crc_all_signups: person + organisation signups unified. */
  def allSignups(signups: DataFrame, orgSignups: DataFrame): DataFrame =
    signups.select(col("hash"), col("user"), col("token"))
      .unionAll(orgSignups.select(col("hash"), col("organisation").as("user"),
        lit(null).cast("string").as("token")))
      .orderBy("hash")

  /** crc_capacity_graph: how much of `token` its holder can send to
    * `can_send_to` — balance joined with the receiver's current trust in
    * the token's owner, capacity = balance · limit / 100 (the hub's
    * percentage semantics). Balance side is large (addresses × tokens),
    * trust side is the edge list — shuffle-joined on the token owner; at
    * 100 TB both sides pre-bucket by address (sources.BucketedStore).
    */
  def capacityGraph(balances: DataFrame, trust: DataFrame, signups: DataFrame): DataFrame = {
    val owners = signups.select(col("token"), col("user").as("token_owner"))
    balances
      .where(col("balance") > 0)
      .join(owners, "token")
      .join(
        trust.select(col("user").as("token_owner"), col("can_send_to"), col("limit")),
        Seq("token_owner"))
      .select(
        col("safe_address").as("token_holder"),
        col("token"),
        col("token_owner"),
        col("balance"),
        col("can_send_to"),
        (col("balance") * col("limit").cast("double") / lit(100.0d)).as("capacity"))
      .where(col("capacity") > 0)
      .orderBy("token_holder", "token", "can_send_to")
  }
}
