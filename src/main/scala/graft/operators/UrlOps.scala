package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain operators for corpus curation — the C4-style stage that
  * drops documents sourced from (or pointing at) unwanted hosts. Map-only
  * regex projections over codegen'd natives, like [[Pii]]: the patterns
  * stay in the portable subset so Java regex and RE2 agree.
  */
object UrlOps {

  /** Captures the host of an http(s) URL. Group 1 = domain. */
  val urlRe = "https?://([a-z0-9.-]+)"

  private def domains(t: Column): Column =
    regexp_extract_all(t, lit(urlRe), lit(1))

  /** One row per (doc_id, referenced domain) — the link-graph edge list
    * curation pipelines aggregate for domain-level stats and blocklist
    * mining. Docs without URLs contribute no rows.
    */
  def extractDomains(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents.select(col("doc_id"), explode(domains(col(textCol))).as("domain"))
      .orderBy("doc_id", "domain")

  /** Keep/drop on a domain blocklist with SUFFIX semantics (blocking
    * `ads.example.net` also blocks `a.ads.example.net`) — the reason is
    * the first blocked domain in document order, the audit shape the
    * quality filters use. `get(...)` not `element_at(...)`: out-of-bounds
    * must be null, not an ANSI error.
    */
  def domainFilter(documents: DataFrame, blockSuffixes: Seq[String],
                   textCol: String = "text"): DataFrame = {
    val blocked = filter(domains(col(textCol)), d =>
      blockSuffixes.map(s => d === s || d.endsWith("." + s)).reduce(_ || _))
    documents.select(
      col("doc_id"),
      (size(blocked) === 0).as("keep"),
      coalesce(get(blocked, lit(0)), lit("ok")).as("reason")
    ).orderBy("doc_id")
  }
}
