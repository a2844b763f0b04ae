package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines — the scrub
  * stage that runs between quality filtering and tokenization. Reference
  * semantics: regex families for emails, NANP-style phone numbers, and
  * IPv4 addresses (the canonical scrub set; real deployments add locale
  * packs the same way — one pattern, one placeholder).
  *
  * Everything is a map-only projection over codegen'd native regex
  * functions (`regexp_extract_all` / `regexp_replace`): runs at scan
  * speed at any scale, column pruning reduces the read to (doc_id, text),
  * and a `has_pii` filter pushes to the parquet scan. The patterns stay in
  * the portable regex subset (character classes, bounded repetition) so
  * Java regex (Spark) and RE2 (the DuckDB oracle) agree byte-for-byte.
  */
object Pii {

  /** (pattern, placeholder) in REDACTION ORDER — fixed, because redaction
    * output depends on application order and the oracle must apply the
    * same sequence. Phones before IPs would not matter here (dashes vs
    * dots can't overlap) but the order is part of the contract anyway.
    */
  val patterns: Seq[(String, String)] = Seq(
    ("[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>"),
    ("\\+1-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>")
  )

  private def countOf(t: Column, re: String): Column =
    size(regexp_extract_all(t, lit(re), lit(0))).cast("long")

  /** Per-document PII inventory: match counts per family plus the boolean
    * a downstream drop/route filter cuts on. The audit shape privacy
    * dashboards consume (counts, not spans — spans would re-emit the PII).
    */
  def scan(documents: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    documents.select(
      col("doc_id"),
      countOf(t, patterns(0)._1).as("n_emails"),
      countOf(t, patterns(1)._1).as("n_phones"),
      countOf(t, patterns(2)._1).as("n_ips"),
      (countOf(t, patterns(0)._1) + countOf(t, patterns(1)._1) +
        countOf(t, patterns(2)._1) > 0).as("has_pii")
    ).orderBy("doc_id")
  }

  /** Redacted text: every match replaced by its family placeholder, in
    * [[patterns]] order. Emitting the full redacted string (not a hash)
    * keeps the oracle comparison maximally strict.
    */
  def redact(documents: DataFrame, textCol: String = "text"): DataFrame = {
    val redacted = patterns.foldLeft(col(textCol)) { case (acc, (re, ph)) =>
      regexp_replace(acc, re, ph)
    }
    documents.select(col("doc_id"), redacted.as("redacted")).orderBy("doc_id")
  }
}
