package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction — the standard curation stage every
  * production corpus pipeline (C4/RefinedWeb lineage) runs between the
  * heuristic quality rules (q74) and the learned filter (q242): count
  * and scrub emails, phone numbers, IPv4 addresses, and long digit runs
  * (account/card numbers) before any text reaches training.
  *
  * Everything is a codegen'd `regexp_count`/`regexp_replace` projection
  * — a narrow map over the corpus, embarrassingly parallel at 100 TB,
  * no shuffle, no UDF. Patterns are restricted to constructs with
  * identical semantics in Java regex (Spark) and RE2 (the DuckDB
  * oracle): ASCII classes, bounded counted repeats, `\b` on ASCII.
  *
  * The reference has no text pipeline (engine extension for the
  * pretraining stack); pattern battery follows the public C4 cleanup
  * conventions.
  */
object Pii {

  /** RFC-lite email: local part, @, dotted domain, ≥2-alpha TLD. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone: 3-3-4 digit groups, dash or dot separated. */
  val phonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — no octet range check, per C4). */
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Bare digit run of 9–16 digits: account/card/SSN-shaped tokens. */
  val digitRunPattern = "\\b[0-9]{9,16}\\b"

  /** All four detectors in redaction order: an earlier pattern's
    * replacement token contains no digits/@, so later patterns never
    * match inside it — the chain is order-deterministic.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", emailPattern, "<EMAIL>"),
    ("ipv4", ipv4Pattern, "<IP>"),
    ("phone", phonePattern, "<PHONE>"),
    ("digit_run", digitRunPattern, "<NUM>"))

  /** Match count of one detector against the ORIGINAL text (counts are
    * per-pattern independent; redaction order does not affect them).
    */
  def countOf(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** The scrubbed text: every detector replaced by its type token, in
    * [[patterns]] order.
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (_, p, tok)) =>
      regexp_replace(t, p, tok)
    }
}
