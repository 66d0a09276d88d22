package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style document cleaning battery (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
  * §2.2 — the published rules behind the C4 corpus), re-expressed as a
  * PURE per-document projection:
  *
  * Line level (a line survives iff ALL hold):
  *   - ends in a terminal punctuation mark (`.`, `!`, `?`, `"`),
  *   - contains at least 5 words (whitespace tokens),
  *   - does not mention "javascript" (the cookie/JS-warning boilerplate rule).
  * Document level (a document survives iff ALL hold):
  *   - at least 3 surviving lines (the paper's ≥3-sentence rule, applied
  *     to the kept-line set),
  *   - no "lorem ipsum" anywhere (placeholder-text rule),
  *   - no curly brace `{` anywhere (code rule),
  *   - no word from the bad-word list anywhere.
  *
  * Scale shape: every rule is arithmetic on the split-lines array of ONE
  * row — `filter`/`aggregate` higher-order functions over the split, plus
  * whole-text `contains` flags. No explode, no shuffle, no state: the
  * battery compiles to scan + project (PlanSpec gates it), which also
  * makes the gate directly servable on a document STREAM like the PII
  * scrub and the Gopher line rules.
  */
object C4 {

  /** The doc-level lexicon gate. The real C4 list is ~400 entries; the
    * mechanism (a lowercase `contains` battery OR-reduced into one flag)
    * is identical at any list size — each entry is one codegen'd
    * `Contains` over the same scanned string.
    */
  val defaultBadWords: Seq[String] = Seq("jackpot", "casino")

  // split on \r?\n: a CRLF corpus would otherwise leave a trailing \r on
  // every line, and Java-regex `$` in lineKept matches just BEFORE a final
  // line terminator while RE2-class engines (the oracle) do not — the
  // cross-engine divergence ADVICE r13 flagged. Stripping the \r at the
  // split makes `$` a true end-of-string anchor on both engines.
  private def nonEmptyLines(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\r?\n"), l => length(l) > 0)

  /** The line-survival predicate, usable inside a lambda. */
  private def lineKept(l: Column): Column =
    l.rlike("[.!?\"]$") &&
      size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= 5 &&
      !lower(l).contains("javascript")

  /** The battery as bare projection columns — the stream-side form.
    * Emits: n_lines, n_kept_lines, kept_chars, has_lorem, has_brace,
    * has_badword, c4_kept.
    */
  def statsCols(text: Column, badWords: Seq[String] = defaultBadWords): Seq[Column] = {
    val ls = nonEmptyLines(text)
    val kept = filter(ls, lineKept _)
    val keptChars = aggregate(kept, lit(0L), (acc, l) => acc + length(l).cast("long"))
    val lt = lower(coalesce(text, lit("")))
    val hasLorem = lt.contains("lorem ipsum")
    val hasBrace = coalesce(text, lit("")).contains("{")
    val hasBad = badWords.map(w => lt.contains(w.toLowerCase))
      .foldLeft(lit(false))(_ || _) // empty lexicon = no doc flagged
    val nKept = size(kept).cast("long")
    Seq(
      size(ls).cast("long").as("n_lines"),
      nKept.as("n_kept_lines"),
      keptChars.as("kept_chars"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      hasBad.as("has_badword"),
      (nKept >= 3 && !hasLorem && !hasBrace && !hasBad).as("c4_kept"))
  }

  /** Per-document C4 report: `doc_id` + [[statsCols]]. */
  def lineStats(docs: DataFrame, id: Column, text: Column,
      badWords: Seq[String] = defaultBadWords): DataFrame =
    docs.select(id.as("doc_id") +: statsCols(text, badWords): _*)
}
