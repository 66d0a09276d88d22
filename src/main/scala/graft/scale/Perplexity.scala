package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.{TrigramLm, TrigramLmScore}

/** The perplexity filter's SERVING path — the reference corpus runs it
  * batch-only (q248: corpus-trigram LM + per-source top-70% rank), but
  * a live ingest funnel needs the same gate as a stateless per-row
  * projection. Freeze the two corpus-global artifacts at batch-fit
  * time:
  *
  *   1. the trigram LM itself — the count table is character-trigram-
  *      vocabulary-sized (alphabet³ bound, never corpus-sized), so it
  *      collects into a [[graft.functions.TrigramLm]] open-addressing
  *      map and rides the scoring plan as one codegen reference object;
  *   2. the per-source keep THRESHOLD — the LM score of the last doc
  *      the batch rank keeps (fit with the partitioned two-pass
  *      GlobalOrder rank, never a single-task source window), collected
  *      as one row per source.
  *
  * Serving keeps a doc when its 4 dp frozen-LM score is >= its source's
  * threshold — the deployed-filter semantics (a tie at the boundary
  * admits; the batch RANK breaks such ties by doc_id, so the two agree
  * exactly whenever no tie straddles the cut). A source unseen at fit
  * time has no threshold and is NOT kept — the conservative default for
  * a quality gate. Same shape as every other frozen model in the
  * engine: fit batch-side, serve as literals + an O(1)-lookup kernel.
  */
object Perplexity {

  /** A fitted gate: the frozen LM, one threshold per source (at the
    * 4 dp serving grain), and the keep fraction it was fit at.
    */
  final case class Gate(lm: TrigramLm, thresholds: Map[String, Double],
      keepFrac: Double) {

    /** The 4 dp frozen-LM score of `text` — bit-compatible with the
      * batch `r6(trigramLmScore(...))` column on the frozen corpus.
      */
    def lmScore(text: Column): Column =
      graft.queries.r6(Perplexity.lmScore(lm, text))

    /** The source's fitted threshold as a literal CASE chain (sources
      * are few at any corpus scale); NULL for a source unseen at fit.
      */
    def threshold(source: Column): Column =
      thresholds.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
        case (acc, (s, t)) => when(source === s, lit(t)).otherwise(acc)
      }

    /** Stateless keep decision: 4 dp score >= the source's threshold.
      * Pure projection.
      */
    def keep(source: Column, text: Column): Column = {
      val th = threshold(source)
      val s4 = lmScore(text)
      s4.isNotNull && th.isNotNull && s4 >= th
    }
  }

  /** Raw (unrounded) frozen-LM score column. */
  def lmScore(lm: TrigramLm, text: Column): Column =
    ColumnBridge.column(TrigramLmScore(ColumnBridge.expression(text), lm))

  /** Freeze the corpus trigram LM: the q248 count aggregation collected
    * into the serving map. `maxEntries` caps the collect IN the query
    * (the Models.scala NB-cardinality pattern) so a pathological corpus
    * fails loudly instead of materializing an unbounded driver table.
    */
  def fitLm(docs: DataFrame, text: Column,
      maxEntries: Int = 1 << 21): TrigramLm = {
    val tris = docs
      .select(lower(regexp_replace(text, "\\s+", " ")).as("t"))
      .select(explode(when(length(col("t")) >= 3,
          expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
        .otherwise(array().cast("array<string>"))).as("tri"))
    val counts = tris.groupBy(col("tri")).agg(count(lit(1)).as("c"))
      .limit(maxEntries + 1).collect()
    require(counts.length <= maxEntries,
      s"Perplexity.fitLm: more than $maxEntries distinct trigrams — not a " +
        "character-trigram table; refusing the driver collect")
    val total = counts.iterator.map(_.getLong(1)).sum
    TrigramLm.fromCounts(
      counts.toSeq.map(r => r.getString(0) -> r.getLong(1)), total)
  }

  /** Fit the full gate on a (doc_id, source, text) corpus: freeze the
    * LM, rank docs per source by the 4 dp frozen score (GlobalOrder —
    * the scale-safe per-source rank), keep the top `keepFrac`, and
    * record each source's minimum kept score as its threshold.
    * `maxSources` caps the per-source collect in-query.
    */
  def fitGate(docs: DataFrame, keepFrac: Double = 0.7,
      maxSources: Int = 10000): Gate = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"Perplexity.fitGate: keepFrac must be in (0, 1], got $keepFrac")
    val lm = fitLm(docs, col("text"))
    val scored = docs.select(col("doc_id"), col("source"),
        graft.queries.r6(lmScore(lm, col("text"))).as("lm"))
      .localCheckpoint() // scored once: rank probe + local + totals + nsrc
    val ranked = graft.ops.GlobalOrder.withRowNumberBy(scored, Seq("source"),
        Seq(col("lm").desc_nulls_last, col("doc_id")), "rk")
      .join(broadcast(scored.groupBy(col("source"))
        .agg(count(lit(1)).as("nsrc"))), Seq("source"))
    val ths = ranked
      .where(col("lm").isNotNull && col("rk") <= ceil(col("nsrc") * keepFrac))
      .groupBy(col("source")).agg(min(col("lm")).as("th"))
      .limit(maxSources + 1).collect()
    require(ths.length <= maxSources,
      s"Perplexity.fitGate: more than $maxSources sources; refusing the " +
        "driver collect")
    Gate(lm, ths.map(r => r.getString(0) -> r.getDouble(1)).toMap, keepFrac)
  }
}
