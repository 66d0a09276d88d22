package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.scale.{Perplexity, Pii, TextOps}
import graft.scoring.Trainer

/** One sourced corpus document on the wire. */
case class SourcedDoc(doc_id: Long, source: String, text: String)

/** Per-doc stateless curation flags (the same expressions the batch
  * gates compile to: frozen lang-ID keep (q276/CCNet's first filter),
  * q74 heuristic, q247 Gopher repetition battery, q245 PII battery,
  * q242 learned quality, q252 frozen per-source perplexity gate, q260
  * frozen-index near-dup gate, q267 C4 cleaning battery, q296
  * media-payload exact dedup vs a frozen fingerprint index).
  */
case class FlaggedDoc(source: String, ntok: Long, lang: Boolean,
    heuristic: Boolean, gopher: Boolean, pii: Boolean, quality: Boolean,
    perplexity: Boolean, neardup: Boolean, c4: Boolean, mediadup: Boolean)

/** Running per-source curation totals since stream start. */
case class CurationTotals(source: String, n_docs: Long, n_tokens: Long,
    lang_kept: Long, heuristic_kept: Long, gopher_kept: Long, pii_docs: Long,
    quality_kept: Long, perplexity_kept: Long, neardup_docs: Long,
    c4_kept: Long, mediadup_docs: Long,
    survivors: Long, survivor_tokens: Long)

/** Live curation dashboard state — the streaming twin of the q249
  * funnel report: per SOURCE, running totals of docs/token mass and how
  * many pass each stateless gate (target language, heuristic, Gopher
  * repetition, learned quality, frozen perplexity) plus the PII
  * incidence. `survivors` counts lang ∧ heuristic ∧ ¬gopher ∧ quality ∧
  * perplexity ∧ ¬neardup — the full gate battery, live: CCNet's FIRST
  * filter (keep docs the frozen [[graft.scale.LangId.LangNb]] classifies
  * into the target-language set — a pure projection when supplied), the
  * q249 funnel's three stages (the Gopher battery is a pure projection
  * since the one-pass kernel), the q242 learned filter, the perplexity
  * stage served through the batch-fit [[graft.scale.Perplexity.Gate]]
  * (frozen LM kernel + per-source threshold literals, so the
  * corpus-global rank the batch fit needed never runs on the stream),
  * and — when a frozen [[NearDupGate]] index is supplied — the q260
  * near-dup gate (a doc already in yesterday's corpus contributes no
  * new training mass). PII does not drop a doc — the scrub redacts it;
  * its count is the incidence the q246 rollup reports.
  * `survivor_tokens` is the surviving token mass — the number a mixture
  * budgeter (q195) actually consumes.
  *
  * State per source is ONE totals row (11 scalars), so the processor is
  * O(1) per event and state grows with the number of SOURCES — the
  * shape a 100 TB ingest dashboard needs; the flags themselves are pure
  * projections computed before the keyed exchange.
  */
class CurationCounterProcessor
    extends StatefulProcessor[String, FlaggedDoc, CurationTotals] {
  @transient private var st: ValueState[CurationTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CurationTotals]("totals",
      Encoders.product[CurationTotals], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[FlaggedDoc],
      timerValues: TimerValues): Iterator[CurationTotals] = {
    var t = if (st.exists()) st.get()
      else CurationTotals(key, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.foreach { d =>
      def i(b: Boolean) = if (b) 1L else 0L
      // near-dup and media-dup join survival: a doc (or payload) already
      // in the frozen corpus contributes no new training mass; lang
      // joins it as the FIRST gate (CCNet: keep target-language docs
      // before anything else); c4 is the q267 cleaning battery
      val survives = d.lang && d.heuristic && !d.gopher && d.quality &&
        d.perplexity && !d.neardup && d.c4 && !d.mediadup
      t = t.copy(
        n_docs = t.n_docs + 1L,
        n_tokens = t.n_tokens + d.ntok,
        lang_kept = t.lang_kept + i(d.lang),
        heuristic_kept = t.heuristic_kept + i(d.heuristic),
        gopher_kept = t.gopher_kept + i(!d.gopher),
        pii_docs = t.pii_docs + i(d.pii),
        quality_kept = t.quality_kept + i(d.quality),
        perplexity_kept = t.perplexity_kept + i(d.perplexity),
        neardup_docs = t.neardup_docs + i(d.neardup),
        c4_kept = t.c4_kept + i(d.c4),
        mediadup_docs = t.mediadup_docs + i(d.mediadup),
        survivors = t.survivors + i(survives),
        survivor_tokens = t.survivor_tokens + (if (survives) d.ntok else 0L))
    }
    st.update(t)
    Iterator.single(t)
  }
}

object CurationCounters {

  /** The stateless flag projection: target-language keep (frozen
    * [[graft.scale.LangId.LangNb]] prediction ∈ `langGate`'s target
    * set; absent gate = all docs pass), heuristic keep (q74), Gopher
    * repetition flag (q247 kernel battery), PII presence (q245
    * battery), learned-quality keep (q242 margin > 0 at the 4 dp
    * serving grain), frozen perplexity keep (q252 gate). One narrow
    * map — the hashed featurizer carries source/flags through, so no
    * post-featurization join.
    *
    * `c4Gate` adds the q267 C4 cleaning battery (Raffel et al. 2020
    * §2.2) as a keep flag: `(linedText, badWords)` — the text view the
    * line rules read (a production caller passes its text column; a
    * corpus with no natural line structure passes a derived lined
    * view) with the doc-level lexicon. Absent = every doc passes, so
    * prior funnels are unchanged.
    *
    * `mediaGate` adds the q296 media-payload EXACT-dedup flag:
    * `(fpCol, index)` — a per-doc payload-fingerprint expression (the
    * conventional payload is the doc's bytes: `md5(encode(text,
    * 'utf-8'))`) probed against a FROZEN one-column `media_fp` index
    * frame by a stream-static equi-join, the [[NearDupGate]] pattern at
    * byte grain. Absent = no doc flags, so prior funnels are unchanged.
    */
  def flaggedDocs(docs: Dataset[SourcedDoc], model: Trainer.LogisticModel,
      buckets: Int, gate: Perplexity.Gate,
      dupIndex: Option[org.apache.spark.sql.DataFrame] = None,
      dupCfg: NearDupGate.Config = NearDupGate.Config(),
      langGate: Option[(graft.scale.LangId.LangNb, Seq[String])] = None,
      c4Gate: Option[(org.apache.spark.sql.Column, Seq[String])] = None,
      mediaGate: Option[(org.apache.spark.sql.Column, org.apache.spark.sql.DataFrame)] = None): Dataset[FlaggedDoc] = {
    val t = col("text")
    val langKeep = langGate match {
      // NULL prediction (no trigram) is not in the target set — dropped,
      // like any other unidentifiable doc under CCNet's first filter
      case Some((nb, targets)) =>
        coalesce(nb.predict(t).isin(targets: _*), lit(false))
      case None => lit(true)
    }
    val pre0 = docs.toDF()
      .withColumn("__ntok", TextOps.nTokens(t))
      .withColumn("__lang", langKeep)
      .withColumn("__h",
        !(TextOps.nTokens(t) < 20 || TextOps.stopwordRatio(t) < 0.05))
      .withColumn("__pii", Pii.patterns.map { case (_, p, _) =>
        Pii.countOf(t, p) }.reduce(_ + _) > 0)
      .withColumn("__g", TextOps.gopherCols(t).last)
      .withColumn("__lmk", gate.keep(col("source"), t))
      // C4 cleaning battery (q267) over the supplied lined view — a pure
      // projection like the Gopher battery; absent gate = all pass
      .withColumn("__c4", c4Gate match {
        case Some((lined, words)) =>
          graft.scale.C4.statsCols(lined, words).last
        case None => lit(true)
      })
    // near-dup vs the frozen corpus index (q260 gate) — stream-static
    // band joins BEFORE the keyed exchange, like every other flag
    val pre1 = dupIndex match {
      case Some(ix) => NearDupGate.withFlags(pre0, ix, maxHamming = 3, dupCfg)
        .withColumn("__nd", col("is_neardup"))
        .drop("simhash", "n_cands", "min_hamming", "match_id", "is_neardup")
      case None => pre0.withColumn("__nd", lit(false))
    }
    // media-payload exact dedup vs the frozen fingerprint index (q296
    // gate) — one more stream-static equi-join before the keyed exchange
    val pre = mediaGate match {
      case Some((fp, ix)) =>
        pre1.join(ix.select(col("media_fp"), lit(true).as("__md0"))
            .distinct(),
          fp === col("media_fp"), "left")
          .withColumn("__md", coalesce(col("__md0"), lit(false)))
          .drop("media_fp", "__md0")
      case None => pre1.withColumn("__md", lit(false))
    }
    val f = TextOps.hashedNgramFeatures(pre, col("doc_id"), col("text"),
      buckets,
      keep = Seq("source", "__ntok", "__lang", "__h", "__g", "__pii",
        "__lmk", "__c4", "__nd", "__md"))
    val missing = model.features.filterNot(f.columns.contains)
    require(missing.isEmpty,
      s"CurationCounters: model features absent from the stream: $missing")
    implicit val enc: Encoder[FlaggedDoc] = Encoders.product[FlaggedDoc]
    // null text ⇒ zero tokens, no flags (the q74/q245 null semantics)
    f.select(col("source"), coalesce(col("__ntok"), lit(0L)).as("ntok"),
        coalesce(col("__lang"), lit(false)).as("lang"),
        coalesce(col("__h"), lit(false)).as("heuristic"),
        coalesce(col("__g"), lit(false)).as("gopher"),
        coalesce(col("__pii"), lit(false)).as("pii"),
        (graft.queries.r6(Trainer.margin(model)) > 0).as("quality"),
        coalesce(col("__lmk"), lit(false)).as("perplexity"),
        coalesce(col("__nd"), lit(false)).as("neardup"),
        coalesce(col("__c4"), lit(false)).as("c4"),
        coalesce(col("__md"), lit(false)).as("mediadup"))
      .as[FlaggedDoc]
  }

  /** Batch aggregation of [[flaggedDocs]] into the per-source
    * [[CurationTotals]] columns — ONE definition of the totals
    * semantics, shared by the q294 driver-gated battery funnel and the
    * StreamingSpec parity test (which pins the streaming processor's
    * running totals to exactly this frame on the same corpus).
    */
  def batchTotals(flags: Dataset[FlaggedDoc]): org.apache.spark.sql.DataFrame = {
    val sv = col("lang") && col("heuristic") && !col("gopher") &&
      col("quality") && col("perplexity") && !col("neardup") &&
      col("c4") && !col("mediadup")
    flags.toDF().groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("ntok")).as("n_tokens"),
      sum(when(col("lang"), 1L).otherwise(0L)).as("lang_kept"),
      sum(when(col("heuristic"), 1L).otherwise(0L)).as("heuristic_kept"),
      sum(when(!col("gopher"), 1L).otherwise(0L)).as("gopher_kept"),
      sum(when(col("pii"), 1L).otherwise(0L)).as("pii_docs"),
      sum(when(col("quality"), 1L).otherwise(0L)).as("quality_kept"),
      sum(when(col("perplexity"), 1L).otherwise(0L)).as("perplexity_kept"),
      sum(when(col("neardup"), 1L).otherwise(0L)).as("neardup_docs"),
      sum(when(col("c4"), 1L).otherwise(0L)).as("c4_kept"),
      sum(when(col("mediadup"), 1L).otherwise(0L)).as("mediadup_docs"),
      sum(when(sv, 1L).otherwise(0L)).as("survivors"),
      sum(when(sv, col("ntok")).otherwise(0L)).as("survivor_tokens"))
  }

  /** Running totals per source, updated every micro-batch. */
  def totals(docs: Dataset[SourcedDoc], model: Trainer.LogisticModel,
      buckets: Int, gate: Perplexity.Gate,
      dupIndex: Option[org.apache.spark.sql.DataFrame] = None,
      dupCfg: NearDupGate.Config = NearDupGate.Config(),
      langGate: Option[(graft.scale.LangId.LangNb, Seq[String])] = None,
      c4Gate: Option[(org.apache.spark.sql.Column, Seq[String])] = None,
      mediaGate: Option[(org.apache.spark.sql.Column, org.apache.spark.sql.DataFrame)] = None): Dataset[CurationTotals] = {
    implicit val enc: Encoder[CurationTotals] = Encoders.product[CurationTotals]
    flaggedDocs(docs, model, buckets, gate, dupIndex, dupCfg, langGate,
        c4Gate, mediaGate)
      .groupByKey(_.source)(Encoders.STRING)
      .transformWithState(new CurationCounterProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
