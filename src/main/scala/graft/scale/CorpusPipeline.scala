package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The training-data front door: the standard corpus-curation sequence
  * (the C4/Gopher/CCNet recipe) as ONE composition over the engine's
  * scale operators, so a pipeline user calls `curate` instead of wiring
  * eight queries by hand:
  *
  *   0. language gate     — optional: keep docs a frozen classifier
  *                          places in the target-language set (CCNet's
  *                          FIRST filter — a pure projection)
  *   1. quality gate      — length + stopword-ratio screen (TextOps)
  *   2. repetition gate   — Gopher dup-word / top-gram char-mass cuts
  *   3. exact dedup       — fingerprint groups, keep the canonical
  *   4. near-dup groups   — MinHash-LSH components, keep min-id doc
  *   5. decontamination   — drop docs sharing word n-grams with probes
  *   6. semantic dedup    — optional SemDeDup over the survivors'
  *                          embeddings (cluster-partitioned cosine)
  *
  * Every step is a lazy DataFrame transform — Catalyst plans the whole
  * funnel as one job, and each gate's predicate is a column on the
  * surviving frame so the drop REASON is auditable (`keep_reason`
  * pattern from q74). `report` aggregates the funnel counts; at 100 TB
  * both run as the same shuffles the individual operators cost — no
  * extra passes for the composition.
  */
object CorpusPipeline {

  case class Config(
      minTokens: Long = 10,
      minStopwordRatio: Double = 0.0,
      maxDupWordFrac: Double = 0.9,
      maxTopBigramCharFrac: Double = 1.0,
      shingleN: Int = 3,
      neardupTau: Double = 0.5,
      decontamN: Int = 5,
      semK: Int = 8,
      semIters: Int = 1,
      semTau: Double = 0.30)

  /** Curated corpus: the input frame plus `stage` ("kept" or the first
    * gate that rejected the doc) and `canonical_id`. Docs rejected by an
    * earlier gate are not re-judged by later ones (first reason wins, so
    * funnel counts add up).
    *
    * With `embeddings` supplied (vec_id-keyed, vec_id == doc_id), a
    * final SemDeDup stage runs over the docs that SURVIVED every text
    * gate — the paper's placement: semantic dedup after cleaning, so a
    * heuristically-dead doc can never claim a semantic group's keep
    * slot. Docs without an embedding pass the stage untouched.
    *
    * `langKeep` (text column → boolean keep, e.g.
    * `t => langNb.predict(t).isin("en", "de")`) runs FIRST — CCNet's
    * placement: every later gate's budget is spent only on
    * target-language docs. NULL keep (unidentifiable text) drops.
    */
  def curate(docs: DataFrame, probes: Option[DataFrame], id: Column, text: Column,
             cfg: Config = Config(),
             embeddings: Option[DataFrame] = None,
             langKeep: Option[Column => Column] = None): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val quality = base.select(col("doc_id"),
      TextOps.nTokens(col("text")).as("n_tokens"),
      TextOps.stopwordRatio(col("text")).as("stop_ratio"))
    val rep = TextOps.repetitionStats(base, col("doc_id"), col("text"))
      .select(col("doc_id"), col("dup_word_frac"), col("top_bigram_char_frac"))
    val exact = Dedup.exactGroups(base, col("doc_id"), col("text"))
      .select(col("doc_id"), col("canonical_id"))
    val near = Dedup.neardupGroups(base, col("doc_id"), col("text"),
        cfg.shingleN, cfg.neardupTau)
      .select(col("doc_id"), col("canonical_id").as("near_canonical"))
    val contaminated = probes.map { p =>
      Dedup.contaminationReport(base, p.select(id.as("doc_id"), text.as("text")),
          col("doc_id"), col("text"), cfg.decontamN)
        .select(col("doc_id"), col("contaminated"))
    }.getOrElse(base.select(col("doc_id"), lit(false).as("contaminated")))

    val langOk = langKeep.map(f => coalesce(f(col("text")), lit(false)))
      .getOrElse(lit(true))
    val pre = base
      .join(quality, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .withColumn("pre_stage",
        when(!langOk, "wrong_lang")
          .when(col("n_tokens") < cfg.minTokens, "too_short")
          .when(col("stop_ratio") < cfg.minStopwordRatio, "low_stopword")
          .when(coalesce(col("dup_word_frac"), lit(0.0)) > cfg.maxDupWordFrac,
            "repetitive")
          .when(coalesce(col("top_bigram_char_frac"), lit(0.0)) >
            cfg.maxTopBigramCharFrac, "gram_spam")
          .when(col("canonical_id") =!= col("doc_id"), "exact_dup"))

    // Near-dup canonical = lowest member that SURVIVED the earlier gates,
    // not the group's min id unconditionally: a min-id member that quality
    // gates already rejected must not drag the whole group down with it
    // (every copy of the content would silently vanish — the members die
    // as "near_dup" of a doc that is itself dead). Exact dups need no such
    // re-pointing: identical text ⇒ identical gate metrics ⇒ the group
    // lives or dies together. Group-key aggregation over near-dup members
    // only — O(group members), no new wide shuffle.
    val keptCanon = pre.where(col("pre_stage").isNull)
      .join(near, Seq("doc_id"))
      .groupBy(col("near_canonical"))
      .agg(min(col("doc_id")).as("kept_canonical"))
    val nearKept = near.join(keptCanon, Seq("near_canonical"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_canonical"), col("near_canonical")).as("near_canonical"))

    val textStages = pre
      .join(nearKept, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("stage",
        coalesce(col("pre_stage"),
          when(coalesce(col("near_canonical"), col("doc_id")) =!= col("doc_id"),
            "near_dup")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .otherwise("kept")))

    val staged = embeddings match {
      case None => textStages
      case Some(emb) =>
        // SemDeDup over the text-gate survivors only: the cluster-mate
        // pair space (Σ|c|²) never pays for docs already dead, and a
        // dead lower-id doc cannot shadow the group's surviving copy
        val semIn = textStages.where(col("stage") === "kept")
          .select(col("doc_id").as("vec_id"))
          .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        val sem = Similarity.semDedup(semIn, cfg.semK, cfg.semIters, cfg.semTau)
          .select(col("vec_id").as("doc_id"), col("kept").as("__semkept"))
        textStages.join(sem, Seq("doc_id"), "left")
          .withColumn("stage",
            when(col("stage") === "kept" &&
              !coalesce(col("__semkept"), lit(true)), "semantic_dup")
              .otherwise(col("stage")))
    }
    staged
      .select(col("doc_id"), col("n_tokens"), col("stage"),
        (col("stage") === "kept").as("keep"),
        coalesce(col("near_canonical"), col("canonical_id"), col("doc_id"))
          .as("canonical_id"))
  }

  /** Funnel report: docs and tokens surviving each gate. */
  def report(curated: DataFrame): DataFrame =
    curated.groupBy(col("stage")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).cast("long").as("n_tokens"))
}
