package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.scale.TextOps
import graft.scoring.Trainer

/** One corpus document on the wire (the curation stream's row shape). */
case class QualityDoc(doc_id: Long, text: String)

/** The q242 hashed-n-gram quality classifier served on the document
  * stream — closing the curation serving loop the way
  * [[StreamingFeatures.nbCalibratedScoredFeatures]] closes the fraud
  * one: the 16-bucket gram featurizer is a pure per-row projection
  * (no explode, no shuffle, no vocabulary state) and the fitted model
  * is 17 literals, so scoring a document stream needs NO state store
  * and no join — a stateless sink-side map at any ingest rate.
  * Batch==stream parity is pinned in StreamingSpec; the batch twin of
  * the served margin is gated end-to-end by q242.
  */
object DocQuality {

  /** Append the learned quality margin (4 dp, the q242 grain) and the
    * keep decision to a document stream. Feature presence is rejected
    * at plan-build time, as for every served model.
    */
  def hashedQualityScoredDocs(docs: Dataset[QualityDoc],
      model: Trainer.LogisticModel, buckets: Int): DataFrame = {
    val f = TextOps.hashedNgramFeatures(docs.toDF(), col("doc_id"),
      col("text"), buckets)
    val missing = model.features.filterNot(f.columns.contains)
    require(missing.isEmpty,
      s"hashedQualityScoredDocs: model features absent from the stream: $missing")
    f.select(col("doc_id"),
        graft.queries.r6(Trainer.margin(model)).as("hq_margin"))
      .withColumn("hq_keep", col("hq_margin") > 0)
  }

  /** The q247 Gopher repetition battery served on the document stream:
    * the one-pass [[graft.functions.GopherStats]] kernel makes the
    * whole battery a stateless narrow projection (see
    * [[graft.scale.TextOps.gopherCols]]), so the stream serves the
    * exact batch columns. Batch==stream parity in StreamingSpec.
    */
  def repetitionFlaggedDocs(docs: Dataset[QualityDoc]): DataFrame =
    docs.toDF().select(col("doc_id") +:
      TextOps.gopherCols(col("text")): _*)

  /** The q253 Gopher duplicate-line rules served on the document
    * stream: the battery is array arithmetic on the split text (set
    * differences under the c−1 repeat convention — see
    * [[graft.scale.TextOps.lineStatsCols]]), so the streaming form IS
    * the batch column set, a stateless narrow projection. Batch==stream
    * parity in StreamingSpec.
    */
  def lineFlaggedDocs(docs: Dataset[QualityDoc]): DataFrame =
    docs.toDF().select(col("doc_id") +:
      TextOps.lineStatsCols(col("text")): _*)

  /** The q263 frozen lang-NB served on the document stream: per-class
    * posterior = logprior + a fold over the trigram array against the
    * class's 64 bucket-weight literals (classes×65 doubles total), so
    * tagging is a stateless narrow projection — NULL for trigram-less
    * docs (the batch scorer's missing-row semantics). Batch==stream
    * parity pinned in StreamingSpec; the batch twin is pinned against
    * `LangId.nbPredictions` in ScaleSpec.
    */
  def langTaggedDocs(docs: Dataset[QualityDoc],
      m: graft.scale.LangId.LangNb): DataFrame =
    docs.toDF().select(col("doc_id"), m.predict(col("text")).as("pred_lang"))

  /** The q267 C4 cleaning battery served on the document stream: every
    * rule is arithmetic on the split-lines array of one row (see
    * [[graft.scale.C4.statsCols]]), so the streaming form IS the batch
    * column set — a stateless narrow projection, no state store, no
    * join. Batch==stream parity in StreamingSpec.
    */
  def c4FlaggedDocs(docs: Dataset[QualityDoc],
      badWords: Seq[String] = graft.scale.C4.defaultBadWords): DataFrame =
    docs.toDF().select(col("doc_id") +:
      graft.scale.C4.statsCols(col("text"), badWords): _*)

  /** The q279 Gopher QUALITY rules (word/length bounds, symbol ratios,
    * bullet/ellipsis line fractions, alphabetic fraction, stop words)
    * served on the document stream: the battery is pure per-row array
    * arithmetic (see [[graft.scale.TextOps.gopherQualityCols]]), so the
    * streaming form IS the batch column set — a stateless narrow
    * projection. Batch==stream parity in StreamingSpec.
    */
  def qualityRuleFlaggedDocs(docs: Dataset[QualityDoc]): DataFrame =
    docs.toDF().select(col("doc_id") +:
      TextOps.gopherQualityCols(col("text")): _*)

  /** The q274 chunker on the document stream: fixed `w`-token windows at
    * `stride`, each fingerprinted — a stateless flatMap (the explode's
    * output IS the chunk table), so an ingest pipeline emits
    * embedding-ready chunks at the wire. Batch==stream parity in
    * StreamingSpec.
    */
  def chunkedDocs(docs: Dataset[QualityDoc], w: Int = 64,
      stride: Int = 48): DataFrame =
    TextOps.chunks(docs.toDF(), col("doc_id"), col("text"), w, stride)

  /** The q245 PII scrub served on the document stream: per-detector
    * counts + the redacted text, as the same stateless codegen regexp
    * projection the batch operator compiles to — an ingest-side scrub
    * that never lands raw PII in the feature store. Batch==stream
    * parity in StreamingSpec.
    */
  def piiScrubbedDocs(docs: Dataset[QualityDoc]): DataFrame = {
    import graft.scale.Pii
    val counts = Pii.patterns.map { case (name, p, _) =>
      Pii.countOf(col("text"), p).as(s"n_${name}s")
    }
    docs.toDF().select(col("doc_id") +: counts :+
        Pii.redact(col("text")).as("redacted_text"): _*)
      .withColumn("has_pii",
        Pii.patterns.map(p => col(s"n_${p._1}s")).reduce(_ + _) > 0)
  }
}
