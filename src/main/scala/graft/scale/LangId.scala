package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised language identification — the learned upgrade of the
  * q30 marker heuristic (reference: `utils/text_utils` lang guess):
  * a hashed character-trigram naive Bayes classifier, the fastText-era
  * baseline shape (cf. Joulin et al. 2016) with the engine's
  * vocabulary-free md5 bucketing so the model is `classes × buckets`
  * integers — broadcastable at any corpus size, SQL-replayable exactly.
  *
  * Scale shape: ONE corpus aggregation builds the count model, the test
  * side joins two broadcast model tables (counts + per-class totals/
  * priors) and reduces (doc, class)-keyed; the argmax is a per-doc
  * window over `classes` rows on the 4 dp-rounded score (raw doubles
  * would leave near-ties to summation order).
  */
object LangId {

  /** The normalized trigram array (q131 normalization; empty for <3
    * normalized chars). The normalized string is bound ONCE through a
    * 1-element-array lambda — referencing it directly from the inner
    * `transform` would re-run the regex normalization per ELEMENT,
    * turning a 500-char doc into 500 regex passes (measured: 29 s vs
    * 2 s at sf0.1 for q263).
    */
  private def triArray(text: Column): Column =
    flatten(transform(
      array(lower(regexp_replace(text, "\\s+", " "))),
      t => when(length(t) >= 3,
        transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))))

  /** Per-test-doc predictions (doc_id, lang, pred) — the batch scorer
    * the confusion matrix and the frozen serving path both pin to.
    */
  def nbPredictions(docs: DataFrame, id: Column, text: Column, label: Column,
                    train: Column, buckets: Int = 64): DataFrame =
    nbScored(docs, id, text, label, train, buckets, allDocs = false)

  /** Predictions over EVERY doc (train slice included) with the
    * train-slice-fitted model — the funnel/serving form: a curation
    * pipeline gates the WHOLE corpus, not just the hold-out. Same
    * model, same rounded argmax, same tie rule as [[nbPredictions]].
    */
  def nbPredictionsAll(docs: DataFrame, id: Column, text: Column, label: Column,
                       train: Column, buckets: Int = 64): DataFrame =
    nbScored(docs, id, text, label, train, buckets, allDocs = true)

  private def nbScored(docs: DataFrame, id: Column, text: Column, label: Column,
                       train: Column, buckets: Int, allDocs: Boolean): DataFrame = {
    val base = docs.select(id.as("doc_id"), label.as("lang"), train.as("tr"),
      triArray(text).as("ta"))
    val tris = base
      .select(col("doc_id"), col("lang"), col("tr"), explode(col("ta")).as("tri"))
      .select(col("doc_id"), col("lang"), col("tr"),
        Splits.bucket(col("tri"), "lidb", buckets).as("b"))
    val cnt = tris.where(col("tr")).groupBy(col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("tc"))
    val pri = base.where(col("tr")).groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val nn = pri.agg(sum(col("n")).as("nn"))
    val model = tot.join(pri, "lang").crossJoin(broadcast(nn))
      .select(col("lang").as("cand"), col("tc"),
        log(col("n").cast("double") / col("nn")).as("logprior"))
    val scored = (if (allDocs) tris else tris.where(!col("tr")))
      .crossJoin(broadcast(model))
      .join(broadcast(cnt.select(col("lang").as("cand"), col("b"), col("c"))),
        Seq("cand", "b"), "left")
      .groupBy(col("doc_id"), col("lang"), col("cand"), col("logprior"))
      .agg(sum(log((coalesce(col("c"), lit(0L)) + lit(1)).cast("double") /
        (col("tc") + lit(buckets)))).as("ll"))
      .select(col("doc_id"), col("lang"), col("cand"),
        graft.queries.r6(col("logprior") + col("ll")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("pred"))
  }

  /** Confusion matrix (true lang, predicted, n_docs) over the test
    * slice. Test docs shorter than 3 normalized chars carry no trigram
    * and are absent (the q131 convention).
    */
  def nbConfusion(docs: DataFrame, id: Column, text: Column, label: Column,
                  train: Column, buckets: Int = 64): DataFrame =
    nbPredictions(docs, id, text, label, train, buckets)
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))

  /** A FROZEN lang-NB: per class its log prior and the B smoothed
    * bucket log-likelihoods — `classes × (B+1)` doubles, the
    * broadcast-anywhere serving form. `wOf(b)` covers EVERY bucket
    * (missing train count → the add-one default), so serving an unseen
    * trigram is exact: its md5 bucket is computed at serve time and the
    * bucket weight already encodes the smoothing.
    */
  final case class LangNb(buckets: Int, classes: Seq[LangNb.Cls]) {
    require(classes.nonEmpty, "LangNb: no classes")

    private def scoreOfArr(cls: LangNb.Cls, ta: Column): Column =
      graft.queries.r6(aggregate(ta, lit(cls.logprior),
        (acc, tri) => acc + element_at(typedLit(cls.w),
          Splits.bucket(tri, "lidb", buckets).cast("int") + 1)))

    /** Per-class 4 dp posterior of `text` (same arithmetic as the batch
      * scorer: logprior + Σ_trigram ln-weight of its bucket).
      */
    def scoreOf(cls: LangNb.Cls, text: Column): Column =
      scoreOfArr(cls, triArray(text))

    private def bestOf(text: Column, labelOf: Int => Column): Column = {
      val ordered = classes.sortBy(_.lang)
      val perRow = transform(array(triArray(text)), ta => {
        val best = ordered.zipWithIndex.tail.foldLeft(
          struct(scoreOfArr(ordered.head, ta).as("s"), labelOf(0).as("l"))) {
          case (acc, (c, i)) =>
            val sc = scoreOfArr(c, ta)
            when(sc > acc.getField("s"), struct(sc.as("s"), labelOf(i).as("l")))
              .otherwise(acc)
        }
        when(size(ta) > 0, best.getField("l"))
      })
      element_at(perRow, 1)
    }

    /** Predicted language as a pure projection (NULL when the text has
      * no trigram — the batch scorer's missing-row semantics). Ties on
      * the rounded posterior go to the lexicographically smallest
      * class, matching the batch rank's (score DESC, cand ASC). The
      * trigram array is computed ONCE per row (bound through a
      * 1-element-array lambda), not once per class.
      */
    def predict(text: Column): Column = {
      val ordered = classes.sortBy(_.lang)
      bestOf(text, i => lit(ordered(i).lang))
    }

    /** [[predict]] as the class's INDEX in the lex-sorted class list,
      * DoubleType — the `ServedModel` score contract (the argmax index
      * is the classifier's native decision value; NULL for trigram-less
      * docs as in [[predict]]).
      */
    def predictIndex(text: Column): Column =
      bestOf(text, i => lit(i.toDouble))
  }

  object LangNb {
    final case class Cls(lang: String, logprior: Double, w: Seq[Double])
  }

  /** Fit the frozen form: ONE corpus aggregation down to classes×B
    * counts, collected bounded (`maxClasses`, the NB-cardinality-guard
    * pattern) into the literal serving tables.
    */
  def fit(docs: DataFrame, id: Column, text: Column, label: Column,
          train: Column, buckets: Int = 64, maxClasses: Int = 1000): LangNb = {
    val base = docs.where(train).select(label.as("lang"), triArray(text).as("ta"))
    val cnt = base.select(col("lang"), explode(col("ta")).as("tri"))
      .select(col("lang"), Splits.bucket(col("tri"), "lidb", buckets).as("b"))
      .groupBy(col("lang"), col("b")).agg(count(lit(1)).as("c"))
      .limit(maxClasses * buckets + 1).collect()
    require(cnt.length <= maxClasses * buckets,
      s"LangId.fit: more than $maxClasses classes; refusing the driver collect")
    val pri = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .limit(maxClasses + 1).collect()
    require(pri.length <= maxClasses,
      s"LangId.fit: more than $maxClasses classes; refusing the driver collect")
    val nn = pri.iterator.map(_.getLong(1)).sum.toDouble
    val byCls = cnt.groupBy(_.getString(0))
    val classes = pri.toSeq.sortBy(_.getString(0)).map { p =>
      val lang = p.getString(0)
      val bs = byCls.getOrElse(lang, Array.empty)
        .map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
      val tc = bs.valuesIterator.sum
      val w = (0 until buckets).map(b =>
        math.log((bs.getOrElse(b, 0L) + 1).toDouble / (tc + buckets)))
      LangNb.Cls(lang, math.log(p.getLong(1).toDouble / nn), w)
    }
    LangNb(buckets, classes)
  }
}
