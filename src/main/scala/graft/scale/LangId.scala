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

  /** Confusion matrix (true lang, predicted, n_docs) over the test
    * slice. Test docs shorter than 3 normalized chars carry no trigram
    * and are absent (the q131 convention).
    */
  def nbConfusion(docs: DataFrame, id: Column, text: Column, label: Column,
                  train: Column, buckets: Int = 64): DataFrame = {
    val base = docs.select(id.as("doc_id"), label.as("lang"), train.as("tr"),
      lower(regexp_replace(text, "\\s+", " ")).as("t"))
    val tris = base.select(col("doc_id"), col("lang"), col("tr"),
        explode(when(length(col("t")) >= 3,
            expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
          .otherwise(array().cast("array<string>"))).as("tri"))
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
    val scored = tris.where(!col("tr"))
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
      .groupBy(col("lang"), col("cand").as("pred"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
