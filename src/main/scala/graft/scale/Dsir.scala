package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much its hashed
  * n-gram distribution looks like a TARGET slice (the quality corpus a
  * pretraining run wants more of) versus the raw pool, then keep the
  * top-scoring fraction. The two bag-of-buckets models are add-one-
  * smoothed multinomials over `B` md5 buckets, so a document's log
  * importance weight is an exact per-token table lookup:
  *
  *   w(doc) = Σ_tok [ ln((ct[b]+1)/(Tt+B)) − ln((cr[b]+1)/(Tr+B)) ],
  *   b = md5-bucket(tok)
  *
  * Scale shape: one token explode + ONE corpus aggregation down to `B`
  * model rows; the per-doc score re-joins the exploded tokens against
  * the broadcast B-row weight table and reduces doc-keyed. Nothing is
  * ever all-pairs, and the model (like the paper's) is byte-sized
  * regardless of corpus size.
  */
object Dsir {

  /** Per-doc importance weight against the `target` flag's slice.
    * Returns (doc_id, n_toks, dsir_w) for docs with ≥1 token — callers
    * re-join to the corpus and default empty docs to weight 0.
    */
  def weights(docs: DataFrame, id: Column, text: Column, target: Column,
              buckets: Int = 64): DataFrame = {
    val tb = docs.select(id.as("doc_id"), target.as("tgt"),
        explode(regexp_extract_all(lower(text), lit("\\S+"), lit(0))).as("tok"))
      .select(col("doc_id"), col("tgt"),
        Splits.bucket(col("tok"), "dsir", buckets).as("b"))
    val stats = tb.groupBy(col("b")).agg(count(lit(1)).as("cr"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val tot = stats.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    // ≤B rows after the crossJoin — the broadcast importance-weight table
    val w = stats.crossJoin(broadcast(tot)).select(col("b"),
      (log((col("ct") + lit(1)).cast("double") / (col("tt") + lit(buckets))) -
        log((col("cr") + lit(1)).cast("double") / (col("tr") + lit(buckets)))).as("w"))
    tb.join(broadcast(w), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("dsir_w"))
  }
}
