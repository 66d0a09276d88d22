package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval: Okapi BM25 (Robertson/Walker, TREC-3) over
  * the whitespace-token convention the rest of the text stack uses
  * (`regexp_extract_all(lower(text), '\S+')` — the q50 TF-IDF twin).
  *
  * Scale shape — the classic inverted-index dataflow as joins:
  *   - `tf` (doc, term, tfc) and `dl` (doc, len) are doc-keyed
  *     aggregations of ONE tokenization pass;
  *   - `df` (term, df) is a term-keyed aggregation of `tf`;
  *   - corpus stats (N, avgdl) are a 1-row broadcast;
  *   - the query term set is the EVAL set (a handful of queries), so the
  *     postings probe is a broadcast hash join on `term` — each query
  *     term touches exactly its posting list (df(t) rows), never the
  *     corpus;
  *   - per-(query, doc) scores are one partial-aggregable `sum`.
  *
  * Ranking is done by the CALLER on the ROUNDED score (4 dp, the engine
  * quantum) with a doc-id tie-break: the score is a float sum whose
  * 1-ulp summation-order noise must not decide ranks, or no oracle could
  * reproduce them.
  */
object Retrieval {

  /** Okapi BM25 scored (query_id, doc_id, bm25) pairs for every corpus
    * document sharing at least one term with a query document. Queries
    * are the docs matching `isQuery` (their DISTINCT terms form the
    * query); a query never scores itself.
    *
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene non-negative
    * variant); tf part = tfc·(k1+1) / (tfc + k1·(1 − b + b·len/avgdl)).
    */
  def bm25Pairs(docs: DataFrame, id: Column, text: Column, isQuery: Column,
      k1: Double = 1.2, b: Double = 0.75,
      materializeIndex: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("t"), isQuery.as("is_q"))
    val toks = base.select(col("doc_id"), col("is_q"),
      explode(regexp_extract_all(lower(col("t")), lit("\\S+"), lit(0))).as("term"))
    // tokenize ONCE: the (doc, term, tfc) index is what df/dl/stats/the
    // query term sets all derive from, and four lazy subtrees would each
    // re-run the corpus explode. Materializing it is not a test crutch —
    // it IS the inverted-index build a production retrieval system
    // persists to storage; swap `materializeIndex` for a parquet
    // write/read at real scale.
    val tf = materializeIndex(toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tfc"), first(col("is_q")).as("is_q")))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tfc")).as("len"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"))
    val qterms = tf.where(col("is_q"))
      .select(col("doc_id").as("query_id"), col("term"))
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfPart = (col("tfc") * lit(k1 + 1.0)) /
      (col("tfc") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / col("avgdl"))))
    // probe FIRST: only postings of query terms flow into the dl/df
    // joins (at corpus scale the candidate set is what the query
    // touches, not the index); df restricted to query terms is
    // eval-set-sized and broadcasts, so the only candidate shuffle
    // left is the doc-keyed length join + the final (query, doc) agg
    val cand = tf.join(broadcast(qterms), Seq("term"))
      .where(col("doc_id") =!= col("query_id"))
    val dfq = df.join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
    cand.join(broadcast(dfq), Seq("term"))
      .join(dl, "doc_id").crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(idf * tfPart).as("bm25"))
  }
}
