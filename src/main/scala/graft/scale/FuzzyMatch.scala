package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance near-duplicate pairing with prefix blocking: candidate
  * pairs are generated only WITHIN a blocking key (a normalized-text
  * prefix), then scored with Levenshtein on a bounded slice.
  *
  * The blocked self-join is the scale story: a bare pairwise comparison
  * is O(n²); blocking makes it Σ_b |b|² over block sizes — an equi-join
  * Catalyst shuffles on the block key, so work is distributed and
  * bounded by the largest block, with the usual skew remedies (salting,
  * AQE skew split) applicable if one prefix dominates. Recall is bounded
  * by the blocking assumption (edits inside the first `blockLen` chars
  * escape the block — the same trade every blocking scheme makes; the
  * MinHash/LSH family in [[Dedup]] covers prefix-divergent near-dups).
  */
object FuzzyMatch {

  /** Pairs (id_a < id_b) whose normalized texts share a `blockLen`-char
    * prefix and whose first `sliceLen` chars are within `maxDist` edits.
    */
  def pairs(docs: DataFrame, id: Column, text: Column, blockLen: Int = 12,
      sliceLen: Int = 80, maxDist: Int = 8): DataFrame = {
    val nrm = docs.select(id.as("id"), TextOps.normalized(text).as("t"))
      .select(col("id"), col("t"), substring(col("t"), 1, blockLen).as("blk"))
    val a = nrm.select(col("id").as("id_a"), col("t").as("t_a"), col("blk"))
    val b = nrm.select(col("id").as("id_b"), col("t").as("t_b"), col("blk"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(substring(col("t_a"), 1, sliceLen),
          substring(col("t_b"), 1, sliceLen)).cast("long").as("lev"))
      .where(col("lev") <= maxDist)
  }
}
