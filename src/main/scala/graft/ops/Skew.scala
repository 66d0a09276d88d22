package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation (SURVEY §7.4 #6: the reference's generator sends
  * 30% of traffic to 100 customers — at 100 TB a per-customer aggregation
  * puts those keys on single reducers).
  *
  * AQE splits skewed JOIN partitions but not skewed AGGREGATION state.
  * Plain algebraic aggs (sum/count/min/max) are already fine — map-side
  * partial aggregation shrinks them before the shuffle. Salting matters
  * for aggregates whose partial state is LARGE per key (collect_set,
  * exact distinct, percentile buffers): phase 1 aggregates (key, salt)
  * so a hot key's state is built on `buckets` reducers, phase 2 merges
  * the per-salt results.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a row-identity column. */
  def salt(idCol: Column, buckets: Int): Column = pmod(hash(idCol), lit(buckets))

  /** Two-phase salted aggregation: `partial` aggregates per (key, salt),
    * `fin` merges per key. Caller guarantees fin ∘ partial == direct
    * aggregation (true for any commutative monoid).
    */
  def saltedAgg(df: DataFrame, key: Column, idCol: Column, buckets: Int)(
      partial: Seq[Column], fin: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(idCol, buckets))
      .groupBy(key.as("k"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("k"))
      .agg(fin.head, fin.tail: _*)

  /** Skew-resistant exact distinct count per key: spread the dedup by
    * (key, value-hash salt) before counting, so one hot key's distinct
    * set never materializes on a single task.
    */
  def distinctCount(df: DataFrame, key: Column, value: Column, buckets: Int = 64): DataFrame =
    saltedAgg(df.select(key.as("k0"), value.as("v")), col("k0"), col("v"), buckets)(
      Seq(collect_set(col("v")).as("s")),
      Seq(size(array_distinct(flatten(collect_list(col("s"))))).cast("long").as("distinct_cnt")))
}
