package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-entity behavioral profile vs. the population (SURVEY A26–A30;
  * reference `feature_engineering/advanced_features.py:237-313`).
  *
  * Population statistics are a 1-row aggregate broadcast against the
  * per-entity aggregates (J4), so the whole family is two scans + one
  * broadcast join — no shuffle of the big side beyond the entity groupBy.
  * The percentile (A27) is scipy `percentileofscore(kind='rank')`:
  * `(#strictly-below + #at-or-below) / (2n)` of the entity mean within
  * ALL amounts — computed with a broadcast range-condition join of the
  * (small) per-entity means against the event table; at 100 TB the same
  * API swaps in a t-digest sketch.
  */
object Behavioral {

  /** zscore, percentile, cv, skewness, kurtosis, merchant diversity per key. */
  def profile(df: DataFrame, key: Column, amount: Column, merchant: Column): DataFrame = {
    val z = lit(0.0)
    def nz(c: Column): Column = coalesce(nanvl(c, z), z)

    val per = df.groupBy(key.as("k")).agg(
      avg(amount).as("cust_avg"),
      stddev_pop(amount).as("cust_std"),
      count(lit(1)).as("n"),
      // scipy skew/kurtosis with default bias=True == population g1 / excess g2,
      // which is exactly Spark's skewness()/kurtosis(); 0.0 below 3 samples
      // (`advanced_features.py:266-271`).
      when(count(lit(1)) >= 3, nz(skewness(amount))).otherwise(0.0).as("behavioral_amount_skewness"),
      when(count(lit(1)) >= 3, nz(kurtosis(amount))).otherwise(0.0).as("behavioral_amount_kurtosis"),
      (countDistinct(merchant).cast("double") / count(lit(1))).as("behavioral_merchant_diversity"))

    val pop = df.agg(
      avg(amount).as("pop_avg"),
      stddev_pop(amount).as("pop_std"),
      count(lit(1)).as("pop_n"))

    // percentile-of-score: strict/weak rank of each entity mean within the
    // full amount population. NOT a cross join (that's O(N·K)): union-tag
    // the means into the population and read both counts off running sums
    // in two orderings — ties resolved by the tag so "events at the same
    // value" land before the mean for n_le and after it for n_lt. The
    // running sums are the two-pass bucket-offset cumulatives
    // (GlobalOrder) — exact longs, never a single-task global sort. The
    // read points (mean rows) are deterministic under event-tie
    // permutation because mean rows carry cnt = 0.
    val popVals = df.select(amount.as("v"), lit(1L).as("cnt"), lit(0).as("tag"),
      lit(null).cast(per.schema("k").dataType).as("k"))
    val meanVals = per.select(col("cust_avg").as("v"), lit(0L).as("cnt"), lit(1).as("tag"), col("k"))
    val u = popVals.unionByName(meanVals)
    val le = GlobalOrder.withCumSums(u, Seq(col("v").asc, col("tag").asc),
        Seq((col("cnt"), "n_le")))
      .where(col("k").isNotNull).select(col("k"), col("n_le"))
    val lt = GlobalOrder.withCumSums(u, Seq(col("v").asc, col("tag").desc),
        Seq((col("cnt"), "n_lt")))
      .where(col("k").isNotNull).select(col("k"), col("n_lt"))
    val ranks = le.join(lt, "k")

    // `ranks` is one row per ENTITY — the same cardinality as `per` — so it
    // must shuffle-join on k, never broadcast (10⁹ customers would ship the
    // whole rank table to every executor). Only the 1-row `pop` broadcasts.
    per.join(ranks, "k")
      .crossJoin(broadcast(pop))
      .select(
        col("k"),
        when(col("pop_std") > 0, (col("cust_avg") - col("pop_avg")) / col("pop_std"))
          .otherwise(0.0).as("behavioral_amount_zscore"),
        ((col("n_lt") + col("n_le")) / (lit(2.0) * col("pop_n")))
          .as("behavioral_amount_percentile"),
        when(col("cust_avg") > 0, nz(col("cust_std")) / col("cust_avg"))
          .otherwise(0.0).as("behavioral_amount_cv"),
        col("behavioral_amount_skewness"),
        col("behavioral_amount_kurtosis"),
        col("behavioral_merchant_diversity"))
  }
}
