package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch operators — the approximate twins of the exact
  * distinct/count operators, for the data volumes where exact state is
  * the bottleneck. Both sketch families are commutative monoids, so
  * Spark computes them with MAP-SIDE partial aggregation and merges tiny
  * fixed-size states at the reducer: per-key state is O(sketch), not
  * O(distinct values) — the property that lets a 100 TB distinct-count
  * run in one pass. The exact forms remain the correctness oracles
  * (SketchSpec pins error bounds against them).
  */
object Sketches {

  /** Per-entity exact vs HLL-sketch distinct counts, side by side:
    * `entity, exact, approx, rel_err`. The estimate is order-independent
    * (register-max state), hence deterministic across partitionings.
    */
  def hllDistinct(df: DataFrame, entity: Column, value: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(entity.as("entity"))
      .agg(
        countDistinct(value).as("exact"),
        hll_sketch_estimate(hll_sketch_agg(value, lit(lgK))).as("approx"))
      .select(col("entity"), col("exact"), col("approx"),
        (abs(col("approx") - col("exact")).cast("double") / col("exact"))
          .as("rel_err"))

  /** Global distinct estimate built by MERGING per-group sketches —
    * the re-aggregation pattern (pre-aggregate per partition/day, union
    * later) that exact distinct counts famously cannot do.
    */
  def hllMergedDistinct(df: DataFrame, group: Column, value: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(group.as("g"))
      .agg(hll_sketch_agg(value, lit(lgK)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_distinct"))

  /** Count-min sketch over `value`, decoded to estimated counts for the
    * given candidate items (the serving-side lookup shape: the sketch is
    * the shipped artifact, candidates come from the request). One-sided
    * error: estimate >= true count, overshoot <= eps·N with prob >= conf.
    */
  def cmsCounts(df: DataFrame, value: Column, candidates: Seq[String],
      eps: Double = 0.001, conf: Double = 0.99, seed: Int = 42): Seq[(String, Long)] = {
    val bin = df.agg(count_min_sketch(
      value, lit(eps), lit(conf), lit(seed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bin))
    candidates.map(c => c -> cms.estimateCount(c))
  }
}
