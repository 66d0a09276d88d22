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

  /** Per-group exact percentiles next to a RANK-SPACE acceptance check
    * of the percentile sketch (`approx_percentile`, rank error ≤
    * n/accuracy): for each target p, the exact rank of the sketch's
    * answer must sit within `envelope` of p. Rank space is the sketch's
    * actual guarantee — a value-space comparison would fail on any
    * heavy-tailed column without the sketch being wrong.
    *
    * Two passes: the grouped sketch+exact aggregate (per-group state is
    * O(sketch); the exact `percentile` buffers values and is the
    * small-group-count gate side, not the scale path), then one
    * conditional-count pass against the broadcast per-group answers.
    * Output per group: exact_p<pp> (oracle-reproducible) and ok_p<pp>
    * booleans — the q87 envelope-gate contract.
    */
  def approxPercentileGate(df: DataFrame, group: Column, value: Column,
      ps: Seq[Double], accuracy: Int = 1000,
      envelope: Double = 0.01): DataFrame = {
    val base = df.select(group.as("g"), value.cast("double").as("v"))
    val pArr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val per = base.groupBy(col("g")).agg(
      expr(s"percentile(v, $pArr)").as("ex"),
      percentile_approx(col("v"), array(ps.map(lit): _*), lit(accuracy)).as("ap"),
      count(lit(1)).as("n"))
    val rankAggs = ps.indices.map(i =>
      sum((col("v") <= col("ap")(i)).cast("long")).as(s"r$i"))
    val ranked = base.join(broadcast(per), "g")
      .groupBy(col("g"), col("n"), col("ex"), col("ap"))
      .agg(rankAggs.head, rankAggs.tail: _*)
    def pp(p: Double) = (p * 100).round.toString
    ranked.select(col("g") +:
      (ps.indices.map(i => graft.queries.r6(col("ex")(i)).as(s"exact_p${pp(ps(i))}")) ++
       ps.indices.map(i =>
         (abs(col(s"r$i").cast("double") / col("n") - ps(i)) <= envelope)
           .as(s"ok_p${pp(ps(i))}"))): _*)
  }

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
