package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shape aggregates the reference computes per entity —
  * Gini, Shannon entropy, HHI, diversity (SURVEY A15, A16, A21, A22, A30).
  *
  * All are expressed as two-phase relational aggregations (window +
  * groupBy on the SAME key), so Catalyst plans ONE hash-partition
  * exchange on the entity key and reuses it — no per-group UDAF, no
  * collect_list blow-up, scales linearly at 100 TB.
  */
object Distribution {

  /** Gini coefficient of `value` per `key` (reference
    * `flink_job/real_time_processor.py:213-228`): over ascending-sorted
    * x with 1-based rank i, `2*Σ i*x_i / (n*Σx) − (n+1)/n`;
    * 0.0 when n<=1 or Σx<=0. `tie` makes rank assignment deterministic
    * (ties contribute the same sum either way, but the plan stays
    * reproducible).
    */
  def gini(df: DataFrame, key: Column, value: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(value.asc, tie.asc)
    df.select(key.as("k"), value.as("x"), row_number().over(w).cast("double").as("i"))
      .groupBy(col("k"))
      .agg(
        when(count(lit(1)) > 1 && sum(col("x")) > 0,
          lit(2.0) * sum(col("i") * col("x")) / (count(lit(1)) * sum(col("x")))
            - (count(lit(1)) + lit(1.0)) / count(lit(1)))
          .otherwise(0.0).as("gini"))
  }

  /** Shannon entropy (log2) of the `bucket` histogram per `key`
    * (reference `advanced_features.py:197-208`): 0.0 when the entity has
    * <=1 distinct bucket.
    */
  def entropy(df: DataFrame, key: Column, bucket: Column, out: String): DataFrame = {
    val counts = df.groupBy(key.as("k"), bucket.as("b")).agg(count(lit(1)).as("cnt"))
    val total = sum(col("cnt")).over(Window.partitionBy(col("k")))
    counts.select(col("k"), col("cnt"), total.as("tot"))
      .groupBy(col("k"))
      .agg(
        when(count(lit(1)) <= 1, 0.0)
          .otherwise(-sum(col("cnt") / col("tot") * log2(col("cnt") / col("tot"))))
          .as(out))
  }

  /** Herfindahl–Hirschman index of `bucket` shares per `key`
    * (reference `advanced_features.py:307-311`): Σ (count_b/total)^2.
    */
  def hhi(df: DataFrame, key: Column, bucket: Column, out: String): DataFrame = {
    val counts = df.groupBy(key.as("k"), bucket.as("b")).agg(count(lit(1)).as("cnt"))
    val total = sum(col("cnt")).over(Window.partitionBy(col("k")))
    counts.select(col("k"), col("cnt"), total.as("tot"))
      .groupBy(col("k"))
      .agg(sum(pow(col("cnt") / col("tot"), 2.0)).as(out))
  }

  /** Per-event trailing-window Gini (the A15 WINDOW form,
    * `real_time_processor.py:213-228`): sorted-array accumulation as
    * higher-order array expressions over the frame — v1 of SURVEY §2.8's
    * plan (v2 at 100 TB: TypedImperativeAggregate with a merge buffer).
    */
  def giniOver(amount: Column, w: org.apache.spark.sql.expressions.WindowSpec, secs: Long): Column = {
    val arr = sort_array(collect_list(amount).over(Trailing.lastSeconds(w, secs)))
    val n = size(arr)
    val s = aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val ix = aggregate(
      zip_with(arr, sequence(lit(1), n), (v, i) => i.cast("double") * v),
      lit(0.0), (acc, x) => acc + x)
    when(n > 1 && s > 0,
      lit(2.0) * ix / (n * s) - (n + lit(1.0)) / n).otherwise(0.0)
  }

  /** Per-event trailing-window HHI (A16 window form): bucket shares from
    * the frame's collected values via array_distinct + filter counts.
    */
  def hhiOver(bucket: Column, w: org.apache.spark.sql.expressions.WindowSpec, secs: Long): Column = {
    val arr = collect_list(bucket).over(Trailing.lastSeconds(w, secs))
    val n = size(arr).cast("double")
    aggregate(
      transform(array_distinct(arr), m => {
        val c = size(filter(arr, x => x === m)).cast("double")
        (c / n) * (c / n)
      }),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Mutual information between two categorical columns, reported as the
    * per-`x` contribution:  mi_x = Σ_y (n_xy/n) · ln(n·n_xy / (n_x·n_y)).
    * Σ over all x gives I(X;Y) ≥ 0 — the training-pipeline
    * feature-relevance screen (which features carry signal about a
    * label). All inputs to the log are ratios of exact integer counts, so
    * the only float noise is summation order. One groupBy(x,y) exchange
    * builds the joint histogram; the marginals broadcast onto it.
    */
  def mutualInformation(df: DataFrame, x: Column, y: Column): DataFrame = {
    val joint = df.groupBy(x.as("x"), y.as("y")).agg(count(lit(1)).as("nxy"))
    val mx = joint.groupBy(col("x").as("xm")).agg(sum(col("nxy")).as("nx"))
    val my = joint.groupBy(col("y").as("ym")).agg(sum(col("nxy")).as("ny"))
    val n = joint.agg(sum(col("nxy")).as("n"))
    joint
      .join(broadcast(mx), col("x") === col("xm"))
      .join(broadcast(my), col("y") === col("ym"))
      .crossJoin(broadcast(n))
      .groupBy(col("x"))
      .agg(sum((col("nxy").cast("double") / col("n")) *
          log((col("n") * col("nxy")).cast("double") / (col("nx") * col("ny"))))
        .as("mi_contrib"), sum(col("nxy")).as("n_x"))
  }

  /** Shannon entropy (log2) of each key's first-order transition (bigram)
    * distribution over `state`, ordered by `order` (pass a tie-breaking
    * column — sequence entropy is only well-defined for a deterministic
    * order). Keys with fewer than 2 events emit no row. Low entropy on a
    * long sequence = scripted repetition; extends the entropy/Gini/HHI
    * family from value distributions to SEQUENCE structure.
    */
  def transitionEntropy(df: DataFrame, key: Column, state: Column,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val big = df.select(key.as("k"), state.as("a"),
        lead(state, 1).over(w).as("b"))
      .where(col("b").isNotNull)
      .groupBy(col("k"), col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
    big.select(col("k"), col("c"),
        sum(col("c")).over(Window.partitionBy(col("k"))).as("n"))
      .groupBy(col("k"))
      .agg(first(col("n")).as("n_transitions"),
        // 0.0 - : a one-bigram key yields -0.0 from the sum; normalize the
        // zero's sign so parquet bits match the oracle's
        (lit(0.0) - sum((col("c").cast("double") / col("n")) *
          log2(col("c").cast("double") / col("n")))).as("transition_entropy"))
  }

  /** Conditional transition entropy H(next | prev) per key, log2:
    * −Σ_{a,b} (c_ab/n) · log2(c_ab/c_a). How predictable the NEXT
    * counterparty is given the current one — 0 for a deterministic chain
    * even when the unconditional [[transitionEntropy]] is high (a cycle
    * A→B→C→A has joint entropy log2(3) but conditional entropy 0: pure
    * scripting). Same one-window + two-level-aggregation shape.
    */
  def conditionalTransitionEntropy(df: DataFrame, key: Column, state: Column,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val big = df.select(key.as("k"), state.as("a"),
        lead(state, 1).over(w).as("b"))
      .where(col("b").isNotNull)
      .groupBy(col("k"), col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("k"))))
      .withColumn("ca", sum(col("c")).over(Window.partitionBy(col("k"), col("a"))))
    big.groupBy(col("k"))
      .agg(first(col("n")).as("n_transitions"),
        (lit(0.0) - sum((col("c").cast("double") / col("n")) *
          log2(col("c").cast("double") / col("ca")))).as("cond_entropy"))
  }

  /** Lorenz-curve decile points of an exact integer `measure` per entity:
    * entities ranked ascending into 10 equal-count bins, each bin's
    * count, total, and the cumulative share of the grand total. The
    * graphical twin of the Gini/Theil scalars — "the bottom 80% of
    * customers carry x% of volume". The decile assignment is the
    * two-pass range-partitioned rank (GlobalOrder — the per-entity table
    * is still 10⁹ rows at scale); only the 10-row decile table runs on a
    * deliberate constant-key single partition.
    */
  def lorenzDeciles(perEntity: DataFrame, id: Column, measure: Column): DataFrame = {
    import graft.ops.GlobalOrder
    val ranked = GlobalOrder.withRowNumber(
      perEntity.select(measure.as("m"), id.as("__id")),
      Seq(col("m").asc, col("__id").asc), "__rn", total = Some("__n"))
    val byDecile = ranked
      .select(col("m"), GlobalOrder.ntileOf(col("__rn"), col("__n"), 10).as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_entities"), sum(col("m")).as("vol"))
    // 10-row decile table: cumulative share via a window-free triangular
    // self-join (exact integer volumes)
    val prior = byDecile.select(col("decile").as("__d2"), col("vol").as("__v2"))
    byDecile.join(prior, col("__d2") <= col("decile"))
      .groupBy(col("decile"), col("n_entities"), col("vol"))
      .agg(sum(col("__v2")).as("__cumvol"))
      .crossJoin(broadcast(byDecile.agg(sum(col("vol")).as("__totvol"))))
      .select(col("decile"), col("n_entities"), col("vol"),
        (col("__cumvol").cast("double") / col("__totvol")).as("cum_share"))
  }

  /** max bucket count / total (reference `advanced_features.py:133`). */
  def peakRatio(df: DataFrame, key: Column, bucket: Column, out: String): DataFrame = {
    val counts = df.groupBy(key.as("k"), bucket.as("b")).agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("k"))
      .agg((max(col("cnt")).cast("double") / sum(col("cnt"))).as(out))
  }
}
