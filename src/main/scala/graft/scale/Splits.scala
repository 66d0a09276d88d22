package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: md5-bucket the
  * record id (salted). Narrow, no RNG state, identical on any engine /
  * cluster size / run — the properties a reproducible 100 TB train/test
  * split needs (`sample()` has none of them: it is partitioning-dependent
  * and unrepeatable across engines).
  */
object Splits {
  def bucket(id: Column, salt: String = "split", n: Int = 100): Column =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % n

  /** Driver-side twin of [[bucket]] for values that must exist in Scala
    * before a plan is built (hyperparameter draws, per-tree subsample
    * salts): first 8 md5 hex chars of `"salt:id"` as an unsigned int,
    * mod n — bit-identical to the column expression and to the oracle's
    * `('0x'||substr(md5(salt||':'||id),1,8))::UBIGINT % n`.
    */
  def bucketLocal(salt: String, id: String, n: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % n
  }

  /** 80/10/10 train/valid/test assignment. */
  def assign(b: Column): Column =
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")

  /** Leakage-safe temporal split: train = the first `trainFrac` of rows
    * in event-time order, test = rows after an EMBARGO gap beyond the
    * train cutoff, embargo = the gap rows (excluded from both sides, so
    * trailing-window features of early test rows cannot see train-period
    * events — the backtest-purging rule). The cutoff is the timestamp AT
    * a row position (not an interpolated quantile), so it is an actual
    * data value and engine-exact.
    *
    * The cutoff row is found with the two-pass range-partitioned rank
    * ([[graft.ops.GlobalOrder.withRowNumber]]) — never a single-task
    * global sort — then the one-row cutoff broadcasts back over the
    * unsorted input. Ties at the cutoff are value-safe: the k-th order
    * STATISTIC is the same timestamp no matter how equal stamps permute.
    */
  def temporal(df: org.apache.spark.sql.DataFrame, ts: Column,
      trainFrac: Double = 0.8, embargoSeconds: Long = 86400): org.apache.spark.sql.DataFrame = {
    val ranked = graft.ops.GlobalOrder.withRowNumber(
      df.select(ts.as("__ts")), Seq(col("__ts")), "__rn", total = Some("__n"))
    val cut = ranked
      .where(col("__rn") <= floor(col("__n") * trainFrac).cast("long"))
      .agg(max(col("__ts")).as("__cut")) // one row; null cut when trainFrac*n < 1
    df.crossJoin(broadcast(cut))
      .withColumn("split",
        when(ts <= col("__cut"), "train")
          .when(ts > col("__cut") + expr(s"INTERVAL $embargoSeconds SECONDS"), "test")
          .otherwise("embargo"))
      .drop("__cut")
  }

  /** Deterministic stratified sample: the first `k` rows of each stratum
    * in md5-of-id order — a reproducible "k per group" downsample (no
    * RNG, engine-portable, stable under repartitioning). One shuffle on
    * the stratum key; rank is a window over the md5 hex string with the
    * id as tie-break.
    */
  def stratified(df: org.apache.spark.sql.DataFrame, stratum: Column, id: Column,
      k: Int, salt: String = "strat"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(s"$salt:"), id.cast("string")))
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(stratum).orderBy(h, id)))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * salted-md5 bucket of the id — same reproducibility properties as
    * [[bucket]] (engine-portable, repartition-stable, no RNG), and every
    * record keeps its fold across reruns so per-fold feature/label
    * artifacts can be cached.
    */
  def kfold(df: org.apache.spark.sql.DataFrame, id: Column, k: Int,
      salt: String = "fold"): org.apache.spark.sql.DataFrame =
    df.withColumn("fold", bucket(id, salt, k))

  /** Class-STRATIFIED deterministic k-fold — the engine twin of the
    * reference's `StratifiedKFold(n_splits=5)` (`models/
    * advanced_models.py:24,263`) and of `train_test_split(...,
    * stratify=y)` (`:384`, fold 0 as the hold-out): rows are ranked
    * WITHIN their class by (salted md5, id) and fold = (rank − 1) mod k,
    * so every fold's class counts differ by at most 1 per class — the
    * class ratio is preserved exactly, which the plain md5-bucket
    * [[kfold]] only approximates.
    *
    * Scale shape: the within-class rank comes from
    * [[graft.ops.GlobalOrder.withCumSumsBy]] partitioned on the label —
    * the md5 key (uniform) drives the range bucketing, so no
    * single-task window appears even though there are only two classes
    * (a `Window.partitionBy(label)` would funnel each class through ONE
    * task). Same determinism contract as [[kfold]]: RNG-free,
    * partitioning-independent, engine-portable.
    */
  def stratifiedKfold(df: org.apache.spark.sql.DataFrame, id: Column,
      label: Column, k: Int, salt: String = "skfold"): org.apache.spark.sql.DataFrame = {
    require(k >= 2, s"stratifiedKfold: k must be >= 2, got $k")
    val h = conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))),
      1, 8), 16, 10).cast("long")
    val ranked = graft.ops.GlobalOrder.withCumSumsBy(
      df.withColumn("__sk_y", label).withColumn("__sk_h", h),
      Seq("__sk_y"), Seq(col("__sk_h").asc, id.asc),
      Seq((lit(1L), "__sk_rk")))
    ranked.withColumn("fold", (col("__sk_rk") - 1) % k)
      .drop("__sk_y", "__sk_h", "__sk_rk")
  }

  /** Deterministic class rebalance: keep every positive row, hash-sample
    * negatives at `keep`/`n` (same md5-bucket mechanism as [[bucket]], so
    * the subsample is stable across engines and runs), and attach the
    * inverse-probability weight (n/keep for sampled negatives, 1 for
    * positives) that keeps downstream estimators unbiased. Narrow — one
    * filter, no shuffle, no RNG state.
    */
  def rebalance(df: org.apache.spark.sql.DataFrame, id: Column, label: Column,
      keep: Int, n: Int = 1000, salt: String = "rebalance"): org.apache.spark.sql.DataFrame =
    df.withColumn("label", label)
      .where(col("label") || bucket(id, salt, n) < keep)
      .withColumn("weight", when(col("label"), lit(1.0)).otherwise(lit(n.toDouble / keep)))

  /** Temperature-scaled mixture weights for multi-source training
    * corpora: per group, sampling weight ∝ tokens^alpha normalized over
    * all groups (alpha < 1 upsamples small sources — the multinomial
    * temperature trick), plus the effective epochs each source runs
    * when `budgetTokens` are drawn with those weights (epochs > 1 flags
    * sources the schedule would repeat). One aggregation to group
    * granularity, then a broadcast of the single normalization row —
    * the group table is tiny by construction at any corpus size.
    */
  def mixtureWeights(df: org.apache.spark.sql.DataFrame, group: Column,
      tokens: Column, alpha: Double, budgetTokens: Long): org.apache.spark.sql.DataFrame = {
    val per = df.groupBy(group.as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).cast("long").as("tokens"))
    val z = per.agg(sum(pow(col("tokens").cast("double"), alpha)).as("__z"))
    per.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("tokens"),
        (pow(col("tokens").cast("double"), alpha) / col("__z")).as("weight"),
        (pow(col("tokens").cast("double"), alpha) / col("__z") * budgetTokens
          / col("tokens")).as("epochs"))
  }
}
