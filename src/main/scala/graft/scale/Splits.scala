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

  /** 80/10/10 train/valid/test assignment. */
  def assign(b: Column): Column =
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")

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
}
