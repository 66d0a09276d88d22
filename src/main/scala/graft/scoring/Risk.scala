package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's weighted-linear risk model as one closed-form Column
  * expression (reference `api/main.py:82-209`): clamp-normalize each
  * feature, weighted sum, rule boosts, clamp to [0,1], classify.
  * No UDFs — the whole model stays inside whole-stage codegen, so scoring
  * a 100 TB feature table is a single narrow map stage.
  */
object Risk {
  /** feature -> (weight, normalizer); `api/main.py:82-97,147-173`. */
  val model: Seq[(String, Double, Double)] = Seq(
    ("txn_amount_sum_60s", 0.15, 10000.0),
    ("txn_amount_sum_5m", 0.12, 25000.0),
    ("txn_amount_sum_1h", 0.10, 50000.0),
    ("txn_count_60s", 0.08, 10.0),
    ("txn_count_5m", 0.07, 20.0),
    ("txn_count_10m", 0.06, 30.0),
    ("txn_count_1h", 0.05, 50.0),
    ("unique_ips_1h", 0.20, 5.0),
    ("unique_merchants_1h", 0.05, 10.0),
    ("velocity_score_1h", 0.12, 2.0),
    ("amount_deviation_score_1h", 0.08, 5000.0),
    ("night_txn_count_24h", 0.06, 5.0),
    ("weekend_txn_count_7d", 0.03, 10.0),
    ("avg_txn_amount_1h", 0.03, 5000.0))

  /** min(value/normalizer, 1.0) * weight, summed (`api/main.py:119-132`). */
  def baseScore: Column =
    model.map { case (f, wgt, norm) =>
      least(col(f).cast("double") / lit(norm), lit(1.0)) * lit(wgt)
    }.reduce(_ + _)

  /** Rule boosts (`api/main.py:175-200`); `amount` is the current txn. */
  def boosts(amount: Column): Column =
    when(amount > 10000, 0.3).when(amount > 5000, 0.15).otherwise(0.0) +
      when(col("unique_ips_1h") > 3, 0.25).otherwise(0.0) +
      when(col("velocity_score_1h") > 1.5, 0.2).otherwise(0.0) +
      when(col("amount_deviation_score_1h") > 3000, 0.15).otherwise(0.0) +
      when(col("night_txn_count_24h") > 3, 0.1).otherwise(0.0)

  /** Clamped final score (`api/main.py:141`). */
  def score(amount: Column): Column =
    least(greatest(baseScore + boosts(amount), lit(0.0)), lit(1.0))

  /** LOW <= 0.3 < MEDIUM <= 0.6 < HIGH (`api/main.py:202-209`). */
  def level(score: Column): Column =
    when(score <= 0.3, "LOW").when(score <= 0.6, "MEDIUM").otherwise("HIGH")

  /** Top-3 explanation factors (reference `api/main.py:211-241`): feature
    * names of the 3 largest weight contributions, kept only above the 0.05
    * significance floor. One array expression — sort/slice/filter all stay
    * in codegen. Ties (equal contributions) break by feature name; the
    * reference inherits Python dict order instead, so the tie rule here is
    * the engine's canonical choice, mirrored in the oracle.
    */
  def explanation: Column = {
    val entries = model.map { case (f, wgt, norm) =>
      struct((-least(col(f).cast("double") / lit(norm), lit(1.0)) * lit(wgt)).as("c"),
        lit(f).as("n"))
    }
    val top3 = slice(array_sort(array(entries: _*)), 1, 3)
    transform(filter(top3, x => x.getField("c") < -0.05), x => x.getField("n"))
  }

  /** Attach risk_score + risk_level to a feature frame. */
  def scored(features: DataFrame, amount: Column): DataFrame = {
    val s = score(amount)
    features.withColumn("risk_score", s).withColumn("risk_level", level(s))
  }
}
