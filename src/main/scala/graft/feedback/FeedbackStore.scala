package graft.feedback

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's feedback subsystem tables as columnar tables
  * (SURVEY S8; reference `feedback/feedback_system.py:33-156` uses
  * SQLite): `feedback`, `model_performance`, `drift_metrics` — same
  * schemas, parquet-backed, date-filtered reads as plain predicates that
  * push down to the scan.
  */
object FeedbackStore {

  case class Feedback(id: Long, transaction_id: String, customer_id: String,
      predicted_score: Double, predicted_label: Int, actual_label: Int,
      analyst_id: String, feedback_timestamp: java.sql.Timestamp,
      confidence_level: Int, comments: String, investigation_outcome: String)

  /** Seeded synthetic feedback (reference `feedback_system.py:407-453`:
    * beta(2,5)-ish scores, 85% analyst agreement) — column expressions
    * over spark.range, scale-free.
    */
  def simulated(spark: SparkSession, n: Long, seed: Long = 42L,
                startTs: String = "2024-01-01 00:00:00"): DataFrame = {
    // beta(2,5)-shaped score: min of uniforms skews low. Materialized in
    // its own projection FIRST — separate Rand instances desynchronize
    // when branches evaluate them conditionally.
    val scored = spark.range(n).select(col("id"),
      least(rand(seed), rand(seed + 1), greatest(rand(seed + 2), rand(seed + 3))).as("score"))
    val score = col("score")
    scored.select(
      col("id"),
      concat(lit("txn_"), col("id")).as("transaction_id"),
      concat(lit("cust_"), (col("id") % 1000)).as("customer_id"),
      round(score, 4).as("predicted_score"),
      (score > 0.5).cast("int").as("predicted_label"),
      when(rand(seed + 4) < 0.85, (score > 0.5).cast("int"))
        .otherwise(lit(1) - (score > 0.5).cast("int")).as("actual_label"),
      concat(lit("analyst_"), (col("id") % 7)).as("analyst_id"),
      timestamp_micros(unix_micros(lit(startTs).cast("timestamp")) +
        (rand(seed + 5) * 30L * 86400000000L).cast("long")).as("feedback_timestamp"),
      (rand(seed + 6) * 3 + 3).cast("int").as("confidence_level"),
      lit("").as("comments"),
      when(rand(seed + 7) < 0.5, "confirmed_fraud").otherwise("false_positive")
        .as("investigation_outcome"))
  }

  /** Date-filtered read (`feedback_system.py:119-123`): predicate pushes
    * to the parquet scan.
    */
  def recent(feedback: DataFrame, now: java.sql.Timestamp, days: Int): DataFrame =
    feedback.where(col("feedback_timestamp") >=
      timestamp_micros(unix_micros(lit(now)) - days.toLong * 86400000000L))

  /** Retrain recommendation (`feedback_system.py:258-261`): accuracy of
    * analyst-confirmed labels below 0.85.
    */
  def retrainRecommended(feedback: DataFrame): DataFrame =
    feedback.agg(
        Drift.accuracy(col("predicted_label"), col("actual_label")).as("accuracy"))
      .select(col("accuracy"), (col("accuracy") < 0.85).as("retrain_recommended"))

  /** Validity of one feedback row under the reference table's insert
    * contract (`feedback_system.py:41-46`): transaction_id, customer_id,
    * predicted_score and predicted_label are NOT NULL; actual_label,
    * analyst_id, confidence_level, comments, investigation_outcome are
    * nullable and never reject a row.
    */
  def validFeedback: org.apache.spark.sql.Column =
    col("transaction_id").isNotNull && col("customer_id").isNotNull &&
      col("predicted_score").isNotNull && col("predicted_label").isNotNull

  /** Batch-validated insert (`collect_feedback_batch`,
    * `feedback_system.py:393-405`): the reference try-inserts each row
    * and counts successes, skipping rows the table contract rejects.
    * Set-at-a-time twin: one filter splits the batch, one aggregate is
    * the returned count plus its rejection breakdown — no per-row
    * driver loop, so the "batch" can be any size. Returns (accepted
    * rows, 1-row report).
    */
  def collectBatch(batch: DataFrame): (DataFrame, DataFrame) = {
    val ok = validFeedback
    def miss(c: String) = sum((col(c).isNull).cast("long")).as(s"n_missing_$c")
    val report = batch.agg(
      count(lit(1)).as("n_batch"),
      sum(ok.cast("long")).as("n_accepted"),
      (count(lit(1)) - sum(ok.cast("long"))).as("n_rejected"),
      miss("transaction_id"), miss("customer_id"),
      miss("predicted_score"), miss("predicted_label"))
    (batch.where(ok), report)
  }

  /** Append model metrics / monitoring cycles as JSONL (SURVEY S11;
    * reference `scripts/monitoring.py:596-597`).
    */
  def appendMetricsJson(metrics: DataFrame, dir: String): Unit =
    metrics.write.mode("append").json(dir)

  def writeTable(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)
}
