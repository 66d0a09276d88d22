package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Natural-language risk narrative — the engine twin of the reference's
  * templated explanation/recommendation text
  * (`explainability/shap_explainer.py:318-433`): headline with score and
  * level, a sentence for the dominant factor, and a score-band
  * recommendation with a factor-specific follow-up. One `format_string`/
  * `concat` Column — fully codegen, no UDF, so narrating a 100 TB scored
  * table is the same narrow map stage as scoring it.
  *
  * Cross-engine formatting contract: every numeric that reaches a format
  * specifier is PRE-ROUNDED (with the engine's 5e-11 nudge) to the
  * rendered precision first — `%.1f` on a raw value sits on exact binary
  * halves where JVM (HALF_UP) and C-style printf (half-even) disagree;
  * on a pre-rounded value the rendering is unambiguous in both.
  */
object NlReport {

  private def rnd(c: Column, p: Double): Column =
    when(c + 5e-11 >= 0, floor((c + 5e-11) * p + 0.5))
      .otherwise(-floor(-(c + 5e-11) * p + 0.5)) / p

  /** Sentence for the top explanation factor (feature-family templates,
    * like the reference's `_explain_feature`); `name` is the factor's
    * feature name, values read from the feature columns in scope.
    */
  private def factorSentence(name: Column): Column =
    when(name.isNull, lit("no factor above the significance floor"))
      .when(name === "unique_ips_1h",
        format_string("used %d distinct IPs in the last hour", col("unique_ips_1h")))
      .when(name === "velocity_score_1h",
        format_string("velocity of %.1f txn/min in the last hour",
          rnd(col("velocity_score_1h"), 10)))
      .when(name.startsWith("txn_amount_sum"),
        format_string("moved %.2f in the %s window",
          rnd(col("txn_amount_sum_1h"), 100), lit("1h")))
      .when(name === "night_txn_count_24h",
        format_string("%d night transactions in 24h", col("night_txn_count_24h")))
      .when(name.startsWith("txn_count"),
        format_string("%d transactions in the last hour", col("txn_count_1h")))
      .otherwise(format_string("%s is elevated", name))

  /** Score-band recommendation (the reference's `_generate_recommendations`
    * bands), plus a follow-up keyed by the dominant factor family.
    */
  private def recommendation(score: Column, top: Column): Column = {
    val band =
      when(score > 0.8, "block pending manual review; contact the customer")
        .when(score > 0.6, "approve with enhanced monitoring; review next transactions")
        .when(score > 0.3, "approve; routine monitoring")
        .otherwise("approve; no further action")
    val followUp =
      when(top.isNotNull && top.contains("unique_ips"),
        lit(" | verify the IP locations are known for this customer"))
        .when(top.isNotNull && top.contains("velocity"),
          lit(" | check whether the transaction velocity is justified"))
        .when(top.isNotNull && top.contains("night"),
          lit(" | investigate the reason for night-time activity"))
        .otherwise(lit(""))
    concat(band, followUp)
  }

  /** `transaction_id, customer_id, risk_score, risk_level, report` over a
    * feature frame carrying the [[Risk.model]] columns plus `amount`.
    */
  def narrate(features: DataFrame): DataFrame = {
    val score = rnd(Risk.score(col("amount")), 10000)
    val factors = Risk.explanation
    val top = get(factors, lit(0)) // null (not ANSI error) on empty array
    val report = format_string(
      "RISK %s (score %.4f) amount %.2f | top factors: %s | dominant: %s | recommendation: %s",
      Risk.level(score), score, rnd(col("amount"), 100),
      when(size(factors) > 0, array_join(factors, ",")).otherwise(lit("none")),
      factorSentence(top), recommendation(score, top))
    features.select(col("transaction_id"), col("customer_id"),
      score.as("risk_score"), Risk.level(score).as("risk_level"), report.as("report"))
  }
}
