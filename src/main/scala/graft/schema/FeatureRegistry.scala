package graft.schema

import graft.ops.CoreFeatures
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The feast-registry surface (reference `feature_repo/definitions.py`:
  * FeatureView declarations with entity / TTL / field / dtype): catalog
  * rows derive from the ACTUAL serving-view schemas, so the catalog is
  * the serving-schema CONTRACT — a renamed or retyped column throws (or
  * flips the q215 hash), exactly what a registry exists to catch. The
  * reference's three FeatureView groupings are preserved as view_name.
  */
object FeatureRegistry {

  /** (view, entity, ttl hours, declared fields) — the reference's
    * declarations (`definitions.py:27-79`), grouped as it groups them.
    */
  val declared: Seq[(String, String, Int, Seq[String])] = Seq(
    ("customer_transaction_features", "customer_id", 24,
      Seq("txn_amount_sum_60s", "txn_amount_sum_5m", "txn_amount_sum_1h",
        "txn_count_60s", "txn_count_5m", "txn_count_10m", "txn_count_1h",
        "unique_merchants_1h", "avg_txn_amount_1h", "max_txn_amount_1h")),
    ("customer_behavioral_features", "customer_id", 24,
      Seq("unique_ips_1h", "night_txn_count_24h", "weekend_txn_count_7d",
        "velocity_score_1h", "amount_deviation_score_1h")),
    ("merchant_transaction_features", "merchant_id", 24,
      Seq("merchant_txn_count_1h", "merchant_txn_amount_sum_1h",
        "merchant_unique_customers_1h", "merchant_avg_txn_amount_1h")))

  /** Catalog DataFrame over the live transaction frame's serving
    * schemas (plan-only — nothing executes against `tx`).
    */
  def catalog(tx: DataFrame): DataFrame = {
    val schemas = Map(
      "customer_id" -> CoreFeatures.customerFeatures(tx).schema,
      "merchant_id" -> CoreFeatures.merchantFeatures(tx).schema)
    val rows = declared.flatMap { case (view, entity, ttl, fields) =>
      val schema = schemas(entity)
      fields.map { fname =>
        val fld = schema.fields.find(_.name == fname).getOrElse(
          throw new IllegalStateException(
            s"catalog field $fname missing from the $view serving schema"))
        (view, entity, ttl.toLong, fname, fld.dataType.simpleString)
      }
    }
    import tx.sparkSession.implicits._
    rows.toDF("view_name", "entity", "ttl_hours", "field", "dtype")
      .select(col("view_name"), col("entity"), col("ttl_hours"),
        col("field"), col("dtype"))
  }
}
