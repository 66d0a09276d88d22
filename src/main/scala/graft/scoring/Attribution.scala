package graft.scoring

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-level feature attribution for the linear risk model — the
  * engine twin of the reference's SHAP dataset summary
  * (`explainability/shap_explainer.py:128-156`: mean |SHAP value| per
  * feature over a sample). For a weighted-linear model the SHAP value of
  * feature i on a row is exactly its weighted normalized contribution
  * relative to the background mean, so the mean-|contribution| report is
  * closed form — no sampling, no explainer loop.
  *
  * Shape: ONE partial-aggregated pass computes all per-feature
  * mean-|w·min(f/norm,1)| values (a single 1-row aggregate — map-side
  * combine, nothing row-shaped shuffles), the total attribution mass is
  * a column expression over that row, and the per-feature report is an
  * explode of a 14-element literal-keyed array OVER THE ONE ROW. The
  * reference caps at 1000 sampled rows for tractability
  * (`shap_explainer.py:133-137`); this form is exact over the full frame
  * at any scale, so no sample is needed.
  */
object Attribution {

  /** One row per model feature: `feature, mean_abs_contribution, share`
    * (share of the model's total mean attribution mass), over the given
    * feature frame (any frame carrying the [[Risk.model]] columns).
    */
  def report(features: DataFrame): DataFrame = {
    val aggs = Risk.model.map { case (f, wgt, norm) =>
      avg(abs(least(col(f).cast("double") / lit(norm), lit(1.0)) * lit(wgt))).as(f)
    }
    val oneRow = features.agg(aggs.head, aggs.tail: _*)
      .withColumn("__tot", Risk.model.map { case (f, _, _) => col(f) }.reduce(_ + _))
    val entries = Risk.model.map { case (f, _, _) =>
      struct(lit(f).as("feature"), col(f).as("mean_abs_contribution"))
    }
    oneRow
      .select(col("__tot"), explode(array(entries: _*)).as("e"))
      .select(
        col("e.feature").as("feature"),
        col("e.mean_abs_contribution").as("mean_abs_contribution"),
        when(col("__tot") > 0, col("e.mean_abs_contribution") / col("__tot"))
          .otherwise(0.0).as("share"))
  }
}
