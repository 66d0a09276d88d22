package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style table profile: one output row per column with volume,
  * null rate, exact cardinality, and type-appropriate min/max — the
  * dataset-health snapshot data platforms compute before/after every
  * load.
  *
  * Shape: one independent aggregate PER COLUMN, unioned. On columnar
  * storage this is the right plan, not a compromise — each job's scan
  * prunes to exactly one column (ReadSchema shows a single field), the
  * jobs are independent (a scheduler runs them concurrently), and exact
  * `count(DISTINCT)` per column avoids the single-pass multi-distinct
  * expand blowup. The sketch path swaps `approx_count_distinct` behind
  * the same signature when exactness is not required.
  */
object Profile {
  sealed trait Kind
  case object Num extends Kind   // min/max as double
  case object Str extends Kind   // min/max lexicographic
  case object Other extends Kind // counts only (timestamps: engine-specific rendering)

  def profile(df: DataFrame, cols: Seq[(String, Kind)]): DataFrame =
    cols.map { case (c, k) =>
      df.agg(
          count(lit(1)).as("n"),
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("n_distinct"),
          (k match {
            case Num => min(col(c)).cast("double")
            case _ => lit(null).cast("double")
          }).as("min_num"),
          (k match {
            case Num => max(col(c)).cast("double")
            case _ => lit(null).cast("double")
          }).as("max_num"),
          (k match {
            case Str => min(col(c)).cast("string")
            case _ => lit(null).cast("string")
          }).as("min_str"),
          (k match {
            case Str => max(col(c)).cast("string")
            case _ => lit(null).cast("string")
          }).as("max_str"))
        .select(lit(c).as("column"), col("n"),
          (col("n") - col("n_nonnull")).as("n_null"),
          ((col("n") - col("n_nonnull")).cast("double") / col("n")).as("null_rate"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }.reduce(_.unionByName(_))
}
