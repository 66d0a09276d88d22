package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weekly cohort retention: group users by the week of their first event
  * (the cohort), then count distinct active users at each whole-week
  * offset from that cohort start.
  *
  * Shape: two shuffles on user (first-event min, then distinct-count per
  * cohort cell) and a broadcast join of the tiny cohort-size table.
  * Output cardinality is cohorts × offsets — independent of event count,
  * so the plan holds at 100 TB (the wide input only ever flows through
  * hash aggregations keyed by user_id).
  */
object Cohort {

  /** One row per (cohort_week, week_offset): active_users, cohort_size,
    * retention = active/size. Offset 0 is 100% by construction.
    */
  def retention(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one scan: the cohort week is a window min over the same user_id
    // partitioning the aggregates need — no self-join of the event table
    val withCohort = events.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .withColumn("cohort_week",
        min(col("wk")).over(Window.partitionBy(col("user_id"))))
    val sizes = withCohort.select(col("user_id"), col("cohort_week")).distinct()
      .groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    withCohort
      .select(col("cohort_week"),
        // week starts are 7 days apart exactly, so /7 is exact
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") / col("cohort_size")).as("retention"))
  }
}
