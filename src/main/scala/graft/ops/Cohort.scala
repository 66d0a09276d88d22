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

  /** Weekly growth accounting — the standard user-base decomposition:
    * per week, how many active users are NEW (first week ever), RETAINED
    * (also active the previous week), or RESURRECTED (returning after a
    * gap); plus CHURNED_AFTER (active this week, silent the next — the
    * forward-attributed churn). new + retained + resurrected = weekly
    * actives by construction. One distinct (user, week) projection, one
    * per-user lag/lead window, one groupBy(week) — counts are exact
    * integers at any scale.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val weeks = events.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk")).distinct()
      .select(col("user_id"), col("wk"),
        min(col("wk")).over(Window.partitionBy(col("user_id"))).as("first_wk"),
        lag(col("wk"), 1).over(w).as("prev_wk"),
        lead(col("wk"), 1).over(w).as("next_wk"))
    weeks.groupBy(col("wk").as("week"))
      .agg(
        count(when(col("wk") === col("first_wk"), 1)).as("new_users"),
        count(when(col("prev_wk") === date_sub(col("wk"), 7), 1)).as("retained"),
        count(when(col("wk") =!= col("first_wk") &&
          (col("prev_wk").isNull || col("prev_wk") < date_sub(col("wk"), 7)), 1))
          .as("resurrected"),
        count(when(col("next_wk").isNull || col("next_wk") > date_add(col("wk"), 7), 1))
          .as("churned_after"))
  }
}
