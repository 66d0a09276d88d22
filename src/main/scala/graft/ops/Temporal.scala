package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity temporal profile over full history (SURVEY A17–A25;
  * reference `feature_engineering/advanced_features.py:115-195`).
  *
  * One lag-window pass (partitioned by the entity key) feeds one groupBy
  * on the same key — a single exchange at any scale.
  *
  * Canonical deviations from the reference, encoded identically in the
  * oracle: pandas' sample-std of a single inter-arrival is NaN and scipy's
  * correlation of a zero-variance series is NaN — this engine defines
  * both as 0.0 (the reference's own cold-start default).
  */
object Temporal {

  /** Circular (circadian) rhythm per key: events mapped to angles on the
    * 24 h clock, R = mean resultant length ∈ [0,1] (1 = all activity at
    * one instant of day, 0 = uniform around the clock — the correct
    * "peak hour concentration" statistic, unlike a modal-bucket ratio it
    * sees 23:55 and 00:05 as NEAR), peak_hour = mean direction mapped to
    * [0,24). One narrow projection + one aggregation; trig ulp
    * differences between engines are absorbed by the caller's rounding.
    */
  def circadian(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val twoPi = 2 * math.Pi
    val theta = ((unix_micros(ts) % 86400000000L).cast("double")
      / 86400000000L.toDouble) * twoPi
    df.select(key.as("k"), cos(theta).as("cx"), sin(theta).as("sy"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), avg(col("cx")).as("mc"), avg(col("sy")).as("ms"))
      .select(col("k"), col("n"),
        sqrt(col("mc") * col("mc") + col("ms") * col("ms")).as("rhythm_r"),
        ((((atan2(col("ms"), col("mc")) % twoPi) + twoPi) % twoPi)
          / twoPi * 24).as("peak_hour"))
  }

  /** Goh–Barabási burstiness of the inter-arrival process per key:
    * B = (σ−μ)/(σ+μ) over the gap series (population σ, exact-micros
    * gaps). B→1 for extreme bursts, ≈0 for Poisson arrivals, −1 for a
    * perfectly regular (scripted) clock — the single-number complement
    * to [[interarrival]]'s raw moments. NULL when there are no gaps;
    * a single gap gives σ=0 → B=−1 (a two-event entity is maximally
    * "regular" by definition, pinned in the oracle the same way).
    */
  def burstiness(df: DataFrame, key: Column, ts: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(unix_micros(ts).asc, tie.asc)
    val micros = unix_micros(ts)
    df.select(key.as("k"), (micros - lag(micros, 1).over(w)).as("gap"))
      .groupBy(col("k"))
      .agg(count(col("gap")).as("n_gaps"),
        avg(col("gap")).as("mu"),
        coalesce(stddev_pop(col("gap")), lit(0.0)).as("sd"))
      .select(col("k"), col("n_gaps"),
        when(col("n_gaps") >= 1 && (col("sd") + col("mu")) > 0,
          (col("sd") - col("mu")) / (col("sd") + col("mu"))).as("burstiness"))
  }

  /** Inter-arrival stats: avg/std/min/max interval (seconds),
    * regularity = std/avg (0 if avg<=0), burst ratio = frac(diff < 300 s).
    * Entities with a single event get all-zeros
    * (`advanced_features.py:141-163`).
    */
  def interarrival(df: DataFrame, key: Column, ts: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(unix_micros(ts).asc, tie.asc)
    val micros = unix_micros(ts)
    val diff = ((micros - lag(micros, 1).over(w)) / 1e6).as("diff")
    val z = lit(0.0)
    def nz(c: Column): Column = coalesce(nanvl(c, z), z)
    df.select(key.as("k"), diff)
      .groupBy(col("k"))
      .agg(
        nz(avg(col("diff"))).as("temporal_avg_interval"),
        nz(stddev_samp(col("diff"))).as("temporal_std_interval"),
        nz(min(col("diff"))).as("temporal_min_interval"),
        nz(max(col("diff"))).as("temporal_max_interval"),
        when(avg(col("diff")) > 0,
          nz(stddev_samp(col("diff"))) / avg(col("diff"))).otherwise(0.0)
          .as("temporal_regularity"),
        nz(avg(when(col("diff") < 300, 1.0).otherwise(0.0)))
          .as("temporal_burst_ratio"))
  }

  /** OLS slope of `y` against the 0-based event index (ordered by ts) and
    * |r| trend strength; 0.0 when the entity has <3 events
    * (`advanced_features.py:167-174`, scipy linregress).
    */
  def amountTrend(df: DataFrame, key: Column, ts: Column, tie: Column, y: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(unix_micros(ts).asc, tie.asc)
    val z = lit(0.0)
    def nz(c: Column): Column = coalesce(nanvl(c, z), z)
    df.select(key.as("k"), y.as("y"), (row_number().over(w) - 1).cast("double").as("x"))
      .groupBy(col("k"))
      .agg(
        when(count(lit(1)) >= 3, nz(regr_slope(col("y"), col("x")))).otherwise(0.0)
          .as("temporal_amount_trend"),
        when(count(lit(1)) >= 3, nz(abs(corr(col("x"), col("y"))))).otherwise(0.0)
          .as("temporal_amount_trend_strength"))
  }

  /** Daily-frequency trend: regression of txns-per-day against the day's
    * 0-based index among the entity's ACTIVE days (not calendar days —
    * the reference regresses over `groupby(date).size()`,
    * `advanced_features.py:176-186`); 0.0 with <3 active days.
    */
  def frequencyTrend(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val daily = df.groupBy(key.as("k"), to_date(ts).as("d")).agg(count(lit(1)).cast("double").as("cnt"))
    val w = Window.partitionBy(col("k")).orderBy(col("d").asc)
    val z = lit(0.0)
    def nz(c: Column): Column = coalesce(nanvl(c, z), z)
    daily.select(col("k"), col("cnt"), (row_number().over(w) - 1).cast("double").as("x"))
      .groupBy(col("k"))
      .agg(
        when(count(lit(1)) >= 3, nz(regr_slope(col("cnt"), col("x")))).otherwise(0.0)
          .as("temporal_frequency_trend"),
        when(count(lit(1)) >= 3, nz(abs(corr(col("x"), col("cnt"))))).otherwise(0.0)
          .as("temporal_frequency_trend_strength"))
  }
}
