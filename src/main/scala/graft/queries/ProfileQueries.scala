package graft.queries

import graft.ops.{Behavioral, Distribution, Temporal}
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Per-entity full-history profile aggregates (SURVEY A15–A30) with
  * DuckDB oracles. Keys: one output row per customer.
  */
object ProfileQueries extends QueryPack {

  override val defs: Map[String, Q] = Map(
    "q09_gini" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      Distribution.gini(tx, col("customer_id"), col("amount"), col("transaction_id"))
        .select(col("k").as("customer_id"), r6(col("gini")).as("amount_gini"))
    },
    "q10_entropy" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val hour_e = Distribution.entropy(tx, col("customer_id"), hour(col("event_timestamp")), "temporal_hour_entropy")
      val dow_e = Distribution.entropy(tx, col("customer_id"), dayofweek(col("event_timestamp")), "temporal_dow_entropy")
      val peak = Distribution.peakRatio(tx, col("customer_id"), hour(col("event_timestamp")), "temporal_peak_hour_ratio")
      hour_e.join(dow_e, "k").join(peak, "k")
        .select(col("k").as("customer_id"),
          r6(col("temporal_hour_entropy")).as("temporal_hour_entropy"),
          r6(col("temporal_dow_entropy")).as("temporal_dow_entropy"),
          r6(col("temporal_peak_hour_ratio")).as("temporal_peak_hour_ratio"))
    },
    "q11_hhi" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      Distribution.hhi(tx, col("customer_id"), col("merchant_id"), "behavioral_merchant_hhi")
        .select(col("k").as("customer_id"), r6(col("behavioral_merchant_hhi")).as("behavioral_merchant_hhi"))
    },
    "q12_interarrival" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      Temporal.interarrival(tx, col("customer_id"), col("event_timestamp"), col("transaction_id"))
        .select(col("k").as("customer_id"),
          r6(col("temporal_avg_interval")).as("temporal_avg_interval"),
          r6(col("temporal_std_interval")).as("temporal_std_interval"),
          r6(col("temporal_min_interval")).as("temporal_min_interval"),
          r6(col("temporal_max_interval")).as("temporal_max_interval"),
          r6(col("temporal_regularity")).as("temporal_regularity"),
          r6(col("temporal_burst_ratio")).as("temporal_burst_ratio"))
    },
    "q13_trends" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val a = Temporal.amountTrend(tx, col("customer_id"), col("event_timestamp"), col("transaction_id"), col("amount"))
      val f = Temporal.frequencyTrend(tx, col("customer_id"), col("event_timestamp"))
      a.join(f, "k")
        .select(col("k").as("customer_id"),
          r6(col("temporal_amount_trend")).as("temporal_amount_trend"),
          r6(col("temporal_amount_trend_strength")).as("temporal_amount_trend_strength"),
          r6(col("temporal_frequency_trend")).as("temporal_frequency_trend"),
          r6(col("temporal_frequency_trend_strength")).as("temporal_frequency_trend_strength"))
    },
    "q45_window_gini_hhi" -> { (s, dir) =>
      // native buffer aggregates (FunctionsSpec proves them equal to the
      // HOF forms) — the HOF versions materialize+sort an array per row
      // and were ~4x slower at sf0.1
      graft.functions.GraftFunctions.register(s)
      val tx = Tables.transactions(s, dir)
      val w = graft.ops.Trailing.spec(col("customer_id"), col("event_timestamp"))
      val frame = graft.ops.Trailing.lastSeconds(w, 604800L)
      tx.select(col("transaction_id"), col("customer_id"),
        r6(expr("gini_agg(amount)").over(frame)).as("amount_gini_7d"),
        r6(expr("hhi_agg(merchant_id)").over(frame)).as("merchant_hhi_7d"))
    },
    "q14_behavioral" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      Behavioral.profile(tx, col("customer_id"), col("amount"), col("merchant_id"))
        .select(col("k").as("customer_id"),
          r6(col("behavioral_amount_zscore")).as("behavioral_amount_zscore"),
          r6(col("behavioral_amount_percentile")).as("behavioral_amount_percentile"),
          r6(col("behavioral_amount_cv")).as("behavioral_amount_cv"),
          r6(col("behavioral_amount_skewness")).as("behavioral_amount_skewness"),
          r6(col("behavioral_amount_kurtosis")).as("behavioral_amount_kurtosis"),
          r6(col("behavioral_merchant_diversity")).as("behavioral_merchant_diversity"))
    })

  override val oracle: Map[String, String] = Map(
    "q09_gini" ->
      """WITH r AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS i
  FROM events)
SELECT user_id AS customer_id,
  round(CASE WHEN count(*) > 1 AND sum(value) > 0
    THEN 2.0*sum(i*value)/(count(*)*sum(value)) - (count(*)+1.0)/count(*)
    ELSE 0.0 END+ 5e-11, 4) AS amount_gini
FROM r GROUP BY user_id""",
    "q10_entropy" ->
      """WITH hh AS (SELECT user_id, hour(ts) AS b, count(*) AS cnt FROM events GROUP BY 1, 2),
ht AS (SELECT user_id, cnt, sum(cnt) OVER (PARTITION BY user_id) AS tot FROM hh),
he AS (SELECT user_id, CASE WHEN count(*) <= 1 THEN 0.0
         ELSE -sum(cnt/tot*log2(cnt/tot)) END AS hour_e,
       max(cnt)::DOUBLE / max(tot) AS peak
       FROM ht GROUP BY user_id),
dd AS (SELECT user_id, isodow(ts) AS b, count(*) AS cnt FROM events GROUP BY 1, 2),
dt AS (SELECT user_id, cnt, sum(cnt) OVER (PARTITION BY user_id) AS tot FROM dd),
de AS (SELECT user_id, CASE WHEN count(*) <= 1 THEN 0.0
         ELSE -sum(cnt/tot*log2(cnt/tot)) END AS dow_e
       FROM dt GROUP BY user_id)
SELECT he.user_id AS customer_id,
  round(he.hour_e+ 5e-11, 4) AS temporal_hour_entropy,
  round(de.dow_e+ 5e-11, 4) AS temporal_dow_entropy,
  round(he.peak+ 5e-11, 4) AS temporal_peak_hour_ratio
FROM he JOIN de USING (user_id)""",
    "q11_hhi" ->
      """WITH m AS (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2),
t AS (SELECT user_id, cnt, sum(cnt) OVER (PARTITION BY user_id) AS tot FROM m)
SELECT user_id AS customer_id,
  round(sum(pow(cnt/tot, 2.0))+ 5e-11, 4) AS behavioral_merchant_hhi
FROM t GROUP BY user_id""",
    "q12_interarrival" ->
      """WITH d AS (
  SELECT user_id,
    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) / 1e6 AS diff
  FROM events)
SELECT user_id AS customer_id,
  round(coalesce(avg(diff), 0.0)+ 5e-11, 4) AS temporal_avg_interval,
  round(coalesce(stddev_samp(diff), 0.0)+ 5e-11, 4) AS temporal_std_interval,
  round(coalesce(min(diff), 0.0)+ 5e-11, 4) AS temporal_min_interval,
  round(coalesce(max(diff), 0.0)+ 5e-11, 4) AS temporal_max_interval,
  round(CASE WHEN avg(diff) > 0 THEN coalesce(stddev_samp(diff), 0.0)/avg(diff) ELSE 0.0 END+ 5e-11, 4) AS temporal_regularity,
  round(coalesce(avg(CASE WHEN diff < 300 THEN 1.0 ELSE 0.0 END), 0.0)+ 5e-11, 4) AS temporal_burst_ratio
FROM d GROUP BY user_id""",
    "q13_trends" ->
      """WITH i AS (
  SELECT user_id, value,
    (row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) - 1)::DOUBLE AS x
  FROM events),
a AS (
  SELECT user_id,
    CASE WHEN count(*) >= 3 THEN coalesce(regr_slope(value, x), 0.0) ELSE 0.0 END AS amt_trend,
    CASE WHEN count(*) >= 3 THEN coalesce(abs(corr(x, value)), 0.0) ELSE 0.0 END AS amt_strength
  FROM i GROUP BY user_id),
d AS (SELECT user_id, cast(ts AS DATE) AS dt, count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
di AS (SELECT user_id, cnt,
    (row_number() OVER (PARTITION BY user_id ORDER BY dt) - 1)::DOUBLE AS x FROM d),
f AS (
  SELECT user_id,
    CASE WHEN count(*) >= 3 THEN coalesce(regr_slope(cnt, x), 0.0) ELSE 0.0 END AS freq_trend,
    CASE WHEN count(*) >= 3 THEN coalesce(abs(corr(x, cnt)), 0.0) ELSE 0.0 END AS freq_strength
  FROM di GROUP BY user_id)
SELECT a.user_id AS customer_id,
  round(a.amt_trend+ 5e-11, 4) AS temporal_amount_trend,
  round(a.amt_strength+ 5e-11, 4) AS temporal_amount_trend_strength,
  round(f.freq_trend+ 5e-11, 4) AS temporal_frequency_trend,
  round(f.freq_strength+ 5e-11, 4) AS temporal_frequency_trend_strength
FROM a JOIN f USING (user_id)""",
    "q45_window_gini_hhi" ->
      """WITH j AS (
  SELECT e1.event_id, e1.user_id, e2.value AS v, e2.event_type AS m
  FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id
    AND epoch_us(e2.ts) <= epoch_us(e1.ts)
    AND epoch_us(e2.ts) > epoch_us(e1.ts) - 604800000000),
r AS (SELECT event_id, v,
    row_number() OVER (PARTITION BY event_id ORDER BY v) AS i,
    count(*) OVER (PARTITION BY event_id) AS n,
    sum(v) OVER (PARTITION BY event_id) AS s
  FROM j),
g AS (SELECT event_id,
    CASE WHEN max(n) > 1 AND max(s) > 0
      THEN 2.0*sum(i*v)/(max(n)*max(s)) - (max(n)+1.0)/max(n) ELSE 0.0 END AS gini
  FROM r GROUP BY event_id),
mc AS (SELECT event_id, m, count(*) AS cnt FROM j GROUP BY 1, 2),
mt AS (SELECT event_id, cnt, sum(cnt) OVER (PARTITION BY event_id) AS tot FROM mc),
h AS (SELECT event_id, sum((cnt::DOUBLE/tot)*(cnt::DOUBLE/tot)) AS hhi FROM mt GROUP BY event_id)
SELECT e.event_id AS transaction_id, e.user_id AS customer_id,
  round(g.gini + 5e-11, 4) AS amount_gini_7d,
  round(h.hhi + 5e-11, 4) AS merchant_hhi_7d
FROM events e JOIN g ON e.event_id = g.event_id JOIN h ON e.event_id = h.event_id""",
    "q14_behavioral" ->
      """WITH per AS (
  SELECT user_id, avg(value) AS mu, stddev_pop(value) AS sd, count(*) AS n FROM events GROUP BY 1),
m AS (
  SELECT e.user_id,
    avg(pow(e.value - p.mu, 2)) AS m2,
    avg(pow(e.value - p.mu, 3)) AS m3,
    avg(pow(e.value - p.mu, 4)) AS m4,
    count(DISTINCT e.event_type)::DOUBLE / count(*) AS diversity
  FROM events e JOIN per p USING (user_id) GROUP BY e.user_id),
pop AS (SELECT avg(value) AS pop_avg, stddev_pop(value) AS pop_std, count(*) AS pop_n FROM events),
pct AS (
  SELECT p.user_id,
    sum(CASE WHEN e.value < p.mu THEN 1 ELSE 0 END) AS n_lt,
    sum(CASE WHEN e.value <= p.mu THEN 1 ELSE 0 END) AS n_le
  FROM events e CROSS JOIN per p GROUP BY p.user_id)
SELECT per.user_id AS customer_id,
  round(CASE WHEN pop.pop_std > 0 THEN (per.mu - pop.pop_avg)/pop.pop_std ELSE 0.0 END+ 5e-11, 4) AS behavioral_amount_zscore,
  round((pct.n_lt + pct.n_le)/(2.0*pop.pop_n)+ 5e-11, 4) AS behavioral_amount_percentile,
  round(CASE WHEN per.mu > 0 THEN coalesce(per.sd, 0.0)/per.mu ELSE 0.0 END+ 5e-11, 4) AS behavioral_amount_cv,
  round(CASE WHEN per.n >= 3 AND m.m2 > 0 THEN m.m3/pow(m.m2, 1.5) ELSE 0.0 END+ 5e-11, 4) AS behavioral_amount_skewness,
  round(CASE WHEN per.n >= 3 AND m.m2 > 0 THEN m.m4/pow(m.m2, 2) - 3.0 ELSE 0.0 END+ 5e-11, 4) AS behavioral_amount_kurtosis,
  round(m.diversity+ 5e-11, 4) AS behavioral_merchant_diversity
FROM per JOIN m USING (user_id) JOIN pct USING (user_id) CROSS JOIN pop""")
}
