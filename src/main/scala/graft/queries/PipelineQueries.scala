package graft.queries

import graft.pit.PointInTime
import graft.schema.FeatureViews
import graft.ops.Trailing
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Point-in-time training construction and the full-width FeatureView
  * backfill (SURVEY J2, §3.3, A1–A14 across all six windows).
  */
object PipelineQueries extends QueryPack {

  private val pitWindows = Seq("1h" -> 3600L, "24h" -> 86400L)

  override val defs: Map[String, Q] = Map(
    "q36_pit_training" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val events = ev.select(col("user_id").as("key"),
        unix_micros(col("ts")).as("ts_micros"), col("value").as("amount"))
      // decoupled label probes: every 10th event, 30 minutes later
      val probes = ev.where(col("event_id") % 10 === 0)
        .select(col("event_id").as("probe_id"), col("user_id").as("key"),
          (unix_micros(col("ts")) + lit(1800000000L)).as("ts_micros"))
      PointInTime.asOfFeatures(events, probes, pitWindows)
        .select(col("probe_id"), col("key").as("customer_id"),
          col("txn_count_1h"),
          r6(col("txn_amount_sum_1h")).as("txn_amount_sum_1h"),
          col("txn_count_24h"),
          r6(col("txn_amount_sum_24h")).as("txn_amount_sum_24h"))
    },
    "q51_asof_join" -> { (s, dir) =>
      // row-returning as-of join: each probe (30 min before every 7th
      // event) picks up the customer's latest event at-or-before it;
      // probes before a customer's first event stay unmatched
      val ev = Tables.events(s, dir)
      val events = ev.select(col("user_id").as("key"),
        unix_micros(col("ts")).as("tm"), col("value"), col("event_id"))
      val probes = ev.where(col("event_id") % 7 === 0)
        .select(col("event_id").as("probe_id"), col("user_id").as("key"),
          (unix_micros(col("ts")) - lit(1800000000L)).as("tm"))
      graft.ops.AsOf.lastEventAsOf(events, probes, Seq("value", "event_id"))
        .select(col("probe_id"), col("key").as("customer_id"),
          coalesce(col("event_id"), lit(-1L)).as("matched_event_id"),
          r6(coalesce(col("value"), lit(0.0))).as("last_value"),
          col("event_id").isNotNull.as("matched"))
    },
    "q151_asof_tolerance" -> { (s, dir) =>
      // tolerance-bounded as-of (merge_asof semantics): same probes as
      // q51, but a match more than 1h older than the probe goes stale
      val ev = Tables.events(s, dir)
      val events = ev.select(col("user_id").as("key"),
        unix_micros(col("ts")).as("tm"), col("value"), col("event_id"))
      val probes = ev.where(col("event_id") % 7 === 0)
        .select(col("event_id").as("probe_id"), col("user_id").as("key"),
          (unix_micros(col("ts")) - lit(1800000000L)).as("tm"))
      graft.ops.AsOf.lastEventAsOfTol(events, probes, Seq("value", "event_id"),
          tolerance = 3600000000L)
        .select(col("probe_id"), col("key").as("customer_id"),
          coalesce(col("event_id"), lit(-1L)).as("matched_event_id"),
          r6(coalesce(col("value"), lit(0.0))).as("last_value"),
          col("event_id").isNotNull.as("matched"))
    },
    // oracle: recursive-CTE reachability (GraphOracles.communitiesSql)
    "q49_communities" -> { (s, dir) =>
      graft.ops.GraphOps.communities(Tables.transactions(s, dir))
        .select(col("customer_id"), col("component_id"), col("component_size"))
    },
    // oracle: bounded-BFS distances + layer-unrolled Brandes
    // (GraphOracles.centralitiesSql); CentralitySpec pins the algorithm
    // on a hand-computed graph independently.
    "q38_centralities" -> { (s, dir) =>
      graft.ops.Centrality.customerCentralities(Tables.transactions(s, dir))
        .select(col("customer_id"),
          r6(col("graph_closeness_centrality")).as("graph_closeness_centrality"),
          r6(col("graph_betweenness_centrality")).as("graph_betweenness_centrality"))
    },
    "q37_full_features" -> { (s, dir) =>
      // the shared windowView + oracle rounding; the two projections
      // collapse into one, so the plan (and its bits) are unchanged
      val roundCols = for {
        (wName, _) <- FeatureViews.windows6
        kind <- FeatureViews.kinds
      } yield {
        val named = kind.featureName(wName)
        (if (kind.double) r6(col(named)) else col(named)).as(named)
      }
      FeatureViews.windowView(Tables.transactions(s, dir))
        .select(col("transaction_id") +: col("customer_id") +: roundCols: _*)
    })

  override val oracle: Map[String, String] = Map(
    "q151_asof_tolerance" ->
      """WITH probes AS (
  SELECT event_id AS probe_id, user_id, epoch_us(ts) - 1800000000 AS tm
  FROM events WHERE event_id % 7 = 0),
e AS (SELECT user_id, epoch_us(ts) AS tm, value, event_id FROM events),
j AS (SELECT p.probe_id, p.user_id, p.tm, e.tm AS etm, e.value, e.event_id
      FROM probes p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.tm >= e.tm)
SELECT probe_id, user_id AS customer_id,
  coalesce(CASE WHEN etm >= tm - 3600000000 THEN event_id END, -1) AS matched_event_id,
  round(coalesce(CASE WHEN etm >= tm - 3600000000 THEN value END, 0.0) + 5e-11, 4) AS last_value,
  coalesce(etm >= tm - 3600000000, FALSE) AS matched
FROM j""",
    "q51_asof_join" ->
      """WITH probes AS (
  SELECT event_id AS probe_id, user_id, epoch_us(ts) - 1800000000 AS tm
  FROM events WHERE event_id % 7 = 0),
e AS (SELECT user_id, epoch_us(ts) AS tm, value, event_id FROM events)
SELECT p.probe_id, p.user_id AS customer_id,
  coalesce(e.event_id, -1) AS matched_event_id,
  round(coalesce(e.value, 0.0) + 5e-11, 4) AS last_value,
  e.event_id IS NOT NULL AS matched
FROM probes p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.tm >= e.tm""",
    "q49_communities" -> GraphOracles.communitiesSql,
    "q38_centralities" -> GraphOracles.centralitiesSql(),
    "q36_pit_training" ->
      """WITH probes AS (
  SELECT event_id AS probe_id, user_id, epoch_us(ts) + 1800000000 AS tm FROM events WHERE event_id % 10 = 0),
u AS (
  SELECT user_id, epoch_us(ts) AS tm, value AS amount, NULL::BIGINT AS probe_id FROM events
  UNION ALL
  SELECT user_id, tm, NULL::DOUBLE, probe_id FROM probes),
f AS (
  SELECT user_id, probe_id,
    count(amount) OVER w1h AS txn_count_1h,
    coalesce(sum(amount) OVER w1h, 0.0) AS txn_amount_sum_1h,
    count(amount) OVER w24h AS txn_count_24h,
    coalesce(sum(amount) OVER w24h, 0.0) AS txn_amount_sum_24h
  FROM u
  WINDOW w1h AS (PARTITION BY user_id ORDER BY tm RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW),
         w24h AS (PARTITION BY user_id ORDER BY tm RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW))
SELECT probe_id, user_id AS customer_id, txn_count_1h,
  round(txn_amount_sum_1h+ 5e-11, 4) AS txn_amount_sum_1h,
  txn_count_24h,
  round(txn_amount_sum_24h+ 5e-11, 4) AS txn_amount_sum_24h
FROM f WHERE probe_id IS NOT NULL""",
    "q37_full_features" -> {
      val winDefs = FeatureViews.windows6.map { case (wName, secs) =>
        s"w$wName AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN ${secs * 1000000L - 1} PRECEDING AND CURRENT ROW)"
      }.mkString(",\n       ")
      val exprs = (for {
        (wName, secs) <- FeatureViews.windows6
        kind <- FeatureViews.kinds
      } yield {
        val e = FeatureViews.sqlExpr(kind, s"w$wName", secs)
        val named = kind.featureName(wName)
        if (kind.double) s"round($e+ 5e-11, 4) AS $named" else s"$e AS $named"
      }).mkString(",\n  ")
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  $exprs
FROM events
WINDOW $winDefs"""
    })
}
