package graft.queries

import graft.ops.{Clustering, CoreFeatures => F}
import graft.scale.Multimodal
import graft.scoring.Risk
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Explanations, per-group DBSCAN, and the multimodal binary pipeline
  * (SURVEY W6, A31, plus the training-pipeline media path).
  */
object ServingQueries extends QueryPack {

  /** DuckDB CTE computing the serving feature view over `events` —
    * shared by every oracle that re-derives the [[Risk.model]] columns
    * (q39 explanations, q164 attribution).
    */
  private val featureCteSql: String = {
    val w = Map("w60s" -> 60000000L, "w5m" -> 300000000L, "w10m" -> 600000000L,
      "w1h" -> 3600000000L, "w24h" -> 86400000000L, "w7d" -> 604800000000L)
      .map { case (a, m) =>
        s"$a AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN ${m - 1} PRECEDING AND CURRENT ROW)"
      }.mkString(", ")
    s"""f AS (
  SELECT event_id AS transaction_id, user_id AS customer_id,
    sum(value) OVER w60s AS txn_amount_sum_60s,
    sum(value) OVER w5m AS txn_amount_sum_5m,
    sum(value) OVER w1h AS txn_amount_sum_1h,
    count(*) OVER w60s AS txn_count_60s,
    count(*) OVER w5m AS txn_count_5m,
    count(*) OVER w10m AS txn_count_10m,
    count(*) OVER w1h AS txn_count_1h,
    count(DISTINCT props->>'$$.k') OVER w1h AS unique_ips_1h,
    count(DISTINCT event_type) OVER w1h AS unique_merchants_1h,
    (count(*) OVER w1h) / 60.0 AS velocity_score_1h,
    coalesce(stddev_pop(value) OVER w1h, 0.0) AS amount_deviation_score_1h,
    sum(CASE WHEN hour(ts) < 6 OR hour(ts) > 22 THEN 1 ELSE 0 END) OVER w24h AS night_txn_count_24h,
    sum(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) OVER w7d AS weekend_txn_count_7d,
    avg(value) OVER w1h AS avg_txn_amount_1h
  FROM events WINDOW $w)"""
  }

  override val defs: Map[String, Q] = Map(
    // feature catalog (the feast registry surface, feature_repo/
    // definitions.py: FeatureView declarations with entity / TTL /
    // field / dtype): rows derive from the ACTUAL serving-view schemas
    // (customerFeatures / merchantFeatures applied to the live
    // transaction frame), so this query is the schema CONTRACT — a
    // renamed or retyped serving column flips the hash and fails the
    // correctness gate, exactly what a registry is for. The reference's
    // three FeatureView groupings are preserved as view_name.
    "q215_feature_catalog" -> { (s, dir) =>
      graft.schema.FeatureRegistry.catalog(Tables.transactions(s, dir))
    },
    // feature-freshness / staleness report (the pipeline-lag surface of
    // the reference's monitoring loop, scripts/monitoring.py, minus
    // psutil): per customer, staleness = corpus max event time minus the
    // customer's last event; bucketed SLA histogram with shares and
    // per-bucket moments, plus the exact global p50/p95 staleness — the
    // view an online feature store alerts on. One groupBy(customer) +
    // tiny broadcast aggregates.
    "q213_feature_freshness" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val b = ev.agg(max(unix_micros(col("ts"))).as("max_tm"))
      val st = ev.groupBy(col("user_id").as("customer_id"))
        .agg(max(unix_micros(col("ts"))).as("last_tm"))
        .crossJoin(broadcast(b))
        .select((col("max_tm") - col("last_tm")).as("us"))
        .select(col("us"), (col("us") / lit(1000000.0)).as("stale_s"),
          when(col("us") < 3600000000L, "lt_1h")
            .when(col("us") < 86400000000L, "lt_24h")
            .when(col("us") < 604800000000L, "lt_7d")
            .otherwise("stale").as("bucket"))
        .localCheckpoint() // histogram + totals + percentiles re-read it
      val tot = st.agg(count(lit(1)).cast("double").as("__t"),
        expr("percentile(stale_s, array(0.5D, 0.95D))").as("__p"))
      st.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_customers"),
          r6(avg(col("stale_s"))).as("avg_staleness_s"),
          r6(max(col("stale_s"))).as("max_staleness_s"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_customers"),
          r6(col("n_customers") / col("__t")).as("share"),
          col("avg_staleness_s"), col("max_staleness_s"),
          r6(col("__p").getItem(0)).as("p50_s"),
          r6(col("__p").getItem(1)).as("p95_s"))
    },
    "q39_explanations" -> { (s, dir) =>
      // scalar (comma-joined) so the driver's sort+hash compare can handle
      // the column — arrays are unhashable on the oracle side
      F.customerFeatures(Tables.transactions(s, dir))
        .select(col("transaction_id"), col("customer_id"),
          array_join(Risk.explanation, ",").as("explanation"))
    },
    // dataset-level SHAP-style attribution: closed-form for the linear
    // model, one aggregate pass (scoring/Attribution.scala)
    "q164_attribution" -> { (s, dir) =>
      graft.scoring.Attribution.report(
          F.customerFeatures(Tables.transactions(s, dir)))
        .select(col("feature"),
          r6(col("mean_abs_contribution")).as("mean_abs_contribution"),
          r6(col("share")).as("share"))
    },
    // oracle: eps-graph components via recursive CTE
    // (GraphOracles.dbscanSql); ClusteringSpec pins sklearn parity on a
    // hand fixture independently.
    "q41_dbscan" -> { (s, dir) =>
      Clustering.dbscanFeatures(Tables.transactions(s, dir))
        .select(col("customer_id"),
          r6(col("behavioral_outlier_ratio")).as("behavioral_outlier_ratio"),
          col("behavioral_n_clusters"))
    },
    "q43_auc_drift" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      graft.feedback.Drift.aucDriftWindowed(ev,
          col("event_type") === "error", col("value"), col("ts"))
        .select(r6(col("auc_recent")).as("auc_recent"),
          r6(col("auc_prior")).as("auc_prior"),
          col("n_recent"), col("n_prior"),
          r6(col("degradation")).as("degradation"),
          col("drift_detected"))
    },
    "q42_percentiles" -> { (s, dir) =>
      // W10: p50/p95/p99 summary per group. Exact `percentile` (linear
      // interpolation — same convention as DuckDB quantile_cont); the
      // 100 TB path swaps in percentile_approx behind the same shape.
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("p"),
          count(lit(1)).as("cnt"))
        .select(col("event_type"),
          r6(col("p").getItem(0)).as("p50"),
          r6(col("p").getItem(1)).as("p95"),
          r6(col("p").getItem(2)).as("p99"),
          col("cnt"))
    },
    "q40_multimodal" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaTable(Tables.documents(s, dir))
      val exprFeats = media.select(
        col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        md5(col("media")).as("media_md5"),
        md5(substring(col("media"), 1, 64)).as("thumb_md5"))
      val decoded = Multimodal.extractFeatures(
        media.select(col("doc_id"), col("media"), col("meta.format").as("format"))
          .as[Multimodal.MediaRow])
      exprFeats.join(decoded.toDF(), "doc_id")
        .select(col("doc_id"), col("n_bytes"), col("media_md5"), col("thumb_md5"),
          r6(col("byte_mean")).as("byte_mean"), col("byte_max").cast("long").as("byte_max"),
          col("n_frames"))
    },
    "q72_frame_sample" -> { (s, dir) =>
      // every-2nd 256-byte frame of each payload; frame_bytes reports the
      // ACTUAL sliced length, which the oracle recomputes arithmetically
      // from octet_length — an off-by-one in the binary substring would
      // surface as a mismatch on every tail frame
      Multimodal.sampleFrames(
          Multimodal.mediaTable(Tables.documents(s, dir)), 256, 2)
        .select(col("doc_id"), col("frame_idx"), col("frame_bytes"))
    })

  override val oracle: Map[String, String] = Map(
    "q215_feature_catalog" -> {
      // the EXPECTED contract, hardcoded independently of the engine's
      // schemas — dtype drift on either side breaks the hash
      val rows = Seq(
        ("customer_transaction_features", "customer_id",
          Seq("txn_amount_sum_60s" -> "double", "txn_amount_sum_5m" -> "double",
            "txn_amount_sum_1h" -> "double", "txn_count_60s" -> "bigint",
            "txn_count_5m" -> "bigint", "txn_count_10m" -> "bigint",
            "txn_count_1h" -> "bigint", "unique_merchants_1h" -> "bigint",
            "avg_txn_amount_1h" -> "double", "max_txn_amount_1h" -> "double")),
        ("customer_behavioral_features", "customer_id",
          Seq("unique_ips_1h" -> "bigint", "night_txn_count_24h" -> "bigint",
            "weekend_txn_count_7d" -> "bigint", "velocity_score_1h" -> "double",
            "amount_deviation_score_1h" -> "double")),
        ("merchant_transaction_features", "merchant_id",
          Seq("merchant_txn_count_1h" -> "bigint",
            "merchant_txn_amount_sum_1h" -> "double",
            "merchant_unique_customers_1h" -> "bigint",
            "merchant_avg_txn_amount_1h" -> "double")))
      val vals = rows.flatMap { case (view, entity, fields) =>
        fields.map { case (f, dt) =>
          s"('$view', '$entity', CAST(24 AS BIGINT), '$f', '$dt')"
        }
      }.mkString(",\n  ")
      s"""SELECT * FROM (VALUES
  $vals) AS t(view_name, entity, ttl_hours, field, dtype)"""
    },
    "q213_feature_freshness" ->
      """WITH b AS (SELECT max(epoch_us(ts)) AS max_tm FROM events),
st AS (
  SELECT max_tm - max(epoch_us(ts)) AS us,
    (max_tm - max(epoch_us(ts))) / 1000000.0 AS stale_s
  FROM events CROSS JOIN b GROUP BY user_id, max_tm),
bk AS (
  SELECT CASE WHEN us < 3600000000 THEN 'lt_1h'
              WHEN us < 86400000000 THEN 'lt_24h'
              WHEN us < 604800000000 THEN 'lt_7d'
              ELSE 'stale' END AS bucket, stale_s
  FROM st),
tot AS (SELECT count(*)::DOUBLE AS t,
  quantile_cont(stale_s, 0.5) AS p50, quantile_cont(stale_s, 0.95) AS p95 FROM bk)
SELECT bucket, count(*) AS n_customers,
  round(count(*) / tot.t + 5e-11, 4) AS share,
  round(avg(stale_s) + 5e-11, 4) AS avg_staleness_s,
  round(max(stale_s) + 5e-11, 4) AS max_staleness_s,
  round(tot.p50 + 5e-11, 4) AS p50_s,
  round(tot.p95 + 5e-11, 4) AS p95_s
FROM bk CROSS JOIN tot
GROUP BY bucket, tot.t, tot.p50, tot.p95""",
    "q41_dbscan" -> GraphOracles.dbscanSql,
    "q72_frame_sample" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
f AS (SELECT doc_id, n_bytes, unnest(range(0, ((n_bytes + 255) // 256))) AS frame_idx
      FROM m WHERE n_bytes > 0)
SELECT doc_id, frame_idx::BIGINT AS frame_idx,
  least(256, n_bytes - frame_idx*256)::BIGINT AS frame_bytes
FROM f WHERE frame_idx % 2 = 0""",
    "q164_attribution" ->
      s"""WITH $featureCteSql,
a AS (SELECT
    ${Risk.model.map { case (f, wgt, norm) =>
        s"avg(abs(least($f / $norm, 1.0) * $wgt)) AS $f" }.mkString(",\n    ")}
  FROM f),
u AS (
  ${Risk.model.map { case (f, _, _) =>
        s"SELECT '$f' AS feature, $f AS m FROM a" }.mkString("\n  UNION ALL ")}),
t AS (SELECT sum(m) AS tot FROM u)
SELECT feature, round(m + 5e-11, 4) AS mean_abs_contribution,
  round(CASE WHEN tot > 0 THEN m / tot ELSE 0.0 END + 5e-11, 4) AS share
FROM u, t""",
    "q39_explanations" -> {
      val entries = Risk.model.map { case (f, wgt, norm) =>
        s"{'c': -least($f / $norm, 1.0) * $wgt, 'n': '$f'}"
      }.mkString(",\n      ")
      s"""WITH $featureCteSql
SELECT transaction_id, customer_id,
  coalesce(array_to_string(list_transform(
    list_filter(
      list_sort([
      $entries])[1:3],
      x -> x.c < -0.05),
    x -> x.n), ','), '') AS explanation
FROM f"""
    },
    "q43_auc_drift" ->
      """WITH b AS (SELECT max(epoch_us(ts)) AS max_tm FROM events),
t AS (
  SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y, value AS s,
    CASE WHEN epoch_us(ts) > max_tm - 604800000000 THEN 'recent'
         WHEN epoch_us(ts) > max_tm - 1209600000000 THEN 'prior' END AS period
  FROM events CROSS JOIN b),
tt AS (SELECT * FROM t WHERE period IS NOT NULL),
r AS (SELECT period, y,
    rank() OVER (PARTITION BY period ORDER BY s) + (count(*) OVER (PARTITION BY period, s) - 1)/2.0 AS midrank
  FROM tt),
pp AS (SELECT period,
    (sum(CASE WHEN y = 1 THEN midrank END) - sum(y)*(sum(y) + 1)/2.0)
      / (sum(y)*(count(*) - sum(y))) AS auc,
    count(*) AS n
  FROM r GROUP BY period)
SELECT round(rec.auc+ 5e-11, 4) AS auc_recent, round(pri.auc+ 5e-11, 4) AS auc_prior,
  rec.n AS n_recent, pri.n AS n_prior,
  round(pri.auc - rec.auc+ 5e-11, 4) AS degradation,
  (rec.n + pri.n >= 50 AND rec.n >= 20 AND pri.n >= 20 AND pri.auc - rec.auc > 0.05) AS drift_detected
FROM (SELECT * FROM pp WHERE period = 'recent') rec
CROSS JOIN (SELECT * FROM pp WHERE period = 'prior') pri""",
    "q42_percentiles" ->
      """SELECT event_type,
  round(quantile_cont(value, 0.5)+ 5e-11, 4) AS p50,
  round(quantile_cont(value, 0.95)+ 5e-11, 4) AS p95,
  round(quantile_cont(value, 0.99)+ 5e-11, 4) AS p99,
  count(*) AS cnt
FROM events GROUP BY event_type""",
    "q40_multimodal" ->
      """WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c FROM documents),
st AS (SELECT doc_id, avg(unicode(c)) AS byte_mean, max(unicode(c)) AS byte_max FROM ch GROUP BY doc_id)
SELECT d.doc_id,
  octet_length(encode(d.text)) AS n_bytes,
  md5(d.text) AS media_md5,
  md5(substr(d.text, 1, 64)) AS thumb_md5,
  round(st.byte_mean+ 5e-11, 4) AS byte_mean,
  st.byte_max::BIGINT AS byte_max,
  (octet_length(encode(d.text)) + 255) // 256 AS n_frames
FROM documents d JOIN st USING (doc_id)""")
}
