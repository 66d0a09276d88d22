package graft.queries

import graft.ops.{CoreFeatures => F, Trailing}
import graft.scoring.Risk
import graft.tables.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core per-entity trailing-window features (SURVEY §2.3 A1–A14) and the
  * end-to-end risk pipeline (A32–A34), with DuckDB oracles.
  *
  * Oracle frames mirror [[graft.ops.Trailing]]: strict (t-W, t] as
  * `RANGE BETWEEN W*1e6-1 PRECEDING AND CURRENT ROW` over `epoch_us(ts)`.
  */
object CoreQueries extends QueryPack {

  private def win(alias: String, micros: Long): String =
    s"$alias AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN ${micros - 1} PRECEDING AND CURRENT ROW)"

  private val W = Map(
    "w60s" -> 60000000L, "w5m" -> 300000000L, "w10m" -> 600000000L,
    "w1h" -> 3600000000L, "w24h" -> 86400000000L, "w7d" -> 604800000000L)

  private def windowClause(names: String*): String =
    "WINDOW " + names.map(n => win(n, W(n))).mkString(", ")

  /** The full Risk.model feature frame as an oracle CTE — shared by the
    * q08 scoring mirror and the q161 importance mirror. MATERIALIZED so a
    * multi-referencing consumer cannot re-run the six window frames.
    */
  private lazy val featureCte: String =
    s"""f AS MATERIALIZED (
  SELECT event_id AS transaction_id, user_id AS customer_id, value AS amount,
    event_type,
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
  FROM events ${windowClause("w60s", "w5m", "w10m", "w1h", "w24h", "w7d")})"""

  override val defs: Map[String, Q] = Map(
    "q01_txn_counts" -> { (s, dir) =>
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      Tables.transactions(s, dir).select(
        col("transaction_id"), col("customer_id"),
        F.txnCount(w, 60).as("txn_count_60s"),
        F.txnCount(w, 300).as("txn_count_5m"),
        F.txnCount(w, 3600).as("txn_count_1h"))
    },
    "q02_amount_sums" -> { (s, dir) =>
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      Tables.transactions(s, dir).select(
        col("transaction_id"), col("customer_id"),
        r6(F.amountSum(col("amount"), w, 60)).as("txn_amount_sum_60s"),
        r6(F.amountSum(col("amount"), w, 300)).as("txn_amount_sum_5m"),
        r6(F.amountSum(col("amount"), w, 3600)).as("txn_amount_sum_1h"))
    },
    "q03_amount_stats" -> { (s, dir) =>
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      Tables.transactions(s, dir).select(
        col("transaction_id"), col("customer_id"),
        r6(F.amountAvg(col("amount"), w, 3600)).as("avg_txn_amount_1h"),
        r6(F.amountMax(col("amount"), w, 3600)).as("max_txn_amount_1h"),
        r6(F.amountMin(col("amount"), w, 3600)).as("min_txn_amount_1h"))
    },
    "q04_amount_std" -> { (s, dir) =>
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      Tables.transactions(s, dir).select(
        col("transaction_id"), col("customer_id"),
        r6(F.amountStdPop(col("amount"), w, 3600)).as("amount_deviation_score_1h"))
    },
    "q05_unique_counts" -> { (s, dir) =>
      // native TypedImperativeAggregate (graft.functions.ExactDistinct)
      // instead of the size(collect_set) workaround — same values, no
      // per-row array materialization
      graft.functions.GraftFunctions.register(s)
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      Tables.transactions(s, dir).select(
        col("transaction_id"), col("customer_id"),
        expr("exact_distinct(ip_address)").over(Trailing.lastSeconds(w, 3600)).as("unique_ips_1h"),
        expr("exact_distinct(merchant_id)").over(Trailing.lastSeconds(w, 3600)).as("unique_merchants_1h"))
    },
    "q06_velocity" -> { (s, dir) =>
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      Tables.transactions(s, dir).select(
        col("transaction_id"), col("customer_id"),
        r6(F.velocity(w, 3600)).as("velocity_score_1h"))
    },
    "q07_calendar_counts" -> { (s, dir) =>
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      val ts = col("event_timestamp")
      Tables.transactions(s, dir).select(
        col("transaction_id"), col("customer_id"),
        F.condCount(F.isNight(ts), w, 86400).as("night_txn_count_24h"),
        F.condCount(F.isWeekend(ts), w, 604800).as("weekend_txn_count_7d"),
        r6(F.condRatio(F.isBusinessHours(ts), w, 86400)).as("business_hours_ratio_24h"))
    },
    "q08_risk_score" -> { (s, dir) =>
      val feats = F.customerFeatures(Tables.transactions(s, dir))
      Risk.scored(feats, col("amount")).select(
        col("transaction_id"), col("customer_id"),
        r6(col("risk_score")).as("risk_score"), col("risk_level"))
    },
    // natural-language narrative per scored transaction (the reference's
    // templated explanation/recommendation text) — one codegen'd
    // format_string map over the feature view, no UDF
    "q166_nl_report" -> { (s, dir) =>
      graft.scoring.NlReport.narrate(
        F.customerFeatures(Tables.transactions(s, dir)))
    },
    // global feature importance of the linear risk model: the population
    // std of each feature's clamp-normalized CONTRIBUTION (weight folded
    // in) — the data-grounded ranking of which model terms actually move
    // scores. One aggregate over the shared feature view; the 14-row
    // melt happens on the single agg row, not per input row.
    // per-feature target correlation ranking (the reference notebook's
    // `X.corrwith(y).sort_values(key=abs)` screen, notebooks/
    // aml_analysis.ipynb cell 9): Pearson correlation of every
    // multi-window feature with the suspicion label in ONE aggregate
    // over the shared feature frame, melted to rows, ranked by |corr|
    // (4dp, feature-name tie-break) with a window-free triangular join.
    "q208_target_correlation" -> { (s, dir) =>
      val fnames = Seq("amount", "txn_amount_sum_60s", "txn_amount_sum_5m",
        "txn_amount_sum_1h", "txn_count_60s", "txn_count_5m",
        "txn_count_10m", "txn_count_1h", "unique_ips_1h",
        "unique_merchants_1h", "velocity_score_1h",
        "amount_deviation_score_1h", "night_txn_count_24h",
        "weekend_txn_count_7d", "avg_txn_amount_1h")
      def deNaN(c: Column) = when(isnan(c), lit(null)).otherwise(c)
      val feats = F.customerFeatures(Tables.transactions(s, dir))
        .withColumn("y", (col("merchant_id") === "error").cast("double"))
      val aggs = fnames.map(f =>
        deNaN(corr(col(f).cast("double"), col("y"))).as(s"c_$f"))
      val cs = feats.agg(aggs.head, aggs.tail: _*)
      val melted = cs.select(explode(array(fnames.map(f =>
          struct(lit(f).as("feature"), col(s"c_$f").as("c"))): _*)).as("e"))
        .select(col("e.feature"), r6z(col("e.c")).as("target_corr"),
          coalesce(abs(r6z(col("e.c"))), lit(-1.0)).as("abs_corr"))
        .localCheckpoint() // 15 rows; read twice for the triangular rank
      val o = melted.select(col("feature").as("__f2"), col("abs_corr").as("__a2"))
      melted.crossJoin(o)
        .groupBy(col("feature"), col("target_corr"), col("abs_corr"))
        .agg(sum(when(col("__a2") > col("abs_corr") ||
          (col("__a2") === col("abs_corr") && col("__f2") < col("feature")), 1L)
          .otherwise(0L)).as("__nb"))
        .select(col("feature"), col("target_corr"), col("abs_corr"),
          (col("__nb") + 1).as("rank"))
    },
    // univariate feature selection (the notebook's SelectKBest(f_classif)
    // screen, notebooks/aml_analysis.ipynb cell 2 + sklearn
    // feature_selection): one-way ANOVA F-statistic of every window
    // feature against the binary label — closed form from per-class
    // count/sum/sumsq, so ALL features screen in ONE conditional
    // aggregate; ranked by 4dp F desc (feature-name tie-break,
    // triangular join), selected = top-5 like SelectKBest(k=5).
    "q209_select_kbest" -> { (s, dir) =>
      val fnames = Seq("amount", "txn_amount_sum_60s", "txn_amount_sum_5m",
        "txn_amount_sum_1h", "txn_count_60s", "txn_count_5m",
        "txn_count_10m", "txn_count_1h", "unique_ips_1h",
        "unique_merchants_1h", "velocity_score_1h",
        "amount_deviation_score_1h", "night_txn_count_24h",
        "weekend_txn_count_7d", "avg_txn_amount_1h")
      val feats = F.customerFeatures(Tables.transactions(s, dir))
        .withColumn("y", (col("merchant_id") === "error").cast("int"))
      val aggs =
        Seq(sum(when(col("y") === 0, 1L).otherwise(0L)).cast("double").as("n0"),
          sum(when(col("y") === 1, 1L).otherwise(0L)).cast("double").as("n1")) ++
        fnames.flatMap { f =>
          val x = col(f).cast("double")
          Seq(sum(when(col("y") === 0, x)).as(s"s0_$f"),
            sum(when(col("y") === 1, x)).as(s"s1_$f"),
            sum(when(col("y") === 0, x * x)).as(s"q0_$f"),
            sum(when(col("y") === 1, x * x)).as(s"q1_$f"))
        }
      val mom = feats.agg(aggs.head, aggs.tail: _*)
      def fstat(f: String): Column = {
        val (n0, n1) = (col("n0"), col("n1"))
        val (s0, s1) = (col(s"s0_$f"), col(s"s1_$f"))
        val (q0, q1) = (col(s"q0_$f"), col(s"q1_$f"))
        val m0 = s0 / n0
        val m1 = s1 / n1
        val m = (s0 + s1) / (n0 + n1)
        val ssb = n0 * (m0 - m) * (m0 - m) + n1 * (m1 - m) * (m1 - m)
        val ssw = (q0 - n0 * m0 * m0) + (q1 - n1 * m1 * m1)
        when(n0 > 1 && n1 > 1 && ssw > 0,
          ssb / (ssw / (n0 + n1 - 2)))
      }
      val melted = mom.select(explode(array(fnames.map(f =>
          struct(lit(f).as("feature"), fstat(f).as("fv"))): _*)).as("e"))
        .select(col("e.feature"), r6(col("e.fv")).as("f_stat"),
          coalesce(r6(col("e.fv")), lit(-1.0)).as("__fr"))
        .localCheckpoint() // 15 rows; read twice for the triangular rank
      val o = melted.select(col("feature").as("__f2"), col("__fr").as("__v2"))
      melted.crossJoin(o)
        .groupBy(col("feature"), col("f_stat"), col("__fr"))
        .agg(sum(when(col("__v2") > col("__fr") ||
          (col("__v2") === col("__fr") && col("__f2") < col("feature")), 1L)
          .otherwise(0L)).as("__nb"))
        .select(col("feature"), col("f_stat"), (col("__nb") + 1).as("rank"),
          (col("__nb") + 1 <= 5).as("selected"))
    },
    "q161_feature_importance" -> { (s, dir) =>
      val feats = F.customerFeatures(Tables.transactions(s, dir))
      val aggs = Risk.model.map { case (f, wgt, norm) =>
        stddev_pop(least(col(f).cast("double") / norm, lit(1.0)) * wgt).as(s"s_$f")
      }
      val stds = feats.agg(aggs.head, aggs.tail: _*)
      val melted = stds.select(explode(array(Risk.model.map { case (f, wgt, _) =>
          struct(lit(f).as("feature"), lit(wgt).as("weight"), col(s"s_$f").as("std"))
        }: _*)).as("e"))
        .select(col("e.feature"), col("e.weight"), col("e.std"))
      val tot = melted.agg(sum(col("std")).as("tot"))
      melted.crossJoin(broadcast(tot))
        .select(col("feature"), col("weight"),
          r6(col("std")).as("contrib_std"),
          r6(col("std") / col("tot")).as("importance_share"))
    })

  override val oracle: Map[String, String] = Map(
    "q01_txn_counts" ->
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  count(*) OVER w60s AS txn_count_60s,
  count(*) OVER w5m AS txn_count_5m,
  count(*) OVER w1h AS txn_count_1h
FROM events ${windowClause("w60s", "w5m", "w1h")}""",
    "q02_amount_sums" ->
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  round(sum(value) OVER w60s+ 5e-11, 4) AS txn_amount_sum_60s,
  round(sum(value) OVER w5m+ 5e-11, 4) AS txn_amount_sum_5m,
  round(sum(value) OVER w1h+ 5e-11, 4) AS txn_amount_sum_1h
FROM events ${windowClause("w60s", "w5m", "w1h")}""",
    "q03_amount_stats" ->
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  round(avg(value) OVER w1h+ 5e-11, 4) AS avg_txn_amount_1h,
  round(max(value) OVER w1h+ 5e-11, 4) AS max_txn_amount_1h,
  round(min(value) OVER w1h+ 5e-11, 4) AS min_txn_amount_1h
FROM events ${windowClause("w1h")}""",
    "q04_amount_std" ->
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  round(coalesce(stddev_pop(value) OVER w1h, 0.0)+ 5e-11, 4) AS amount_deviation_score_1h
FROM events ${windowClause("w1h")}""",
    "q05_unique_counts" ->
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  count(DISTINCT props->>'$$.k') OVER w1h AS unique_ips_1h,
  count(DISTINCT event_type) OVER w1h AS unique_merchants_1h
FROM events ${windowClause("w1h")}""",
    "q06_velocity" ->
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  round((count(*) OVER w1h) / 60.0+ 5e-11, 4) AS velocity_score_1h
FROM events ${windowClause("w1h")}""",
    "q07_calendar_counts" ->
      s"""SELECT event_id AS transaction_id, user_id AS customer_id,
  count(*) FILTER (WHERE hour(ts) < 6 OR hour(ts) > 22) OVER w24h AS night_txn_count_24h,
  count(*) FILTER (WHERE isodow(ts) >= 6) OVER w7d AS weekend_txn_count_7d,
  round(avg(CASE WHEN hour(ts) BETWEEN 9 AND 17 THEN 1.0 ELSE 0.0 END) OVER w24h+ 5e-11, 4) AS business_hours_ratio_24h
FROM events ${windowClause("w24h", "w7d")}""",
    "q208_target_correlation" -> {
      val fnames = Seq("amount", "txn_amount_sum_60s", "txn_amount_sum_5m",
        "txn_amount_sum_1h", "txn_count_60s", "txn_count_5m",
        "txn_count_10m", "txn_count_1h", "unique_ips_1h",
        "unique_merchants_1h", "velocity_score_1h",
        "amount_deviation_score_1h", "night_txn_count_24h",
        "weekend_txn_count_7d", "avg_txn_amount_1h")
      val corrSel = fnames.map(f => s"corr($f, y) AS c_$f").mkString(",\n    ")
      val melt = fnames.map(f =>
        s"SELECT '$f' AS feature, round(c_$f + 5e-11, 4) + 0.0 AS target_corr, coalesce(abs(round(c_$f + 5e-11, 4)) + 0.0, -1.0) AS abs_corr FROM c")
        .mkString("\nUNION ALL\n")
      s"""WITH $featureCte,
lab AS (SELECT f.*, CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS y FROM f),
c AS (SELECT
    $corrSel
  FROM lab),
m AS ($melt)
SELECT m.feature, m.target_corr, m.abs_corr,
  CAST(1 + sum(CASE WHEN m2.abs_corr > m.abs_corr OR (m2.abs_corr = m.abs_corr AND m2.feature < m.feature) THEN 1 ELSE 0 END) AS BIGINT) AS rank
FROM m CROSS JOIN m m2
GROUP BY m.feature, m.target_corr, m.abs_corr""" },
    "q209_select_kbest" -> {
      val fnames = Seq("amount", "txn_amount_sum_60s", "txn_amount_sum_5m",
        "txn_amount_sum_1h", "txn_count_60s", "txn_count_5m",
        "txn_count_10m", "txn_count_1h", "unique_ips_1h",
        "unique_merchants_1h", "velocity_score_1h",
        "amount_deviation_score_1h", "night_txn_count_24h",
        "weekend_txn_count_7d", "avg_txn_amount_1h")
      val momSel = (Seq(
        "CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0",
        "CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1") ++
        fnames.flatMap { f =>
          val x = s"CAST($f AS DOUBLE)"
          Seq(s"sum(CASE WHEN y = 0 THEN $x END) AS s0_$f",
            s"sum(CASE WHEN y = 1 THEN $x END) AS s1_$f",
            s"sum(CASE WHEN y = 0 THEN $x*$x END) AS q0_$f",
            s"sum(CASE WHEN y = 1 THEN $x*$x END) AS q1_$f")
        }).mkString(",\n    ")
      def fstat(f: String) = {
        val (s0, s1, q0, q1) = (s"s0_$f", s"s1_$f", s"q0_$f", s"q1_$f")
        s"""CASE WHEN n0 > 1 AND n1 > 1 AND (($q0 - n0*($s0/n0)*($s0/n0)) + ($q1 - n1*($s1/n1)*($s1/n1))) > 0 THEN
      (n0*($s0/n0 - ($s0 + $s1)/(n0 + n1))*($s0/n0 - ($s0 + $s1)/(n0 + n1)) + n1*($s1/n1 - ($s0 + $s1)/(n0 + n1))*($s1/n1 - ($s0 + $s1)/(n0 + n1)))
        / ((($q0 - n0*($s0/n0)*($s0/n0)) + ($q1 - n1*($s1/n1)*($s1/n1))) / (n0 + n1 - 2)) END"""
      }
      val melt = fnames.map(f =>
        s"SELECT '$f' AS feature, round(${fstat(f)} + 5e-11, 4) AS f_stat, coalesce(round(${fstat(f)} + 5e-11, 4), -1.0) AS fr FROM c")
        .mkString("\nUNION ALL\n")
      s"""WITH $featureCte,
lab AS (SELECT f.*, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y FROM f),
c AS (SELECT
    $momSel
  FROM lab),
m AS ($melt)
SELECT m.feature, m.f_stat,
  CAST(1 + sum(CASE WHEN m2.fr > m.fr OR (m2.fr = m.fr AND m2.feature < m.feature) THEN 1 ELSE 0 END) AS BIGINT) AS rank,
  CAST(1 + sum(CASE WHEN m2.fr > m.fr OR (m2.fr = m.fr AND m2.feature < m.feature) THEN 1 ELSE 0 END) AS BIGINT) <= 5 AS selected
FROM m CROSS JOIN m m2
GROUP BY m.feature, m.f_stat, m.fr""" },
    "q161_feature_importance" -> {
      val stdCols = Risk.model.zipWithIndex.map { case ((f, wgt, n), i) =>
        s"stddev_pop(least($f / $n, 1.0) * $wgt) AS s$i"
      }.mkString(",\n    ")
      val melt = Risk.model.zipWithIndex.map { case ((f, wgt, _), i) =>
        s"SELECT '$f' AS feature, $wgt::DOUBLE AS weight, s$i AS std FROM c"
      }.mkString("\n  UNION ALL ")
      s"""WITH $featureCte,
c AS MATERIALIZED (SELECT $stdCols FROM f),
u AS MATERIALIZED (
  $melt),
t AS (SELECT sum(std) AS tot FROM u)
SELECT feature, weight, round(std + 5e-11, 4) AS contrib_std,
  round(std / tot + 5e-11, 4) AS importance_share
FROM u CROSS JOIN t"""
    },
    "q08_risk_score" -> {
      // mirror of graft.scoring.Risk over the windowed features
      val norm = Risk.model.map { case (f, wgt, n) =>
        s"least($f / $n, 1.0) * $wgt"
      }.mkString(" + ")
      s"""WITH $featureCte, scored AS (
  SELECT transaction_id, customer_id,
    least(greatest(($norm)
      + (CASE WHEN amount > 10000 THEN 0.3 WHEN amount > 5000 THEN 0.15 ELSE 0.0 END)
      + (CASE WHEN unique_ips_1h > 3 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN velocity_score_1h > 1.5 THEN 0.2 ELSE 0.0 END)
      + (CASE WHEN amount_deviation_score_1h > 3000 THEN 0.15 ELSE 0.0 END)
      + (CASE WHEN night_txn_count_24h > 3 THEN 0.1 ELSE 0.0 END), 0.0), 1.0) AS s
  FROM f
)
SELECT transaction_id, customer_id, round(s+ 5e-11, 4) AS risk_score,
  CASE WHEN s <= 0.3 THEN 'LOW' WHEN s <= 0.6 THEN 'MEDIUM' ELSE 'HIGH' END AS risk_level
FROM scored"""
    },
    "q166_nl_report" -> {
      val norm = Risk.model.map { case (f, wgt, n) =>
        s"least($f / $n, 1.0) * $wgt"
      }.mkString(" + ")
      val entries = Risk.model.map { case (f, wgt, n) =>
        s"{'c': -least($f / $n, 1.0) * $wgt, 'n': '$f'}"
      }.mkString(",\n      ")
      val level = "CASE WHEN s <= 0.3 THEN 'LOW' WHEN s <= 0.6 THEN 'MEDIUM' ELSE 'HIGH' END"
      val sentence = """CASE WHEN top IS NULL THEN 'no factor above the significance floor'
    WHEN top = 'unique_ips_1h' THEN printf('used %d distinct IPs in the last hour', unique_ips_1h::BIGINT)
    WHEN top = 'velocity_score_1h' THEN printf('velocity of %.1f txn/min in the last hour', round(velocity_score_1h + 5e-11, 1))
    WHEN top LIKE 'txn_amount_sum%' THEN printf('moved %.2f in the %s window', round(txn_amount_sum_1h + 5e-11, 2), '1h')
    WHEN top = 'night_txn_count_24h' THEN printf('%d night transactions in 24h', night_txn_count_24h::BIGINT)
    WHEN top LIKE 'txn_count%' THEN printf('%d transactions in the last hour', txn_count_1h::BIGINT)
    ELSE printf('%s is elevated', top) END"""
      val reco = """CASE WHEN s > 0.8 THEN 'block pending manual review; contact the customer'
    WHEN s > 0.6 THEN 'approve with enhanced monitoring; review next transactions'
    WHEN s > 0.3 THEN 'approve; routine monitoring'
    ELSE 'approve; no further action' END ||
  CASE WHEN top LIKE '%unique_ips%' THEN ' | verify the IP locations are known for this customer'
    WHEN top LIKE '%velocity%' THEN ' | check whether the transaction velocity is justified'
    WHEN top LIKE '%night%' THEN ' | investigate the reason for night-time activity'
    ELSE '' END"""
      s"""WITH $featureCte,
scored AS (
  SELECT *, round(least(greatest(($norm)
      + (CASE WHEN amount > 10000 THEN 0.3 WHEN amount > 5000 THEN 0.15 ELSE 0.0 END)
      + (CASE WHEN unique_ips_1h > 3 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN velocity_score_1h > 1.5 THEN 0.2 ELSE 0.0 END)
      + (CASE WHEN amount_deviation_score_1h > 3000 THEN 0.15 ELSE 0.0 END)
      + (CASE WHEN night_txn_count_24h > 3 THEN 0.1 ELSE 0.0 END), 0.0), 1.0) + 5e-11, 4) AS s,
    list_transform(list_filter(list_sort([
      $entries])[1:3], x -> x.c < -0.05), x -> x.n) AS facs
  FROM f),
x AS (
  SELECT *, CASE WHEN len(facs) >= 1 THEN facs[1] END AS top FROM scored)
SELECT transaction_id, customer_id, s AS risk_score,
  $level AS risk_level,
  printf('RISK %s (score %.4f) amount %.2f | top factors: %s | dominant: %s | recommendation: %s',
    $level, s, round(amount + 5e-11, 2),
    CASE WHEN len(facs) > 0 THEN array_to_string(facs, ',') ELSE 'none' END,
    $sentence,
    $reco) AS report
FROM x"""
    })
}
