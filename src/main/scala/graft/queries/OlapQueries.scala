package graft.queries

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** OLAP-shape coverage beyond the reference's own surface: pivot/unpivot,
  * CUBE and GROUPING SETS subtotals, interval (range) joins, and bivariate
  * statistics — operators a training-data / analytics engine needs that
  * the reference computes nowhere (its only reshape is per-row Python
  * dicts, reference `api/main.py:330-363`), all expressed as single-pass
  * Spark plans with DuckDB oracles.
  */
object OlapQueries extends QueryPack {

  /** Stable event_type domain (TESTDATA.md); an explicit value list keeps
    * `pivot` a one-job plan — without it Spark runs an extra distinct job
    * to discover the columns, a full scan at 100 TB.
    */
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** lineitem columns with their profile kind — the single spec both the
    * Spark q158 plan and its oracle SQL are generated from, so the two
    * sides cannot drift.
    */
  private val profileCols: Seq[(String, graft.ops.Profile.Kind)] = {
    import graft.ops.Profile._
    Seq("l_orderkey" -> Num, "l_partkey" -> Num, "l_suppkey" -> Num,
      "l_linenumber" -> Num, "l_quantity" -> Num, "l_extendedprice" -> Num,
      "l_discount" -> Num, "l_tax" -> Num,
      "l_returnflag" -> Str, "l_linestatus" -> Str, "l_shipdate" -> Other)
  }

  override val defs: Map[String, Q] = Map(
    // Deequ-style per-column table profile: volume, null rate, exact
    // cardinality, typed min/max — one column-pruned aggregate per column
    "q158_column_profile" -> { (s, dir) =>
      graft.ops.Profile.profile(Tables.lineitem(s, dir), profileCols)
        .select(col("column"), col("n"), col("n_null"),
          r6(col("null_rate")).as("null_rate"), col("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    },
    // ledger reconciliation: order header total vs the recomputed
    // lineitem roll-up — the fact-to-fact consistency check a warehouse
    // runs after every load. One co-keyed aggregate + join on orderkey;
    // top-20 worst gaps by ROUNDED delta with key tie-breaks.
    "q162_reconciliation" -> { (s, dir) =>
      val calc = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("calc"))
      Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .join(calc, "o_orderkey")
        .withColumn("adiff", r6(abs(col("o_totalprice") - col("calc"))))
        .orderBy(col("adiff").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), r6(col("o_totalprice")).as("o_totalprice"),
          r6(col("calc")).as("lineitem_total"), col("adiff").as("abs_diff"))
    },
    // data-freshness report: per stream partition (event_type), volume,
    // last event time, and lag behind the global high-water mark — the
    // staleness monitor a multi-source ingest runs every cycle
    "q160_freshness" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("tm"))
      val per = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), max(col("tm")).as("last_tm"))
      val hwm = per.agg(max(col("last_tm")).as("hwm"))
      per.crossJoin(broadcast(hwm))
        .select(col("event_type"), col("n"), col("last_tm"),
          (col("hwm") - col("last_tm")).as("lag_us"),
          (col("hwm") - col("last_tm") > 3600000000L).as("stale_1h"))
    },
    // wide reshaping: one row per customer, one amount column per
    // merchant-type — the serving-layer feature-vector shape
    "q60_pivot" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", eventTypes)
        .agg(sum(col("value")))
        .select(col("user_id").as("customer_id") +:
          eventTypes.map(t => r6(coalesce(col(t), lit(0.0))).as(s"amt_$t")): _*)
    },
    // CUBE: all 2^k subtotal combinations in one pass (the dashboard's
    // segment x priority rollups without re-aggregating per page)
    "q61_cube" -> { (s, dir) =>
      val c = broadcast(Tables.customer(s, dir))
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          r2(sum(col("o_totalprice"))).as("total_price"),
          count(lit(1)).as("cnt"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("gid"), col("total_price"), col("cnt"))
    },
    // GROUPING SETS: the two marginals + grand total, skipping the
    // (flag, status) cross cells a CUBE would also compute
    "q62_grouping_sets" -> { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      l.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          r2(sum(col("l_extendedprice"))).as("sum_price"),
          count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("gid"), col("sum_price"), col("cnt"))
    },
    // interval (band) join: events of the same customer in the 5 minutes
    // AFTER each event — the follow-burst probe. Equi key + range
    // predicate plans as one sort-merge join; no cross product.
    "q63_interval_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val a = ev.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tm"))
      val b = ev.select(col("user_id").as("u2"),
        unix_micros(col("ts")).as("tm2"), col("value").as("v2"))
      a.join(b, a("user_id") === b("u2") &&
          col("tm2") > col("tm") && col("tm2") <= col("tm") + lit(300000000L),
          "left")
        .groupBy(col("event_id"))
        .agg(count(col("u2")).as("n_next_5m"),
          r6(coalesce(sum(col("v2")), lit(0.0))).as("amt_next_5m"))
    },
    // bivariate statistics per entity: does transaction size co-move with
    // time of day — corr + sample/population covariance (complements q13's
    // trend regressions). Zero-variance groups: Spark emits NaN where
    // DuckDB emits NULL — normalized here.
    "q64_bivariate" -> { (s, dir) =>
      def deNaN(c: org.apache.spark.sql.Column) =
        when(isnan(c), lit(null)).otherwise(c)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("value"),
          hour(col("ts")).cast("double").as("h"))
      ev.groupBy(col("user_id"))
        .agg(r6z(deNaN(corr(col("value"), col("h")))).as("corr_amount_hour"),
          r6z(covar_samp(col("value"), col("h"))).as("covar_samp_ah"),
          r6z(covar_pop(col("value"), col("h"))).as("covar_pop_ah"),
          count(lit(1)).as("n"))
    },
    // funnel conversion: click -> purchase within 30 min, computed with a
    // FORWARD-looking conditional window (min purchase-time over the
    // following rows) — one sort per user, no self-join
    "q68_funnel" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .where(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tm"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tm"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val nextPurchase = min(when(col("event_type") === "purchase", col("tm"))).over(w)
      ev.withColumn("np", nextPurchase)
        .where(col("event_type") === "click")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(when(col("np") - col("tm") <= 1800000000L, 1L).otherwise(0L)).as("n_converted"))
        .select(col("user_id"), col("n_clicks"), col("n_converted"),
          r6(col("n_converted").cast("double") / col("n_clicks")).as("conv_rate"))
    },
    // time-series regularization: hourly grid per user over the user's
    // active range, forward-filling the last observed hourly sum — the
    // resample+ffill step before sequence models. sequence()+explode is
    // narrow per user; the fill is one ignore-nulls window over the grid.
    "q69_gapfill" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
      val hourly = ev.groupBy(col("user_id"), col("h")).agg(sum(col("value")).as("v"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          col("v").isNotNull.as("observed"),
          r6(last(col("v"), ignoreNulls = true).over(w)).as("v_filled"))
    },
    // equal-width histogram: feature discretization for binned training
    // inputs; one narrow projection + one aggregation
    "q70_histogram" -> { (s, dir) =>
      val bin = least(floor(col("value") / 50.0), lit(19.0)).cast("long")
      Tables.events(s, dir)
        .groupBy(bin.as("bin"))
        .agg(count(lit(1)).as("cnt"), r2(sum(col("value"))).as("sum_v"))
    },
    // per-entity robust scaling: (x - median) / IQR — the outlier-immune
    // standardization; exact percentiles per group agg, broadcast back
    "q71_robust_scale" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val stats = ev.groupBy(col("user_id").as("u"))
        .agg(expr("percentile(value, 0.5)").as("med"),
          expr("percentile(value, 0.75) - percentile(value, 0.25)").as("iqr"))
      ev.join(broadcast(stats), col("user_id") === col("u"))
        .select(col("event_id"), col("user_id"),
          r6((col("value") - col("med")) / (col("iqr") + lit(1e-9))).as("robust_z"))
    },
    // event-sequence transition matrix (first-order Markov): what follows
    // what, per user timeline — one navigation window + one aggregation
    "q75_transitions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("cnt"))
      pairs.select(col("event_type"), col("next_type"), col("cnt"),
        r6(col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy(col("event_type")))).as("prob"))
    },
    // full outer join — completes the join-type matrix (inner/left/semi/
    // anti/as-of/interval are elsewhere): per-nation customer vs supplier
    // counts, keeping nations present on either side only
    "q76_full_outer" -> { (s, dir) =>
      val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_customers"))
      val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(su, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
    },
    // argmax/argmin (max_by family) with DETERMINISTIC tie-breaks: the
    // struct-max trick orders (value, event_id) lexicographically, so equal
    // amounts resolve by id instead of partition order — `max_by(x, y)`
    // alone is nondeterministic under ties and would flake the hash gate
    "q78_argmax" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      // null-valued rows are excluded on both sides: max(struct) skips
      // them for free (null field sorts first), min(struct) would pick
      // them (oracle ORDER BY is NULLS LAST) — hence the when() guard.
      // event_id is unique, so mn needs no third tie-break field.
      ev.groupBy(col("user_id"))
        .agg(
          max(struct(col("value"), col("event_id"), col("event_type"))).as("mx"),
          min(when(col("value").isNotNull,
            struct(col("value"), col("event_id")))).as("mn"))
        .select(col("user_id"),
          r6(col("mx.value")).as("max_value"),
          col("mx.event_id").as("max_event_id"),
          col("mx.event_type").as("max_event_type"),
          r6(col("mn.value")).as("min_value"),
          col("mn.event_id").as("min_event_id"))
    },
    // melt: wide metric columns to long (metric, value) rows, then one
    // summary row per metric — the normalized-metrics-table shape
    "q66_unpivot" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "val")
        .groupBy(col("metric"))
        .agg(r2(sum(col("val"))).as("sum_val"),
          r6(avg(col("val"))).as("avg_val"),
          count(lit(1)).as("cnt"))
    })

  override val oracle: Map[String, String] = Map(
    "q162_reconciliation" ->
      """WITH c AS (SELECT l_orderkey AS o_orderkey,
  sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS calc FROM lineitem GROUP BY 1),
j AS (SELECT o.o_orderkey, o.o_totalprice, c.calc,
        round(abs(o.o_totalprice - c.calc) + 5e-11, 4) AS adiff
      FROM orders o JOIN c USING (o_orderkey))
SELECT o_orderkey, round(o_totalprice + 5e-11, 4) AS o_totalprice,
  round(calc + 5e-11, 4) AS lineitem_total, adiff AS abs_diff
FROM j ORDER BY adiff DESC, o_orderkey ASC LIMIT 20""",
    "q160_freshness" ->
      """WITH per AS (SELECT event_type, count(*) AS n, max(epoch_us(ts)) AS last_tm FROM events GROUP BY 1),
h AS (SELECT max(last_tm) AS hwm FROM per)
SELECT event_type, n, last_tm, hwm - last_tm AS lag_us,
  hwm - last_tm > 3600000000 AS stale_1h
FROM per CROSS JOIN h""",
    "q158_column_profile" -> profileCols.map { case (c, k) =>
      val minNum = if (k == graft.ops.Profile.Num) s"min($c)::DOUBLE" else "NULL::DOUBLE"
      val maxNum = if (k == graft.ops.Profile.Num) s"max($c)::DOUBLE" else "NULL::DOUBLE"
      val minStr = if (k == graft.ops.Profile.Str) s"min($c)::VARCHAR" else "NULL::VARCHAR"
      val maxStr = if (k == graft.ops.Profile.Str) s"max($c)::VARCHAR" else "NULL::VARCHAR"
      s"""SELECT '$c' AS "column", count(*) AS n, count(*) - count($c) AS n_null,
  round((count(*) - count($c))::DOUBLE / count(*) + 5e-11, 4) AS null_rate,
  count(DISTINCT $c) AS n_distinct, $minNum AS min_num, $maxNum AS max_num,
  $minStr AS min_str, $maxStr AS max_str FROM lineitem"""
    }.mkString("\nUNION ALL\n"),
    "q60_pivot" -> {
      val cols = eventTypes.map { t =>
        s"round(coalesce(sum(CASE WHEN event_type = '$t' THEN value END), 0.0) + 5e-11, 4) AS amt_$t"
      }.mkString(",\n  ")
      s"""SELECT user_id AS customer_id,
  $cols
FROM events GROUP BY 1"""
    },
    "q61_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
  GROUPING(c_mktsegment, o_orderpriority) AS gid,
  round(sum(o_totalprice) + 1e-4, 2) AS total_price,
  count(*) AS cnt
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)""",
    "q62_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
  coalesce(l_linestatus, 'ALL') AS l_linestatus,
  GROUPING(l_returnflag, l_linestatus) AS gid,
  round(sum(l_extendedprice) + 1e-4, 2) AS sum_price,
  count(*) AS cnt
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q63_interval_join" ->
      """WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS tm FROM events),
b AS (SELECT user_id AS u2, epoch_us(ts) AS tm2, value AS v2 FROM events)
SELECT a.event_id, count(b.u2) AS n_next_5m,
  round(coalesce(sum(b.v2), 0.0) + 5e-11, 4) AS amt_next_5m
FROM a LEFT JOIN b ON a.user_id = b.u2 AND b.tm2 > a.tm AND b.tm2 <= a.tm + 300000000
GROUP BY 1""",
    "q64_bivariate" ->
      """SELECT user_id,
  round(corr(value, hour(ts)::DOUBLE) + 5e-11, 4) + 0.0 AS corr_amount_hour,
  round(covar_samp(value, hour(ts)::DOUBLE) + 5e-11, 4) + 0.0 AS covar_samp_ah,
  round(covar_pop(value, hour(ts)::DOUBLE) + 5e-11, 4) + 0.0 AS covar_pop_ah,
  count(*) AS n
FROM events GROUP BY 1""",
    "q68_funnel" ->
      """WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tm
  FROM events WHERE event_type IN ('click', 'purchase')),
x AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' THEN tm END)
    OVER (PARTITION BY user_id ORDER BY tm, event_id
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
  FROM ev),
c AS (
  SELECT user_id, count(*) AS n_clicks,
    sum(CASE WHEN np - tm <= 1800000000 THEN 1 ELSE 0 END)::BIGINT AS n_converted
  FROM x WHERE event_type = 'click' GROUP BY 1)
SELECT user_id, n_clicks, n_converted,
  round(n_converted::DOUBLE / n_clicks + 5e-11, 4) AS conv_rate
FROM c""",
    "q69_gapfill" ->
      """WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h, value FROM events),
hourly AS (SELECT user_id, h, sum(value) AS v FROM ev GROUP BY 1, 2),
bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
j AS (
  SELECT g.user_id, g.h, hourly.v
  FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h)
SELECT user_id, h, v IS NOT NULL AS observed,
  round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 5e-11, 4) AS v_filled
FROM j""",
    "q70_histogram" ->
      """SELECT least(floor(value / 50.0), 19)::BIGINT AS bin,
  count(*) AS cnt, round(sum(value) + 1e-4, 2) AS sum_v
FROM events GROUP BY 1""",
    "q71_robust_scale" ->
      """WITH s AS (
  SELECT user_id AS u, quantile_cont(value, 0.5) AS med,
    quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
  FROM events GROUP BY 1)
SELECT event_id, user_id, round((value - med)/(iqr + 1e-9) + 5e-11, 4) AS robust_z
FROM events JOIN s ON user_id = u""",
    "q78_argmax" ->
      """WITH r AS (
  SELECT user_id, value, event_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rx,
    row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rn
  FROM events)
SELECT a.user_id,
  round(a.value + 5e-11, 4) AS max_value,
  a.event_id AS max_event_id,
  a.event_type AS max_event_type,
  round(b.value + 5e-11, 4) AS min_value,
  b.event_id AS min_event_id
FROM (SELECT * FROM r WHERE rx = 1) a JOIN (SELECT * FROM r WHERE rn = 1) b USING (user_id)""",
    "q76_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1),
s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
  coalesce(c.n_customers, 0) AS n_customers,
  coalesce(s.n_suppliers, 0) AS n_suppliers
FROM c FULL JOIN s ON c.nk = s.nk""",
    "q75_transitions" ->
      """WITH p AS (
  SELECT user_id, event_type,
    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events),
c AS (
  SELECT event_type, next_type, count(*) AS cnt
  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2)
SELECT event_type, next_type, cnt,
  round(cnt::DOUBLE / sum(cnt) OVER (PARTITION BY event_type) + 5e-11, 4) AS prob
FROM c""",
    "q66_unpivot" ->
      """WITH long AS (
  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT metric, round(sum(val) + 1e-4, 2) AS sum_val,
  round(avg(val) + 5e-11, 4) AS avg_val, count(*) AS cnt
FROM long GROUP BY 1""")
}
