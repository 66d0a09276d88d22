package graft.queries

import graft.ops.{AmlPatterns, Cohort, CoreFeatures, Distribution, GraphOps, PageRank, Trailing}
import graft.scale.{FuzzyMatch, Splits}
import graft.tables.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AML pattern detectors and the remaining training-pipeline/OLAP
  * surface: structuring screens (batch + the streaming twin), Benford
  * digit tests, round-number bias, shared-identifier ring pairs, cohort
  * retention, Levenshtein fuzzy matching, PageRank, ranking windows,
  * RFM, co-occurrence lift, z-order, quality gating, IQR fences,
  * temporal/stratified/rebalanced splits, feature crossing, decayed
  * activity, and PSI drift.
  *
  * Reference anchors: the threshold rules these generalize are
  * `api/main.py:175-200` (amount-threshold boosts); the graph features
  * PageRank and ring pairs extend are `advanced_features.py:27-90`.
  */
object DomainQueries extends QueryPack {

  private val centsSql = "round(value*100)::BIGINT"

  override val defs: Map[String, Q] = Map(
    // card-testing velocity: same customer+merchant repeat within 60s
    "q159_rapid_repeats" -> { (s, dir) =>
      AmlPatterns.rapidRepeats(Tables.transactions(s, dir), windowSeconds = 60L)
        .select(col("transaction_id"), col("customer_id"), col("merchant_id"),
          col("gap_us"), r6(col("amount")).as("amount"),
          r6(col("prev_amount")).as("prev_amount"))
    },
    // sequence-model anomaly (closed-form LSTM stand-in, reference
    // models/advanced_models.py:144-172): Laplace-smoothed first-order
    // Markov model over per-customer merchant sequences; per-customer
    // mean transition NLL and its exp (perplexity)
    "q193_markov_nll" -> { (s, dir) =>
      AmlPatterns.markovNll(Tables.transactions(s, dir))
        .select(col("customer_id"), col("n_steps"),
          r6(col("avg_nll")).as("avg_nll"),
          r6(exp(col("avg_nll"))).as("perplexity"))
    },
    // structuring screen: repeated just-under-threshold amounts (T=100)
    "q79_structuring" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      AmlPatterns.structuring(tx, threshold = 100.0)
        .select(col("customer_id"), col("band_cnt"), col("band_sum_cents"),
          r6(col("band_share")).as("band_share"), col("flagged"))
    },
    "q80_benford" -> { (s, dir) =>
      AmlPatterns.benford(Tables.transactions(s, dir))
        .select(col("digit"), col("cnt"),
          r6(col("obs_freq")).as("obs_freq"),
          r6(col("benford_freq")).as("benford_freq"),
          r2(col("chi2_term")).as("chi2_term"))
    },
    "q81_round_bias" -> { (s, dir) =>
      AmlPatterns.roundBias(Tables.transactions(s, dir))
        .select(col("merchant_id"), col("n"),
          col("whole_cnt"), r6(col("whole_ratio")).as("whole_ratio"),
          col("ten_cnt"), r6(col("ten_ratio")).as("ten_ratio"))
    },
    "q82_cohort_retention" -> { (s, dir) =>
      Cohort.retention(Tables.events(s, dir))
        .select(col("cohort_week").cast("string").as("cohort_week"),
          col("week_offset"), col("active_users"), col("cohort_size"),
          r6(col("retention")).as("retention"))
    },
    // blocked edit-distance near-dup pairs (prefix block, bounded slice)
    "q83_fuzzy_match" -> { (s, dir) =>
      FuzzyMatch.pairs(Tables.documents(s, dir), col("doc_id"), col("text"))
        .select(col("id_a"), col("id_b"), col("lev"))
    },
    // personalized PageRank from flagged seeds: proximity-weighted
    // exposure to confirmed-bad accounts (same seed rule as q106)
    "q163_risk_propagation" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val e = ev.select(concat(lit("c:"), col("user_id").cast("string")).as("src"),
          concat(lit("m:"), col("event_type")).as("dst")).distinct()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = ev.where(col("value") > 300)
        .select(concat(lit("c:"), col("user_id").cast("string")).as("node")).distinct()
      PageRank.personalized(sym, seeds, iters = 10, damping = 0.85)
        .orderBy(r6(col("pr")).desc, col("node").asc)
        .limit(50)
        .select(col("node"), col("is_seed"), r6(col("pr")).as("pr"))
    },
    // PageRank over the symmetrized customer-merchant bipartite graph
    "q84_pagerank" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(concat(lit("c:"), col("user_id").cast("string")).as("src"),
          concat(lit("m:"), col("event_type")).as("dst"))
        .distinct()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      PageRank.run(sym, iters = 10, damping = 0.85)
        .select(col("node"), r6(col("pr")).as("pr"))
    },
    // global ranking-window family over an exact integer measure. Even
    // though the input is the per-user aggregate, at 10⁹ users a bare
    // Window.orderBy is still a one-task sort — rank comes from the
    // two-pass range-partitioned GlobalOrder instead, every rank
    // function derives from (rn, n) in exact integer arithmetic, and
    // lead() becomes a self-join on rn+1 (same exchange key).
    "q85_window_suite" -> { (s, dir) =>
      val spend = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(AmlPatterns.cents(col("value"))).as("total_cents"))
      val ranked = graft.ops.GlobalOrder.withRowNumber(spend,
        Seq(col("total_cents").desc, col("user_id")), "__rn", total = Some("__n"))
      val next = ranked.select((col("__rn") - 1).as("__rn"),
        col("total_cents").as("__next_cents"))
      ranked.join(next, Seq("__rn"), "left")
        .select(col("user_id"), col("total_cents"),
          graft.ops.GlobalOrder.ntileOf(col("__rn"), col("__n"), 4).as("quartile"),
          r6(graft.ops.GlobalOrder.percentRankOf(col("__rn"), col("__n"))).as("pct_rank"),
          r6(graft.ops.GlobalOrder.cumeDistOf(col("__rn"), col("__n"))).as("cum_dist"),
          coalesce(col("total_cents") - col("__next_cents"), lit(0L)).as("gap_cents"))
    },
    // bounded 2-core of the customer-merchant graph: 4 peel rounds of
    // "drop degree<2 nodes" — ring participants survive, pendant
    // customers fall off. Deterministic round count = oracle-expressible.
    "q109_kcore" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(concat(lit("c:"), col("user_id").cast("string")).as("src"),
          concat(lit("m:"), col("event_type")).as("dst")).distinct()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      GraphOps.boundedKCore(sym, k = 2, rounds = 4)
    },
    // new-counterparty novelty: share of last-7d txns to merchants the
    // customer had never used before the window started (mule signal)
    "q110_novelty" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val anchor = tx.agg(max(col("event_timestamp")).as("anchor"))
      AmlPatterns.noveltyRatio(tx.crossJoin(broadcast(anchor)),
          col("anchor"), windowSeconds = 604800L)
        .select(col("customer_id"), col("recent_cnt"), col("novel_cnt"),
          r6(col("novelty_ratio")).as("novelty_ratio"))
    },
    // burst ceiling: each customer's PEAK trailing-60s / trailing-1h txn
    // count — both frames ride the one canonical (customer, ts) window
    // exchange, then one groupBy(customer) max
    "q111_peak_velocity" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val w = Trailing.spec(col("customer_id"), col("event_timestamp"))
      tx.select(col("customer_id"),
          CoreFeatures.txnCount(w, 60).as("c60"),
          CoreFeatures.txnCount(w, 3600).as("c1h"))
        .groupBy(col("customer_id"))
        .agg(max(col("c60")).as("peak_count_60s"),
          max(col("c1h")).as("peak_count_1h"))
    },
    // feature-relevance screen: per-merchant contribution to the mutual
    // information between merchant and hour-of-day (integer-count ratios)
    "q112_mutual_info" -> { (s, dir) =>
      Distribution.mutualInformation(Tables.events(s, dir),
          col("event_type"), hour(col("ts")))
        .select(col("x").as("merchant_id"), col("n_x"),
          r6(col("mi_contrib")).as("mi_contrib"))
    },
    // Pareto concentration points: the minimal customer-head covering
    // 50% / 90% of total volume (all-integer cumulative logic)
    "q113_pareto" -> { (s, dir) =>
      val per = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(sum(AmlPatterns.cents(col("value"))).as("c"))
      // two-pass range-partitioned running totals (GlobalOrder), one pass
      // for both: the rank is just the running count — all integer cents,
      // so the distributed form is bit-identical to a single sort
      val ord = Seq(col("c").desc, col("user_id"))
      val o = graft.ops.GlobalOrder.withCumSums(per, ord,
          Seq((col("c"), "cum"), (lit(1L), "rk")))
        .select(col("c"), col("cum"), col("rk"))
        .crossJoin(broadcast(per.agg(sum(col("c")).as("tot"),
          count(lit(1)).as("nc"))))
      o.groupBy(col("nc"))
        .agg(min(when(col("cum") * 2 >= col("tot"), col("rk"))).as("k50"),
          min(when(col("cum") * 10 >= col("tot") * 9, col("rk"))).as("k90"))
        .select(col("k50"), col("k90"),
          r6(col("k50").cast("double") / col("nc")).as("frac50"),
          r6(col("k90").cast("double") / col("nc")).as("frac90"))
    },
    // first-order transition (bigram) entropy of each customer's merchant
    // sequence — low entropy = scripted repetition, extends the
    // entropy/Gini/HHI family to SEQUENCE structure
    "q114_transition_entropy" -> { (s, dir) =>
      Distribution.transitionEntropy(Tables.events(s, dir), col("user_id"),
          col("event_type"), Seq(unix_micros(col("ts")), col("event_id")))
        .select(col("k").as("customer_id"), col("n_transitions"),
          r6(col("transition_entropy")).as("transition_entropy"))
    },
    // characteristic stability index: PSI over LEARNED decile cuts — the
    // baseline period defines the bins (value at the k·n/10-th order
    // statistic, GlobalOrder rank), the comparison period is scored
    // against them. Completes the drift family (q94 fixed-width PSI,
    // q24 KS, q142 JSD): CSI is what model monitoring actually deploys,
    // because the bins move with the trained population.
    "q177_csi" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.intDiv
      val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("value"))
      val cutTs = ev.agg((min(col("ts")) + expr("INTERVAL 17 DAYS")).as("cutts"))
      val tagged = ev.crossJoin(broadcast(cutTs))
        .select(col("event_id"), col("value"), (col("ts") <= col("cutts")).as("p1"))
        .localCheckpoint() // ranked (baseline) + bucketed (both periods)
      val ranked = graft.ops.GlobalOrder.withRowNumber(tagged.where(col("p1")),
        Seq(col("value"), col("event_id")), "__rn", total = Some("__n"))
      val isCut = (1 to 9).map(i =>
        col("__rn") === intDiv(lit(i.toLong) * col("__n"), lit(10L))).reduce(_ || _)
      val cuts = ranked.where(isCut)
        .agg(sort_array(collect_list(col("value"))).as("cuts"))
      val bucketed = tagged.crossJoin(broadcast(cuts)).select(col("p1"),
        aggregate(col("cuts"), lit(0),
          (acc, c) => acc + when(col("value") > c, 1).otherwise(0)).as("bucket"))
      val per = bucketed.groupBy(col("bucket")).agg(
        sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("p1"), 1L).otherwise(0L)).as("n2"))
      val tot = per.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
      val s1 = (col("n1").cast("double") + 0.5) / (col("t1").cast("double") + 5.0)
      val s2 = (col("n2").cast("double") + 0.5) / (col("t2").cast("double") + 5.0)
      per.crossJoin(broadcast(tot)).select(col("bucket"), col("n1"), col("n2"),
        r6(s1).as("share1"), r6(s2).as("share2"),
        r6((s2 - s1) * log(s2 / s1)).as("csi_contrib"))
    },
    // weight-of-evidence / information value per amount decile — the
    // classic supervised binning table (credit-risk standard) next to
    // q112's mutual information. Deciles are the exact SQL NTILE via the
    // two-pass GlobalOrder rank (no single-task sort); +0.5 Laplace
    // smoothing keeps zero cells finite; counts stay exact integers.
    "q176_woe_iv" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_id"), col("value"),
        (col("event_type") === "error").cast("long").as("y"))
      val ranked = graft.ops.GlobalOrder.withRowNumber(ev,
        Seq(col("value"), col("event_id")), "__rn", total = Some("__n"))
      val per = ranked
        .select(col("y"), graft.ops.GlobalOrder.ntileOf(col("__rn"), col("__n"), 10).as("decile"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      val tot = per.agg(sum(col("n")).as("tn"), sum(col("n_pos")).as("tp"))
      val dp = (col("n_pos").cast("double") + 0.5) / (col("tp").cast("double") + 5.0)
      val dn = ((col("n") - col("n_pos")).cast("double") + 0.5) /
        ((col("tn") - col("tp")).cast("double") + 5.0)
      per.crossJoin(broadcast(tot))
        .select(col("decile"), col("n"), col("n_pos"),
          r6(log(dp / dn)).as("woe"),
          r6((dp - dn) * log(dp / dn)).as("iv_contrib"))
    },
    // bipartite label-propagation communities: finer than q49's connected
    // components (splits weakly-overlapping membership), all-integer
    // deterministic (plurality with min-label ties, no RNG/floats)
    "q174_label_propagation" -> { (s, dir) =>
      GraphOps.labelPropagation(Tables.transactions(s, dir), rounds = 3)
        .select(col("customer_id"), col("community"), col("community_size"))
    },
    // HITS hubs/authorities on the DIRECTED customer->merchant graph —
    // the layering lens PageRank's undirected prominence misses
    "q121_hits" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(concat(lit("c:"), col("user_id").cast("string")).as("src"),
          concat(lit("m:"), col("event_type")).as("dst")).distinct()
      graft.ops.Hits.run(e, iters = 6)
        .select(col("node"), col("side"), r6(col("s")).as("s"))
    },
    // conditional transition entropy H(next merchant | current merchant):
    // 0 for scripted cycles even when the joint entropy (q114) is high
    "q122_cond_entropy" -> { (s, dir) =>
      Distribution.conditionalTransitionEntropy(Tables.events(s, dir),
          col("user_id"), col("event_type"),
          Seq(unix_micros(col("ts")), col("event_id")))
        .select(col("k").as("customer_id"), col("n_transitions"),
          r6(col("cond_entropy")).as("cond_entropy"))
    },
    // deterministic k-fold assignment + per-fold label-balance audit
    "q123_kfold" -> { (s, dir) =>
      Splits.kfold(Tables.events(s, dir), col("event_id"), k = 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n"),
          count(when(col("value") > 300, 1)).as("pos"))
        .select(col("fold"), col("n"), col("pos"),
          r6(col("pos").cast("double") / col("n")).as("pos_rate"))
    },
    // class-STRATIFIED k-fold (the reference's StratifiedKFold(5),
    // models/advanced_models.py:24,263): rows rank within their class by
    // salted md5 and fold = (rank-1) mod k, so per-fold class counts
    // differ by at most 1 — exact ratio preservation q123's plain
    // md5-bucket folds only approximate. Output = every row's
    // assignment + its fold's class-balance audit columns.
    "q231_stratified_kfold" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_id"),
        (col("event_type") === "error").cast("long").as("y"))
      val folded = Splits.stratifiedKfold(ev, col("event_id"), col("y"),
        k = 5, salt = "skf")
      val per = folded.groupBy(col("fold"))
        .agg(count(lit(1)).as("fold_n"), sum(col("y")).as("fold_pos"))
      folded.join(broadcast(per), "fold")
        .select(col("event_id"), col("y"), col("fold"),
          col("fold_n"), col("fold_pos"))
    },
    // stratified 80/20 train/test split (train_test_split(...,
    // stratify=y), models/advanced_models.py:384): fold 0 of the
    // 5-fold stratified assignment is the hold-out, so both sides
    // carry the class ratio exactly (±1 row)
    "q232_stratified_split" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_id"),
        (col("event_type") === "error").cast("long").as("y"))
      Splits.stratifiedKfold(ev, col("event_id"), col("y"),
          k = 5, salt = "stsp")
        .withColumn("split", when(col("fold") === 0, "test").otherwise("train"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
        .select(col("split"), col("n"), col("n_pos"),
          r6(col("n_pos").cast("double") / col("n")).as("pos_rate"))
    },
    // GROUPED k-fold (entity-safe CV): the fold is a function of the
    // USER, so all of a user's events share a fold and per-user trailing
    // features can never leak across the train/test boundary — the
    // entity twin of q123's row-hash folds. The audit reports per-fold
    // user/event mass and label balance; user-level disjointness is
    // structural (fold = md5(user), one fold per user by construction).
    "q178_group_kfold" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("fold", Splits.bucket(col("user_id"), "gcv", 5))
      ev.groupBy(col("fold"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          count(when(col("event_type") === "error", 1)).as("pos"))
        .select(col("fold"), col("n_users"), col("n_events"), col("pos"),
          r6(col("pos").cast("double") / col("n_events")).as("pos_rate"))
    },
    // expanding-window temporal CV (backtest folds): k cutoffs at
    // i·n/k-th event-time order statistics; fold i trains on everything
    // before cutoff i and tests on (cutoff i, cutoff i+1] — the report
    // is the fold-boundary table every backtest starts from. Order
    // statistics via the two-pass GlobalOrder rank; counts exact.
    "q179_temporal_cv" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge.intDiv
      val k = 4
      val ev = Tables.events(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("tm"))
      val ranked = graft.ops.GlobalOrder.withRowNumber(ev,
        Seq(col("tm"), col("event_id")), "__rn", total = Some("__n"))
        .localCheckpoint() // cut extraction + per-fold counting
      val isCut = (1 to k).map(i =>
        col("__rn") === intDiv(lit(i.toLong) * col("__n"), lit(k.toLong))).reduce(_ || _)
      val cutsRaw = ranked.where(isCut)
        .select(col("__rn").as("cut_rn"), col("tm").as("cut_tm"))
      // fold index via a triangular count over the ≤k cut rows — keeps
      // the engine's zero-partition-less-window invariant (a bare
      // Window.orderBy here would be harmless at k rows but reintroduces
      // the single-task window shape the codebase bans)
      val cuts = cutsRaw
        .join(cutsRaw.select(col("cut_rn").as("__rn2")), col("__rn2") <= col("cut_rn"))
        .groupBy(col("cut_rn"), col("cut_tm")).agg(count(lit(1)).as("fold"))
      // fold i: train = rows with rn <= cut_{i-1} (cut_0 = 0), test =
      // rows in (cut_{i-1}, cut_i] — counted directly from the ranks
      val prev = cuts.select((col("fold") + 1).as("fold"),
        col("cut_rn").as("prev_rn"), col("cut_tm").as("prev_tm"))
      cuts.join(prev, Seq("fold"), "left")
        .where(col("fold") > 1) // fold 1 has no training history
        .select(col("fold"),
          coalesce(col("prev_rn"), lit(0L)).as("n_train"),
          (col("cut_rn") - coalesce(col("prev_rn"), lit(0L))).as("n_test"),
          col("prev_tm").as("train_end_us"), col("cut_tm").as("test_end_us"))
    },
    // identifier churn: consecutive-IP switches (rotation), not just
    // distinct counts — 2 IPs alternated 100x is 99 switches
    "q124_ip_churn" -> { (s, dir) =>
      AmlPatterns.ipChurn(Tables.transactions(s, dir))
        .select(col("customer_id"), col("n"), col("distinct_ips"),
          col("ip_switches"), r6(col("switch_rate")).as("switch_rate"))
    },
    // Goh-Barabási burstiness of inter-arrival gaps: +1 bursty, 0
    // Poisson, -1 clockwork (scripted) — one number per customer
    "q125_burstiness" -> { (s, dir) =>
      graft.ops.Temporal.burstiness(Tables.events(s, dir),
          col("user_id"), col("ts"), col("event_id"))
        .select(col("k").as("customer_id"), col("n_gaps"),
          r6(col("burstiness")).as("burstiness"))
    },
    // degree assortativity of the customer-merchant graph: one-number
    // structural fingerprint (hub-and-spoke topologies go negative)
    "q126_assortativity" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(concat(lit("c:"), col("user_id").cast("string")).as("src"),
          concat(lit("m:"), col("event_type")).as("dst")).distinct()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      GraphOps.degreeAssortativity(sym)
        .select(col("n_edges"), r6(col("assortativity")).as("assortativity"))
    },
    // embedding outlier screen: top-20 vectors by squared distance to the
    // global centroid (training-data quality gate for the vector column);
    // ranked by the ROUNDED distance so float noise cannot reorder
    "q127_embedding_outliers" -> { (s, dir) =>
      val exploded = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      val cent = exploded.groupBy(col("pos")).agg(avg(col("v")).as("c"))
      exploded.join(broadcast(cent), Seq("pos"))
        .groupBy(col("vec_id"))
        .agg(sum(pow(col("v") - col("c"), 2)).as("d2raw"))
        .select(col("vec_id"), r6(col("d2raw")).as("d2"))
        .orderBy(col("d2").desc, col("vec_id").asc)
        .limit(20)
    },
    // corpus dedup report: one-row summary of exact-duplicate mass and
    // the token volume dropping it would save
    "q128_dedup_report" -> { (s, dir) =>
      val w = Window.partitionBy(md5(col("text")))
      val rows = Tables.documents(s, dir).select(col("doc_id"),
        md5(col("text")).as("fp"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("toks"),
        (col("doc_id") =!= min(col("doc_id")).over(w)).as("is_dup"))
      rows.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        count(when(col("is_dup"), 1)).as("dup_docs"),
        r6(count(when(col("is_dup"), 1)).cast("double") / count(lit(1)))
          .as("dup_rate"),
        sum(col("toks")).cast("long").as("tokens_total"),
        coalesce(sum(when(col("is_dup"), col("toks"))), lit(0)).cast("long")
          .as("tokens_dropped"))
    },
    // winsorized means per merchant: clip at the 1/64 and 63/64
    // quantiles (power-of-two fractions -> bit-identical interpolation
    // across engines, the q90 trick) and report raw vs robust means
    "q144_winsorize" -> { (s, dir) =>
      val c = AmlPatterns.cents(col("amount"))
      val tx = Tables.transactions(s, dir).select(col("merchant_id"), c.as("cents"))
      val qs = tx.groupBy(col("merchant_id").as("m"))
        .agg(expr("percentile(cents, 0.015625)").as("lo"),
          expr("percentile(cents, 0.984375)").as("hi"))
      tx.join(broadcast(qs), col("merchant_id") === col("m"))
        .groupBy(col("merchant_id"))
        .agg(count(lit(1)).as("n"),
          count(when(col("cents") < col("lo") || col("cents") > col("hi"), 1))
            .as("n_clipped"),
          r6(avg(col("cents"))).as("mean_raw"),
          r6(avg(greatest(least(col("cents").cast("double"), col("hi")), col("lo"))))
            .as("mean_winsorized"),
          r6(first(col("lo"))).as("lo"), r6(first(col("hi"))).as("hi"))
    },
    // cross-merchant daily-volume correlation: lead-lag/comovement
    // fingerprint between entity pairs (inner-joined on shared days)
    "q138_cross_correlation" -> { (s, dir) =>
      val d = Tables.events(s, dir)
        .groupBy(col("event_type").as("m"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      d.as("a").join(d.as("b"),
          col("a.day") === col("b.day") && col("a.m") < col("b.m"))
        .groupBy(col("a.m").as("m1"), col("b.m").as("m2"))
        .agg(count(lit(1)).as("n_days"),
          r6z(corr(col("a.c"), col("b.c"))).as("day_corr"))
    },
    // per-merchant user saturation curve: new vs cumulative distinct
    // users by week (first-touch attribution, exact integers)
    "q139_saturation" -> { (s, dir) =>
      val f = Tables.events(s, dir)
        .groupBy(col("event_type").as("m"), col("user_id"))
        .agg(min(to_date(date_trunc("week", col("ts")))).as("wk"))
      val cum = Window.partitionBy(col("m")).orderBy(col("wk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      f.groupBy(col("m"), col("wk"))
        .agg(count(lit(1)).as("new_users"))
        .select(col("m").as("merchant_id"), col("wk").cast("string").as("week"),
          col("new_users"), sum(col("new_users")).over(cum).as("cum_users"))
    },
    // centroid silhouette per label: (nearest-other-centroid distance −
    // own-centroid distance) / max of the two, averaged — the cluster
    // separation score of the embedding space (label quality at a glance)
    "q140_silhouette" -> { (s, dir) =>
      val exploded = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
      val cents = exploded.groupBy(col("label").as("clabel"), col("pos"))
        .agg(avg(col("v")).as("c"))
      val d2 = exploded.join(cents, Seq("pos"))
        .groupBy(col("vec_id"), col("label"), col("clabel"))
        .agg(sum(pow(col("v") - col("c"), 2)).as("d2"))
      val sil = d2.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("label") === col("clabel"), col("d2"))).as("down"),
          min(when(col("label") =!= col("clabel"), col("d2"))).as("dother"))
        .select(col("label"),
          ((col("dother") - col("down")) / greatest(col("dother"), col("down")))
            .as("s"))
      sil.groupBy(col("label"))
        .agg(count(lit(1)).as("n"), r6(avg(col("s"))).as("mean_silhouette"))
    },
    // day-of-week seasonal index per merchant: avg daily volume by dow
    // over the merchant's overall daily average
    "q133_seasonal_index" -> { (s, dir) =>
      val d = Tables.events(s, dir)
        .groupBy(col("event_type").as("m"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val byDow = d.groupBy(col("m"), dayofweek(col("day")).as("dow"))
        .agg(avg(col("c")).as("avg_c"))
      val overall = d.groupBy(col("m").as("m2")).agg(avg(col("c")).as("ov"))
      byDow.join(broadcast(overall), col("m") === col("m2"))
        .select(col("m").as("merchant_id"), col("dow").cast("long").as("dow"),
          r6(col("avg_c")).as("avg_daily_cnt"),
          r6(col("avg_c") / col("ov")).as("seasonal_index"))
    },
    // weekly growth accounting: new / retained / resurrected actives +
    // forward-attributed churn (new+retained+resurrected = weekly actives)
    "q134_growth_accounting" -> { (s, dir) =>
      Cohort.growthAccounting(Tables.events(s, dir))
        .select(col("week").cast("string").as("week"), col("new_users"),
          col("retained"), col("resurrected"), col("churned_after"))
    },
    // trailing-28d daily volume anomaly per merchant: z-score of each
    // day's count against its own trailing window (self-inclusive)
    "q135_daily_anomaly" -> { (s, dir) =>
      val d = Tables.events(s, dir)
        .groupBy(col("event_type").as("m"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("m")).orderBy(unix_date(col("day")))
        .rangeBetween(-27, 0)
      d.select(col("m").as("merchant_id"), col("day").cast("string").as("day"),
          col("c"), avg(col("c")).over(w).as("mu"),
          stddev_pop(col("c")).over(w).as("sd"))
        .select(col("merchant_id"), col("day"), col("c"),
          r6(col("mu")).as("mu28"),
          r6(when(col("sd") > 0, (col("c") - col("mu")) / col("sd"))).as("z"),
          coalesce(when(col("sd") > 0, abs((col("c") - col("mu")) / col("sd")) > 3),
            lit(false)).as("anomalous"))
    },
    // char-trigram diversity: the repetition/boilerplate filter a corpus
    // pipeline runs before tokenization (low = template text)
    "q129_trigram_diversity" -> { (s, dir) =>
      graft.scale.TextOps.trigramDiversity(Tables.documents(s, dir),
          col("doc_id"), col("text"))
        .select(col("doc_id"), col("n_trigrams"), col("n_distinct"),
          r6(col("diversity")).as("diversity"))
    },
    // circadian rhythm: circular mean resultant length + peak hour per
    // customer (23:55 and 00:05 are NEAR, unlike bucket histograms)
    "q130_circadian" -> { (s, dir) =>
      graft.ops.Temporal.circadian(Tables.events(s, dir),
          col("user_id"), col("ts"))
        .select(col("k").as("customer_id"), col("n"),
          r6(col("rhythm_r")).as("rhythm_r"),
          r6(col("peak_hour")).as("peak_hour"))
    },
    // dormant-account reactivation: longest-ever silence vs the gap just
    // before the latest txn (account-takeover / mule signal)
    "q115_dormancy" -> { (s, dir) =>
      AmlPatterns.dormancy(Tables.transactions(s, dir),
          reactivationSeconds = 172800L)
        .select(col("customer_id"), col("n"), col("max_gap_us"),
          col("last_gap_us"), col("reactivated"))
    },
    // Lorenz-curve deciles of customer volume (graphical twin of
    // Gini/Theil): cumulative share carried by each volume decile
    "q117_lorenz" -> { (s, dir) =>
      val per = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(sum(AmlPatterns.cents(col("value"))).as("c"))
      Distribution.lorenzDeciles(per, col("user_id"), col("c"))
        .select(col("decile"), col("n_entities"), col("vol").as("vol_cents"),
          r6(col("cum_share")).as("cum_share"))
    },
    // mirrored-amount pairs: same customer, same exact cents, different
    // merchants within 24h — split-payment / layering structure
    "q118_mirror_pairs" -> { (s, dir) =>
      AmlPatterns.mirrorPairs(Tables.transactions(s, dir),
        windowSeconds = 86400L)
    },
    // week-over-week activity shift per customer (anchored at corpus max)
    "q119_wow_delta" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val anchor = tx.agg(max(col("event_timestamp")).as("anchor"))
      val us = unix_micros(col("event_timestamp"))
      val aus = unix_micros(col("anchor"))
      val wk = 7L * 86400000000L
      tx.crossJoin(broadcast(anchor))
        .groupBy(col("customer_id"))
        .agg(count(when(us > aus - wk, 1)).as("cnt_recent"),
          count(when(us <= aus - wk && us > aus - 2 * wk, 1)).as("cnt_prior"))
        .select(col("customer_id"), col("cnt_recent"), col("cnt_prior"),
          (col("cnt_recent") - col("cnt_prior")).as("delta"),
          r6(when(col("cnt_prior") > 0,
            col("cnt_recent").cast("double") / col("cnt_prior"))).as("wow_ratio"))
    },
    // per-customer Benford chi-square as a ranked suspicion score
    "q120_benford_entity" -> { (s, dir) =>
      AmlPatterns.benfordByEntity(Tables.transactions(s, dir), col("customer_id"))
        .select(col("entity").as("customer_id"), col("n"), r2(col("chi2")).as("chi2"))
    },
    // exact weighted median: the smallest cents value whose cumulative
    // weight reaches half the total — all-integer accumulation, no
    // interpolation, engine-exact by construction
    "q107_weighted_median" -> { (s, dir) =>
      val c = AmlPatterns.cents(col("amount"))
      val byVal = Tables.transactions(s, dir)
        .groupBy(col("merchant_id"), c.as("cents"))
        .agg(count(lit(1)).as("w"))
      val win = Window.partitionBy(col("merchant_id")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("merchant_id"))
      byVal
        .withColumn("cum", sum(col("w")).over(win))
        .withColumn("half", sum(col("w")).over(tot))
        .where(col("cum") * 2 >= col("half"))
        .groupBy(col("merchant_id"))
        .agg(min(col("cents")).as("weighted_median_cents"))
    },
    // Theil inequality index per merchant: (1/n) Σ (x/μ)·ln(x/μ) on
    // positive amounts — complements Gini/HHI in the inequality family
    "q108_theil" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir).where(col("amount") > 0)
      val stats = tx.groupBy(col("merchant_id").as("m"))
        .agg(avg(col("amount")).as("mu"))
      tx.join(broadcast(stats), col("merchant_id") === col("m"))
        .groupBy(col("merchant_id"))
        .agg(r6(avg((col("amount") / col("mu")) * log(col("amount") / col("mu"))))
          .as("theil"), count(lit(1)).as("n"))
    },
    // proximity to flagged accounts: bounded-BFS hop distance on the
    // customer-merchant graph (exact integer distances, NULL beyond 4)
    "q106_distance_to_flagged" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val e = ev.select(concat(lit("c:"), col("user_id").cast("string")).as("src"),
          concat(lit("m:"), col("event_type")).as("dst")).distinct()
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = sym.select(col("src").as("node")).distinct()
      val flagged = ev.where(col("value") > 300)
        .select(concat(lit("c:"), col("user_id").cast("string")).as("node")).distinct()
      graft.ops.GraphOps.distanceToFlagged(sym, nodes, flagged, maxHops = 4)
        .select(col("node"), col("d").as("dist"))
    },
    // composite AML screen: structuring share + round-amount bias +
    // decayed-activity intensity folded into one ranked suspicion score.
    // Ranks order by the ROUNDED score (then id), so cross-engine float
    // noise cannot reorder near-ties.
    "q105_composite_screen" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val c = AmlPatterns.cents(col("amount"))
      val anchor = tx.agg(max(col("event_timestamp")).as("anchor"))
      val base = tx.crossJoin(broadcast(anchor))
        .groupBy(col("customer_id"))
        .agg(
          (count(when(c >= 9000 && c < 10000, 1)).cast("double") / count(lit(1)))
            .as("band_share"),
          (count(when(c % 100 === 0, 1)).cast("double") / count(lit(1)))
            .as("whole_share"),
          sum(exp((unix_micros(col("anchor")) - unix_micros(col("event_timestamp")))
            * lit(-math.log(2.0) / (604800 * 1e6)))).as("decayed"))
      val mx = base.agg(max(col("decayed")).as("mx"))
      val scored = base.crossJoin(broadcast(mx))
        .select(col("customer_id"),
          r6(col("band_share") * 0.5 + col("whole_share") * 0.3 +
            col("decayed") / col("mx") * 0.2).as("suspicion"))
      // rank over the ROUNDED score (float-noise-stable) via the two-pass
      // range-partitioned rank — entity-scale, no single-task sort
      graft.ops.GlobalOrder.withRowNumber(scored,
        Seq(col("suspicion").desc, col("customer_id")), "rank")
    },
    // nearest-centroid classification over the embedding column: assign
    // each vector to the closest class centroid (argmin over summed
    // squared distance; class gaps dwarf float summation noise)
    "q104_nearest_centroid" -> { (s, dir) =>
      val exploded = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
      val cents = exploded.groupBy(col("label").as("clabel"), col("pos"))
        .agg(avg(col("v")).as("c"))
      exploded
        .join(cents, Seq("pos"))
        .groupBy(col("vec_id"), col("label"), col("clabel"))
        .agg(sum(pow(col("v") - col("c"), 2)).as("d2"))
        .groupBy(col("vec_id"), col("label"))
        .agg(min(struct(col("d2"), col("clabel"))).as("mn"))
        .select(col("vec_id"), col("label"),
          col("mn.clabel").cast("long").as("pred_label"),
          (col("mn.clabel") === col("label")).as("correct"))
    },
    // embedding mean-pooling: per-class centroid of the vector column
    // (the chunk->document pooling step of an embedding pipeline),
    // exploded to (label, pos) rows so the gate can hash scalars
    "q103_embedding_centroid" -> { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(r6(avg(col("v"))).as("centroid"), count(lit(1)).as("n"))
    },
    // forward-looking label construction: at each event, did an 'error'
    // event follow within 24h for this user? The label-generation stage
    // of a supervised pipeline — a FUTURE range frame, strictly after
    // the current instant so the label never leaks the feature row
    "q102_future_labels" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(1L, 86400000000L)
      Tables.events(s, dir)
        .select(col("event_id"),
          coalesce(max(when(col("event_type") === "error", 1L).otherwise(0L)).over(w),
            lit(0L)).as("label_error_24h"))
    },
    // lag-1 autocorrelation of the daily volume series per merchant —
    // rounds out the time-series family (trend/gap-fill/CUSUM/Markov)
    "q101_autocorr" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily.withColumn("prev", lag(col("cnt"), 1).over(w))
        .where(col("prev").isNotNull)
        .groupBy(col("event_type").as("merchant_id"))
        .agg(r6z(corr(col("cnt").cast("double"), col("prev").cast("double")))
          .as("lag1_autocorr"),
          count(lit(1)).as("n_pairs"))
    },
    // CUSUM change-point scan over the daily volume series: cumulative
    // deviation from the global mean, deterministic day ordering — the
    // monitoring primitive for "when did behavior shift"
    "q100_cusum" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val tot = daily.agg(sum(col("cnt")).as("total"), count(lit(1)).as("days"))
      // closed form over EXACT integer cumulatives: cusum_i = Σcnt − i·mean
      // (identical IEEE ops on any engine, unlike a sequential double
      // window sum whose association depends on execution layout). The
      // prefix runs as a triangular self-join over the per-DAY table —
      // calendar-bounded, no window, no single-partition sort.
      val prior = daily.select(col("day").as("__d2"), col("cnt").as("__c2"))
      daily.join(prior, col("__d2") <= col("day"))
        .groupBy(col("day"), col("cnt"))
        .agg(sum(col("__c2")).as("__cumcnt"), count(lit(1)).as("__rk"))
        .crossJoin(broadcast(tot))
        .select(col("day").cast("string").as("day"), col("cnt"),
          r6(col("__cumcnt").cast("double") -
            col("__rk") * (col("total").cast("double") / col("days"))).as("cusum"))
    },
    // per-customer session behavior (on top of native session_window):
    // session_window.end = last event + gap, so duration = end-start-gap
    // in exact integer micros
    "q99_session_features" -> { (s, dir) =>
      val gapMinutes = 30
      val gapUs = gapMinutes * 60000000L
      val sessions = Tables.transactions(s, dir)
        .groupBy(col("customer_id"),
          session_window(col("event_timestamp"), s"$gapMinutes minutes").as("sw"))
        .agg(count(lit(1)).as("txns"))
        .select(col("customer_id"), col("txns"),
          ((unix_micros(col("sw.end")) - unix_micros(col("sw.start")) - gapUs) / 1e6)
            .as("secs"))
      sessions.groupBy(col("customer_id"))
        .agg(count(lit(1)).as("n_sessions"),
          r6(avg(col("secs"))).as("avg_session_secs"),
          r6(avg(col("txns"))).as("avg_txns_per_session"),
          max(col("txns")).as("max_session_txns"))
    },
    // shared-IP ring pairs (hub-rank-cut self-join, top-k by shared count)
    "q98_shared_id_pairs" -> { (s, dir) =>
      AmlPatterns.sharedIdPairs(Tables.transactions(s, dir),
        col("ip_address"), hubFrac = 0.7, topK = 20)
    },
    // market-basket lift between merchant pairs — AmlPatterns
    // .cooccurrenceLift with the trim exposed as a parameter. OUTPUT
    // CONTRACT: keepFrac=0.8 computes lift over the population with the
    // top-20% largest baskets removed (degree-rank cut, hub-safe at
    // scale); keepFrac=1.0 would be the untrimmed classic lift.
    "q96_cooccurrence" -> { (s, dir) =>
      AmlPatterns.cooccurrenceLift(Tables.transactions(s, dir), keepFrac = 0.8)
        .select(col("m1"), col("m2"), col("n_both"), r6(col("lift")).as("lift"))
    },
    // RFM segmentation: quintiles over exact integer measures (micros
    // recency, count, cents) — float-free ordering, deterministic ties.
    // Each quintile is a two-pass range-partitioned rank (GlobalOrder) —
    // entity-scale input, but 10⁹ customers through one ntile task is
    // still the scale killer — joined back on the customer key.
    "q97_rfm" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val anchor = tx.agg(max(col("event_timestamp")).as("anchor"))
      // localCheckpoint: each quintile's two-pass rank consumes `per`
      // twice (percentile sample + ranked scan) and there are three of
      // them plus the final join — without it the RFM aggregate pipeline
      // recomputes ~9x (round-4 ADVICE). One materialization, 4 narrow
      // columns/customer, read 7 times.
      val per = tx.crossJoin(broadcast(anchor))
        .groupBy(col("customer_id"))
        .agg((unix_micros(first(col("anchor"))) - unix_micros(max(col("event_timestamp"))))
          .as("recency_us"),
          count(lit(1)).as("freq"),
          sum(AmlPatterns.cents(col("amount"))).as("monetary_cents"))
        .localCheckpoint()
      def quintile(measure: String, ord: Seq[org.apache.spark.sql.Column], out: String) =
        graft.ops.GlobalOrder.withRowNumber(
            per.select(col("customer_id"), col(measure)), ord, "__rn", total = Some("__n"))
          .select(col("customer_id"),
            graft.ops.GlobalOrder.ntileOf(col("__rn"), col("__n"), 5).as(out))
      val r = quintile("recency_us", Seq(col("recency_us").asc, col("customer_id")), "r_score")
      val f = quintile("freq", Seq(col("freq").desc, col("customer_id")), "f_score")
      val m = quintile("monetary_cents", Seq(col("monetary_cents").desc, col("customer_id")), "m_score")
      per.join(r, "customer_id").join(f, "customer_id").join(m, "customer_id")
        .select(col("customer_id"), col("recency_us"), col("freq"), col("monetary_cents"),
          col("r_score"), col("f_score"), col("m_score"))
    },
    // PSI drift between calendar halves of the amount distribution
    "q94_psi_drift" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val cut = ev.agg((min(col("ts")) + expr("INTERVAL 17 DAYS")).as("cut"))
      graft.feedback.Drift.psi(ev.crossJoin(broadcast(cut)),
          col("value"), col("ts") <= col("cut"), lo = 0.0, hi = 500.0)
        .select(r6(col("psi")).as("psi"), col("drift_detected"))
    },
    // Jensen-Shannon divergence on the same split: bounded by ln 2, no
    // smoothing needed — completes the PSI/KS/AUC drift family
    "q142_jsd_drift" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val cut = ev.agg((min(col("ts")) + expr("INTERVAL 17 DAYS")).as("cut"))
      graft.feedback.Drift.jsd(ev.crossJoin(broadcast(cut)),
          col("value"), col("ts") <= col("cut"), lo = 0.0, hi = 500.0)
        .select(r6(col("jsd")).as("jsd"), col("drift_detected"))
    },
    // deterministic k-per-stratum sample (md5 order, no RNG)
    "q95_stratified_sample" -> { (s, dir) =>
      Splits.stratified(Tables.events(s, dir).select(col("event_id"), col("event_type")),
          col("event_type"), col("event_id"), k = 50)
        .select(col("event_id"), col("event_type"))
    },
    // recency-weighted activity: exp half-life decay as of the corpus
    // max timestamp (deterministic anchor, point-in-time correct)
    "q93_decayed_activity" -> { (s, dir) =>
      val tx = Tables.transactions(s, dir)
      val anchor = tx.agg(max(col("event_timestamp")).as("anchor"))
      AmlPatterns.decayedActivity(tx.crossJoin(broadcast(anchor)),
          col("anchor"), halfLifeSeconds = 604800)
        .select(col("customer_id"),
          r6(col("decayed_count")).as("decayed_count"),
          r2(col("decayed_amount")).as("decayed_amount"), col("n"))
    },
    // leakage-safe temporal split: train | embargo gap | test, cutoff at
    // an actual data timestamp (engine-exact, no quantile interpolation)
    "q91_temporal_split" -> { (s, dir) =>
      Splits.temporal(Tables.events(s, dir), col("ts"),
          trainFrac = 0.8, embargoSeconds = 86400)
        .select(col("event_id"), col("split"))
    },
    // hashed feature cross (merchant x hour-of-day), bounded cardinality
    "q92_feature_cross" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(graft.ops.Interactions.crossBucket(64,
          col("event_type"), hour(col("ts"))).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    },
    // Tukey IQR outlier fences per merchant, on exact integer cents:
    // quartile positions 0.25·(n-1) have power-of-two fractions, so the
    // interpolated fences are bit-identical across engines and the
    // outlier COUNTS (integers, no rounding refuge) compare exactly
    "q90_outlier_fences" -> { (s, dir) =>
      val c = AmlPatterns.cents(col("amount"))
      val tx = Tables.transactions(s, dir).select(col("merchant_id"), c.as("cents"))
      val stats = tx.groupBy(col("merchant_id").as("m"))
        .agg(expr("percentile(cents, 0.25)").as("q1"),
          expr("percentile(cents, 0.75)").as("q3"))
      val lo = col("q1") - (col("q3") - col("q1")) * 1.5
      val hi = col("q3") + (col("q3") - col("q1")) * 1.5
      tx.join(broadcast(stats), col("merchant_id") === col("m"))
        .groupBy(col("merchant_id"))
        .agg(count(lit(1)).as("n"),
          count(when(col("cents") < lo || col("cents") > hi, 1)).as("out_cnt"),
          first(lo).as("lof"), first(hi).as("hif"))
        .select(col("merchant_id"), col("n"), col("out_cnt"),
          r6(col("out_cnt").cast("double") / col("n")).as("out_rate"),
          r6(col("lof")).as("lo_fence"), r6(col("hif")).as("hi_fence"))
    },
    // one-pass declarative data-quality gate + FK integrity check
    "q89_quality_report" -> { (s, dir) =>
      import graft.ops.QualityChecks._
      val ev = Tables.events(s, dir)
      val single = report(ev, Seq(
        NotNull("event_id_not_null", col("event_id")),
        Unique("event_id_unique", col("event_id")),
        NotNull("value_not_null", col("value")),
        InRange("value_in_range", col("value"), 0.0, 1000.0)))
      val fk = refIntegrity("user_fk_in_customer", ev, col("user_id"),
        Tables.customer(s, dir), col("c_custkey"))
      single.union(fk)
        .select(col("constraint"), r6(col("metric")).as("metric"), col("passed"))
    },
    // Morton z-values for 2-D data clustering (codegen'd bit algebra)
    "q88_zorder" -> { (s, dir) =>
      val c = AmlPatterns.cents(col("value"))
      Tables.events(s, dir).select(col("event_id"), col("user_id"),
        c.as("cents"),
        graft.plans.ZOrder.zValue(col("user_id"), c, bits = 21).as("zval"))
    },
    // HLL-sketch distinct (the at-scale twin of exact countDistinct).
    // The raw estimate is deterministic in Spark but not reproducible in
    // DuckDB's different HLL implementation, so the gated output is the
    // exact count (hash-verified) plus `within_envelope`: whether the HLL
    // estimate landed inside 3x its theoretical relative standard error
    // (1.04/sqrt(2^lgK) ≈ 1.63% at lgK=12 → 5%). The oracle asserts TRUE,
    // so an estimator regression breaks the hash gate.
    "q87_sketch_distinct" -> { (s, dir) =>
      graft.ops.Sketches.hllDistinct(Tables.transactions(s, dir),
          col("merchant_id"), col("customer_id"))
        .select(col("entity").as("merchant_id"),
          col("exact").as("exact_distinct"),
          (col("rel_err") <= 0.05).as("within_envelope"))
    },
    // percentile-sketch acceptance gate (the q87 envelope recipe for the
    // OTHER sketch family): per-event-type exact p50/p90/p99 next to a
    // rank-space check of approx_percentile — the exact rank of each
    // sketch answer must sit within ±0.01 of its target (10× the
    // sketch's n/accuracy guarantee). Exact values hash-gate against
    // quantile_cont; the booleans assert the sketch held.
    "q188_percentile_sketch" -> { (s, dir) =>
      graft.ops.Sketches.approxPercentileGate(Tables.events(s, dir),
          col("event_type"), col("value"), Seq(0.5, 0.9, 0.99))
        .withColumnRenamed("g", "event_type")
    },
    // deterministic class rebalance: all positives + md5-sampled
    // negatives at 5/1000, with inverse-probability weights
    "q86_rebalance" -> { (s, dir) =>
      Splits.rebalance(Tables.events(s, dir).select(col("event_id"), col("value")),
          col("event_id"), col("value") > 300, keep = 5)
        .select(col("event_id"), col("label"), col("weight"))
    })

  /** Unrolled bounded k-core peeling: aggregation is illegal inside a
    * recursive CTE term, so each peel round is a plain GROUP BY degree
    * filter + two join restrictions — the same rounds the Spark loop runs.
    */
  private def kcoreSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""k$r AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e${r - 1} GROUP BY 1) WHERE deg >= $k),
e$r AS (SELECT e.src, e.dst FROM e${r - 1} e JOIN k$r a ON e.src = a.src JOIN k$r b ON e.dst = b.src)"""
    }.mkString(",\n")
    s"""WITH b0 AS (SELECT DISTINCT 'c:' || user_id AS src, 'm:' || event_type AS dst FROM events),
e0 AS (SELECT src, dst FROM b0 UNION SELECT dst, src FROM b0),
$steps
SELECT src AS node, count(*) AS deg FROM e$rounds GROUP BY 1"""
  }

  override val oracle: Map[String, String] = Map(
    "q159_rapid_repeats" ->
      """WITH t AS (SELECT event_id AS transaction_id, user_id AS customer_id,
  event_type AS merchant_id, value AS amount, epoch_us(ts) AS tm FROM events),
l AS (SELECT *, lag(tm) OVER w AS prev_tm, lag(amount) OVER w AS prev_amount
      FROM t WINDOW w AS (PARTITION BY customer_id, merchant_id ORDER BY tm, transaction_id))
SELECT transaction_id, customer_id, merchant_id, tm - prev_tm AS gap_us,
  round(amount + 5e-11, 4) AS amount, round(prev_amount + 5e-11, 4) AS prev_amount
FROM l WHERE prev_tm IS NOT NULL AND tm - prev_tm <= 60000000""",
    "q193_markov_nll" ->
      """WITH t AS (SELECT event_id AS transaction_id, user_id AS customer_id,
  event_type AS merchant_id, epoch_us(ts) AS tm FROM events),
st AS (SELECT customer_id, merchant_id AS cur, lag(merchant_id) OVER w AS prev
       FROM t WINDOW w AS (PARTITION BY customer_id ORDER BY tm, transaction_id)),
steps AS (SELECT * FROM st WHERE prev IS NOT NULL),
tr AS (SELECT prev, cur, count(*) AS c FROM steps GROUP BY 1, 2),
ft AS (SELECT prev, sum(c) AS ct FROM tr GROUP BY 1),
vv AS (SELECT count(DISTINCT merchant_id) AS v FROM t)
SELECT s.customer_id, count(*) AS n_steps,
  round(avg(-ln((tr.c + 1)::DOUBLE / (ft.ct + vv.v))) + 5e-11, 4) AS avg_nll,
  round(exp(avg(-ln((tr.c + 1)::DOUBLE / (ft.ct + vv.v)))) + 5e-11, 4) AS perplexity
FROM steps s JOIN tr ON s.prev = tr.prev AND s.cur = tr.cur
  JOIN ft ON s.prev = ft.prev, vv
GROUP BY 1""",
    "q144_winsorize" ->
      s"""WITH c AS (SELECT event_type AS merchant_id, $centsSql AS cents FROM events),
s AS (SELECT merchant_id, quantile_cont(cents, 0.015625) AS lo,
        quantile_cont(cents, 0.984375) AS hi FROM c GROUP BY 1)
SELECT c.merchant_id, count(*) AS n,
  count(*) FILTER (WHERE cents < lo OR cents > hi) AS n_clipped,
  round(avg(cents) + 5e-11, 4) AS mean_raw,
  round(avg(greatest(least(cents::DOUBLE, hi), lo)) + 5e-11, 4) AS mean_winsorized,
  round(lo + 5e-11, 4) AS lo, round(hi + 5e-11, 4) AS hi
FROM c JOIN s USING (merchant_id) GROUP BY c.merchant_id, lo, hi""",
    "q142_jsd_drift" ->
      """WITH c AS (SELECT min(ts) + INTERVAL 17 DAY AS cut FROM events),
b AS (SELECT least(greatest(floor((value - 0.0) / 50.0), 0), 9)::BIGINT AS bin,
        CASE WHEN ts <= cut THEN 1 ELSE 2 END AS g FROM events, c),
g2 AS (SELECT bin, count(*) FILTER (WHERE g = 1) AS c1,
         count(*) FILTER (WHERE g = 2) AS c2 FROM b GROUP BY 1),
t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g2),
pq AS (SELECT c1::DOUBLE / n1 AS p, c2::DOUBLE / n2 AS q,
         (c1::DOUBLE / n1 + c2::DOUBLE / n2) / 2 AS m FROM g2, t),
j AS (SELECT sum(coalesce(CASE WHEN p > 0 THEN p / 2 * ln(p / m) END, 0)
            + coalesce(CASE WHEN q > 0 THEN q / 2 * ln(q / m) END, 0)) AS jsd FROM pq)
SELECT round(jsd + 5e-11, 4) AS jsd, jsd > 0.1 AS drift_detected FROM j""",
    "q138_cross_correlation" ->
      """WITH d AS (SELECT event_type AS m, ts::DATE AS day, count(*) AS c FROM events GROUP BY 1, 2)
SELECT a.m AS m1, b.m AS m2, count(*) AS n_days,
  round(corr(a.c, b.c) + 5e-11, 4) + 0.0 AS day_corr
FROM d a JOIN d b ON a.day = b.day AND a.m < b.m
GROUP BY 1, 2""",
    "q139_saturation" ->
      """WITH f AS (SELECT event_type AS m, user_id,
        min(date_trunc('week', ts)::DATE) AS wk FROM events GROUP BY 1, 2),
g AS (SELECT m, wk, count(*) AS new_users FROM f GROUP BY 1, 2)
SELECT m AS merchant_id, wk::VARCHAR AS week, new_users,
  sum(new_users) OVER (PARTITION BY m ORDER BY wk ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
FROM g""",
    "q140_silhouette" ->
      """WITH x AS (SELECT vec_id, label, i, embedding[i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) AS t(i)),
c AS (SELECT label AS clabel, i, avg(v) AS c FROM x GROUP BY 1, 2),
d AS (SELECT x.vec_id, x.label, c.clabel, sum(pow(x.v - c.c, 2)) AS d2
      FROM x JOIN c USING (i) GROUP BY 1, 2, 3),
o AS (SELECT vec_id, label,
        max(CASE WHEN label = clabel THEN d2 END) AS down,
        min(CASE WHEN label <> clabel THEN d2 END) AS dother
      FROM d GROUP BY 1, 2)
SELECT label, count(*) AS n,
  round(avg((dother - down) / greatest(dother, down)) + 5e-11, 4) AS mean_silhouette
FROM o GROUP BY 1""",
    "q133_seasonal_index" ->
      """WITH d AS (SELECT event_type AS m, ts::DATE AS day, count(*) AS c FROM events GROUP BY 1, 2),
g AS (SELECT m, dayofweek(day) + 1 AS dow, avg(c::DOUBLE) AS avg_c FROM d GROUP BY 1, 2),
t AS (SELECT m, avg(c::DOUBLE) AS ov FROM d GROUP BY 1)
SELECT g.m AS merchant_id, g.dow::BIGINT AS dow,
  round(g.avg_c + 5e-11, 4) AS avg_daily_cnt,
  round(g.avg_c / t.ov + 5e-11, 4) AS seasonal_index
FROM g JOIN t USING (m)""",
    "q134_growth_accounting" ->
      """WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk FROM events),
x AS (SELECT user_id, wk,
        min(wk) OVER (PARTITION BY user_id) AS first_wk,
        lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
        lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM w)
SELECT wk::VARCHAR AS week,
  count(*) FILTER (WHERE wk = first_wk) AS new_users,
  count(*) FILTER (WHERE prev_wk = wk - 7) AS retained,
  count(*) FILTER (WHERE wk <> first_wk AND (prev_wk IS NULL OR prev_wk < wk - 7)) AS resurrected,
  count(*) FILTER (WHERE next_wk IS NULL OR next_wk > wk + 7) AS churned_after
FROM x GROUP BY 1""",
    "q135_daily_anomaly" ->
      """WITH d AS (SELECT event_type AS m, ts::DATE AS day, count(*) AS c FROM events GROUP BY 1, 2),
z AS (SELECT m, day, c,
        avg(c) OVER w AS mu, stddev_pop(c) OVER w AS sd
      FROM d WINDOW w AS (PARTITION BY m ORDER BY (day - DATE '1970-01-01')
                          RANGE BETWEEN 27 PRECEDING AND CURRENT ROW))
SELECT m AS merchant_id, day::VARCHAR AS day, c,
  round(mu + 5e-11, 4) AS mu28,
  CASE WHEN sd > 0 THEN round((c - mu) / sd + 5e-11, 4) END AS z,
  coalesce(CASE WHEN sd > 0 THEN abs((c - mu) / sd) > 3 END, false) AS anomalous
FROM z""",
    "q129_trigram_diversity" ->
      """WITH b AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS t FROM documents),
x AS (SELECT doc_id, substr(t, i, 3) AS tri
      FROM b, unnest(range(1, greatest(length(t) - 1, 1))) AS u(i)),
g AS (SELECT doc_id, count(*) AS n_trigrams, count(DISTINCT tri) AS n_distinct
      FROM x GROUP BY 1)
SELECT b.doc_id, coalesce(g.n_trigrams, 0) AS n_trigrams,
  coalesce(g.n_distinct, 0) AS n_distinct,
  CASE WHEN g.n_trigrams > 0
       THEN round(g.n_distinct::DOUBLE / g.n_trigrams + 5e-11, 4) END AS diversity
FROM b LEFT JOIN g USING (doc_id)""",
    "q130_circadian" ->
      """WITH a AS (SELECT user_id,
  cos((epoch_us(ts) % 86400000000)::DOUBLE / 86400000000 * (2 * pi())) AS cx,
  sin((epoch_us(ts) % 86400000000)::DOUBLE / 86400000000 * (2 * pi())) AS sy
FROM events),
s AS (SELECT user_id, count(*) AS n, avg(cx) AS mc, avg(sy) AS ms FROM a GROUP BY 1)
SELECT user_id AS customer_id, n,
  round(sqrt(mc * mc + ms * ms) + 5e-11, 4) AS rhythm_r,
  round((((atan2(ms, mc) % (2 * pi())) + 2 * pi()) % (2 * pi())) / (2 * pi()) * 24 + 5e-11, 4) AS peak_hour
FROM s""",
    "q124_ip_churn" ->
      """WITH c AS (SELECT user_id, json_extract_string(props, 'k') AS ip,
        lag(json_extract_string(props, 'k')) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      FROM events)
SELECT user_id AS customer_id, count(*) AS n,
  count(DISTINCT ip) AS distinct_ips,
  count(*) FILTER (WHERE prev IS NOT NULL AND prev <> ip) AS ip_switches,
  CASE WHEN count(*) > 1 THEN
    round((count(*) FILTER (WHERE prev IS NOT NULL AND prev <> ip))::DOUBLE
          / (count(*) - 1) + 5e-11, 4) END AS switch_rate
FROM c GROUP BY 1""",
    "q125_burstiness" ->
      """WITH g AS (SELECT user_id,
  epoch_us(ts) - lag(epoch_us(ts)) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap FROM events),
s AS (SELECT user_id, count(gap) AS n_gaps, avg(gap) AS mu,
        coalesce(stddev_pop(gap), 0.0) AS sd FROM g GROUP BY 1)
SELECT user_id AS customer_id, n_gaps,
  CASE WHEN n_gaps >= 1 AND sd + mu > 0
       THEN round((sd - mu) / (sd + mu) + 5e-11, 4) END AS burstiness
FROM s""",
    "q126_assortativity" ->
      """WITH b AS (SELECT DISTINCT 'c:' || user_id AS src, 'm:' || event_type AS dst FROM events),
e AS (SELECT src, dst FROM b UNION SELECT dst, src FROM b),
d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)
SELECT count(*) AS n_edges,
  round(corr(da.deg, db.deg) + 5e-11, 4) AS assortativity
FROM e JOIN d da ON e.src = da.src JOIN d db ON e.dst = db.src""",
    "q127_embedding_outliers" ->
      """WITH x AS (SELECT vec_id, i, embedding[i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) AS t(i)),
c AS (SELECT i, avg(v) AS c FROM x GROUP BY 1),
d AS (SELECT vec_id, round(sum(pow(v - c.c, 2)) + 5e-11, 4) AS d2
      FROM x JOIN c USING (i) GROUP BY 1)
SELECT vec_id, d2 FROM d ORDER BY d2 DESC, vec_id ASC LIMIT 20""",
    "q128_dedup_report" ->
      """WITH r AS (SELECT doc_id, md5(text) AS fp,
  len(regexp_extract_all(text, '\S+')) AS toks,
  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
FROM documents)
SELECT count(*) AS n_docs, count(DISTINCT fp) AS n_unique,
  count(*) FILTER (WHERE is_dup) AS dup_docs,
  round((count(*) FILTER (WHERE is_dup))::DOUBLE / count(*) + 5e-11, 4) AS dup_rate,
  sum(toks)::BIGINT AS tokens_total,
  coalesce(sum(toks) FILTER (WHERE is_dup), 0)::BIGINT AS tokens_dropped
FROM r""",
    "q178_group_kfold" ->
      """WITH f AS (
  SELECT user_id, event_type,
    ('0x' || substr(md5('gcv:' || user_id), 1, 8))::UBIGINT % 5 AS fold
  FROM events)
SELECT fold::BIGINT AS fold,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  count(*) AS n_events,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS pos,
  round((count(*) FILTER (WHERE event_type = 'error'))::DOUBLE / count(*) + 5e-11, 4) AS pos_rate
FROM f GROUP BY 1""",
    "q179_temporal_cv" -> {
      val kcv = 4
      val cvRanks = (1 to kcv).map(i => s"$i*n//$kcv").mkString(", ")
      s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS tm FROM events),
r AS (SELECT event_id, tm, row_number() OVER (ORDER BY tm, event_id) AS rn,
        count(*) OVER () AS n FROM ev),
c0 AS MATERIALIZED (SELECT rn AS cut_rn, tm AS cut_tm FROM r WHERE rn IN ($cvRanks)),
c AS (SELECT a.cut_rn, a.cut_tm, count(*) AS fold
      FROM c0 a JOIN c0 b ON b.cut_rn <= a.cut_rn GROUP BY 1, 2),
p AS (SELECT fold + 1 AS fold, cut_rn AS prev_rn, cut_tm AS prev_tm FROM c)
SELECT c.fold, CAST(coalesce(p.prev_rn, 0) AS BIGINT) AS n_train,
  CAST(c.cut_rn - coalesce(p.prev_rn, 0) AS BIGINT) AS n_test,
  p.prev_tm AS train_end_us, c.cut_tm AS test_end_us
FROM c LEFT JOIN p USING (fold) WHERE c.fold > 1"""
    },
    "q177_csi" -> {
      val ranks = (1 to 9).map(i => s"$i*n//10").mkString(", ")
      s"""WITH ct AS (SELECT min(ts) + INTERVAL 17 DAY AS cutts FROM events),
tg AS MATERIALIZED (
  SELECT event_id, value, ts <= ct.cutts AS p1 FROM events, ct),
r AS (SELECT value, row_number() OVER (ORDER BY value, event_id) AS rn,
        count(*) OVER () AS n
      FROM tg WHERE p1),
cutsT AS MATERIALIZED (SELECT value AS cutval FROM r WHERE rn IN ($ranks)),
b AS (SELECT p1,
        (SELECT count(*) FROM cutsT WHERE cutval < tg.value) AS bucket
      FROM tg),
p AS (SELECT bucket,
        CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN p1 THEN 0 ELSE 1 END) AS BIGINT) AS n2
      FROM b GROUP BY 1),
t AS (SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2 FROM p)
SELECT bucket, n1, n2,
  round((n1 + 0.5)/(t1 + 5.0) + 5e-11, 4) AS share1,
  round((n2 + 0.5)/(t2 + 5.0) + 5e-11, 4) AS share2,
  round(((n2 + 0.5)/(t2 + 5.0) - (n1 + 0.5)/(t1 + 5.0))
    * ln(((n2 + 0.5)/(t2 + 5.0)) / ((n1 + 0.5)/(t1 + 5.0))) + 5e-11, 4) AS csi_contrib
FROM p, t"""
    },
    "q176_woe_iv" ->
      """WITH b AS (
  SELECT event_id, value, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
  FROM events),
d AS (SELECT y, ntile(10) OVER (ORDER BY value, event_id) AS decile FROM b),
p AS (SELECT decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(n_pos) AS BIGINT) AS tp FROM p)
SELECT decile, n, n_pos,
  round(ln(((n_pos + 0.5)/(tp + 5.0)) / (((n - n_pos) + 0.5)/((tn - tp) + 5.0))) + 5e-11, 4) AS woe,
  round((((n_pos + 0.5)/(tp + 5.0)) - (((n - n_pos) + 0.5)/((tn - tp) + 5.0)))
    * ln(((n_pos + 0.5)/(tp + 5.0)) / (((n - n_pos) + 0.5)/((tn - tp) + 5.0))) + 5e-11, 4) AS iv_contrib
FROM p, t""",
    "q174_label_propagation" -> {
      // semi-synchronous bipartite LPA unrolled: per round, merchants
      // take the plurality label of their customers (ties -> min label),
      // then customers take the plurality label of their merchants
      def phase(out: String, key: String, src: String, join: String, lab: String) =
        s"""$out AS MATERIALIZED (
  SELECT $key, community FROM (
    SELECT e.$key, l.community, count(*) AS cnt,
      row_number() OVER (PARTITION BY e.$key ORDER BY count(*) DESC, l.community ASC) AS rk
    FROM e JOIN $lab l USING ($join)
    GROUP BY e.$key, l.community)
  WHERE rk = 1)"""
      val rounds = (1 to 3).map { r =>
        phase(s"m$r", "merchant_id", "e", "customer_id", if (r == 1) "c0" else s"c${r - 1}") +
          ",\n" + phase(s"c$r", "customer_id", "e", "merchant_id", s"m$r")
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
  SELECT DISTINCT user_id AS customer_id, event_type AS merchant_id FROM events),
c0 AS (SELECT DISTINCT customer_id, customer_id AS community FROM e),
$rounds,
s AS (SELECT community, count(*) AS community_size FROM c3 GROUP BY 1)
SELECT c3.customer_id, c3.community, s.community_size
FROM c3 JOIN s USING (community)"""
    },
    "q121_hits" -> graft.ops.Hits.oracleSql(
      "SELECT DISTINCT 'c:' || user_id AS src, 'm:' || event_type AS dst FROM events",
      iters = 6, round = s => s"round($s + 5e-11, 4)"),
    "q122_cond_entropy" ->
      """WITH q AS (SELECT user_id, event_type AS a,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS b
      FROM events),
g AS (SELECT user_id, a, b, count(*) AS c FROM q WHERE b IS NOT NULL GROUP BY 1, 2, 3),
w AS (SELECT user_id, c,
        sum(c) OVER (PARTITION BY user_id) AS n,
        sum(c) OVER (PARTITION BY user_id, a) AS ca FROM g)
SELECT user_id AS customer_id, max(n)::BIGINT AS n_transitions,
  round(0 - sum((c::DOUBLE / n) * log2(c::DOUBLE / ca)) + 5e-11, 4) AS cond_entropy
FROM w GROUP BY 1""",
    "q231_stratified_kfold" ->
      """WITH b AS (SELECT event_id,
  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y FROM events),
r AS (SELECT event_id, CAST(y AS BIGINT) AS y,
  CAST((row_number() OVER (PARTITION BY y
    ORDER BY ('0x' || substr(md5('skf:' || event_id), 1, 8))::UBIGINT,
      event_id) - 1) % 5 AS BIGINT) AS fold
  FROM b),
p AS (SELECT fold, count(*) AS fold_n, CAST(sum(y) AS BIGINT) AS fold_pos
  FROM r GROUP BY 1)
SELECT r.event_id, r.y, r.fold, p.fold_n, p.fold_pos
FROM r JOIN p USING (fold)""",
    "q232_stratified_split" ->
      """WITH b AS (SELECT event_id,
  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y FROM events),
r AS (SELECT CAST(y AS BIGINT) AS y,
  CAST((row_number() OVER (PARTITION BY y
    ORDER BY ('0x' || substr(md5('stsp:' || event_id), 1, 8))::UBIGINT,
      event_id) - 1) % 5 AS BIGINT) AS fold
  FROM b)
SELECT CASE WHEN fold = 0 THEN 'test' ELSE 'train' END AS split,
  count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
  round(CAST(sum(y) AS DOUBLE) / count(*) + 5e-11, 4) AS pos_rate
FROM r GROUP BY 1""",
    "q123_kfold" ->
      """WITH b AS (
  SELECT ('0x' || substr(md5('fold:' || event_id), 1, 8))::UBIGINT % 5 AS fold, value
  FROM events)
SELECT fold::BIGINT AS fold, count(*) AS n,
  count(*) FILTER (WHERE value > 300) AS pos,
  round((count(*) FILTER (WHERE value > 300))::DOUBLE / count(*) + 5e-11, 4) AS pos_rate
FROM b GROUP BY 1""",
    "q115_dormancy" ->
      """WITH g AS (SELECT user_id,
  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap,
  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
SELECT user_id AS customer_id, count(*) AS n,
  max(gap) AS max_gap_us,
  max(CASE WHEN rn = 1 THEN gap END) AS last_gap_us,
  coalesce(max(CASE WHEN rn = 1 THEN gap END) > 172800000000, false) AS reactivated
FROM g GROUP BY 1""",
    "q117_lorenz" ->
      s"""WITH s AS (SELECT user_id, sum($centsSql) AS c FROM events GROUP BY 1),
d AS (SELECT ntile(10) OVER (ORDER BY c ASC, user_id ASC) AS decile, c FROM s),
g AS (SELECT decile, count(*) AS n_entities, sum(c)::BIGINT AS vol_cents FROM d GROUP BY 1)
SELECT decile, n_entities, vol_cents,
  round((sum(vol_cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING))::DOUBLE
        / (sum(vol_cents) OVER ()) + 5e-11, 4) AS cum_share
FROM g""",
    "q118_mirror_pairs" ->
      s"""WITH c AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
       $centsSql AS cents FROM events)
SELECT a.user_id AS customer_id, count(*) AS mirror_pairs,
  count(DISTINCT a.cents) AS mirror_cents
FROM c a JOIN c b ON a.user_id = b.user_id AND a.cents = b.cents
  AND a.event_type <> b.event_type AND abs(a.us - b.us) <= 86400000000
  AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
GROUP BY 1""",
    "q119_wow_delta" ->
      """WITH a AS (SELECT epoch_us(max(ts)) AS aus FROM events)
SELECT user_id AS customer_id,
  count(*) FILTER (WHERE epoch_us(ts) > aus - 604800000000) AS cnt_recent,
  count(*) FILTER (WHERE epoch_us(ts) <= aus - 604800000000
                   AND epoch_us(ts) > aus - 1209600000000) AS cnt_prior,
  count(*) FILTER (WHERE epoch_us(ts) > aus - 604800000000)
    - count(*) FILTER (WHERE epoch_us(ts) <= aus - 604800000000
                       AND epoch_us(ts) > aus - 1209600000000) AS delta,
  round((count(*) FILTER (WHERE epoch_us(ts) > aus - 604800000000))::DOUBLE
    / nullif(count(*) FILTER (WHERE epoch_us(ts) <= aus - 604800000000
                              AND epoch_us(ts) > aus - 1209600000000), 0) + 5e-11, 4) AS wow_ratio
FROM events, a GROUP BY 1""",
    "q120_benford_entity" ->
      s"""WITH d AS (SELECT user_id, substr(($centsSql)::VARCHAR, 1, 1)::BIGINT AS dig
           FROM events WHERE value > 0),
g AS (SELECT user_id, dig, count(*) AS c FROM d GROUP BY 1, 2),
t AS (SELECT user_id, sum(c)::BIGINT AS n FROM g GROUP BY 1)
SELECT g.user_id AS customer_id, t.n AS n,
  round(sum((g.c * g.c)::DOUBLE / (t.n * log10(1 + 1.0 / g.dig))) - t.n + 1e-4, 2) AS chi2
FROM g JOIN t USING (user_id) GROUP BY 1, 2""",
    "q109_kcore" -> kcoreSql(k = 2, rounds = 4),
    "q110_novelty" ->
      """WITH mx AS (SELECT epoch_us(max(ts)) - 604800000000 AS cut FROM events),
r AS (SELECT user_id, event_type FROM events, mx WHERE epoch_us(ts) > cut),
o AS (SELECT DISTINCT user_id, event_type FROM events, mx WHERE epoch_us(ts) <= cut)
SELECT r.user_id AS customer_id, count(*) AS recent_cnt,
  count(*) FILTER (WHERE o.user_id IS NULL) AS novel_cnt,
  round((count(*) FILTER (WHERE o.user_id IS NULL))::DOUBLE / count(*) + 5e-11, 4) AS novelty_ratio
FROM r LEFT JOIN o ON r.user_id = o.user_id AND r.event_type = o.event_type
GROUP BY 1""",
    "q111_peak_velocity" ->
      """WITH f AS (SELECT user_id,
  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 59999999 PRECEDING AND CURRENT ROW) AS c60,
  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS c1h
FROM events)
SELECT user_id AS customer_id, max(c60) AS peak_count_60s, max(c1h) AS peak_count_1h
FROM f GROUP BY 1""",
    "q112_mutual_info" ->
      """WITH j AS (SELECT event_type AS x, hour(ts) AS y, count(*) AS nxy FROM events GROUP BY 1, 2),
mx AS (SELECT x, sum(nxy) AS nx FROM j GROUP BY 1),
my AS (SELECT y, sum(nxy) AS ny FROM j GROUP BY 1),
t AS (SELECT sum(nxy) AS n FROM j)
SELECT j.x AS merchant_id, sum(j.nxy)::BIGINT AS n_x,
  round(sum((j.nxy::DOUBLE / t.n) * ln((t.n * j.nxy)::DOUBLE / (mx.nx * my.ny))) + 5e-11, 4) AS mi_contrib
FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t
GROUP BY 1""",
    "q113_pareto" ->
      s"""WITH s AS (SELECT user_id, sum($centsSql) AS c FROM events GROUP BY 1),
o AS (SELECT c,
        sum(c) OVER (ORDER BY c DESC, user_id ROWS UNBOUNDED PRECEDING) AS cum,
        row_number() OVER (ORDER BY c DESC, user_id) AS rk FROM s),
t AS (SELECT sum(c) AS tot, count(*) AS nc FROM s)
SELECT min(rk) FILTER (WHERE cum * 2 >= tot) AS k50,
  min(rk) FILTER (WHERE cum * 10 >= tot * 9) AS k90,
  round((min(rk) FILTER (WHERE cum * 2 >= tot))::DOUBLE / nc + 5e-11, 4) AS frac50,
  round((min(rk) FILTER (WHERE cum * 10 >= tot * 9))::DOUBLE / nc + 5e-11, 4) AS frac90
FROM o, t GROUP BY nc""",
    "q114_transition_entropy" ->
      """WITH q AS (SELECT user_id, event_type AS a,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS b
      FROM events),
g AS (SELECT user_id, a, b, count(*) AS c FROM q WHERE b IS NOT NULL GROUP BY 1, 2, 3),
t AS (SELECT user_id, sum(c)::BIGINT AS n FROM g GROUP BY 1)
SELECT g.user_id AS customer_id, t.n AS n_transitions,
  round(0 - sum((g.c::DOUBLE / t.n) * log2(g.c::DOUBLE / t.n)) + 5e-11, 4) AS transition_entropy
FROM g JOIN t USING (user_id) GROUP BY 1, 2""",
    "q79_structuring" ->
      s"""WITH c AS (SELECT user_id, $centsSql AS c FROM events)
SELECT user_id AS customer_id,
  count(*) FILTER (WHERE c >= 9000 AND c < 10000) AS band_cnt,
  coalesce(sum(c) FILTER (WHERE c >= 9000 AND c < 10000), 0)::BIGINT AS band_sum_cents,
  round((count(*) FILTER (WHERE c >= 9000 AND c < 10000))::DOUBLE / count(*) + 5e-11, 4) AS band_share,
  (count(*) FILTER (WHERE c >= 9000 AND c < 10000) >= 3 AND
   (count(*) FILTER (WHERE c >= 9000 AND c < 10000))::DOUBLE / count(*) > 0.1) AS flagged
FROM c GROUP BY 1""",
    "q80_benford" ->
      s"""WITH c AS (SELECT $centsSql AS c FROM events WHERE value > 0),
d AS (SELECT substr(c::VARCHAR, 1, 1)::BIGINT AS digit, count(*) AS cnt FROM c GROUP BY 1),
t AS (SELECT sum(cnt)::DOUBLE AS n FROM d)
SELECT digit, cnt,
  round(cnt / n + 5e-11, 4) AS obs_freq,
  round(log10(1 + 1.0/digit) + 5e-11, 4) AS benford_freq,
  round(pow(cnt - n * log10(1 + 1.0/digit), 2) / (n * log10(1 + 1.0/digit)) + 1e-4, 2) AS chi2_term
FROM d, t""",
    "q81_round_bias" ->
      s"""WITH c AS (SELECT event_type AS merchant_id, $centsSql AS c FROM events)
SELECT merchant_id, count(*) AS n,
  count(*) FILTER (WHERE c % 100 = 0) AS whole_cnt,
  round((count(*) FILTER (WHERE c % 100 = 0))::DOUBLE / count(*) + 5e-11, 4) AS whole_ratio,
  count(*) FILTER (WHERE c % 1000 = 0) AS ten_cnt,
  round((count(*) FILTER (WHERE c % 1000 = 0))::DOUBLE / count(*) + 5e-11, 4) AS ten_ratio
FROM c GROUP BY 1""",
    "q82_cohort_retention" ->
      """WITH w AS (SELECT user_id, date_trunc('week', ts)::DATE AS wk FROM events),
f AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY 1),
s AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1),
a AS (SELECT f.cohort_week, (w.wk - f.cohort_week) // 7 AS week_offset,
        count(DISTINCT w.user_id) AS active_users
      FROM w JOIN f USING (user_id) GROUP BY 1, 2)
SELECT a.cohort_week::VARCHAR AS cohort_week, a.week_offset, a.active_users,
  s.cohort_size,
  round(a.active_users::DOUBLE / s.cohort_size + 5e-11, 4) AS retention
FROM a JOIN s USING (cohort_week)""",
    "q83_fuzzy_match" ->
      """WITH nrm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  levenshtein(substr(a.t, 1, 80), substr(b.t, 1, 80))::BIGINT AS lev
FROM nrm a JOIN nrm b ON substr(a.t, 1, 12) = substr(b.t, 1, 12) AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.t, 1, 80), substr(b.t, 1, 80)) <= 8""",
    "q163_risk_propagation" -> (PageRank.pprOracleSql(
      "SELECT DISTINCT 'c:' || user_id AS src, 'm:' || event_type AS dst FROM events",
      "SELECT DISTINCT 'c:' || user_id AS node FROM events WHERE value > 300",
      iters = 10, damping = 0.85, round = s => s"round($s + 5e-11, 4)") +
      "\nORDER BY round(r10.pr + 5e-11, 4) DESC, st.node ASC LIMIT 50"),
    "q84_pagerank" -> PageRank.oracleSql(
      "SELECT DISTINCT 'c:' || user_id AS src, 'm:' || event_type AS dst FROM events",
      iters = 10, damping = 0.85, round = s => s"round($s + 5e-11, 4)"),
    "q85_window_suite" ->
      s"""WITH s AS (SELECT user_id, sum($centsSql)::BIGINT AS total_cents FROM events GROUP BY 1)
SELECT user_id, total_cents,
  ntile(4) OVER w AS quartile,
  round(percent_rank() OVER w + 5e-11, 4) AS pct_rank,
  round(cume_dist() OVER w + 5e-11, 4) AS cum_dist,
  coalesce(total_cents - lead(total_cents) OVER w, 0)::BIGINT AS gap_cents
FROM s WINDOW w AS (ORDER BY total_cents DESC, user_id)""",
    "q107_weighted_median" ->
      s"""WITH b AS (
  SELECT event_type AS merchant_id, $centsSql AS cents, count(*) AS w
  FROM events GROUP BY 1, 2),
c AS (
  SELECT merchant_id, cents,
    sum(w) OVER (PARTITION BY merchant_id ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(w) OVER (PARTITION BY merchant_id) AS half
  FROM b)
SELECT merchant_id, min(cents) AS weighted_median_cents
FROM c WHERE cum * 2 >= half GROUP BY 1""",
    "q108_theil" ->
      """WITH s AS (
  SELECT event_type AS m, avg(value) AS mu FROM events WHERE value > 0 GROUP BY 1)
SELECT event_type AS merchant_id,
  round(avg((value / mu) * ln(value / mu)) + 5e-11, 4) AS theil,
  count(*) AS n
FROM events JOIN s ON event_type = m
WHERE value > 0 GROUP BY 1""",
    "q106_distance_to_flagged" -> {
      val hops = (1 to 4).map { h =>
        s"""s$h AS (SELECT DISTINCT ed.dst AS node FROM ed JOIN d${h - 1} ON ed.src = d${h - 1}.node AND d${h - 1}.d = ${h - 1}),
d$h AS (SELECT d${h - 1}.node, least(d${h - 1}.d, CASE WHEN s$h.node IS NOT NULL THEN $h END) AS d
        FROM d${h - 1} LEFT JOIN s$h USING (node))"""
      }.mkString(",\n")
      s"""WITH e AS (SELECT DISTINCT 'c:' || user_id AS src, 'm:' || event_type AS dst FROM events),
ed AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
n AS (SELECT DISTINCT src AS node FROM ed),
f AS (SELECT DISTINCT 'c:' || user_id AS node FROM events WHERE value > 300),
d0 AS (SELECT n.node, CASE WHEN f.node IS NOT NULL THEN 0 END AS d
       FROM n LEFT JOIN f USING (node)),
$hops
SELECT node, d::BIGINT AS dist FROM d4"""
    },
    "q105_composite_screen" -> {
      val lambda = math.log(2.0) / (604800 * 1e6)
      s"""WITH a AS (SELECT max(ts) AS anchor FROM events),
base AS (
  SELECT user_id AS customer_id,
    (count(*) FILTER (WHERE round(value*100)::BIGINT >= 9000
                        AND round(value*100)::BIGINT < 10000))::DOUBLE / count(*) AS band_share,
    (count(*) FILTER (WHERE round(value*100)::BIGINT % 100 = 0))::DOUBLE / count(*) AS whole_share,
    sum(exp((epoch_us(anchor) - epoch_us(ts)) * -$lambda)) AS decayed
  FROM events, a GROUP BY 1),
m AS (SELECT max(decayed) AS mx FROM base),
s AS (
  SELECT customer_id,
    round(band_share * 0.5 + whole_share * 0.3 + decayed / mx * 0.2 + 5e-11, 4) AS suspicion
  FROM base, m)
SELECT customer_id, suspicion,
  row_number() OVER (ORDER BY suspicion DESC, customer_id) AS rank
FROM s"""
    },
    "q104_nearest_centroid" ->
      """WITH x AS (
  SELECT vec_id, label, i::BIGINT AS pos, embedding[i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) AS t(i)),
c AS (SELECT label AS clabel, pos, avg(v) AS c FROM x GROUP BY 1, 2),
d AS (SELECT x.vec_id, x.label, c.clabel, sum((x.v - c.c) * (x.v - c.c)) AS d2
      FROM x JOIN c USING (pos) GROUP BY 1, 2, 3),
r AS (SELECT vec_id, label, clabel, d2,
        row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rk
      FROM d)
SELECT vec_id, label, clabel::BIGINT AS pred_label, clabel = label AS correct
FROM r WHERE rk = 1""",
    "q103_embedding_centroid" ->
      """SELECT label, (i - 1)::BIGINT AS pos,
  round(avg(embedding[i]) + 5e-11, 4) AS centroid,
  count(*) AS n
FROM embeddings, unnest(range(1, 65)) AS t(i)
GROUP BY 1, 2""",
    "q102_future_labels" ->
      """SELECT event_id,
  coalesce(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts)
    RANGE BETWEEN 1 FOLLOWING AND 86400000000 FOLLOWING), 0)::BIGINT AS label_error_24h
FROM events""",
    "q101_autocorr" ->
      """WITH d AS (SELECT event_type, ts::DATE AS day, count(*) AS cnt FROM events GROUP BY 1, 2),
p AS (SELECT event_type, cnt,
        lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev
      FROM d)
SELECT event_type AS merchant_id,
  round(corr(cnt, prev) + 5e-11, 4) + 0.0 AS lag1_autocorr,
  count(*) AS n_pairs
FROM p WHERE prev IS NOT NULL GROUP BY 1""",
    "q100_cusum" ->
      """WITH d AS (SELECT ts::DATE AS day, count(*) AS cnt FROM events GROUP BY 1),
t AS (SELECT sum(cnt) AS total, count(*) AS days FROM d)
SELECT a.day::VARCHAR AS day, a.cnt,
  round(sum(b.cnt)::DOUBLE - count(*) * (t.total::DOUBLE / t.days) + 5e-11, 4) AS cusum
FROM d a JOIN d b ON b.day <= a.day CROSS JOIN t
GROUP BY a.day, a.cnt, t.total, t.days""",
    "q99_session_features" ->
      """WITH o AS (
  SELECT user_id, event_id,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_session,
    epoch_us(ts) AS us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
s AS (
  SELECT user_id, us,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o),
g AS (
  SELECT user_id, sid, count(*) AS txns, (max(us) - min(us)) / 1e6 AS secs
  FROM s GROUP BY 1, 2)
SELECT user_id AS customer_id, count(*) AS n_sessions,
  round(avg(secs) + 5e-11, 4) AS avg_session_secs,
  round(avg(txns) + 5e-11, 4) AS avg_txns_per_session,
  max(txns) AS max_session_txns
FROM g GROUP BY 1""",
    "q98_shared_id_pairs" ->
      """WITH e AS (
  SELECT DISTINCT user_id, json_extract_string(props, 'k') AS ident FROM events
  WHERE json_extract_string(props, 'k') IS NOT NULL),
d AS (SELECT ident, count(*) AS deg FROM e GROUP BY 1),
r AS (SELECT ident, row_number() OVER (ORDER BY deg, ident) AS rk,
             count(*) OVER () AS n_ident FROM d),
k AS (SELECT e.user_id, e.ident FROM e JOIN r USING (ident)
      WHERE r.rk <= floor(r.n_ident * 0.3)),
p AS (SELECT a.user_id AS c1, b.user_id AS c2, count(*) AS shared_ids
      FROM k a JOIN k b ON a.ident = b.ident AND a.user_id < b.user_id
      GROUP BY 1, 2)
SELECT c1, c2, shared_ids FROM p
ORDER BY shared_ids DESC, c1 ASC, c2 ASC LIMIT 20""",
    "q96_cooccurrence" ->
      """WITH allb AS (SELECT DISTINCT user_id, event_type FROM events),
deg AS (SELECT user_id, count(*) AS deg FROM allb GROUP BY 1),
r AS (SELECT user_id, row_number() OVER (ORDER BY deg, user_id) AS rk,
        count(*) OVER () AS n_cust FROM deg),
kept AS (SELECT user_id FROM r WHERE rk <= floor(n_cust * 0.8)),
e AS (SELECT allb.* FROM allb JOIN kept USING (user_id)),
n AS (SELECT count(DISTINCT user_id) AS nc FROM e),
per AS (SELECT event_type, count(*) AS cnt FROM e GROUP BY 1),
p AS (SELECT a.event_type AS m1, b.event_type AS m2, count(*) AS n_both
      FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT m1, m2, n_both,
  round((n_both * nc)::DOUBLE / (x.cnt * y.cnt) + 5e-11, 4) AS lift
FROM p, n
JOIN per x ON x.event_type = p.m1
JOIN per y ON y.event_type = p.m2""",
    "q97_rfm" ->
      """WITH a AS (SELECT max(ts) AS anchor FROM events),
per AS (
  SELECT user_id AS customer_id,
    epoch_us(anchor) - epoch_us(max(ts)) AS recency_us,
    count(*) AS freq,
    sum(round(value*100)::BIGINT)::BIGINT AS monetary_cents
  FROM events, a GROUP BY 1, anchor)
SELECT customer_id, recency_us, freq, monetary_cents,
  ntile(5) OVER (ORDER BY recency_us ASC, customer_id) AS r_score,
  ntile(5) OVER (ORDER BY freq DESC, customer_id) AS f_score,
  ntile(5) OVER (ORDER BY monetary_cents DESC, customer_id) AS m_score
FROM per""",
    "q94_psi_drift" ->
      """WITH c AS (SELECT min(ts) + INTERVAL 17 DAY AS cut FROM events),
b AS (SELECT least(greatest(floor(value / 50.0), 0), 9)::BIGINT AS bin, (ts <= cut) AS f
      FROM events, c),
counts AS (SELECT bin, count(*) FILTER (WHERE f) AS c1, count(*) FILTER (WHERE NOT f) AS c2
           FROM b GROUP BY 1),
g AS (SELECT unnest(range(0, 10)) AS bin),
j AS (SELECT g.bin, coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2 FROM g LEFT JOIN counts USING (bin)),
t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM counts),
p AS (SELECT (c1::DOUBLE + 0.5) / (n1::DOUBLE + 5.0) AS p,
             (c2::DOUBLE + 0.5) / (n2::DOUBLE + 5.0) AS q FROM j, t)
SELECT round(sum((p - q) * ln(p / q)) + 5e-11, 4) AS psi,
       sum((p - q) * ln(p / q)) > 0.2 AS drift_detected
FROM p""",
    "q95_stratified_sample" ->
      """WITH r AS (
  SELECT event_id, event_type,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY md5('strat:' || event_id), event_id) AS rk
  FROM events)
SELECT event_id, event_type FROM r WHERE rk <= 50""",
    "q93_decayed_activity" -> {
      val lambda = math.log(2.0) / (604800 * 1e6) // same literal as the op
      s"""WITH a AS (SELECT max(ts) AS anchor FROM events),
w AS (SELECT user_id, value,
        exp((epoch_us(anchor) - epoch_us(ts)) * -$lambda) AS w
      FROM events, a)
SELECT user_id AS customer_id,
  round(sum(w) + 5e-11, 4) AS decayed_count,
  round(sum(w * value) + 1e-4, 2) AS decayed_amount,
  count(*) AS n
FROM w GROUP BY 1"""
    },
    "q91_temporal_split" ->
      """WITH x AS (SELECT event_id, ts, row_number() OVER (ORDER BY ts) AS rn,
               count(*) OVER () AS n FROM events),
c AS (SELECT max(ts) AS cut FROM x WHERE rn <= floor(n * 0.8))
SELECT event_id,
  CASE WHEN ts <= cut THEN 'train'
       WHEN ts > cut + INTERVAL 86400 SECONDS THEN 'test'
       ELSE 'embargo' END AS split
FROM events, c""",
    "q92_feature_cross" ->
      """WITH b AS (
  SELECT ('0x' || substr(md5('cross:' || event_type || chr(1) || hour(ts)), 1, 8))::UBIGINT % 64 AS bucket
  FROM events)
SELECT bucket::BIGINT AS bucket, count(*) AS cnt FROM b GROUP BY 1""",
    "q90_outlier_fences" ->
      s"""WITH c AS (SELECT event_type AS merchant_id, $centsSql AS cents FROM events),
s AS (SELECT merchant_id, quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.75) AS q3
      FROM c GROUP BY 1)
SELECT c.merchant_id, count(*) AS n,
  count(*) FILTER (WHERE cents < q1 - (q3 - q1) * 1.5 OR cents > q3 + (q3 - q1) * 1.5) AS out_cnt,
  round((count(*) FILTER (WHERE cents < q1 - (q3 - q1) * 1.5 OR cents > q3 + (q3 - q1) * 1.5))::DOUBLE
        / count(*) + 5e-11, 4) AS out_rate,
  round(q1 - (q3 - q1) * 1.5 + 5e-11, 4) AS lo_fence,
  round(q3 + (q3 - q1) * 1.5 + 5e-11, 4) AS hi_fence
FROM c JOIN s USING (merchant_id) GROUP BY c.merchant_id, q1, q3""",
    "q89_quality_report" ->
      """WITH m AS (
  SELECT count(event_id)::DOUBLE / count(*) AS nn,
         count(DISTINCT event_id)::DOUBLE / count(*) AS uq,
         count(value)::DOUBLE / count(*) AS vn,
         (count(*) FILTER (WHERE value >= 0.0 AND value < 1000.0))::DOUBLE / count(*) AS vr
  FROM events),
fk AS (
  SELECT count(*)::DOUBLE AS total,
         (count(*) FILTER (WHERE user_id IN (SELECT c_custkey FROM customer)))::DOUBLE AS ok
  FROM events WHERE user_id IS NOT NULL)
SELECT * FROM (
  SELECT 'event_id_not_null' AS "constraint", round(nn + 5e-11, 4) AS metric, nn >= 1.0 AS passed FROM m
  UNION ALL SELECT 'event_id_unique', round(uq + 5e-11, 4), uq = 1.0 FROM m
  UNION ALL SELECT 'value_not_null', round(vn + 5e-11, 4), vn >= 1.0 FROM m
  UNION ALL SELECT 'value_in_range', round(vr + 5e-11, 4), vr >= 1.0 FROM m
  UNION ALL SELECT 'user_fk_in_customer', round(ok / total + 5e-11, 4), ok = total FROM fk)""",
    "q87_sketch_distinct" ->
      """SELECT event_type AS merchant_id, count(DISTINCT user_id) AS exact_distinct,
  TRUE AS within_envelope
FROM events GROUP BY 1""",
    "q188_percentile_sketch" ->
      """SELECT event_type,
  round(quantile_cont(value, 0.5) + 5e-11, 4) AS exact_p50,
  round(quantile_cont(value, 0.9) + 5e-11, 4) AS exact_p90,
  round(quantile_cont(value, 0.99) + 5e-11, 4) AS exact_p99,
  TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
FROM events GROUP BY 1""",
    "q88_zorder" ->
      s"""WITH c AS (SELECT event_id, user_id, $centsSql AS cents FROM events)
SELECT event_id, user_id, cents,
  ${graft.plans.ZOrder.zValueSql("user_id", "cents", 21)} AS zval
FROM c""",
    "q86_rebalance" ->
      """WITH e AS (SELECT event_id, value > 300 AS label FROM events)
SELECT event_id, label,
  CASE WHEN label THEN 1.0::DOUBLE ELSE 200.0::DOUBLE END AS weight
FROM e
WHERE label OR ('0x' || substr(md5('rebalance:' || event_id), 1, 8))::UBIGINT % 1000 < 5""")
}
