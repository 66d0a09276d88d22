package graft.feedback

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-quality / drift statistics as pure DataFrame aggregations
  * (SURVEY A35–A37; reference `feedback/feedback_system.py:166-229`).
  * No UDFs: AUC is the Mann–Whitney rank statistic, KS is an ECDF
  * comparison — both one global sort / window pass.
  */
object Drift {

  /** ROC AUC of `score` against binary `label` via the rank-sum identity
    * AUC = (Σ midrank⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻), with mid-ranks for score
    * ties (exactly sklearn `roc_auc_score`). Null when either class is
    * absent.
    *
    * Scale shape: scores aggregate to one row per DISTINCT value first,
    * then the rank bookkeeping runs over the value table with the
    * two-pass range-partitioned running count (GlobalOrder) — no
    * single-task global sort over rows OR values. All rank arithmetic is
    * integer/half-integer exact, so this is bit-identical to the per-row
    * rank window it replaces: midrank(v) = #rows below v + (cnt_v + 1)/2,
    * and Σ⁺ midrank = Σ_v n⁺_v · midrank(v).
    */
  def auc(df: DataFrame, label: Column, score: Column): DataFrame = {
    val perValue = df.select(label.cast("int").as("y"), score.as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("yp"))
    val cum = graft.ops.GlobalOrder.withCumSums(perValue,
      Seq(col("s").asc), Seq((col("c"), "cc")))
    cum.agg(
      when(sum(col("yp")) > 0 && sum(col("yp")) < sum(col("c")),
        (sum(col("yp") * (col("cc") - col("c") + (col("c") + 1) / 2.0)) -
          sum(col("yp")) * (sum(col("yp")) + 1) / 2.0) /
          (sum(col("yp")) * (sum(col("c")) - sum(col("yp"))))).as("auc"))
  }

  /** [[auc]] for many tagged slices at once — ONE distinct-value
    * aggregation and ONE grouped cumsum pipeline (GlobalOrder, scale-safe
    * at any score cardinality) carry every tag's rank bookkeeping, where
    * per-slice [[auc]] calls each paid a full bucket-shuffle pipeline
    * over the same scored frame (guide §2.4 — the grid/fold/curve
    * evaluators ran 4-12 of those per query). Per tag this is the
    * identical rank-sum identity over the identical per-value counts:
    * the cumulative counts are exact integers, so only the final
    * double-sum association can differ from the solo form — callers
    * round the AUC (r6) as they already did for the solo form. Tags with
    * a single class emit NULL, as [[auc]] does. Output: (tag, auc).
    */
  def aucByTag(df: DataFrame, tag: Column, label: Column, score: Column): DataFrame = {
    val perValue = df.select(tag.as("tag"), label.cast("int").as("y"), score.as("s"))
      .groupBy(col("tag"), col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("yp"))
    val cum = graft.ops.GlobalOrder.withCumSumsBy(perValue, Seq("tag"),
      Seq(col("s").asc), Seq((col("c"), "cc")))
    cum.groupBy(col("tag")).agg(
      when(sum(col("yp")) > 0 && sum(col("yp")) < sum(col("c")),
        (sum(col("yp") * (col("cc") - col("c") + (col("c") + 1) / 2.0)) -
          sum(col("yp")) * (sum(col("yp")) + 1) / 2.0) /
          (sum(col("yp")) * (sum(col("c")) - sum(col("yp"))))).as("auc"))
  }

  /** Mid-rank AUC per group — segment-sliced model evaluation (the
    * fairness/stability view a single global AUC hides: a model can hold
    * 0.9 overall while collapsing to coin-flip inside one merchant
    * segment). Same Wilcoxon rank-sum identity as [[auc]], with every
    * window and aggregation partitioned by the group key — one exchange.
    * Single-class groups emit NULL (AUC undefined there).
    */
  def groupedAuc(df: DataFrame, group: Column, label: Column, score: Column): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
    val tied = Window.partitionBy(col("g"), col("s"))
    val ranked = df.select(group.as("g"), label.cast("int").as("y"), score.as("s"))
      .select(col("g"), col("y"),
        (rank().over(w) + (count(lit(1)).over(tied) - 1) / 2.0).as("midrank"))
    ranked.groupBy(col("g")).agg(
      count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
      when(sum(col("y")) > 0 && sum(col("y")) < count(lit(1)),
        (sum(when(col("y") === 1, col("midrank"))) -
          sum(col("y")) * (sum(col("y")) + 1) / 2.0) /
          (sum(col("y")) * (count(lit(1)) - sum(col("y"))))).as("auc"))
  }

  /** Exact average precision — sklearn's `average_precision_score`
    * (`models/advanced_models.py:495`, the metric `evaluate_all_models`
    * reports next to ROC-AUC): the step-wise PR-curve area
    * `AP = Σ_t (R_t − R_{t−1})·P_t` over DISTINCT scores descending,
    * factored as `Σ_t Δtp_t·(tp_t / n_t) / pos` (the oracle uses the
    * same factored form, so the float chain matches). One
    * groupBy(score) + GlobalOrder integer cumsums — no single-partition
    * window at any score cardinality; single-class inputs emit NULL.
    */
  def averagePrecision(df: DataFrame, label: Column, score: Column): DataFrame = {
    val perValue = df.select(label.cast("int").as("y"), score.as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("yp"))
    val cum = graft.ops.GlobalOrder.withCumSums(perValue,
      Seq(col("s").desc), Seq((col("c"), "cn"), (col("yp"), "ctp")))
    cum.agg(
      when(sum(col("yp")) > 0 && sum(col("yp")) < sum(col("c")),
        sum(col("yp").cast("double") *
          (col("ctp").cast("double") / col("cn"))) /
          sum(col("yp")).cast("double")).as("ap"))
  }

  /** Exact ROC curve point table — sklearn `roc_curve(y, score)`
    * (`models/advanced_models.py:27`, consumed by `evaluate_all_models`
    * and the notebook's threshold plots): one row per kept distinct
    * score descending with (threshold, fpr, tpr), plus sklearn's
    * artificial leading point (threshold = +inf, 0, 0).
    *
    * `dropIntermediate` (sklearn's default) removes interior points that
    * are collinear on BOTH axes — kept iff the second difference of the
    * fp or tp cumsum is nonzero, endpoints always kept; the dropped
    * points change no plot. Scale shape: distinct-score cumsums via
    * GlobalOrder (no single-task sort), and the second differences come
    * from two equi-joins of the value table to itself on the GlobalOrder
    * row index — curve-table-sized shuffles, never row-sized.
    * Single-class inputs emit NULL on the undefined axis (sklearn warns
    * and emits NaN).
    */
  def rocCurve(df: DataFrame, label: Column, score: Column,
      dropIntermediate: Boolean = true): DataFrame = {
    val perValue = df.select(label.cast("int").as("y"), score.cast("double").as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("yp"))
    val cum = graft.ops.GlobalOrder.withCumSums(perValue,
      Seq(col("s").desc), Seq((col("c"), "cn"), (col("yp"), "ctp"),
        (lit(1L), "idx")))
    val tot = perValue.agg(sum(col("c")).as("n"), sum(col("yp")).as("p"),
      count(lit(1)).as("nv"))
    val pts = cum.select(col("idx"), col("s"), col("ctp").as("tps"),
      (col("cn") - col("ctp")).as("fps"))
    val kept =
      if (!dropIntermediate) pts
      else {
        val pr = pts.select(col("idx").as("pi"), col("tps").as("ptps"),
          col("fps").as("pfps"))
        val nx = pts.select(col("idx").as("ni"), col("tps").as("ntps"),
          col("fps").as("nfps"))
        pts.join(pr, col("idx") - 1 === col("pi"), "left")
          .join(nx, col("idx") + 1 === col("ni"), "left")
          .where(col("pi").isNull || col("ni").isNull ||
            col("nfps") - col("fps") * 2 + col("pfps") =!= 0 ||
            col("ntps") - col("tps") * 2 + col("ptps") =!= 0)
          .select(col("idx"), col("s"), col("tps"), col("fps"))
      }
    val lead = df.sparkSession.range(1).select(
      lit(Double.PositiveInfinity).as("threshold"),
      lit(0L).as("tps"), lit(0L).as("fps"))
    lead.unionByName(kept.select(col("s").as("threshold"), col("tps"), col("fps")))
      .crossJoin(broadcast(tot))
      .select(col("threshold"),
        when(col("n") - col("p") > 0,
          col("fps").cast("double") / (col("n") - col("p"))).as("fpr"),
        when(col("p") > 0, col("tps").cast("double") / col("p")).as("tpr"))
  }

  /** Exact precision–recall curve point table — sklearn
    * `precision_recall_curve(y, score)` (`models/advanced_models.py:28`):
    * one row per distinct score descending down to the FIRST threshold
    * attaining full recall (sklearn's `searchsorted` cut — below it
    * recall is constant 1), plus the appended terminal point
    * (threshold = NULL, precision 1, recall 0). precision = tp/(tp+fp)
    * = ctp/cn at each distinct-score cut; same GlobalOrder cumsum shape
    * as [[averagePrecision]] (its AP is exactly this curve's step area).
    * No-positive inputs emit NULL recall (sklearn warns).
    */
  def prCurve(df: DataFrame, label: Column, score: Column): DataFrame = {
    val perValue = df.select(label.cast("int").as("y"), score.cast("double").as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("yp"))
    val cum = graft.ops.GlobalOrder.withCumSums(perValue,
      Seq(col("s").desc), Seq((col("c"), "cn"), (col("yp"), "ctp"),
        (lit(1L), "idx")))
    val tot = perValue.agg(sum(col("c")).as("n"), sum(col("yp")).as("p"))
    val withTot = cum.crossJoin(broadcast(tot))
    val lastIdx = withTot.where(col("ctp") === col("p"))
      .agg(min(col("idx")).as("last_idx"))
    val body = withTot.crossJoin(broadcast(lastIdx))
      .where(col("idx") <= col("last_idx"))
      .select(col("s").as("threshold"),
        (col("ctp").cast("double") / col("cn")).as("precision"),
        when(col("p") > 0, col("ctp").cast("double") / col("p")).as("recall"))
    val terminal = df.sparkSession.range(1).select(
      lit(null).cast("double").as("threshold"),
      lit(1.0).as("precision"), lit(0.0).as("recall"))
    body.unionByName(terminal)
  }

  /** Per-group twin of [[averagePrecision]]: same step-wise AP with the
    * cumulation partitioned by the group key — one exchange, segment
    * cardinality rows out. Single-class groups emit NULL.
    */
  def groupedAveragePrecision(df: DataFrame, group: Column, label: Column,
      score: Column): DataFrame = {
    val perValue = df.select(group.as("g"), label.cast("int").as("y"), score.as("s"))
      .groupBy(col("g"), col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("yp"))
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perValue
      .withColumn("cn", sum(col("c")).over(w))
      .withColumn("ctp", sum(col("yp")).over(w))
    cum.groupBy(col("g")).agg(
      sum(col("c")).as("n"), sum(col("yp")).as("n_pos"),
      when(sum(col("yp")) > 0 && sum(col("yp")) < sum(col("c")),
        sum(col("yp").cast("double") *
          (col("ctp").cast("double") / col("cn"))) /
          sum(col("yp")).cast("double")).as("ap"))
  }

  /** Windowed AUC drift (A35; reference `feedback_system.py:166-202`):
    * AUC over the trailing 7 days vs the 7 days before, relative to the
    * data's max timestamp. Drift when recent AUC degrades by more than
    * 0.05, guarded by the reference's minimum sample sizes (50 total /
    * 20 recent / 20 prior). Mid-rank AUC per period via one
    * period-partitioned window.
    */
  def aucDriftWindowed(df: DataFrame, label: Column, score: Column, ts: Column): DataFrame = {
    val bounds = df.agg(max(unix_micros(ts)).as("max_tm"))
    val week = 7L * 86400 * 1000000
    val tagged = df.select(label.cast("int").as("y"), score.as("s"), unix_micros(ts).as("tm"))
      .crossJoin(broadcast(bounds))
      .withColumn("period",
        when(col("tm") > col("max_tm") - week, "recent")
          .when(col("tm") > col("max_tm") - 2 * week, "prior"))
      .where(col("period").isNotNull)
    val w = Window.partitionBy(col("period")).orderBy(col("s"))
    val tied = Window.partitionBy(col("period"), col("s"))
    val ranked = tagged.select(col("period"), col("y"),
      (rank().over(w) + (count(lit(1)).over(tied) - 1) / 2.0).as("midrank"))
    val perPeriod = ranked.groupBy(col("period")).agg(
      ((sum(when(col("y") === 1, col("midrank"))) -
        sum(col("y")) * (sum(col("y")) + 1) / 2.0) /
        (sum(col("y")) * (count(lit(1)) - sum(col("y"))))).as("auc"),
      count(lit(1)).as("n"))
    val r = perPeriod.where(col("period") === "recent")
      .select(col("auc").as("auc_recent"), col("n").as("n_recent"))
    val p = perPeriod.where(col("period") === "prior")
      .select(col("auc").as("auc_prior"), col("n").as("n_prior"))
    r.crossJoin(p).select(
      col("auc_recent"), col("auc_prior"), col("n_recent"), col("n_prior"),
      (col("auc_prior") - col("auc_recent")).as("degradation"),
      (col("n_recent") + col("n_prior") >= 50 && col("n_recent") >= 20 && col("n_prior") >= 20 &&
        col("auc_prior") - col("auc_recent") > 0.05).as("drift_detected"))
  }

  /** Binary-prediction accuracy (A37): mean(pred == actual). */
  def accuracy(predicted: Column, actual: Column): Column =
    avg(when(predicted === actual, 1.0).otherwise(0.0))

  /** Two-sample Kolmogorov–Smirnov statistic between `value` of rows where
    * `inFirst` and the rest: D = max over observed values of
    * |ECDF₁ − ECDF₂|, plus the asymptotic α=0.05 decision
    * (drift when D > 1.358·sqrt((n₁+n₂)/(n₁·n₂))).
    * One groupBy(value), then the ECDFs run as two-pass range-partitioned
    * running counts (GlobalOrder) over the distinct-value table — exact
    * long arithmetic, no single-task sort at any value cardinality.
    */
  def ks(df: DataFrame, value: Column, inFirst: Column): DataFrame = {
    val perValue = df
      .select(value.as("v"), when(inFirst, 1).otherwise(2).as("g"))
      .groupBy(col("v"))
      .agg(sum(when(col("g") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === 2, 1L).otherwise(0L)).as("c2"))
    val cum = graft.ops.GlobalOrder.withCumSums(perValue, Seq(col("v").asc),
        Seq((col("c1"), "cc1"), (col("c2"), "cc2")))
      .select(col("cc1"), col("cc2"))
    val tot = perValue.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .agg(
        max(abs(col("cc1").cast("double") / col("n1") -
          col("cc2").cast("double") / col("n2"))).as("d"),
        max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .select(col("d").as("ks_stat"),
        ksPvalue(col("d"), col("n1"), col("n2")).as("ks_pvalue"),
        (col("d") > lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") / (col("n1") * col("n2"))))
          .as("drift_detected"))
  }

  /** Population Stability Index between two samples of a bounded value:
    * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over `nBins` equal-width bins
    * on [lo, hi), Laplace-smoothed (cnt+0.5)/(n+nBins/2) so empty bins
    * contribute finitely. The standard model-monitoring drift score
    * (PSI > 0.2 = significant shift). One aggregation per sample over
    * the bin key + a bin-grid join — no sort, unlike KS.
    */
  def psi(df: DataFrame, value: Column, inFirst: Column,
      lo: Double, hi: Double, nBins: Int = 10): DataFrame = {
    require(hi > lo && nBins >= 1,
      s"psi needs hi > lo and nBins >= 1, got [$lo, $hi) x $nBins")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((value - lo) / width), lit(0)), lit(nBins - 1))
      .cast("long")
    val counts = df
      // NULL membership drops the row from BOTH samples (SQL FILTER
      // semantics; otherwise(2) would silently inflate the second one)
      .where(inFirst.isNotNull)
      .select(bin.as("bin"), when(inFirst, 1).otherwise(2).as("g"))
      .groupBy(col("bin"))
      .agg(sum(when(col("g") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === 2, 1L).otherwise(0L)).as("c2"))
    val spark = df.sparkSession
    val grid = spark.range(nBins).select(col("id").as("bin"))
    val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    grid.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
      .crossJoin(broadcast(tot))
      .select(((col("c1") + 0.5) / (col("n1") + lit(nBins * 0.5))).as("p"),
        ((col("c2") + 0.5) / (col("n2") + lit(nBins * 0.5))).as("q"))
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
      .select(col("psi"), (col("psi") > 0.2).as("drift_detected"))
  }

  /** Jensen–Shannon divergence between the two binned samples (nats):
    * JSD = ½ KL(p‖m) + ½ KL(q‖m), m = (p+q)/2. Unlike PSI it needs no
    * smoothing (m > 0 wherever either side is) and is bounded by ln 2,
    * so the drift threshold is scale-free. Same fixed-grid binning and
    * one-aggregation shape as [[psi]].
    */
  def jsd(df: DataFrame, value: Column, inFirst: Column,
      lo: Double, hi: Double, nBins: Int = 10): DataFrame = {
    require(hi > lo && nBins >= 1,
      s"jsd needs hi > lo and nBins >= 1, got [$lo, $hi) x $nBins")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((value - lo) / width), lit(0)), lit(nBins - 1))
      .cast("long")
    val counts = df
      .where(inFirst.isNotNull)
      .select(bin.as("bin"), when(inFirst, 1).otherwise(2).as("g"))
      .groupBy(col("bin"))
      .agg(sum(when(col("g") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === 2, 1L).otherwise(0L)).as("c2"))
    val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    counts.crossJoin(broadcast(tot))
      .select((col("c1").cast("double") / col("n1")).as("p"),
        (col("c2").cast("double") / col("n2")).as("q"))
      .select(col("p"), col("q"), ((col("p") + col("q")) / 2).as("m"))
      .agg(sum(
        coalesce(when(col("p") > 0, col("p") / 2 * log(col("p") / col("m"))), lit(0.0)) +
        coalesce(when(col("q") > 0, col("q") / 2 * log(col("q") / col("m"))), lit(0.0)))
        .as("jsd"))
      .select(col("jsd"), (col("jsd") > 0.1).as("drift_detected"))
  }

  /** Asymptotic two-sample KS p-value (Kolmogorov distribution tail):
    * p = 2 Σ_{k>=1} (-1)^{k-1} exp(-2 k² λ²), λ = D·sqrt(n1·n2/(n1+n2)) —
    * the same closed form scipy uses for large samples
    * (`feedback_system.py:204-229` checks p < 0.05). 100 terms as a pure
    * column expression; clamped to [0,1].
    */
  def ksPvalue(d: Column, n1: Column, n2: Column): Column = {
    val lam = d * sqrt(n1.cast("double") * n2 / (n1 + n2))
    val series = (1 to 100).map { k =>
      lit(2.0 * (if (k % 2 == 1) 1 else -1)) * exp(lit(-2.0 * k * k) * lam * lam)
    }.reduce(_ + _)
    least(greatest(series, lit(0.0)), lit(1.0))
  }
}
