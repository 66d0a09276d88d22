package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AdaBoost (SAMME) on exact decision stumps — the engine twin of the
  * reference's `AdaBoostClassifier` ensemble slot
  * (`models/advanced_models.py:17`, exercised by the model zoo next to
  * RF/GB/XGBoost). Binary SAMME: each round fits the stump minimizing
  * WEIGHTED misclassification error, votes with
  * `alpha = ln((1 − err)/err)`, and multiplies every misclassified row's
  * weight by `beta = (1 − err)/err`.
  *
  * Scale/determinism contract (the house boosting recipe, see
  * [[Boosting]]): sample weights are never materialized per row. After
  * `r` rounds a row's weight is `Π beta_j^{miss_j}` — a function of its
  * r-bit miss PATTERN only — so each round runs ONE fused melted
  * candidate pass that counts exact integers per (feature, threshold,
  * pattern) cell, cumsums them with [[graft.ops.GlobalOrder]] (no
  * single-partition window, no float running sums), and folds the
  * ≤ 2^r pattern-weight literals in fixed ascending-pattern order AFTER
  * aggregation. `beta` is rounded to 4 dp before entering the next
  * round's weights and `alpha = ln(beta)` is 4 dp-rounded before
  * entering any vote, so the weight chain is pure rational arithmetic of
  * integers and 4 dp literals — the DuckDB oracle replays it
  * bit-for-bit. Passes = rounds (all features share one scan); driver
  * state = one argmin row per round.
  */
object AdaBoost {

  /** One fitted SAMME round: the stump (`x <= threshold` → leftLabel),
    * its weighted training error, the 4 dp weight multiplier
    * `beta = r4((1 − err)/err)` and the 4 dp vote `alpha = r4(ln beta)`.
    */
  case class Round(feature: String, threshold: Double, leftLabel: Int,
      rightLabel: Int, err: Double, beta: Double, alpha: Double)

  /** 0/1 prediction of one fitted stump for a feature row. */
  def predict(r: Round): Column =
    when(col(r.feature).cast("double") <= r.threshold, lit(r.leftLabel))
      .otherwise(lit(r.rightLabel))

  /** Signed weighted vote of the staged ensemble `rounds`: each stump
    * contributes +alpha when it predicts 1, −alpha when it predicts 0
    * (sign-flip instead of multiply so the oracle's expression is the
    * identical operation chain).
    */
  def voteScore(rounds: Seq[Round]): Column =
    rounds.map(r => when(predict(r) === 1, lit(r.alpha)).otherwise(lit(-r.alpha)))
      .reduce(_ + _)

  /** Ensemble 0/1 class: 1 iff the weighted vote is strictly positive
    * (exact-zero vote → 0, deterministic on both engines).
    */
  def classify(rounds: Seq[Round]): Column =
    when(voteScore(rounds) > 0, lit(1L)).otherwise(lit(0L))

  /** Fit up to `rounds` SAMME rounds on `df` over numeric `features`
    * with 0/1 `label`, with sklearn's early-stops: a round whose best
    * weighted error is 0 (separable slice) is KEPT with vote weight 1
    * and ends the fit; a round whose best error reaches 0.5 (boosting
    * exhausted) is DISCARDED and ends the fit — raising only when it
    * was the first round (no better-than-chance stump exists at all).
    * The returned ensemble may therefore be shorter than `rounds`;
    * callers and the oracle replay derive the kept length from the
    * same stop rule.
    */
  def fit(df: DataFrame, features: Seq[String], label: Column,
      rounds: Int): Seq[Round] = {
    require(rounds >= 1 && rounds <= 6,
      s"AdaBoost.fit: pattern table is 2^rounds — rounds must be in [1,6], got $rounds")
    val y = label.cast("long")
    var fitted = Vector.empty[Round]
    var stop = false
    for (_ <- 1 to rounds if !stop) {
      val p = fitted.size
      val pats = 1 << p
      // row's miss-pattern id under the prior rounds (0 when p = 0)
      val patCol = fitted.zipWithIndex.foldLeft(lit(0)) { case (acc, (r, j)) =>
        acc + (predict(r) =!= y).cast("int") * (1 << j)
      }
      // pattern weight = Π beta_j over set bits, ascending j — the same
      // ascending left-assoc product the oracle SQL writes out
      val w: Seq[Double] = (0 until pats).map { g =>
        (0 until p).filter(j => (g & (1 << j)) != 0)
          .map(j => fitted(j).beta).foldLeft(1.0)(_ * _)
      }
      val aggs = (0 until pats).flatMap(g => Seq(
        sum(when(col(s"__m$g"), 1L).otherwise(0L)).as(s"__n$g"),
        sum(when(col(s"__m$g") && col("__y") === 1L, 1L).otherwise(0L))
          .as(s"__p$g")))
      val per0 = Models.meltedPer(df, features,
        (0 until pats).map(g => (patCol === g).as(s"__m$g")) :+ y.as("__y"),
        (0 until pats).map(g => s"__m$g") :+ "__y", aggs)
      val totAggs = (0 until pats).flatMap(g => Seq(
        sum(col(s"__n$g")).as(s"__tn$g"), sum(col(s"__p$g")).as(s"__tp$g")))
      val tot = per0.groupBy(col("__feat")).agg(totAggs.head, totAggs.tail: _*)
      val cum = graft.ops.GlobalOrder.withCumSumsBy(per0, Seq("__feat"),
        Seq(col("threshold")),
        (0 until pats).flatMap(g =>
          Seq(col(s"__n$g") -> s"__nl$g", col(s"__p$g") -> s"__pl$g")))
      def wsum(term: Int => Column): Column =
        (0 until pats).map(g => lit(w(g)) * term(g)).reduce(_ + _)
      val wlp = wsum(g => col(s"__pl$g"))
      val wln = wsum(g => col(s"__nl$g") - col(s"__pl$g"))
      val wrp = wsum(g => col(s"__tp$g") - col(s"__pl$g"))
      val wrn = wsum(g => (col(s"__tn$g") - col(s"__tp$g")) -
        (col(s"__nl$g") - col(s"__pl$g")))
      val nlAll = (0 until pats).map(g => col(s"__nl$g")).reduce(_ + _)
      val tnAll = (0 until pats).map(g => col(s"__tn$g")).reduce(_ + _)
      val errCol = (least(col("__wlp"), col("__wln")) +
        least(col("__wrp"), col("__wrn"))) /
        (((col("__wlp") + col("__wln")) + col("__wrp")) + col("__wrn"))
      val best = cum.join(broadcast(tot), "__feat")
        .where(nlAll < tnAll) // right side non-empty (max value = no split)
        .select(col("__feat"), col("threshold"), wlp.as("__wlp"),
          wln.as("__wln"), wrp.as("__wrp"), wrn.as("__wrn"))
        .select(col("__feat"), col("threshold"), col("__wlp"), col("__wln"),
          col("__wrp"), col("__wrn"), errCol.as("__err"))
        .orderBy(graft.queries.r6(col("__err")).asc, col("__feat").asc,
          col("threshold").asc)
        .limit(1).head()
      val (feat, thr) = (best.getString(0), best.getDouble(1))
      val (blp, bln, brp, brn) = (best.getDouble(2), best.getDouble(3),
        best.getDouble(4), best.getDouble(5))
      val err = best.getDouble(6)
      if (err <= 0.0) {
        // separable slice: keep the perfect learner with vote weight 1
        // and stop — sklearn's early-stop (`_boost_discrete` returns
        // weight 1.0 on estimator_error <= 0 and the fit loop breaks).
        // beta is never consumed (no later round exists); stored as 1.0.
        fitted :+= Round(feat, thr,
          leftLabel = if (blp > bln) 1 else 0,
          rightLabel = if (brp > brn) 1 else 0,
          err = err, beta = 1.0, alpha = 1.0)
        stop = true
      } else if (err >= 0.5) {
        // boosting exhausted (no better-than-chance stump under the
        // current weights): sklearn discards the round and stops, and
        // raises only when it was the FIRST round — mirror both.
        require(fitted.nonEmpty,
          s"AdaBoost.fit: first round's best weighted err=$err >= 0.5 " +
          "— no better-than-chance stump exists")
        stop = true
      } else {
        val beta = KMeansOps.r6d((1.0 - err) / err)
        fitted :+= Round(feat, thr,
          leftLabel = if (blp > bln) 1 else 0,
          rightLabel = if (brp > brn) 1 else 0,
          err = err, beta = beta, alpha = KMeansOps.r6d(math.log(beta)))
      }
    }
    fitted
  }
}
