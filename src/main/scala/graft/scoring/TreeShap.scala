package graft.scoring

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** EXACT interventional Shapley attribution for the boosted depth-2 tree
  * model — the interaction-aware extension of the q199 stump-chain SHAP
  * (reference `explainability/shap_explainer.py:78-126` explains its
  * tree ensembles per instance; the stump chain is additive, a depth-2
  * tree is the smallest member whose SHAP must split credit across an
  * interaction).
  *
  * Formulation: each tree round is a 3-player game over its SLOTS
  * (root / left-child / right-child split). A present slot reads the
  * instance's value; an absent slot reads the background row z drawn
  * from the empirical JOINT distribution (interventional SHAP). Every
  * conditional expectation reduces to FIVE population counts per round:
  *
  *   naL   = #(z_root ≤ t_root)
  *   nbL   = #(z_left ≤ t_left)            (marginal)
  *   ncL   = #(z_right ≤ t_right)          (marginal)
  *   nabLL = #(z_root ≤ t_root ∧ z_left ≤ t_left)
  *   nacGL = #(z_root > t_root ∧ z_right ≤ t_right)
  *
  * so the whole explainer is ONE population aggregate + per-row literal
  * arithmetic — no shuffle, no join beyond the 1-row broadcast.
  *
  * Slot games are UNIFORM under duplicated features: when two slots
  * share a column the count formulas above remain exactly the
  * interventional expectations (the background draws stay jointly
  * consistent), and a feature's credit is the sum of its slots' phis.
  * Efficiency always holds (Σ slot-phi = f(x) − E[f]); slot-sum equals
  * the feature-level Shapley value whenever the tree's three slots hold
  * distinct features (the fitted case at every driver SF — asserted by
  * the spec's brute-force comparison).
  *
  * ORACLE-PARITY: every expression below is written in the exact
  * left-associative order the DuckDB replay mirrors, with counts as
  * integer columns and leaf values as 4dp literals.
  */
object TreeShap {

  /** Per-round slot attributions for one [[Boosting.TreeRound]]:
    * (phiRoot, phiLeft, phiRight, e0, fx) where e0 is the round's
    * no-information expectation (row-independent) and fx its exact
    * prediction for the row. `naL..n` are the count COLUMNS (from the
    * broadcast population row).
    */
  def roundPhis(tr: Boosting.TreeRound,
      naL: Column, nbL: Column, ncL: Column,
      nabLL: Column, nacGL: Column, n: Column)
      : (Column, Column, Column, Column, Column) = {
    val (v0, v1, v2, v3) =
      (lit(tr.v0), lit(tr.v1), lit(tr.v2), lit(tr.v3))
    val xaLe = col(tr.rootFeature).cast("double") <= lit(tr.rootThreshold)
    val xbLe = col(tr.leftFeature).cast("double") <= lit(tr.leftThreshold)
    val xcLe = col(tr.rightFeature).cast("double") <= lit(tr.rightThreshold)
    val vLx = when(xbLe, v0).otherwise(v1) // left leaf at the instance
    val vRx = when(xcLe, v2).otherwise(v3)
    val fx = when(xaLe, vLx).otherwise(vRx)
    // conditional expectations; each written once, in oracle order
    val e0 = (nabLL * v0 + (naL - nabLL) * v1 + nacGL * v2 +
      (n - naL - nacGL) * v3) / n
    val eL = (nbL * v0 + (n - nbL) * v1) / n // E[left subtree]
    val eR = (ncL * v2 + (n - ncL) * v3) / n
    val eA = when(xaLe, eL).otherwise(eR)
    val eB = (naL * vLx + nacGL * v2 + (n - naL - nacGL) * v3) / n
    val eC = (nabLL * v0 + (naL - nabLL) * v1 + (n - naL) * vRx) / n
    val eAB = when(xaLe, vLx).otherwise(eR)
    val eAC = when(xaLe, eL).otherwise(vRx)
    val eBC = (naL * vLx + (n - naL) * vRx) / n
    // 3-player Shapley weights: 1/3 (|S|∈{0,2}), 1/6 (|S|=1)
    def phi(s1: Column, s0: Column, d1a: Column, d1b: Column,
        d0a: Column, d0b: Column, s3: Column, s2: Column): Column =
      (s1 - s0) / 3 + (d1a - d1b) / 6 + (d0a - d0b) / 6 + (s3 - s2) / 3
    val phiA = phi(eA, e0, eAB, eB, eAC, eC, fx, eBC)
    val phiB = phi(eB, e0, eAB, eA, eBC, eC, fx, eAC)
    val phiC = phi(eC, e0, eAC, eA, eBC, eB, fx, eAB)
    (phiA, phiB, phiC, e0, fx)
  }

  /** The five population-count aggregate columns for round `tr`,
    * suffixed `_$t` — one conditional-sum set per round, all rounds in
    * ONE aggregate.
    */
  def countAggs(tr: Boosting.TreeRound, t: Int): Seq[Column] = {
    val aLe = col(tr.rootFeature).cast("double") <= lit(tr.rootThreshold)
    val bLe = col(tr.leftFeature).cast("double") <= lit(tr.leftThreshold)
    val cLe = col(tr.rightFeature).cast("double") <= lit(tr.rightThreshold)
    Seq(sum(when(aLe, 1L).otherwise(0L)).as(s"naL_$t"),
      sum(when(bLe, 1L).otherwise(0L)).as(s"nbL_$t"),
      sum(when(cLe, 1L).otherwise(0L)).as(s"ncL_$t"),
      sum(when(aLe && bLe, 1L).otherwise(0L)).as(s"nabLL_$t"),
      sum(when(!aLe && cLe, 1L).otherwise(0L)).as(s"nacGL_$t"))
  }
}
