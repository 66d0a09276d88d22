package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LIME local linear surrogate over the COMPLETE 2^k factorial of
  * keep-vs-mask patterns (the reference's LIMEExplainer slot, reference
  * `explainability/shap_explainer.py:255-304`).
  *
  * The reference samples a kernelized neighborhood and fits a weighted
  * ridge per instance; with a complete factorial neighborhood and uniform
  * kernel the least-squares surrogate is CLOSED FORM — in ±1 coding the
  * design matrix (intercept + k pattern columns) is orthogonal with
  * XᵀX = 2^k·I, so
  *
  *   intercept  b  = (Σ_p s_p) / 2^k
  *   beta_j        = (Σ_p ±s_p) / 2^k   (sign = pattern p's bit j)
  *
  * and the whole explainer is one shuffle-free projection: 2^k score
  * expressions per row, betas / fidelity R² as row-local folds. (The
  * sampled kernelized LIME converges to this fit as σ → ∞.)
  *
  * ORACLE-PARITY CONTRACT: every fold below is LEFT-ASSOCIATIVE in
  * ascending pattern order p = 0..2^k−1 (then ascending j), and a
  * negative term enters as `acc + (−x)` — bit-identical to SQL's
  * left-associative `… − x`. A DuckDB replay that writes the same
  * p-ordered sums reproduces every unrounded intermediate exactly.
  */
object Lime {

  /** Pattern p keeps feature j iff bit j of p is set. */
  def keeps(p: Int, j: Int): Boolean = ((p >> j) & 1) == 1

  /** Pattern-p score of a boosted depth-2 tree model over MASKED
    * features: a kept feature reads its column, a masked one reads
    * `bgCol(j)` (a literal for serving, a broadcast 1-row column for
    * the oracle-gated batch query). The CASE structure and fold order
    * are the ones the DuckDB replay mirrors.
    */
  def maskedTreeScore(m: Boosting.TreeModel, features: Seq[String],
      bgCol: Int => Column)(p: Int): Column = {
    def mcol(fname: String): Column = {
      val j = features.indexOf(fname)
      require(j >= 0, s"Lime.maskedTreeScore: split feature $fname not in $features")
      if (keeps(p, j)) col(fname).cast("double") else bgCol(j)
    }
    m.rounds.foldLeft(lit(m.f0): Column) { (acc, tr) =>
      def side(fn: String, t: Double, lo: Double, hi: Double): Column =
        when(mcol(fn) <= lit(t), lit(lo)).otherwise(lit(hi))
      acc + when(mcol(tr.rootFeature) <= lit(tr.rootThreshold),
        side(tr.leftFeature, tr.leftThreshold, tr.v0, tr.v1))
        .otherwise(side(tr.rightFeature, tr.rightThreshold, tr.v2, tr.v3))
    }
  }

  /** [[surrogate]] over [[maskedTreeScore]] with the serving column
    * names: appends `lime_pred` (the model's own score at the all-keep
    * corner), `lime_<feature>` surrogate weights, `lime_intercept`, and
    * `lime_r2` (surrogate fidelity; 1.0 when the model is locally
    * constant), dropping the internals. Shared by the batch facade and
    * the streaming serving path.
    */
  def explainTree(df: DataFrame, model: Boosting.TreeModel,
      features: Seq[String], bgCol: Int => Column): DataFrame = {
    require(features.nonEmpty && features.size <= 8,
      s"Lime.explainTree: need 1..8 features, got ${features.size}")
    val k = features.size
    val out = surrogate(df, k, maskedTreeScore(model, features, bgCol))
    val named = out
      .withColumn("lime_pred", col(s"__s${(1 << k) - 1}"))
      .withColumn("lime_intercept", col("__b"))
      .withColumn("lime_r2",
        when(col("__sst") > 0, lit(1.0) - col("__sse") / col("__sst"))
          .otherwise(lit(1.0)))
    val withBetas = features.zipWithIndex.foldLeft(named) { case (d, (f, j)) =>
      d.withColumn(s"lime_$f", col(s"__b$j"))
    }
    withBetas.drop(
      (0 until (1 << k)).map(p => s"__s$p") ++
        (0 until k).map(j => s"__b$j") ++
        Seq("__b", "__sse", "__sst"): _*)
  }

  /** Appends the surrogate columns for the 2^k factorial of `s(p)`
    * score expressions: `<pre>b` (intercept), `<pre>b$j` (per-feature
    * surrogate weight), `<pre>sse` / `<pre>sst` (surrogate residual /
    * total squared error over the neighborhood — R² = 1 − sse/sst,
    * with sst = 0 meaning the model is locally constant).
    *
    * `s(p)` is evaluated once into a `<pre>s$p` column first, so score
    * expressions stay single-evaluation however often the folds read
    * them; everything is row-local (no shuffle, no join).
    */
  def surrogate(df: DataFrame, k: Int, s: Int => Column,
      pre: String = "__"): DataFrame = {
    require(k >= 1 && k <= 8, s"Lime.surrogate: k must be in [1,8], got $k")
    val n = 1 << k
    val withS = (0 until n).foldLeft(df)((acc, p) =>
      acc.withColumn(s"${pre}s$p", s(p)))
    def sp(p: Int): Column = col(s"${pre}s$p")
    val withB = withS
      .withColumn(s"${pre}b",
        (0 until n).map(sp).reduceLeft(_ + _) / n)
      .withColumns(Map.empty[String, Column] ++ (0 until k).map(j =>
        s"${pre}b$j" -> (0 until n).map(p =>
          if (keeps(p, j)) sp(p) else -sp(p)).reduceLeft(_ + _) / n))
    def fitted(p: Int): Column =
      (0 until k).foldLeft(col(s"${pre}b"): Column)((acc, j) =>
        acc + (if (keeps(p, j)) col(s"${pre}b$j") else -col(s"${pre}b$j")))
    def sq(c: Column) = c * c
    withB
      .withColumn(s"${pre}sse",
        (0 until n).map(p => sq(sp(p) - fitted(p))).reduceLeft(_ + _))
      .withColumn(s"${pre}sst",
        (0 until n).map(p => sq(sp(p) - col(s"${pre}b"))).reduceLeft(_ + _))
  }
}
