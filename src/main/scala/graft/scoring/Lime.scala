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
