package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gradient-boosted decision stumps with squared loss — the engine's
  * boosted-ensemble slot (the reference trains GradientBoosting /
  * XGBoost-style models at `models/advanced_models.py:228-231`; this is
  * the closed-form, aggregation-only twin that scales the same way the
  * exact stump does).
  *
  * Each round fits a regression stump to the RUNNING RESIDUAL
  * r = y − F(x) and adds `rate · leaf-mean` to the model. The trick that
  * keeps every pass integer-exact (and therefore bit-reproducible in the
  * DuckDB oracle): after t rounds the model F takes one value per
  * combination of prior leaf memberships, so the residual sum over any
  * candidate's left side decomposes into INTEGER cumulative counts —
  * Σ_L r = Σ_L y − n_L·F0 − Σ_j [vl_j·|L∩left_j| + vr_j·(n_L−|L∩left_j|)]
  * — with the prior leaf values entering as 4dp-rounded literals
  * (identical binary64 on both engines, the q170/q172 recipe). The
  * cumulative machinery is [[graft.ops.GlobalOrder.withCumSums]] over
  * 2+(t−1) integral columns per feature: no single-partition window, no
  * float cumsum, at any distinct-value cardinality.
  *
  * Split criterion: squared-error reduction. Minimizing left+right SSE
  * with optimal constants equals maximizing S_L²/n_L + S_R²/n_R (S =
  * residual sum), so the argmax needs only the integer cumsums and the
  * literals. Ties break on (rounded gain desc, feature, threshold) —
  * deterministic across engines.
  *
  * Driver state is O(rounds): one argmax row collects per round (the
  * same bounded shape as Lloyd's k centroids in [[KMeansOps]]).
  */
object Boosting {

  /** One fitted round: split + SHRUNKEN leaf values (rate already
    * applied, rounded to the engine quantum before re-entering).
    */
  final case class Stump(feature: String, threshold: Double, vl: Double, vr: Double)

  /** Fitted additive model F(x) = f0 + Σ_t (vl_t | vr_t). */
  final case class Model(f0: Double, rate: Double, rounds: Seq[Stump])

  /** Fit `rounds` boosted stumps on `df` (numeric `features`, 0/1
    * `label`). The caller should cache/checkpoint `df`: each round reads
    * it once per feature for the distinct-value aggregate.
    */
  def fit(df: DataFrame, features: Seq[String], label: Column,
      rounds: Int, rate: Double): Model = {
    require(rounds >= 1, s"Boosting.fit: rounds must be >= 1, got $rounds")
    val y = label.cast("long")
    val base = df.agg(count(lit(1)).as("__n"), sum(y).as("__sy")).head()
    // F0 = mean(y), rounded to the quantum before entering residual math
    val f0 = KMeansOps.r6d(base.getLong(1).toDouble / base.getLong(0))

    var fitted = List.empty[Stump] // reverse fit order
    for (_ <- 1 to rounds) {
      val prior = fitted.reverse
      val cands = features.map { f =>
        val aggs = Seq(count(lit(1)).as("__cn"), sum(y).as("__csy")) ++
          prior.zipWithIndex.map { case (st, j) =>
            sum(when(col(st.feature).cast("double") <= st.threshold, 1L)
              .otherwise(0L)).as(s"__cc$j")
          }
        val per = df.groupBy(col(f).cast("double").as("threshold"))
          .agg(aggs.head, aggs.tail: _*)
        val cum = graft.ops.GlobalOrder.withCumSums(per, Seq(col("threshold")),
          Seq(col("__cn") -> "nl", col("__csy") -> "syl") ++
            prior.indices.map(j => col(s"__cc$j") -> s"cll$j"))
        val totAggs = Seq(sum(col("__cn")).as("tn"), sum(col("__csy")).as("tsy")) ++
          prior.indices.map(j => sum(col(s"__cc$j")).as(s"tcl$j"))
        val tot = per.agg(totAggs.head, totAggs.tail: _*)
        // residual sum over a side from its integer counts + rounded
        // literals — the oracle writes the same expression in the same
        // associativity
        def residSum(sy: Column, n: Column, cl: Int => Column): Column =
          prior.zipWithIndex.foldLeft(sy - n * lit(f0)) { case (acc, (st, j)) =>
            acc - (lit(st.vl) * cl(j) + lit(st.vr) * (n - cl(j)))
          }
        cum.crossJoin(broadcast(tot))
          .select(lit(f).as("feature"), col("threshold"), col("nl"), col("tn"),
            residSum(col("syl"), col("nl"), j => col(s"cll$j")).as("sl"),
            residSum(col("tsy"), col("tn"), j => col(s"tcl$j")).as("stot"))
          .where(col("nl") < col("tn")) // right side non-empty
          .select(col("feature"), col("threshold"), col("nl"),
            (col("tn") - col("nl")).as("nr"),
            col("sl"), (col("stot") - col("sl")).as("sr"))
      }.reduce(_.unionByName(_))

      val best = cands.select(col("feature"), col("threshold"),
          graft.queries.r6(col("sl") * col("sl") / col("nl") +
            col("sr") * col("sr") / col("nr")).as("gain"),
          graft.queries.r6(lit(rate) * (col("sl") / col("nl"))).as("vl"),
          graft.queries.r6(lit(rate) * (col("sr") / col("nr"))).as("vr"))
        .orderBy(col("gain").desc, col("feature"), col("threshold"))
        .limit(1).head()
      fitted = Stump(best.getString(0), best.getDouble(1),
        best.getAs[Double]("vl"), best.getAs[Double]("vr")) :: fitted
    }
    Model(f0, rate, fitted.reverse)
  }

  /** F(x) over the raw feature columns — a literal CASE chain, pure
    * projection (no join, whole-stage codegen).
    */
  def score(m: Model): Column =
    m.rounds.foldLeft(lit(m.f0)) { (acc, st) =>
      acc + when(col(st.feature).cast("double") <= lit(st.threshold),
        lit(st.vl)).otherwise(lit(st.vr))
    }
}
