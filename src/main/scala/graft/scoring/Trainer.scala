package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine trainable model: full-batch logistic regression by
  * DataFrame-expressed gradient descent — the engine twin of the
  * reference's supervised layer (`models/advanced_models.py:1-533`,
  * notebook cell-10), built the way distributed LR actually trains at
  * scale (Spark MLlib's own LBFGS/OWLQN does the same reduction): each
  * iteration is ONE partial-aggregated pass computing the (d+1)-gradient
  * vector; only that tiny vector ever reaches the driver. The data never
  * collects, never reshuffles after the initial projection, and the
  * per-iteration cost is a map + combine over the cached standardized
  * frame — at 100 TB with 1000 executors each step is a single
  * tree-aggregate.
  *
  * Determinism: weights start at 0, steps are fixed-rate full-batch
  * (no sampling, no RNG anywhere); float summation-order noise across
  * partitions stays at ulp scale and is absorbed by the caller's output
  * rounding — the same contract every aggregate query in the engine
  * already relies on.
  */
object Trainer {

  /** Fitted model: per-feature standardization (population moments) and
    * the weights/intercept in STANDARDIZED space.
    */
  final case class LogisticModel(
      features: Seq[String], means: Seq[Double], stds: Seq[Double],
      weights: Seq[Double], intercept: Double, iters: Int, lr: Double)

  /** Fit on `train` (must carry `features` numeric columns); `label`
    * must evaluate to 0.0/1.0. Full-batch GD on the standardized
    * features: w ← w − lr · (1/n) Σ x·(σ(w·x+b) − y).
    */
  def fitLogistic(train: DataFrame, features: Seq[String], label: Column,
      iters: Int = 20, lr: Double = 0.5): LogisticModel = {
    require(iters >= 1, s"fitLogistic: iters must be >= 1, got $iters")
    val d = features.size
    val statAggs = features.flatMap { f =>
      Seq(avg(col(f).cast("double")).as(s"m_$f"),
        stddev_pop(col(f).cast("double")).as(s"s_$f"))
    }
    val st = train.agg(statAggs.head, statAggs.tail: _*).head()
    val means = features.indices.map(i => Option(st.get(2 * i))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    val stds = features.indices.map { i =>
      val s = Option(st.get(2 * i + 1)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      if (s > 0.0) s else 1.0 // constant column contributes only to intercept
    }
    val xs = features.zipWithIndex.map { case (f, i) =>
      ((col(f).cast("double") - lit(means(i))) / lit(stds(i))).as(s"__x$i")
    }
    // cache the standardized projection: every GD pass re-reads it (at
    // cluster scale: MEMORY_AND_DISK; the projection is d+1 doubles/row)
    val data = train.select(label.cast("double").as("__y") +: xs: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = Array.fill(d)(0.0)
      var b = 0.0
      for (_ <- 1 to iters) {
        val margin = (0 until d).map(i => col(s"__x$i") * lit(w(i)))
          .foldLeft(lit(b))(_ + _)
        val err = lit(1.0) / (lit(1.0) + exp(-margin)) - col("__y")
        val gAggs = (0 until d).map(i => avg(err * col(s"__x$i")).as(s"g$i")) :+
          avg(err).as("gb")
        val g = data.agg(gAggs.head, gAggs.tail: _*).head()
        for (i <- 0 until d) w(i) -= lr * g.getDouble(i)
        b -= lr * g.getDouble(d)
      }
      LogisticModel(features, means, stds, w.toSeq, b, iters, lr)
    } finally data.unpersist()
  }

  /** Linear margin w·standardize(x) + b over the RAW feature columns —
    * monotone in the predicted probability, so ranking metrics (AUC) can
    * skip the sigmoid.
    */
  def margin(m: LogisticModel): Column =
    m.features.zipWithIndex.map { case (f, i) =>
      ((col(f).cast("double") - lit(m.means(i))) / lit(m.stds(i))) * lit(m.weights(i))
    }.foldLeft(lit(m.intercept))(_ + _)

  /** Predicted probability σ(margin). */
  def probability(m: LogisticModel): Column =
    lit(1.0) / (lit(1.0) + exp(-margin(m)))
}
