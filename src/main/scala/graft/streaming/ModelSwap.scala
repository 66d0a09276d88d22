package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.scoring.{ModelStore, Trainer}

/** Micro-batch model hot-swap — the engine twin of the reference
  * retrainer's save-then-RELOAD lifecycle (`feedback/feedback_system.py:
  * 308-388` retrains, joblib-dumps, and the serving process picks the
  * new estimator up without a restart). The stateless scorers in
  * [[StreamingFeatures]] bake the model literals in at plan-build; this
  * wrapper instead re-resolves `latestVersion` from the versioned
  * [[graft.scoring.ModelStore]] parquet table at every micro-batch, so
  * a version promoted BETWEEN batches starts scoring at the next batch
  * boundary — the foreachBatch body is the swap point.
  *
  * Cost model: the per-batch check is ONE driver-side aggregate over the
  * model table (O(model parts) rows of narrow parquet — never fact-table
  * sized), and the literal CASE/linear chain is rebuilt only when the
  * version actually moves; an unchanged version reuses the cached model,
  * so steady state adds one footer-read + 1-row max() per batch.
  *
  * Usage (the spec's wiring):
  * {{{
  *   val swap = new HotSwapLogistic(storePath, "fraud_lr")
  *   features.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
  *     sink(swap.scoreBatch(b))
  *   }
  * }}}
  */
final class HotSwapLogistic(storePath: String, modelId: String)
    extends Serializable {

  // (version, rebuilt model) — foreachBatch bodies run on the driver
  // sequentially per query, but volatile keeps multi-query sharing safe
  @transient @volatile private var cached: (Long, Trainer.LogisticModel) = _

  /** The version currently serving, if any batch has resolved one. */
  def currentVersion: Option[Long] = Option(cached).map(_._1)

  /** Resolve the latest stored version, rebuilding the model only when
    * the version moved since the last batch.
    */
  def resolve(spark: org.apache.spark.sql.SparkSession)
      : (Long, Trainer.LogisticModel) = {
    val store = spark.read.parquet(storePath)
    val latest = ModelStore.latestVersion(store, modelId).getOrElse(
      throw new IllegalStateException(
        s"HotSwapLogistic: no versions of '$modelId' in $storePath"))
    val c = cached
    if (c == null || c._1 != latest) {
      val m = ModelStore.logisticOf(ModelStore.rowsOf(store, modelId, latest))
      cached = (latest, m)
    }
    cached
  }

  /** foreachBatch body: score the micro-batch with the latest stored
    * model, stamping the version that produced each row (the audit
    * column the reference's performance history keys on). Feature
    * presence is re-checked on every resolve — a promoted version may
    * legally change the feature set, so the plan-build-time gate of the
    * baked-in scorers moves to the swap point here.
    */
  def scoreBatch(batch: DataFrame): DataFrame = {
    val (ver, m) = resolve(batch.sparkSession)
    val missing = m.features.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"HotSwapLogistic: version $ver features absent from the batch: $missing")
    batch.withColumn("model_version", lit(ver))
      .withColumn("model_margin", Trainer.margin(m))
      .withColumn("model_probability", Trainer.probability(m))
  }
}
