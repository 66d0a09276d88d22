package graft.scoring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model persistence — the engine twin of the reference's joblib
  * save/load lifecycle (`models/advanced_models.py:9` imports joblib and
  * every `train_*` saves its fitted estimator; the retrainer reloads
  * them). Each fitted model serializes to rows of ONE narrow versioned
  * table (the q212 performance-history shape: `model_id` + `version`
  * key), written and read as plain parquet like any other table — no
  * binary blobs, so the stored model is queryable, diffable across
  * versions, and engine-agnostic.
  *
  * Round-trip contract: doubles/longs/strings pass through DataFrame
  * literals and parquet unchanged (IEEE-exact), so a model rebuilt by
  * the `*Of` readers is `==` to the exported case class and its serving
  * CASE chain is bit-identical — gated by q230 (export → import →
  * score both paths, count agreement) and FacadeSpec's disk round-trip.
  *
  * Covered families: [[Trainer.LogisticModel]] (logistic GD, weighted
  * GD, linear SVM — same shape), [[AdaBoost.Round]] ensembles,
  * [[Boosting.Model]] (shrunken stumps), [[Boosting.TreeModel]]
  * (depth-2 rounds) and [[Trees.DeepTree]] / [[Trees.BestFirstTree]]
  * (path-keyed splits). Naive-Bayes likelihood tables are already
  * DataFrames — persist those as parquet directly.
  */
object ModelStore {

  /** One row of the model table. Unused slots are NULL (None). */
  final case class ModelRow(model_id: String, version: Long, kind: String,
      part: String, idx: Long, k: Option[String], k2: Option[String],
      v1: Option[Double], v2: Option[Double], v3: Option[Double],
      v4: Option[Double], c1: Option[Long], c2: Option[Long],
      c3: Option[Long], c4: Option[Long])

  private def row(id: String, ver: Long, kind: String, part: String,
      idx: Long = 0L, k: Option[String] = None, k2: Option[String] = None,
      v1: Option[Double] = None, v2: Option[Double] = None,
      v3: Option[Double] = None, v4: Option[Double] = None,
      c1: Option[Long] = None, c2: Option[Long] = None,
      c3: Option[Long] = None, c4: Option[Long] = None): ModelRow =
    ModelRow(id, ver, kind, part, idx, k, k2, v1, v2, v3, v4, c1, c2, c3, c4)

  /** Rows → DataFrame in the canonical column order. */
  def table(spark: SparkSession, rows: Seq[ModelRow]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Collect one (model_id, version) slice back to rows — model-sized
    * by construction (≤ meta + parts).
    */
  def rowsOf(df: DataFrame, modelId: String, version: Long): Seq[ModelRow] = {
    import df.sparkSession.implicits._
    df.where(col("model_id") === modelId && col("version") === version)
      .as[ModelRow].collect().toSeq
  }

  /** Highest stored version of `modelId` (the q212-style promote key). */
  def latestVersion(df: DataFrame, modelId: String): Option[Long] =
    df.where(col("model_id") === modelId)
      .agg(max(col("version"))).head().get(0) match {
      case v: Long => Some(v)
      case _ => None
    }

  // ---- logistic / weighted-logistic / linear-SVM (LogisticModel) ----

  def logisticRows(id: String, ver: Long,
      m: Trainer.LogisticModel): Seq[ModelRow] =
    row(id, ver, "logistic", "meta", v1 = Some(m.intercept),
      v2 = Some(m.lr), c1 = Some(m.iters.toLong)) +:
      m.features.indices.map { i =>
        row(id, ver, "logistic", "feature", idx = i.toLong,
          k = Some(m.features(i)), v1 = Some(m.means(i)),
          v2 = Some(m.stds(i)), v3 = Some(m.weights(i)))
      }

  def logisticOf(rows: Seq[ModelRow]): Trainer.LogisticModel = {
    val meta = one(rows, "logistic", "meta")
    val fs = parts(rows, "logistic", "feature")
    Trainer.LogisticModel(fs.map(_.k.get), fs.map(_.v1.get),
      fs.map(_.v2.get), fs.map(_.v3.get), meta.v1.get,
      meta.c1.get.toInt, meta.v2.get)
  }

  // ---- AdaBoost-SAMME stump ensembles ----

  def adaBoostRows(id: String, ver: Long,
      rounds: Seq[AdaBoost.Round]): Seq[ModelRow] =
    rounds.zipWithIndex.map { case (r, t) =>
      row(id, ver, "adaboost", "round", idx = t.toLong,
        k = Some(r.feature), v1 = Some(r.threshold), v2 = Some(r.err),
        v3 = Some(r.beta), v4 = Some(r.alpha),
        c1 = Some(r.leftLabel.toLong), c2 = Some(r.rightLabel.toLong))
    }

  def adaBoostOf(rows: Seq[ModelRow]): Seq[AdaBoost.Round] =
    parts(rows, "adaboost", "round").map(r =>
      AdaBoost.Round(r.k.get, r.v1.get, r.c1.get.toInt, r.c2.get.toInt,
        r.v2.get, r.v3.get, r.v4.get))

  // ---- boosted stumps ----

  def boostingRows(id: String, ver: Long, m: Boosting.Model): Seq[ModelRow] =
    row(id, ver, "boost_stumps", "meta", v1 = Some(m.f0),
      v2 = Some(m.rate)) +:
      m.rounds.zipWithIndex.map { case (s, t) =>
        row(id, ver, "boost_stumps", "round", idx = t.toLong,
          k = Some(s.feature), v1 = Some(s.threshold), v2 = Some(s.vl),
          v3 = Some(s.vr))
      }

  def boostingOf(rows: Seq[ModelRow]): Boosting.Model = {
    val meta = one(rows, "boost_stumps", "meta")
    Boosting.Model(meta.v1.get, meta.v2.get,
      parts(rows, "boost_stumps", "round").map(r =>
        Boosting.Stump(r.k.get, r.v1.get, r.v2.get, r.v3.get)))
  }

  // ---- boosted depth-2 trees ----

  def boostedTreesRows(id: String, ver: Long,
      m: Boosting.TreeModel): Seq[ModelRow] = {
    // the three feature names pack comma-joined into one slot; a comma
    // inside a name would mis-split on read (thresholds are immune —
    // hex-bit packed). Reject at export, not corrupt at import.
    m.rounds.flatMap(t => Seq(t.rootFeature, t.leftFeature, t.rightFeature))
      .foreach(f => require(!f.contains(","),
        s"ModelStore.boostedTreesRows: feature name '$f' contains a comma"))
    row(id, ver, "boost_trees", "meta", v1 = Some(m.f0),
      v2 = Some(m.rate)) +:
      m.rounds.zipWithIndex.map { case (t, i) =>
        row(id, ver, "boost_trees", "round", idx = i.toLong,
          k = Some(t.rootFeature + "," + t.leftFeature + "," + t.rightFeature),
          k2 = Some(s"${j(t.rootThreshold)},${j(t.leftThreshold)},${j(t.rightThreshold)}"),
          v1 = Some(t.v0), v2 = Some(t.v1), v3 = Some(t.v2), v4 = Some(t.v3))
      }
  }

  def boostedTreesOf(rows: Seq[ModelRow]): Boosting.TreeModel = {
    val meta = one(rows, "boost_trees", "meta")
    Boosting.TreeModel(meta.v1.get, meta.v2.get,
      parts(rows, "boost_trees", "round").map { r =>
        val fs = r.k.get.split(",", -1)
        val ts = r.k2.get.split(",", -1).map(uj)
        Boosting.TreeRound(fs(0), ts(0), fs(1), ts(1), fs(2), ts(2),
          r.v1.get, r.v2.get, r.v3.get, r.v4.get)
      })
  }

  // ---- categorical NB + Platt calibrator (the q241 served pair) ----

  /** Persist the served calibrated-probability pair: NB priors +
    * per-feature likelihood tables + the 1-feature Platt calibrator.
    * Layout: one `prior` row (n1/n0), one `cal_meta` + one
    * `cal_feature` row (the logistic layout, 1 feature), and one `like`
    * row per (feature, value) cell — `c2` carries the feature's
    * POSITION so the rebuilt `NbModel.features` order (and with it the
    * delta's term-summation order, which the bitwise contract pins) is
    * exactly the fitted one.
    */
  def nbPlattRows(id: String, ver: Long, nb: Models.NbModel,
      cal: Trainer.LogisticModel): Seq[ModelRow] = {
    require(cal.features.size == 1,
      s"ModelStore.nbPlattRows: the Platt calibrator is 1-feature, got ${cal.features}")
    val like = nb.features.zipWithIndex.flatMap { case (f, fi) =>
      nb.tables(f).zipWithIndex.map { case ((v, c1cnt, c0cnt), vi) =>
        row(id, ver, "nb_platt", "like", idx = fi.toLong * 1000000L + vi,
          k = Some(f), v1 = Some(c1cnt), v2 = Some(c0cnt),
          c1 = Some(v), c2 = Some(fi.toLong))
      }
    }
    Seq(
      row(id, ver, "nb_platt", "prior", v1 = Some(nb.n1), v2 = Some(nb.n0)),
      row(id, ver, "nb_platt", "cal_meta", v1 = Some(cal.intercept),
        v2 = Some(cal.lr), c1 = Some(cal.iters.toLong)),
      row(id, ver, "nb_platt", "cal_feature", k = Some(cal.features.head),
        v1 = Some(cal.means.head), v2 = Some(cal.stds.head),
        v3 = Some(cal.weights.head))) ++ like
  }

  def nbPlattOf(rows: Seq[ModelRow]): (Models.NbModel, Trainer.LogisticModel) = {
    val prior = one(rows, "nb_platt", "prior")
    val meta = one(rows, "nb_platt", "cal_meta")
    val cf = one(rows, "nb_platt", "cal_feature")
    val like = parts(rows, "nb_platt", "like")
    val features = like.sortBy(_.c2.get).map(_.k.get).distinct
    val tables = features.map(f => f ->
      like.filter(_.k.get == f).sortBy(_.idx)
        .map(r => (r.c1.get, r.v1.get, r.v2.get))).toMap
    (Models.NbModel(features, prior.v1.get, prior.v2.get, tables),
      Trainer.LogisticModel(Seq(cf.k.get), Seq(cf.v1.get), Seq(cf.v2.get),
        Seq(cf.v3.get), meta.v1.get, meta.c1.get.toInt, meta.v2.get))
  }

  // ---- path-keyed deep trees (level-wise and best-first) ----

  def deepTreeRows(id: String, ver: Long, m: Trees.DeepTree): Seq[ModelRow] =
    row(id, ver, "tree", "meta", c1 = Some(m.n), c2 = Some(m.pos),
      c3 = Some(m.maxDepth.toLong)) +:
      m.splits.toSeq.sortBy { case (p, _) => (p.length, p) }.zipWithIndex
        .map { case ((p, s), i) =>
          row(id, ver, "tree", "split", idx = i.toLong, k = Some(p),
            k2 = Some(s.feature), v1 = Some(s.threshold), v2 = Some(s.gini),
            c1 = Some(s.nLeft), c2 = Some(s.posLeft), c3 = Some(s.nRight),
            c4 = Some(s.posRight))
        }

  def deepTreeOf(rows: Seq[ModelRow]): Trees.DeepTree = {
    val meta = one(rows, "tree", "meta")
    Trees.DeepTree(meta.c3.get.toInt, meta.c1.get, meta.c2.get,
      parts(rows, "tree", "split").map(r => r.k.get ->
        Trees.Split(r.k2.get, r.v1.get, r.v2.get, r.c1.get, r.c2.get,
          r.c3.get, r.c4.get)).toMap)
  }

  // exact double <-> string for threshold packs (raw long bits — commas
  // in the pack never collide with the hex digits)
  private def j(d: Double): String =
    java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(d))
  private def uj(s: String): Double =
    java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(s, 16))

  private def one(rows: Seq[ModelRow], kind: String, part: String): ModelRow = {
    val hits = parts(rows, kind, part)
    require(hits.size == 1,
      s"ModelStore: expected one $kind/$part row, got ${hits.size}")
    hits.head
  }

  private def parts(rows: Seq[ModelRow], kind: String,
      part: String): Seq[ModelRow] = {
    // guard BEFORE filtering: a wrong-kind slice must fail with the
    // diagnostic mixed-kinds error, not a downstream "got 0 rows"
    require(rows.forall(_.kind == kind),
      s"ModelStore: expected kind '$kind', slice holds: " +
        rows.map(_.kind).distinct.mkString(", "))
    rows.filter(r => r.kind == kind && r.part == part).sortBy(_.idx)
  }
}
