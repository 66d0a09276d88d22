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

  // ---- deterministic forests (depth-2 and deep members) ----

  /** Persist a fitted forest — the reference retrainer reloads its
    * RandomForest members like every other joblib dump
    * (`models/advanced_models.py:228-231, 252`; reload lifecycle
    * `feedback/feedback_system.py:308-388`). Layout: one `meta` row
    * (member count), one `member` row per tree (its feature subset,
    * training-slice class counts and depth), and the member's path-keyed
    * splits in the `tree` layout with the member index packed into the
    * high `idx` digits (the `nb_platt` like-row convention). Depth-2
    * forests persist via [[Forest.FTree.deep]].
    */
  def forestRows(id: String, ver: Long,
      forest: Seq[Forest.DeepFTree]): Seq[ModelRow] = {
    require(forest.nonEmpty, "ModelStore.forestRows: empty forest")
    require(forest.map(_.tree) == forest.indices.map(identity),
      s"ModelStore.forestRows: member indices must be 0..n-1 in order, " +
        s"got ${forest.map(_.tree)}")
    forest.flatMap(_.feats).foreach(f => require(!f.contains(","),
      s"ModelStore.forestRows: feature name '$f' contains a comma"))
    row(id, ver, "forest", "meta", c1 = Some(forest.size.toLong)) +:
      forest.flatMap { ft =>
        val m = ft.model
        require(m.splits.size < 1000000,
          s"ModelStore.forestRows: member ${ft.tree} has ${m.splits.size} splits")
        row(id, ver, "forest", "member", idx = ft.tree.toLong,
          k = Some(ft.feats.mkString(",")), c1 = Some(m.n), c2 = Some(m.pos),
          c3 = Some(m.maxDepth.toLong)) +:
          m.splits.toSeq.sortBy { case (p, _) => (p.length, p) }.zipWithIndex
            .map { case ((p, sp), i) =>
              row(id, ver, "forest", "split",
                idx = ft.tree.toLong * 1000000L + i, k = Some(p),
                k2 = Some(sp.feature), v1 = Some(sp.threshold),
                v2 = Some(sp.gini), c1 = Some(sp.nLeft), c2 = Some(sp.posLeft),
                c3 = Some(sp.nRight), c4 = Some(sp.posRight))
            }
      }
  }

  def forestOf(rows: Seq[ModelRow]): Seq[Forest.DeepFTree] = {
    val meta = one(rows, "forest", "meta")
    val members = parts(rows, "forest", "member")
    require(members.size == meta.c1.get,
      s"ModelStore.forestOf: meta declares ${meta.c1.get} members, " +
        s"slice holds ${members.size}")
    val byTree = parts(rows, "forest", "split").groupBy(_.idx / 1000000L)
    members.map { mr =>
      val t = mr.idx
      val splits = byTree.getOrElse(t, Nil).map(r => r.k.get ->
        Trees.Split(r.k2.get, r.v1.get, r.v2.get, r.c1.get, r.c2.get,
          r.c3.get, r.c4.get)).toMap
      Forest.DeepFTree(t.toInt, mr.k.get.split(",", -1).toSeq,
        Trees.DeepTree(mr.c3.get.toInt, mr.c1.get, mr.c2.get, splits))
    }
  }

  // ---- frozen perplexity gate (the curation stack's served model) ----

  /** Persist a fitted [[graft.scale.Perplexity.Gate]] — the curation
    * twin of the fraud models' promotion lifecycle: a nightly refit
    * gate publishes like any estimator and the live funnel picks it up
    * at the next micro-batch. Layout: one `meta` row (keep fraction +
    * the two part counts), one `lm` row per stored trigram (packed
    * code-point key in `c1`, logp VERBATIM in `v1` — IEEE-exact through
    * parquet, so the rebuilt scorer is bitwise-identical), one `th` row
    * per source threshold. The lm slice is character-trigram-vocabulary
    * sized (alphabet³ bound), never corpus-sized.
    */
  def perplexityGateRows(id: String, ver: Long,
      g: graft.scale.Perplexity.Gate): Seq[ModelRow] = {
    val lms = g.lm.entries
    val ths = g.thresholds.toSeq.sortBy(_._1)
    row(id, ver, "perplexity_gate", "meta", v1 = Some(g.keepFrac),
      c1 = Some(lms.size.toLong), c2 = Some(ths.size.toLong)) +:
      (lms.zipWithIndex.map { case ((key, logp), i) =>
        row(id, ver, "perplexity_gate", "lm", idx = i.toLong,
          v1 = Some(logp), c1 = Some(key))
      } ++ ths.zipWithIndex.map { case ((src, th), i) =>
        row(id, ver, "perplexity_gate", "th", idx = i.toLong,
          k = Some(src), v1 = Some(th))
      })
  }

  def perplexityGateOf(rows: Seq[ModelRow]): graft.scale.Perplexity.Gate = {
    val meta = one(rows, "perplexity_gate", "meta")
    val lms = parts(rows, "perplexity_gate", "lm")
    val ths = parts(rows, "perplexity_gate", "th")
    require(lms.size == meta.c1.get && ths.size == meta.c2.get,
      s"ModelStore.perplexityGateOf: meta declares ${meta.c1.get} lm + " +
        s"${meta.c2.get} th rows, slice holds ${lms.size} + ${ths.size}")
    graft.scale.Perplexity.Gate(
      graft.functions.TrigramLm.fromLogps(
        lms.map(r => (r.c1.get, r.v1.get))),
      ths.map(r => r.k.get -> r.v1.get).toMap, meta.v1.get)
  }

  // ---- standing BM25 query (Retrieval.StandingBm25) ----

  /** Persist a frozen standing BM25 query: one meta row (avgdl/k1/b +
    * query id + term count) plus per-term idf rows in term order (idfs
    * round-trip IEEE-exact through parquet, so [[bm25QueryOf]] rebuilds
    * a bitwise-identical scorer).
    */
  def bm25QueryRows(id: String, ver: Long,
      m: graft.scale.Retrieval.StandingBm25): Seq[ModelRow] = {
    val ts = m.terms.sortBy(_._1)
    row(id, ver, "bm25_query", "meta", v1 = Some(m.avgdl), v2 = Some(m.k1),
      v3 = Some(m.b), c1 = Some(m.queryId), c2 = Some(ts.size.toLong)) +:
      ts.zipWithIndex.map { case ((t, w), i) =>
        row(id, ver, "bm25_query", "term", idx = i.toLong, k = Some(t),
          v1 = Some(w))
      }
  }

  def bm25QueryOf(rows: Seq[ModelRow]): graft.scale.Retrieval.StandingBm25 = {
    val meta = one(rows, "bm25_query", "meta")
    val ts = parts(rows, "bm25_query", "term")
    require(ts.size == meta.c2.get,
      s"ModelStore.bm25QueryOf: meta declares ${meta.c2.get} term rows, " +
        s"slice holds ${ts.size}")
    graft.scale.Retrieval.StandingBm25(meta.c1.get,
      ts.map(r => (r.k.get, r.v1.get)), meta.v1.get, meta.v2.get, meta.v3.get)
  }

  // ---- frozen lang-NB (LangId.LangNb) ----

  /** Persist the frozen language-ID NB: one meta row (buckets + class
    * count), per class a prior row and B weight rows (logps round-trip
    * IEEE-exact through parquet, so [[langNbOf]] rebuilds a bitwise-
    * identical scorer).
    */
  def langNbRows(id: String, ver: Long,
      m: graft.scale.LangId.LangNb): Seq[ModelRow] = {
    val cls = m.classes.sortBy(_.lang)
    row(id, ver, "lang_nb", "meta", c1 = Some(m.buckets.toLong),
      c2 = Some(cls.size.toLong)) +:
      (cls.zipWithIndex.map { case (c, i) =>
        row(id, ver, "lang_nb", "pri", idx = i.toLong, k = Some(c.lang),
          v1 = Some(c.logprior))
      } ++ cls.zipWithIndex.flatMap { case (c, i) =>
        c.w.zipWithIndex.map { case (w, b) =>
          row(id, ver, "lang_nb", "w", idx = i.toLong * m.buckets + b,
            k = Some(c.lang), c1 = Some(b.toLong), v1 = Some(w))
        }
      })
  }

  def langNbOf(rows: Seq[ModelRow]): graft.scale.LangId.LangNb = {
    val meta = one(rows, "lang_nb", "meta")
    val (buckets, nCls) = (meta.c1.get.toInt, meta.c2.get.toInt)
    val pris = parts(rows, "lang_nb", "pri")
    val ws = parts(rows, "lang_nb", "w").groupBy(_.k.get)
    require(pris.size == nCls && ws.size == nCls &&
      ws.valuesIterator.forall(_.size == buckets),
      s"ModelStore.langNbOf: meta declares $nCls classes x $buckets " +
        s"buckets, slice holds ${pris.size} priors / ${ws.size} weight groups")
    graft.scale.LangId.LangNb(buckets,
      pris.sortBy(_.idx).map { p =>
        graft.scale.LangId.LangNb.Cls(p.k.get, p.v1.get,
          ws(p.k.get).sortBy(_.c1.get).map(_.v1.get))
      })
  }

  // ---- torn-read manifest + the canonical write path ----

  /** Append ONE `manifest/count` row recording how many rows the
    * version writes. A parquet append is not atomic — a concurrent
    * reader can see `max(version)` move while some of the version's row
    * files are still invisible; the manifest lets a reader reject such
    * a partial slice instead of silently building a truncated model.
    * (Best-effort by construction: a torn read that hides the manifest
    * row itself degrades to the un-guarded contract.)
    */
  def withManifest(rows: Seq[ModelRow]): Seq[ModelRow] = {
    require(rows.nonEmpty, "ModelStore.withManifest: empty model")
    val h = rows.head
    require(rows.forall(r => r.model_id == h.model_id && r.version == h.version),
      "ModelStore.withManifest: rows span multiple (model_id, version)")
    rows :+ ModelRow(h.model_id, h.version, "manifest", "count",
      0L, None, None, None, None, None, None, Some(rows.size.toLong),
      None, None, None)
  }

  /** Strip (and, when present, enforce) the manifest row: the returned
    * body is what the family `*Of` readers consume. Lenient on legacy
    * manifest-less slices.
    */
  def body(rows: Seq[ModelRow]): Seq[ModelRow] = {
    val (mans, rest) = rows.partition(_.kind == "manifest")
    mans.foreach(m => require(m.c1.contains(rest.size.toLong),
      s"ModelStore: torn read — manifest declares ${m.c1.getOrElse(-1L)} " +
        s"rows, slice holds ${rest.size}"))
    rest
  }

  /** THE canonical promotion write: manifest-guard the version's rows
    * and append them to the store path. Every default write carries the
    * torn-read manifest — callers hand-assembling `table(...).write`
    * get the unguarded legacy contract only by opting out.
    */
  def publish(spark: SparkSession, path: String,
      rows: Seq[ModelRow]): Unit =
    table(spark, withManifest(rows)).write.mode("append").parquet(path)

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
