package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Counts-based trainable models beyond the gradient LR in [[Trainer]] —
  * the remaining classical members of the reference's supervised layer
  * (`models/advanced_models.py:1-533` trains tree/ensemble baselines next
  * to the linear model; these are their closed-form, aggregation-only
  * engine twins).
  *
  * Both train as pure DataFrame aggregations: no RNG, no driver-side data
  * movement beyond O(classes × feature-cardinality) model rows, so the
  * same code trains on 10⁹ rows with one shuffle per feature. All scoring
  * arithmetic is integer-count ratios pushed through `ln`, rounded at the
  * output contract, so the DuckDB oracle reproduces decisions exactly.
  */
object Models {

  /** Categorical naive Bayes with Laplace (+1) smoothing.
    *
    * `features` are small-cardinality integral columns (bucketed by the
    * caller); `label` must evaluate to 0/1. Returns the TEST rows scored
    * with the log-odds delta ln P(y=1|x) − ln P(y=0|x):
    * `delta = ln(n1/n0) + Σ_f [ln((c1+1)/(n1+K_f)) − ln((c0+1)/(n0+K_f))]`
    * where K_f is the number of distinct values feature f takes in
    * training (the Laplace denominator), and an unseen value contributes
    * the pure-smoothing 1/(n_c+K_f) term.
    *
    * Plan shape: one 1-row prior aggregate (broadcast), one
    * O(cardinality)-row likelihood aggregate per feature (broadcast —
    * bucketed features are ≤ dozens of rows), then `test` flows through
    * f left joins with no shuffle on the fact side.
    *
    * Preconditions: `train` must contain BOTH classes (a single-class
    * prior makes the log-odds ±Infinity — the correct degenerate answer,
    * but not a useful one) and the feature columns must be non-null
    * (null buckets would train a likelihood row the null-rejecting
    * equi-join can never match).
    */
  def naiveBayesDelta(train: DataFrame, test: DataFrame, features: Seq[String],
      label: Column, out: String = "delta"): DataFrame = {
    val y = label.cast("int")
    val prior = train.agg(
      sum(y).cast("double").as("__n1"),
      (count(lit(1)) - sum(y)).cast("double").as("__n0"))
    val scored = features.foldLeft(test.crossJoin(broadcast(prior))) { (acc, f) =>
      val like = train.groupBy(col(f).as(s"__v_$f")).agg(
        sum(y).cast("double").as(s"__c1_$f"),
        (count(lit(1)) - sum(y)).cast("double").as(s"__c0_$f"))
      val k = like.agg(count(lit(1)).cast("double").as(s"__k_$f"))
      acc.join(broadcast(like), col(f) === col(s"__v_$f"), "left")
        .crossJoin(broadcast(k))
        .drop(s"__v_$f")
    }
    val terms = features.map { f =>
      val (c1, c0, k) = (col(s"__c1_$f"), col(s"__c0_$f"), col(s"__k_$f"))
      log((coalesce(c1, lit(0.0)) + 1.0) / (col("__n1") + k)) -
        log((coalesce(c0, lit(0.0)) + 1.0) / (col("__n0") + k))
    }
    val delta = terms.foldLeft(log(col("__n1") / col("__n0")))(_ + _)
    scored.withColumn(out, delta)
      .drop("__n1" :: "__n0" ::
        features.flatMap(f => Seq(s"__c1_$f", s"__c0_$f", s"__k_$f")).toList: _*)
  }

  /** Out-of-fold [[naiveBayesDelta]] for every fold in ONE pass per
    * feature — the [[Trainer.fitLogisticCV]] fusion applied to the
    * likelihood tables. Per-value class counts are aggregated once with
    * a per-fold conditional sum (`sum(when(fold =!= b, y))`), so fold
    * b's train table is exactly the one its per-fold fit would build: a
    * value appearing only inside fold b gets train counts 0.0 — the
    * same cell the per-fold LEFT JOIN's coalesce produces — and fold
    * b's Laplace K counts only values with train presence. Every row is
    * scored against ITS OWN fold's excluded model; the emitted deltas
    * are bit-identical to `folds` separate [[naiveBayesDelta]] calls
    * (same integer counts, same expression order), while the corpus is
    * scanned once per feature instead of once per feature per fold.
    */
  def naiveBayesDeltaOof(data: DataFrame, features: Seq[String], label: Column,
      foldCol: Column, folds: Int, out: String = "delta"): DataFrame = {
    require(folds >= 2, s"naiveBayesDeltaOof: folds must be >= 2, got $folds")
    val y = label.cast("int")
    val fold = foldCol.cast("int")
    // rows with a NULL fold feed NO train model (`fold =!= b` evaluates
    // to NULL, so the conditional sums skip them — test-verified); rows
    // with an out-of-range integer fold feed EVERY model. Neither kind is
    // a TEST row of any fold, so neither may surface as a scored row
    val inRange = fold.isNotNull && fold >= 0 && fold < folds
    val priorAggs = (0 until folds).flatMap { b =>
      Seq(sum(when(fold =!= b, y)).cast("double").as(s"__n1_$b"),
        (sum(when(fold =!= b, 1)) - sum(when(fold =!= b, y))).cast("double")
          .as(s"__n0_$b"))
    }
    val prior = data.agg(priorAggs.head, priorAggs.tail: _*)
    val base = data.where(inRange).withColumn("__fold", fold)
      .crossJoin(broadcast(prior))
    val scored = features.foldLeft(base) { (acc, f) =>
      val aggs = (0 until folds).flatMap { b =>
        Seq(sum(when(fold =!= b, y)).cast("double").as(s"__c1_${f}_$b"),
          (sum(when(fold =!= b, 1)) - sum(when(fold =!= b, y))).cast("double")
            .as(s"__c0_${f}_$b"))
      }
      val like = data.groupBy(col(f).as(s"__v_$f")).agg(aggs.head, aggs.tail: _*)
      val kAggs = (0 until folds).map { b =>
        count(when(col(s"__c1_${f}_$b") + col(s"__c0_${f}_$b") > 0, 1))
          .cast("double").as(s"__k_${f}_$b")
      }
      val k = like.agg(kAggs.head, kAggs.tail: _*)
      acc.join(broadcast(like), col(f) === col(s"__v_$f"), "left")
        .crossJoin(broadcast(k))
        .drop(s"__v_$f")
    }
    def sel(pfx: String): Column = (0 until folds).foldLeft(lit(null).cast("double")) {
      (acc, b) => when(col("__fold") === b, col(s"${pfx}_$b")).otherwise(acc)
    }
    val terms = features.map { f =>
      val (c1, c0, kf) = (sel(s"__c1_$f"), sel(s"__c0_$f"), sel(s"__k_$f"))
      log((coalesce(c1, lit(0.0)) + 1.0) / (sel("__n1") + kf)) -
        log((coalesce(c0, lit(0.0)) + 1.0) / (sel("__n0") + kf))
    }
    val delta = terms.foldLeft(log(sel("__n1") / sel("__n0")))(_ + _)
    scored.withColumn(out, delta)
      .drop("__fold" +:
        (0 until folds).flatMap(b => Seq(s"__n1_$b", s"__n0_$b") ++
          features.flatMap(f => Seq(s"__c1_${f}_$b", s"__c0_${f}_$b", s"__k_${f}_$b"))): _*)
  }

  /** Collected categorical-NB model: the [[naiveBayesDelta]] likelihood
    * tables pulled to the driver so the log-odds becomes a LITERAL
    * Column — the servable form every other fitted family already has
    * (stump/boost/forest CASE chains). `tables(f)` holds one
    * (value, c1, c0) row per distinct training value of feature `f`;
    * K_f = tables(f).size is the Laplace denominator.
    *
    * The collect is model-sized by contract: features must be
    * small-cardinality integral buckets (the [[fitNaiveBayes]] cap
    * rejects anything else), so the model is O(Σ cardinality) rows no
    * matter how large the training table is.
    */
  final case class NbModel(features: Seq[String], n1: Double, n0: Double,
      tables: Map[String, Seq[(Long, Double, Double)]]) {
    /** The log-odds delta as a literal CASE chain over the feature
      * columns — bit-identical to [[naiveBayesDelta]]'s join form (same
      * doubles through the same JVM `log`/`+` sequence; ModelsSpec pins
      * exact equality). Stateless: serving appends it to any frame that
      * carries the feature columns.
      */
    def delta: Column = {
      val terms = features.map { f =>
        val rows = tables(f)
        val k = rows.size.toDouble
        // unseen value: pure-smoothing 1/(n_c+K) — the join form's
        // coalesce(c, 0)+1 cell
        val dflt = math.log(1.0 / (n1 + k)) - math.log(1.0 / (n0 + k))
        rows.foldLeft(lit(dflt)) { case (acc, (v, c1, c0)) =>
          when(col(f).cast("long") === v,
            lit(math.log((c1 + 1.0) / (n1 + k)) -
              math.log((c0 + 1.0) / (n0 + k)))).otherwise(acc)
        }
      }
      terms.foldLeft(lit(math.log(n1 / n0)): Column)(_ + _)
    }
  }

  /** Fit the collected form of [[naiveBayesDelta]]'s model: one 1-row
    * prior aggregate plus one O(cardinality) likelihood collect per
    * feature. Features must be non-null integral buckets; a feature
    * whose training cardinality exceeds `maxCardinality` is rejected
    * (the literal CASE chain — and the broadcast join it replaces —
    * only makes sense for bucketed columns).
    */
  def fitNaiveBayes(train: DataFrame, features: Seq[String], label: Column,
      maxCardinality: Int = 1024): NbModel = {
    val y = label.cast("int")
    val pr = train.agg(sum(y).cast("double").as("n1"),
      (count(lit(1)) - sum(y)).cast("double").as("n0")).head()
    val (n1, n0) = (pr.getDouble(0), pr.getDouble(1))
    val tables = features.map { f =>
      // cap INSIDE the query (TakeOrdered of maxCardinality+1), so a
      // high-cardinality feature is rejected after materializing at most
      // cap+1 rows on the driver — not its full distinct-value table
      val rows = train.groupBy(col(f).cast("long").as("v"))
        .agg(sum(y).cast("double").as("c1"),
          (count(lit(1)) - sum(y)).cast("double").as("c0"))
        .orderBy(col("v")).limit(maxCardinality + 1).collect()
      require(rows.length <= maxCardinality,
        s"fitNaiveBayes: feature $f has more than $maxCardinality " +
          "distinct values, over the driver-model cap; bucket it first")
      require(rows.forall(!_.isNullAt(0)),
        s"fitNaiveBayes: feature $f has null training values")
      f -> rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    }.toMap
    NbModel(features, n1, n0, tables)
  }

  /** Exact single-split decision stump (depth-1 CART): evaluates EVERY
    * distinct value of every feature as a `x <= t` threshold and returns
    * the candidate table with weighted Gini impurity — the caller picks
    * the argmin (ordered by rounded gini, then feature name, then
    * threshold, so ties are deterministic across engines).
    *
    * Scale shape: one groupBy per feature collapses the fact table to
    * distinct values (the classic pre-sorted stump algorithm), then the
    * left/right class counts come from a GLOBAL cumulative sum over those
    * values — [[graft.ops.GlobalOrder.withCumSums]], integral counts, so
    * no single-partition window anywhere even when a continuous feature
    * has millions of distinct values. Thresholds whose right side is
    * empty (the max value) are dropped — they encode "no split".
    *
    * Output: feature, threshold (double), n_left/pos_left/n_right/
    * pos_right (exact longs), gini (double, unrounded).
    */
  /** Melted single-pass candidate base shared by the stump/tree fits:
    * ONE fact-table scan and ONE (feature, threshold) shuffle feed every
    * feature's distinct-value count table, localCheckpoint'ed so the
    * per-feature cumsum pipelines — which each consume it several times
    * (bucket-boundary probe, local window, per-bucket totals, grand
    * totals) — re-read a (Σ distinct values)-sized table instead of
    * re-scanning and re-shuffling the fact table once per consumer.
    * `keep` columns (label, membership flags) are evaluated BEFORE the
    * explode so row-level expressions see the original row once.
    */
  private[scoring] def meltedPer(df: DataFrame, features: Seq[String],
      keep: Seq[Column], keepNames: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.select(keep :+ explode(array(features.map(f =>
        struct(lit(f).as("f"), col(f).cast("double").as("t"))): _*)).as("__e"): _*)
      .select(col("__e.f").as("__feat") +: col("__e.t").as("threshold") +:
        keepNames.map(col): _*)
      .groupBy(col("__feat"), col("threshold"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint()

  def stumpCandidates(df: DataFrame, features: Seq[String],
      label: Column): DataFrame = {
    val y = label.cast("long")
    val per0 = meltedPer(df, features, Seq(y.as("__y")), Seq("__y"),
      Seq(count(lit(1)).as("__n"), sum(col("__y")).as("__p")))
    val tot = per0.groupBy(col("__feat"))
      .agg(sum(col("__n")).as("__tn"), sum(col("__p")).as("__tp"))
    val cum = graft.ops.GlobalOrder.withCumSumsBy(per0, Seq("__feat"),
      Seq(col("threshold")),
      Seq(col("__n") -> "n_left", col("__p") -> "pos_left"))
    cum.join(broadcast(tot), "__feat")
      .where(col("n_left") < col("__tn")) // right side non-empty
      .select(col("__feat").as("feature"), col("threshold"),
        col("n_left"), col("pos_left"),
        (col("__tn") - col("n_left")).as("n_right"),
        (col("__tp") - col("pos_left")).as("pos_right"),
        (giniOf(col("pos_left"), col("n_left")) * col("n_left") / col("__tn") +
          giniOf(col("__tp") - col("pos_left"), col("__tn") - col("n_left")) *
            (col("__tn") - col("n_left")) / col("__tn")).as("gini"))
  }

  /** Bagged twin of [[stumpCandidates]], fused: ONE distinct-value
    * groupBy and ONE multi-sum GlobalOrder cumsum per feature carry every
    * bag's left counts as parallel columns (conditional sums over
    * `bagCol =!= b`), then a bounded `bags`-way explode emits the
    * per-bag candidate rows — b× fewer passes over the fact table than
    * fitting each bag separately, identical per-bag results.
    *
    * A threshold whose rows all fall in bag b yields a phantom candidate
    * for b (cumulative counts equal to its predecessor's); it ties the
    * predecessor's gini at a LARGER threshold, so (gini, feature,
    * threshold) argmin ordering can never select it over the real
    * candidate — per-bag argmins match the filtered-fit exactly.
    */
  def stumpCandidatesBagged(df: DataFrame, features: Seq[String],
      label: Column, bagCol: Column, bags: Int): DataFrame = {
    require(bags >= 2, s"stumpCandidatesBagged: bags must be >= 2, got $bags")
    groupedCandidates(df, features, label, bags, b => bagCol =!= b, "bag")
  }

  /** Per-SIDE twin of [[stumpCandidatesBagged]] for depth-2 tree growth:
    * `sideCol` (0/1, typically "left/right of the root split") selects
    * the rows each child stump trains ON (membership, not complement).
    * One distinct-value groupBy + one multi-sum GlobalOrder cumsum per
    * feature carries both children's counts — the fact table is scanned
    * once per feature instead of once per (feature × child), and the
    * per-side candidates match `stumpCandidates(df.where(side === s))`
    * exactly (ModelsSpec), with the same phantom-exclusion argument as
    * the bagged fit.
    */
  def stumpCandidatesSided(df: DataFrame, features: Seq[String],
      label: Column, sideCol: Column): DataFrame =
    groupedCandidates(df, features, label, 2, s => sideCol === s, "side")

  /** General fused pass: `groups` parallel candidate tables from ONE
    * distinct-value scan + ONE cumsum pipeline per feature; group g
    * trains on the rows where `member(g)`. The depth-3 tree uses it with
    * 4 leaf-membership groups, the deterministic forest with one
    * row-sample membership per tree — same phantom-exclusion argument as
    * the bagged/sided fits (candidates match the per-group filtered
    * [[stumpCandidates]] exactly, ModelsSpec).
    */
  def stumpCandidatesGrouped(df: DataFrame, features: Seq[String],
      label: Column, groups: Int, member: Int => Column,
      out: String = "grp"): DataFrame = {
    require(groups >= 2, s"stumpCandidatesGrouped: groups must be >= 2, got $groups")
    groupedCandidates(df, features, label, groups, member, out)
  }

  /** Shared fused fit: `groups` parallel candidate tables from one pass,
    * group g trained on rows where `member(g)`.
    */
  private def groupedCandidates(df: DataFrame, features: Seq[String],
      label: Column, groups: Int, member: Int => Column,
      groupOut: String): DataFrame = {
    val y = label.cast("long")
    val aggs = (0 until groups).flatMap(b => Seq(
      sum(when(col(s"__m$b"), 1L).otherwise(0L)).as(s"__n$b"),
      sum(when(col(s"__m$b"), col("__y")).otherwise(lit(0L))).as(s"__p$b")))
    val per0 = meltedPer(df, features,
      (0 until groups).map(b => member(b).as(s"__m$b")) :+ y.as("__y"),
      (0 until groups).map(b => s"__m$b") :+ "__y", aggs)
    val totAggs = (0 until groups).flatMap(b => Seq(
      sum(col(s"__n$b")).as(s"__tn$b"), sum(col(s"__p$b")).as(s"__tp$b")))
    val tot = per0.groupBy(col("__feat")).agg(totAggs.head, totAggs.tail: _*)
    val cum = graft.ops.GlobalOrder.withCumSumsBy(per0, Seq("__feat"),
      Seq(col("threshold")),
      (0 until groups).flatMap(b =>
        Seq(col(s"__n$b") -> s"__nl$b", col(s"__p$b") -> s"__pl$b")))
    val grpStructs = (0 until groups).map(b => struct(
      lit(b).as("grp"), col(s"__nl$b").as("nl"), col(s"__pl$b").as("pl"),
      col(s"__tn$b").as("tn"), col(s"__tp$b").as("tp")))
    cum.join(broadcast(tot), "__feat")
      .select(col("__feat"), col("threshold"), explode(array(grpStructs: _*)).as("s"))
      // real candidates only: left side non-empty (phantoms below the
      // group's min value have nl = 0 — not thresholds of the filtered
      // fit) and right side non-empty (the group's max value)
      .where(col("s.nl") > 0 && col("s.nl") < col("s.tn"))
      .select(col("s.grp").as(groupOut), col("__feat").as("feature"), col("threshold"),
        col("s.nl").as("n_left"), col("s.pl").as("pos_left"),
        (col("s.tn") - col("s.nl")).as("n_right"),
        (col("s.tp") - col("s.pl")).as("pos_right"),
        (giniOf(col("s.pl"), col("s.nl")) * col("s.nl") / col("s.tn") +
          giniOf(col("s.tp") - col("s.pl"), col("s.tn") - col("s.nl")) *
            (col("s.tn") - col("s.nl")) / col("s.tn")).as("gini"))
  }

  /** Gini impurity 1 − p² − (1−p)² of a side with `pos` positives out of
    * `n` rows, in the exact expression order the oracle mirrors.
    */
  private def giniOf(pos: Column, n: Column): Column = {
    val p = pos.cast("double") / n
    lit(1.0) - p * p - (lit(1.0) - p) * (lit(1.0) - p)
  }
}
