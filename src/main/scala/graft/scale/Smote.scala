package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.r6

/** Deterministic SMOTE (synthetic minority oversampling) — the engine
  * twin of the reference's default `prepare_data` rebalancing
  * (`models/advanced_models.py:395-407`: every training run balances
  * with SMOTE before fitting). The q86 rebalance covers the
  * downsample+weight half; this synthesizes the interpolated minority
  * rows the reference actually trains on.
  *
  * RNG-free: every stochastic choice of the classic algorithm — which
  * of the k nearest minority neighbors, and the interpolation factor
  * λ ∈ [0, 1) — is an md5 draw keyed on the parent row id
  * ([[Splits.bucket]]), so the synthesized set is a pure function of
  * the input: replayable by the DuckDB oracle, stable across
  * partitionings and reruns.
  *
  * Scale shape: k-NN runs inside md5 SHARDS of the minority set —
  * candidate pairs are minority²/shards and the ranking window is
  * partitioned by (shard, parent), so there is no all-pairs blow-up and
  * no single-partition window. Sharding trades exact global k-NN for
  * bounded work the way the LSH/IVF ANN kernels do ([[Similarity]]);
  * neighbors stay near-minority points, which is all SMOTE's statistics
  * need. At larger minority counts, raise `shards` (work per shard is
  * (minority/shards)²) or swap the shard join for the LSH-banded
  * candidate generation ([[synthesizeBanded]] — hyperplane-signature
  * bands via [[Similarity.planeCoef]], locality-aligned instead of
  * random). Distances use 4 dp-rounded minority z-scores
  * so neighbor ORDER is engine-exact; interpolation runs in raw feature
  * space like sklearn's.
  *
  * Memory shape: [[synthesize]]/[[synthesizeBy]] broadcast only
  * minority-bounded sides (the same bound sklearn's in-memory SMOTE
  * assumes), while [[knnOppositeCounts]] and [[tomekLinks]] — whose
  * query side can be the majority class (ENN) or the entire dataset
  * (Tomek) — join shuffle-side on the shard key, so executor memory is
  * bounded by a shard partition, not the full query projection. The
  * shard count bounds candidate PAIRS; the shuffle bounds MEMORY —
  * both are needed for the 100 TB story.
  */
object Smote {

  /** Synthesize `reps` rows per minority row of `minority`: for rep r,
    * parent row p draws neighbor rank md5-mod-k and factor
    * λ = md5-mod-10000 / 10000, and emits
    * `x_new = x_p + λ·(x_nbr − x_p)` per feature. Returns
    * (parent_id, nbr_id, rep, lam, s_<feature>…) with raw-space
    * interpolated features — the caller rounds at its output contract.
    * Parents in a shard with no other member (or fewer members than the
    * drawn rank) synthesize nothing rather than erroring.
    */
  def synthesize(minority: DataFrame, id: Column, features: Seq[String],
      k: Int = 5, reps: Int = 1, shards: Int = 8,
      salt: String = "smote"): DataFrame = {
    require(reps >= 1 && reps <= 10,
      s"Smote.synthesize: reps must be in [1,10], got $reps")
    synthesizeBy(minority, id, features, lit(reps.toLong), k, reps, shards, salt)
  }

  /** Per-parent-count twin of [[synthesize]] (the ADASYN shape): `gCol`
    * evaluates on each minority row to its synthetic-row count, clamped
    * to [0, maxReps]; parents with 0 emit nothing. Draw strings are
    * identical to [[synthesize]]'s (`salt:n<rep>:<id>` / `salt:l<rep>:
    * <id>`), so a constant `gCol` reproduces it exactly.
    */
  def synthesizeBy(minority: DataFrame, id: Column, features: Seq[String],
      gCol: Column, k: Int = 5, maxReps: Int = 10, shards: Int = 8,
      salt: String = "smote"): DataFrame = {
    require(shards >= 1, s"Smote.synthesizeBy: shards must be >= 1, got $shards")
    synthesizeWith(minority, id, features, gCol, k, maxReps,
      Splits.bucket(col("__pid"), s"$salt:s", shards), salt)
  }

  /** LSH-BANDED twin of [[synthesizeBy]] — the alternative candidate
    * generation the shard kernel's scaladoc promises for very large
    * minority sets: instead of md5 shards (random, locality-blind),
    * rows group by the random-hyperplane signature of their 4 dp
    * z-vector ([[Similarity.planeCoef]]'s deterministic planes — the
    * ANN kernels' banding, reused verbatim), so every candidate pair
    * shares a locality band and the k-NN search examines genuinely
    * NEAR candidates rather than a uniform sample. Work per band is
    * (band size)²; `planes` doubles the band count per unit, the same
    * lever as `shards` but locality-aligned. Draw strings, distance
    * grain, interpolation and output schema are identical to the shard
    * kernel's — with `planes = 0` (one band) the two are the SAME exact
    * kernel, which the spec asserts literally.
    */
  def synthesizeBanded(minority: DataFrame, id: Column,
      features: Seq[String], gCol: Column, k: Int = 5, maxReps: Int = 10,
      planes: Int = 8, salt: String = "smote"): DataFrame = {
    require(planes >= 0 && planes <= 16,
      s"Smote.synthesizeBanded: planes must be in [0,16], got $planes")
    synthesizeWith(minority, id, features, gCol, k, maxReps,
      bandSignature(features, planes), salt)
  }

  /** Hyperplane-sign signature of the 4 dp z-vector (`__z_<f>` columns):
    * bit p = sign of the projection onto [[Similarity.planeCoef]]'s
    * deterministic plane p. 0 planes = the single band 0.
    */
  private def bandSignature(features: Seq[String], planes: Int): Column =
    if (planes == 0) lit(0L)
    else (0 until planes).map { p =>
      val proj = features.zipWithIndex.map { case (f, d) =>
        col(s"__z_$f") * lit(Similarity.planeCoef(p, d)) }.reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Shared synthesis kernel: `shardCol` evaluates over the projected
    * frame (`__pid`, raw `__x_<f>`, 4 dp z `__z_<f>`) to the candidate
    * group — an md5 shard ([[synthesizeBy]]) or a locality band
    * ([[synthesizeBanded]]).
    */
  private def synthesizeWith(minority: DataFrame, id: Column,
      features: Seq[String], gCol: Column, k: Int, maxReps: Int,
      shardCol: Column, salt: String): DataFrame = {
    require(k >= 1, s"Smote.synthesizeBy: k must be >= 1, got $k")
    require(maxReps >= 1 && maxReps <= 10,
      s"Smote.synthesizeBy: maxReps must be in [1,10], got $maxReps")
    val statAggs = features.flatMap(f => Seq(
      avg(col(f).cast("double")).as(s"__m_$f"),
      coalesce(nullif(stddev_pop(col(f).cast("double")), lit(0.0)), lit(1.0))
        .as(s"__s_$f")))
    val st = minority.agg(statAggs.head, statAggs.tail: _*)
    val z = minority.crossJoin(broadcast(st)).select(
      id.as("__pid") +:
        greatest(lit(0L), least(gCol.cast("long"), lit(maxReps.toLong)))
          .as("__g") +:
        (features.map(f => col(f).cast("double").as(s"__x_$f")) ++
          features.map(f => r6((col(f).cast("double") - col(s"__m_$f")) /
            col(s"__s_$f")).as(s"__z_$f"))): _*)
      .withColumn("__shard", shardCol)
      .localCheckpoint() // scored twice (q/c sides) + 2 feature back-joins
    val q = z.select(col("__shard").as("__qs") +: col("__pid").as("__qid") +:
      features.map(f => col(s"__z_$f").as(s"__zq_$f")): _*)
    val c = z.select(col("__shard").as("__cs") +: col("__pid").as("__nid") +:
      features.map(f => col(s"__z_$f").as(s"__zn_$f")): _*)
    val d2 = features.map { f =>
      val d = col(s"__zq_$f") - col(s"__zn_$f"); d * d
    }.reduce(_ + _)
    // narrow (parent, neighbor, distance) rows through the shuffle; the
    // feature columns re-join AFTER the top-k cut
    val scored = c.join(broadcast(q),
        col("__cs") === col("__qs") && col("__nid") =!= col("__qid"))
      .select(col("__qs").as("__shard"), col("__qid"), col("__nid"),
        d2.as("__d2"))
    val w = Window.partitionBy(col("__shard"), col("__qid"))
      .orderBy(col("__d2").asc, col("__nid").asc)
    val nbrs = scored.withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") <= k)
      .select(col("__qid"), col("__nid"), col("__rnk"))
    val qx = z.select(col("__pid").as("__qid") +: col("__g") +:
      features.map(f => col(s"__x_$f").as(s"__xq_$f")): _*)
    val nx = z.select(col("__pid").as("__nid") +:
      features.map(f => col(s"__x_$f").as(s"__xn_$f")): _*)
    // md5 draws keyed on (salt, rep, parent id) — the literal strings
    // "salt:n<rep>:<id>" / "salt:l<rep>:<id>" the oracle rebuilds
    def draw(tag: String, mod: Int): Column =
      conv(substring(md5(concat(lit(s"$salt:$tag"), col("__rep").cast("string"),
        lit(":"), col("__qid").cast("string"))), 1, 8), 16, 10)
        .cast("long") % mod
    val reps = minority.sparkSession.range(maxReps).select(col("id").as("__rep"))
    val lam = draw("l", 10000).cast("double") / lit(10000.0)
    nbrs.join(broadcast(qx), "__qid").crossJoin(broadcast(reps))
      .where(col("__rep") < col("__g") && col("__rnk") === draw("n", k) + 1)
      .join(broadcast(nx), "__nid")
      .select(col("__qid").as("parent_id") +: col("__nid").as("nbr_id") +:
        col("__rep").as("rep") +: lam.as("lam") +:
        features.map(f => (col(s"__xq_$f") +
          lam * (col(s"__xn_$f") - col(s"__xq_$f"))).as(s"s_$f")): _*)
  }

  /** ADASYN density weights: for each minority row of `all` (rows where
    * `label` = 1), Δ = the MAJORITY count among its k nearest neighbors
    * in the full both-class space — the learning-difficulty weight that
    * decides how many synthetics each parent generates (He et al. 2008;
    * the reference's `ADASYN(random_state=42)` slot,
    * `models/advanced_models.py:398`). Same shard-local 4 dp-z k-NN
    * shape as the synthesis search, but z-moments come from the FULL
    * set (candidates are both classes) and the salt namespace is
    * `salt:d`. Returns (__did, delta); parents alone in their shard are
    * absent (the caller coalesces to 0).
    */
  def adasynCounts(all: DataFrame, id: Column, features: Seq[String],
      label: Column, k: Int = 5, shards: Int = 8,
      salt: String = "adasyn"): DataFrame =
    knnOppositeCounts(all, id, features, label, parentIs = 1L, k, shards, salt)

  /** Shared k-NN opposite-class counter: for each row whose `label`
    * equals `parentIs`, the count of OPPOSITE-class rows among its k
    * nearest neighbors in the full both-class space (shard-local,
    * full-set 4 dp-z moments, `salt:d` namespace). `parentIs = 1` is
    * the ADASYN density weight; `parentIs = 0` is the ENN cleaning
    * evidence (a majority row's minority neighbors,
    * `EditedNearestNeighbours` — `models/advanced_models.py:43`).
    * Returns (__did, delta); parents alone in their shard are absent.
    */
  def knnOppositeCounts(all: DataFrame, id: Column, features: Seq[String],
      label: Column, parentIs: Long, k: Int = 5, shards: Int = 8,
      salt: String = "adasyn"): DataFrame = {
    require(k >= 1, s"Smote.knnOppositeCounts: k must be >= 1, got $k")
    require(shards >= 1,
      s"Smote.knnOppositeCounts: shards must be >= 1, got $shards")
    val y = label.cast("long")
    val statAggs = features.flatMap(f => Seq(
      avg(col(f).cast("double")).as(s"__m_$f"),
      coalesce(nullif(stddev_pop(col(f).cast("double")), lit(0.0)), lit(1.0))
        .as(s"__s_$f")))
    val st = all.agg(statAggs.head, statAggs.tail: _*)
    val z = all.crossJoin(broadcast(st)).select(
      id.as("__pid") +: y.as("__y") +:
        Splits.bucket(id, s"$salt:d", shards).as("__shard") +:
        features.map(f => r6((col(f).cast("double") - col(s"__m_$f")) /
          col(s"__s_$f")).as(s"__z_$f")): _*)
      .localCheckpoint() // scored twice (query/candidate sides)
    val q = z.where(col("__y") === parentIs)
      .select(col("__shard").as("__qs") +: col("__pid").as("__qid") +:
        features.map(f => col(s"__z_$f").as(s"__zq_$f")): _*)
    val c = z.select(col("__shard").as("__cs") +: col("__pid").as("__nid") +:
      col("__y").as("__cy") +:
      features.map(f => col(s"__z_$f").as(s"__zn_$f")): _*)
    val d2 = features.map { f =>
      val d = col(s"__zq_$f") - col(s"__zn_$f"); d * d
    }.reduce(_ + _)
    // shuffle-side on the shard key, NOT broadcast: for ENN (parentIs = 0)
    // the query side is the MAJORITY class — an O(dataset) projection that
    // no shard count shrinks, so a forced broadcast would OOM executors at
    // scale. The shuffle_hash hint keeps the hash-join shape without
    // pinning the build side in every executor; AQE may still demote to
    // broadcast at runtime when the side is genuinely small (ADASYN's
    // minority queries), which is adaptive rather than forced. Sharding
    // bounds the PAIR count (n²/shards); the shuffle bounds the MEMORY.
    val scored = c.join(q.hint("shuffle_hash"),
        col("__cs") === col("__qs") && col("__nid") =!= col("__qid"))
      .select(col("__qs").as("__shard"), col("__qid"), col("__nid"),
        col("__cy"), d2.as("__d2"))
    val w = Window.partitionBy(col("__shard"), col("__qid"))
      .orderBy(col("__d2").asc, col("__nid").asc)
    scored.withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") <= k)
      .groupBy(col("__qid").as("__did"))
      .agg(sum(when(col("__cy") =!= parentIs, 1L).otherwise(0L)).as("delta"))
  }

  /** Tomek links: cross-class MUTUAL nearest-neighbor pairs — the
    * borderline/noise pairs `SMOTETomek` removes after oversampling
    * (`models/advanced_models.py:400`; removal keeps the majority
    * member out of training). Mutual 1-NN pairs are disjoint (each row
    * has one nearest neighbor), so removed-majority count = link count.
    *
    * 1-NN runs shard-local like the rest of the family (full-set 4 dp-z
    * moments, `salt:d` namespace): with one shard this IS the exact
    * Tomek definition; at scale the caller sizes shards to bound
    * n²/shards candidate pairs and the operator becomes shard-local
    * links — the same exactness trade the sharded k-NN family makes.
    * Returns (minority_id, majority_id, link_d2).
    */
  def tomekLinks(all: DataFrame, id: Column, features: Seq[String],
      label: Column, shards: Int, salt: String = "tomek"): DataFrame = {
    require(shards >= 1, s"Smote.tomekLinks: shards must be >= 1, got $shards")
    val y = label.cast("long")
    val statAggs = features.flatMap(f => Seq(
      avg(col(f).cast("double")).as(s"__m_$f"),
      coalesce(nullif(stddev_pop(col(f).cast("double")), lit(0.0)), lit(1.0))
        .as(s"__s_$f")))
    val st = all.agg(statAggs.head, statAggs.tail: _*)
    val z = all.crossJoin(broadcast(st)).select(
      id.as("__pid") +: y.as("__y") +:
        Splits.bucket(id, s"$salt:d", shards).as("__shard") +:
        features.map(f => r6((col(f).cast("double") - col(s"__m_$f")) /
          col(s"__s_$f")).as(s"__z_$f")): _*)
      .localCheckpoint() // scored twice (query/candidate sides)
    val q = z.select(col("__shard").as("__qs") +: col("__pid").as("__qid") +:
      col("__y").as("__qy") +:
      features.map(f => col(s"__z_$f").as(s"__zq_$f")): _*)
    val c = z.select(col("__shard").as("__cs") +: col("__pid").as("__nid") +:
      features.map(f => col(s"__z_$f").as(s"__zn_$f")): _*)
    val d2 = features.map { f =>
      val d = col(s"__zq_$f") - col(s"__zn_$f"); d * d
    }.reduce(_ + _)
    // shuffle-side on the shard key, NOT broadcast: here the query side is
    // EVERY row (both classes), so a forced broadcast is an O(dataset)
    // executor-memory bill no shard count reduces. See knnOppositeCounts.
    val scored = c.join(q.hint("shuffle_hash"),
        col("__cs") === col("__qs") && col("__nid") =!= col("__qid"))
      .select(col("__qs").as("__shard"), col("__qid"), col("__qy"),
        col("__nid"), d2.as("__d2"))
    val w = Window.partitionBy(col("__shard"), col("__qid"))
      .orderBy(col("__d2").asc, col("__nid").asc)
    val nn1 = scored.withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") === 1)
      .select(col("__qid"), col("__qy"), col("__nid"), col("__d2"))
      .localCheckpoint() // self-joined below
    val b = nn1.select(col("__qid").as("__bq"), col("__qy").as("__by"),
      col("__nid").as("__bn"))
    nn1.join(b, col("__nid") === col("__bq") && col("__bn") === col("__qid") &&
        col("__qid") < col("__bq") && col("__qy") =!= col("__by"))
      .select(
        when(col("__qy") === 1L, col("__qid")).otherwise(col("__bq"))
          .as("minority_id"),
        when(col("__qy") === 1L, col("__bq")).otherwise(col("__qid"))
          .as("majority_id"),
        col("__d2").as("link_d2"))
  }
}
