package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mini random-forest: `trees` depth-2 CARTs, each trained
  * on its own md5-bucket row subsample with its own feature subset — the
  * RNG-free twin of the reference's RandomForest/ExtraTrees members
  * (reference `models/advanced_models.py:228-231, 252`; sklearn's
  * bootstrap + max_features randomization becomes md5 row membership +
  * a caller-chosen feature rotation, so the same forest grows on any
  * engine).
  *
  * Fit cost does NOT scale with forest size: the WHOLE forest fits in
  * TWO fused candidate passes ([[Models.stumpCandidatesGrouped]]) —
  * pass 1 carries every tree's root candidates as parallel conditional
  * sums (`trees` groups), pass 2 every tree's both children
  * (`2·trees` groups) — so the fact table is scanned 2·|features| times
  * total, vs 2·|features|·trees for per-tree fits. Candidates from
  * features outside a tree's subset are masked BEFORE the per-tree
  * argmin; per-group results match the filtered per-tree fit exactly
  * (the bagged/sided phantom-exclusion argument, ModelsSpec). Driver
  * state = 3 split rows per tree.
  */
object Forest {
  import Trees.{Depth2, Split}

  /** One fitted member: its feature subset and depth-2 chain. */
  final case class FTree(tree: Int, feats: Seq[String],
      root: Split, left: Split, right: Split) {
    def depth2: Depth2 = Depth2(root, left, right)
  }

  /** Fit `trees` members. `member(t)` selects tree t's training rows
    * (an md5-bucket predicate — the caller owns the sampling law);
    * `featsOf(t)` its feature subset (must be a subset of
    * `allFeatures`). Every tree must admit a root and two child splits
    * on its subset — `require`d loudly, as in [[Trees.fitDepth2]].
    */
  def fit(df: DataFrame, allFeatures: Seq[String], label: Column,
      trees: Int, member: Int => Column,
      featsOf: Int => Seq[String]): Seq[FTree] = {
    require(trees >= 2, s"Forest.fit: trees must be >= 2, got $trees")
    (0 until trees).foreach { t =>
      val bad = featsOf(t).filterNot(allFeatures.contains)
      require(bad.isEmpty, s"Forest.fit: tree $t features $bad not in $allFeatures")
    }
    def ownFeatures(grp: Column, treeOf: Int => Int, groups: Int): Column =
      (0 until groups).map(g =>
        grp === g && col("feature").isin(featsOf(treeOf(g)): _*)).reduce(_ || _)

    // pass 1: every tree's root
    val rootC = Models.stumpCandidatesGrouped(df, allFeatures, label,
      trees, member, "tree")
    val roots = argminPerGroup(rootC.where(ownFeatures(col("tree"), identity, trees)), "tree")
    require((0 until trees).forall(roots.contains),
      s"Forest.fit: a tree admits no root split (fitted: ${roots.keys})")

    // pass 2: every tree's both children — group g = tree·2 + side,
    // membership = the tree's sample AND the side of ITS root literal
    def sideOf(s: Split): Column =
      when(col(s.feature).cast("double") <= lit(s.threshold), 0).otherwise(1)
    val childC = Models.stumpCandidatesGrouped(df, allFeatures, label,
      trees * 2, g => member(g / 2) && sideOf(roots(g / 2)) === g % 2, "grp")
    val kids = argminPerGroup(
      childC.where(ownFeatures(col("grp"), _ / 2, trees * 2)), "grp")
    require((0 until trees * 2).forall(kids.contains),
      s"Forest.fit: a root side admits no split (fitted: ${kids.keys})")

    (0 until trees).map(t =>
      FTree(t, featsOf(t), roots(t), kids(t * 2), kids(t * 2 + 1)))
  }

  /** Majority vote count (0..`trees`) of the forest over the raw feature
    * columns — `trees` literal CASE chains summed, pure projection.
    */
  def votes(forest: Seq[FTree]): Column =
    forest.map(t => Trees.predict(t.depth2)).reduce(_ + _)

  /** Per-group deterministic argmin by (rounded gini, feature,
    * threshold) via min-struct — ONE collect of `groups` rows.
    */
  private def argminPerGroup(cands: DataFrame, grp: String): Map[Int, Split] =
    cands.groupBy(col(grp)).agg(min(struct(
        graft.queries.r6(col("gini")).as("gini"), col("feature"),
        col("threshold"), col("n_left"), col("pos_left"),
        col("n_right"), col("pos_right"))).as("b"))
      .select(col(grp), col("b.*")).collect()
      .map(r => r.getInt(0) -> Split(r.getString(2), r.getDouble(3),
        r.getDouble(1), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
}
