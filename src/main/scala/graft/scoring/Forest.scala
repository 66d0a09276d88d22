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
    /** Path-keyed form of this member — [[Trees.predict]] over the
      * converted [[Trees.DeepTree]] emits the same literal chain as the
      * Depth2 form (identical splits, identical leaf majorities), so a
      * depth-2 forest persists through [[graft.scoring.ModelStore
      * .forestRows]] and serves bit-identically.
      */
    def deep: DeepFTree = DeepFTree(tree, feats, Trees.DeepTree(2,
      root.n, root.posLeft + root.posRight,
      Map("" -> root, "l" -> left, "r" -> right)))
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

  /** One fitted deep member: its feature subset and level-wise tree. */
  final case class DeepFTree(tree: Int, feats: Seq[String],
      model: Trees.DeepTree)

  /** Depth-N forest: every member a [[Trees.fitDepth]]-style level-wise
    * CART on its own md5 row subsample and feature subset, ALL members
    * fitted together — one [[Models.stumpCandidatesGrouped]] pass per
    * LEVEL carries every live (tree, node) pair as a group, so the fact
    * table is scanned `maxDepth × |features|` times regardless of
    * forest size or node count (the [[fit]] fusion at arbitrary depth,
    * matching the reference's depth-6/10 members,
    * `models/advanced_models.py:228-231`). Same deterministic stopping
    * as `fitDepth` (pure node / no candidate), per-tree results equal
    * the solo filtered fit exactly (ModelsSpec). Every tree must admit
    * a root on its subset — `require`d loudly.
    */
  def fitDeep(df: DataFrame, allFeatures: Seq[String], label: Column,
      trees: Int, maxDepth: Int, member: Int => Column,
      featsOf: Int => Seq[String]): Seq[DeepFTree] = {
    require(trees >= 2, s"Forest.fitDeep: trees must be >= 2, got $trees")
    require(maxDepth >= 2 && maxDepth <= 10,
      s"Forest.fitDeep: maxDepth must be in [2, 10], got $maxDepth")
    def mask(grp: Column, treeOf: Int => Int, groups: Int): Column =
      (0 until groups).map(g =>
        grp === g && col("feature").isin(featsOf(treeOf(g)): _*)).reduce(_ || _)
    val rootC = Models.stumpCandidatesGrouped(df, allFeatures, label,
      trees, member, "grp")
    val roots = argminPerGroup(rootC.where(mask(col("grp"), identity, trees)), "grp")
    require((0 until trees).forall(roots.contains),
      s"Forest.fitDeep: a tree admits no root split (fitted: ${roots.keys})")
    var splits: Map[(Int, String), Split] =
      roots.map { case (t, s) => (t, "") -> s }
    def pathPred(t: Int, path: String): Column =
      path.indices.map { i =>
        val s = splits((t, path.take(i)))
        if (path(i) == 'l') col(s.feature).cast("double") <= lit(s.threshold)
        else col(s.feature).cast("double") > lit(s.threshold)
      }.foldLeft(member(t))(_ && _)
    def impureKids(t: Int, p: String, s: Split): Seq[(Int, String, Long, Long)] =
      Seq((t, p + "l", s.nLeft, s.posLeft), (t, p + "r", s.nRight, s.posRight))
        .filter { case (_, _, kn, kp) => kp > 0 && kp < kn }
    var frontier = roots.toSeq.sortBy(_._1)
      .flatMap { case (t, s) => impureKids(t, "", s) }
    var level = 1
    while (level < maxDepth && frontier.nonEmpty) {
      val keys = frontier.map { case (t, p, _, _) => (t, p) }
      val found: Map[(Int, String), Split] =
        if (keys.size == 1) {
          val (t, p) = keys.head
          Trees.argminOpt(Models.stumpCandidates(
            df.where(pathPred(t, p)), featsOf(t), label))
            .map(keys.head -> _).toMap
        } else
          argminPerGroup(
            Models.stumpCandidatesGrouped(df, allFeatures, label, keys.size,
              g => pathPred(keys(g)._1, keys(g)._2), "grp")
              .where(mask(col("grp"), g => keys(g)._1, keys.size)), "grp")
            .map { case (g, s) => keys(g) -> s }
      splits ++= found
      frontier = found.toSeq.sortBy(_._1).flatMap { case ((t, p), s) =>
        impureKids(t, p, s) }
      level += 1
    }
    (0 until trees).map { t =>
      val r = roots(t)
      DeepFTree(t, featsOf(t), Trees.DeepTree(maxDepth, r.n,
        r.posLeft + r.posRight,
        splits.collect { case ((`t`, p), s) => p -> s }))
    }
  }

  /** Majority vote count (0..trees) of a deep forest — `trees` literal
    * CASE chains summed, pure projection.
    */
  def votesDeep(forest: Seq[DeepFTree]): Column =
    forest.map(t => Trees.predict(t.model)).reduce(_ + _)

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
