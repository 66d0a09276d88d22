package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Betweenness and closeness centrality (SURVEY G4/G5; reference
  * `advanced_features.py:59-61` — networkx, recomputed globally per
  * lookup(!)).
  *
  * Distributed decomposition: Brandes betweenness is a sum over sources
  * of per-source dependency contributions, and closeness is computable
  * from the same single-source BFS. So: broadcast the (deduped, compact)
  * adjacency, parallelize SOURCES across the cluster, run one BFS +
  * dependency accumulation per source in a task, and reduce the
  * contribution vectors. Exact at test scale; at 100 TB the same code
  * runs on a SAMPLE of sources (landmark approximation — the standard
  * scale-out for Brandes) since per-source work is independent.
  *
  * Normalizations match networkx defaults:
  *   - betweenness_centrality(normalized=True, undirected):
  *     scale 2/((n-1)(n-2)), endpoints excluded, each pair counted once.
  *   - closeness_centrality(wf_improved=True):
  *     (r-1)/Σd · (r-1)/(n-1), r = reachable nodes incl. self.
  */
object Centrality {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Per-customer betweenness + closeness on the bipartite
    * customer–merchant graph. `sampleSources`: None = exact (all sources)
    * UNLESS the graph exceeds `maxExactSources` nodes, in which case the
    * landmark approximation auto-engages with that many sources (logged —
    * exact Brandes is O(n·m) and a 100× graph would otherwise run n BFS
    * sweeps AND silently assume n is small).
    *
    * Driver-memory contract: the adjacency must fit on the driver to
    * broadcast (inherent to the per-source-parallel Brandes
    * decomposition). The collect is the DEDUPED edge set packed to one
    * long per directed edge (≈8 B/edge + one string per distinct node),
    * hard-capped at `maxDriverEdges` — the default 5e7 is ~400 MiB
    * packed. Beyond the cap the method refuses rather than OOMing the
    * driver; graphs that size want the GraphX/Pregel ops (PageRank/HITS/
    * k-core in this package) or a k-sample of this one on a subgraph.
    */
  def customerCentralities(tx: DataFrame, sampleSources: Option[Int] = None,
      maxDriverEdges: Long = 50000000L, maxExactSources: Int = 4096): DataFrame = {
    val spark = tx.sparkSession
    import spark.implicits._

    val sym = GraphOps.symmetricEdges(tx)
    val nEdges = sym.count()
    require(nEdges <= maxDriverEdges,
      s"centrality adjacency would collect $nEdges directed edges " +
        s"(cap $maxDriverEdges ≈ ${maxDriverEdges * 8L / (1L << 20)} MiB packed); " +
        "raise maxDriverEdges only with driver memory to match, or use the " +
        "distributed graph ops (PageRank/HITS/k-core) at this scale")
    // dictionary-encode node ids on the CLUSTER; collect n node strings
    // once and the edges as packed (src<<32 | dst) longs
    val nodes = sym.select(col("src")).union(sym.select(col("dst")))
      .distinct().as[String].collect().sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    if (n == 0)
      return spark.emptyDataset[(Long, Double, Double)]
        .toDF("customer_id", "graph_closeness_centrality", "graph_betweenness_centrality")
    val idxB = spark.sparkContext.broadcast(idx)
    val packed = sym.select(col("src"), col("dst")).as[(String, String)]
      .mapPartitions { it =>
        val m = idxB.value
        it.map { case (s, d) => (m(s).toLong << 32) | m(d).toLong }
      }.collect()
    val adjBuild = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    packed.foreach { p => adjBuild((p >>> 32).toInt) += (p & 0xffffffffL).toInt }
    val adj = adjBuild.map(_.toArray)
    val adjB = spark.sparkContext.broadcast(adj)

    val allSources = 0 until n
    val effectiveSample = sampleSources.orElse {
      if (n > maxExactSources) {
        log.warn(s"exact Brandes over $n sources exceeds maxExactSources=$maxExactSources; " +
          s"auto-switching to the $maxExactSources-landmark approximation " +
          "(per-source contributions are non-negative, so this underestimates betweenness)")
        Some(maxExactSources)
      } else None
    }
    val sources = effectiveSample.map(k => allSources.take(k)).getOrElse(allSources)

    // per-source task: (closeness of source) + (betweenness contributions)
    val perSource = spark.sparkContext.parallelize(sources, math.max(1, math.min(sources.size, 64)))
      .map { s =>
        val a = adjB.value
        val nn = a.length
        val dist = Array.fill(nn)(-1)
        val sigma = Array.fill(nn)(0.0)
        val order = mutable.ArrayBuffer.empty[Int]
        val preds = Array.fill(nn)(mutable.ArrayBuffer.empty[Int])
        dist(s) = 0; sigma(s) = 1.0
        val queue = mutable.Queue(s)
        while (queue.nonEmpty) {
          val v = queue.dequeue()
          order += v
          a(v).foreach { w =>
            if (dist(w) < 0) { dist(w) = dist(v) + 1; queue.enqueue(w) }
            if (dist(w) == dist(v) + 1) { sigma(w) += sigma(v); preds(w) += v }
          }
        }
        val delta = Array.fill(nn)(0.0)
        order.reverseIterator.foreach { w =>
          preds(w).foreach { v => delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w)) }
        }
        val contributions = (0 until nn).iterator
          .filter(v => v != s && delta(v) != 0.0).map(v => (v, delta(v))).toArray
        val reach = dist.count(_ >= 0)
        val sumD = dist.filter(_ > 0).sum.toDouble
        val closeness =
          if (reach > 1 && sumD > 0) (reach - 1) / sumD * ((reach - 1).toDouble / (nn - 1))
          else 0.0
        (s, closeness, contributions)
      }

    val closeness = perSource.map { case (s, c, _) => (s, c) }
    val rawBetween = perSource.flatMap(_._3).reduceByKey(_ + _)
    // undirected: each pair counted from both endpoints -> /2; then the
    // networkx normalized=True scale.
    val scale = if (n > 2) 1.0 / ((n - 1).toLong * (n - 2)) else 0.0 // 2/((n-1)(n-2)) / 2
    val between = rawBetween.mapValues(_ * scale)

    val joined = closeness.fullOuterJoin(between).map { case (v, (c, b)) =>
      (v, c.getOrElse(0.0), b.getOrElse(0.0))
    }
    val nodeArr = spark.sparkContext.broadcast(nodes)
    joined.map { case (v, c, b) => (nodeArr.value(v), c, b) }
      .toDF("node", "graph_closeness_centrality", "graph_betweenness_centrality")
      .where(col("node").startsWith("c:"))
      .select(regexp_replace(col("node"), "^c:", "").cast("long").as("customer_id"),
        col("graph_closeness_centrality"), col("graph_betweenness_centrality"))
  }
}
