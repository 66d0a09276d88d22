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

  /** Per-customer betweenness + closeness on the bipartite
    * customer–merchant graph. `sampleSources`: None = exact (all sources).
    */
  def customerCentralities(tx: DataFrame, sampleSources: Option[Int] = None): DataFrame = {
    val spark = tx.sparkSession
    import spark.implicits._

    val edgeRows = GraphOps.symmetricEdges(tx).collect()
    val nodes = edgeRows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    if (n == 0)
      return spark.emptyDataset[(Long, Double, Double)]
        .toDF("customer_id", "graph_closeness_centrality", "graph_betweenness_centrality")
    val adjBuild = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    edgeRows.foreach { r => adjBuild(idx(r.getString(0))) += idx(r.getString(1)) }
    val adj = adjBuild.map(_.toArray)
    val adjB = spark.sparkContext.broadcast(adj)

    val allSources = 0 until n
    val sources = sampleSources.map(k => allSources.take(k)).getOrElse(allSources)

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

    val sampleNote = sampleSources.isDefined
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
