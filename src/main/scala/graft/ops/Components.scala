package graft.ops

import org.apache.spark.rdd.RDD

/** Connected-components labeling (label = min vertex id in the component,
  * GraphX's contract) with an ADAPTIVE execution strategy, the same idea
  * as AQE's broadcast fallback: below `localThreshold` edges the Pregel
  * machinery (per-iteration shuffles, vertex replication) costs orders of
  * magnitude more than the graph itself, so the edge list runs through a
  * task-local union-find; above it, GraphX's distributed implementation.
  * Both paths produce identical labels, so callers (and the oracle gate)
  * can't tell them apart — only the wall-clock changes.
  *
  * The near-dup pair graphs and fraud-ring graphs this engine builds are
  * SPARSE BY CONSTRUCTION (LSH-bounded candidates, distinct counterparty
  * edges), so even at 100 TB corpus scale the edge set is usually far
  * smaller than the input — but the distributed path is always there.
  */
object Components {

  /** @return (vertexId, componentLabel = min vertex id in component) */
  def run(edges: RDD[(Long, Long)], localThreshold: Long = 500000L): RDD[(Long, Long)] = {
    // the edge list is consumed twice (count, then collect/Pregel) and its
    // lineage is typically an expensive join pipeline — cache it
    edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = edges.count()
    if (n == 0) {
      edges.unpersist(blocking = false)
      edges.sparkContext.emptyRDD[(Long, Long)]
    } else if (n <= localThreshold) {
      val local = edges.collect()
      edges.unpersist(blocking = false)
      val parent = new scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      for ((a, b) <- local) {
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
      }
      // min-id labels: roots chosen as the smaller id on every union, so
      // find(v) IS the component minimum
      val labels = parent.keysIterator.map(v => (v, find(v))).toArray
      edges.sparkContext.parallelize(labels.toIndexedSeq,
        math.max(1, math.min(labels.length / 10000 + 1, 64)))
    } else {
      import org.apache.spark.graphx.{Edge, Graph}
      Graph.fromEdges(edges.map { case (a, b) => Edge(a, b, 1) }, 0)
        .connectedComponents().vertices.map { case (v, c) => (v, c) }
    }
  }
}
