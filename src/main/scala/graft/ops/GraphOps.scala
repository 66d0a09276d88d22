package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relationship-graph features (SURVEY §2.4; reference
  * `feature_engineering/advanced_features.py:15-105`).
  *
  * The reference holds a networkx graph in memory and recomputes global
  * centralities per lookup; here the graph IS a DataFrame of edges, built
  * with one groupBy, and the per-customer features are aggregations over
  * it — fully distributed, no driver-side graph object.
  *
  * Bipartite node namespaces (customer ids vs merchant ids may collide
  * textually) are kept distinct with "c:"/"m:" prefixes.
  */
object GraphOps {

  /** Customer–merchant edge list: weight = Σ amount, cnt = #txns (G1). */
  def customerMerchantEdges(tx: DataFrame): DataFrame =
    tx.groupBy(col("customer_id"), col("merchant_id"))
      .agg(sum(col("amount")).as("weight"), count(lit(1)).as("cnt"))

  /** Customer–IP edge list: cnt = #txns (G1). */
  def customerIpEdges(tx: DataFrame): DataFrame =
    tx.groupBy(col("customer_id"), col("ip_address"))
      .agg(count(lit(1)).as("cnt"))

  /** Degree-family features per customer (G3, G7, G8, G9):
    *   - graph_degree_centrality = distinct merchants / (N-1), N = total
    *     nodes (distinct customers + distinct merchants) in the graph
    *     (networkx `degree_centrality` convention);
    *   - graph_direct_connections = distinct merchants;
    *   - graph_total_weight = Σ incident edge weight = Σ amounts;
    *   - graph_ip_diversity = distinct IPs (the customer–IP graph degree).
    */
  def degreeFeatures(tx: DataFrame): DataFrame = {
    val per = tx.groupBy(col("customer_id")).agg(
      countDistinct(col("merchant_id")).as("graph_direct_connections"),
      sum(col("amount")).as("graph_total_weight"),
      countDistinct(col("ip_address")).as("graph_ip_diversity"))
    val n = tx.agg(
      (countDistinct(col("customer_id")) + countDistinct(col("merchant_id")))
        .as("n_nodes"))
    per.crossJoin(broadcast(n))
      .select(
        col("customer_id"),
        (col("graph_direct_connections").cast("double") / (col("n_nodes") - 1))
          .as("graph_degree_centrality"),
        col("graph_direct_connections").cast("double").as("graph_direct_connections"),
        col("graph_total_weight"),
        col("graph_ip_diversity").cast("double").as("graph_ip_diversity"))
  }

  /** Symmetrized adjacency of the bipartite customer–merchant graph with
    * prefixed node ids.
    */
  def symmetricEdges(tx: DataFrame): DataFrame = {
    val e = customerMerchantEdges(tx)
      .select(concat(lit("c:"), col("customer_id")).as("src"),
        concat(lit("m:"), col("merchant_id")).as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Fraud-ring communities: connected components of the bipartite
    * customer–merchant graph (the AML use of "who transacts through the
    * same counterparties"). Vertex ids are `xxhash64(node)` — no global
    * sort, no dictionary, no joins on the encode side; ONE aggregate
    * audits the hash for collisions (64-bit space vs entity-scale vertex
    * sets — a hit is astronomically unlikely, but correctness never rides
    * on luck: a collision falls back to the sorted-name dictionary path).
    * The emitted component label is VID-SCHEME-INDEPENDENT — the smallest
    * customer id in the component (every component of this bipartite
    * graph contains a customer) — so both paths are bit-identical and the
    * oracle never sees the internal ids.
    * Output: customer -> (component_id, component_size in customers).
    */
  def communities(tx: DataFrame): DataFrame = {
    val spark = tx.sparkSession
    import spark.implicits._
    // consumed twice (collision audit + encode): checkpoint the groupBy
    val edges = symmetricEdges(tx).where(col("src") < col("dst")).localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val audit = nodes
      .agg(count(lit(1)).as("n"), countDistinct(xxhash64(col("node"))).as("h"))
      .head()
    // (customer_id, raw CC label) under whichever vid scheme ran; the
    // adaptive CC (ops/Components: local union-find below 500k edges,
    // GraphX above) labels by min vid either way
    val custLabels: org.apache.spark.rdd.RDD[(Long, Long)] =
      if (audit.getLong(0) == audit.getLong(1)) {
        val cc = Components.run(edges
          .select(xxhash64(col("src")), xxhash64(col("dst")))
          .rdd.map(r => (r.getLong(0), r.getLong(1))))
        // decode needs only the customer side, and a customer's vid is
        // recomputable from its id — one join, zero dictionaries
        val custVid = tx.select(col("customer_id")).distinct()
          .select(xxhash64(concat(lit("c:"), col("customer_id"))).as("vid"),
            col("customer_id"))
          .rdd.map(r => (r.getLong(0), r.getLong(1)))
        custVid.join(cc).map { case (_, (cid, raw)) => (cid, raw) }
      } else {
        // collision fallback: sorted-name dense vids via distributed joins
        val dict = nodes.orderBy(col("node")).rdd.map(_.getString(0)).zipWithIndex()
        val cc = Components.run(edges.select(col("src"), col("dst")).rdd
          .map(r => (r.getString(0), r.getString(1)))
          .join(dict)
          .map { case (_, (dstName, srcVid)) => (dstName, srcVid) }
          .join(dict)
          .map { case (_, (srcVid, dstVid)) => (srcVid, dstVid) })
        dict.filter(_._1.startsWith("c:"))
          .map { case (node, vid) => (vid, node.stripPrefix("c:").toLong) }
          .join(cc).map { case (_, (cid, raw)) => (cid, raw) }
      }
    // canonical relabel: per raw label, (min customer id, customer count)
    // in one reduce; one component-scale join attaches them
    val byRaw = custLabels.map { case (cid, raw) => (raw, (cid, 1L)) }
      .reduceByKey((a, b) => (math.min(a._1, b._1), a._2 + b._2))
    custLabels.map(_.swap).join(byRaw)
      .map { case (_, (cid, (comp, size))) => (cid, comp, size) }
      .toDF("customer_id", "component_id", "component_size")
  }

  /** Bipartite label-propagation communities: finer-grained than
    * [[communities]] (a connected component splits where membership
    * overlap is weak). Semi-synchronous LPA — merchants adopt the
    * plurality label of their customers, then customers adopt the
    * plurality label of their merchants, `rounds` times; the two-phase
    * sweep is the standard bipartite form (synchronous LPA oscillates on
    * bipartite graphs). ALL-INTEGER determinism: plurality ties break on
    * the smallest label, labels start as the customer id — no RNG, no
    * floats, so the run is exactly reproducible on any engine.
    *
    * Scale shape: each phase is one equi-join (entity-scale, key-
    * partitioned) plus one (node, label) count with a per-node top-1
    * window — partitioned windows only, 2·rounds shuffles total; the
    * final label table checkpoints once for the size join.
    */
  def labelPropagation(tx: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"labelPropagation: rounds must be >= 1, got $rounds")
    import org.apache.spark.sql.expressions.Window
    val e = tx.select(col("customer_id"), col("merchant_id")).distinct()
    def plurality(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key), col("community")).agg(count(lit(1)).as("__cnt"))
        .withColumn("__rk", row_number().over(Window.partitionBy(col(key))
          .orderBy(col("__cnt").desc, col("community").asc)))
        .where(col("__rk") === 1).select(col(key), col("community"))
    var clab = e.select(col("customer_id")).distinct()
      .select(col("customer_id"), col("customer_id").as("community"))
    for (_ <- 1 to rounds) {
      val mlab = plurality(e.join(clab, "customer_id")
        .select(col("merchant_id"), col("community")), "merchant_id")
      clab = plurality(e.join(mlab, "merchant_id")
        .select(col("customer_id"), col("community")), "customer_id")
    }
    val fin = clab.localCheckpoint() // consumed twice: sizes + output join
    val sizes = fin.groupBy(col("community")).agg(count(lit(1)).as("community_size"))
    fin.join(sizes, "community")
      .select(col("customer_id"), col("community"), col("community_size"))
  }

  /** Local clustering coefficient per customer (G6): triangles through the
    * node / wedges deg*(deg-1)/2; 0.0 when deg < 2. Computed with
    * neighbor-pair self-joins — on a bipartite graph this is provably 0
    * everywhere, and the operator computes it rather than assuming it.
    * Scale note: wedge enumeration explodes on hub nodes; the 100 TB path
    * is GraphX TriangleCount over the same edge DataFrame.
    */
  def clusteringCoefficient(tx: DataFrame): DataFrame = {
    val adj = symmetricEdges(tx)
    val deg = adj.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val wedges = adj.as("a").join(adj.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("v"), col("a.dst").as("n1"), col("b.dst").as("n2"))
    val tri = wedges.join(adj.as("e"),
        col("n1") === col("e.src") && col("n2") === col("e.dst"))
      .groupBy(col("v")).agg(count(lit(1)).as("tri"))
    val cc = deg.join(tri, Seq("v"), "left")
      .select(col("v"),
        when(col("deg") >= 2,
          lit(2.0) * coalesce(col("tri"), lit(0L)) / (col("deg") * (col("deg") - 1)))
          .otherwise(0.0).as("graph_clustering_coefficient"))
    cc.where(col("v").startsWith("c:"))
      .select(regexp_replace(col("v"), "^c:", "").cast("long").as("customer_id"),
        col("graph_clustering_coefficient"))
  }

  /** Degree assortativity of a symmetric edge list: the Pearson
    * correlation of endpoint degrees across edges. Negative on
    * hub-and-spoke laundering topologies (high-degree mules fan out to
    * low-degree counterparties), positive on organic social/commercial
    * graphs — a one-number structural fingerprint. One degree
    * aggregation + two joins + `corr` (sample-vs-population cancels in
    * the correlation ratio, so the value is engine-exact up to summation
    * order).
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    edges
      .join(deg.select(col("src").as("a"), col("deg").as("da")), col("src") === col("a"))
      .join(deg.select(col("src").as("b"), col("deg").as("db")), col("dst") === col("b"))
      .agg(count(lit(1)).as("n_edges"), corr(col("da"), col("db")).as("assortativity"))
  }

  /** Bounded k-core peeling over a symmetric distinct edge list: up to
    * `rounds` iterations of "drop nodes with degree < k, restrict edges
    * to survivors". With enough rounds this converges to the true k-core;
    * the FIXED round bound keeps the operator deterministic and
    * oracle-expressible (the DuckDB twin unrolls the same rounds as plain
    * CTEs — aggregation is illegal inside a recursive term). Returns the
    * surviving nodes with their residual degree. Each round is one
    * degree aggregation plus two semi-join restrictions — all
    * key-partitioned shuffles, no driver-side graph; lineage is truncated
    * per round like the PageRank/BFS loops. Peeling is idempotent at its
    * fixpoint, so stopping early when a round removes no edge returns the
    * identical result the remaining rounds would (the count probe is a
    * cheap scan of the just-checkpointed edge set).
    */
  def boundedKCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("src"), col("dst")).localCheckpoint()
    var before = e.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src").as("kept"))
      e = e.join(keep, col("src") === col("kept"), "leftsemi")
        .join(keep, col("dst") === col("kept"), "leftsemi")
        .localCheckpoint()
      val after = e.count()
      stable = after == before
      before = after
      r += 1
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }

  /** Hop distance to the nearest flagged node: bounded BFS as up to
    * `maxHops` join+min rounds over the symmetrized edge list.
    * Unreachable nodes (within the bound) get NULL. Integer distances
    * make this exactly reproducible on any engine; the bound is what
    * keeps each round one equi-join at 100 TB (full single-source BFS
    * would be Pregel — see [[graft.ops.PageRank]] for that pattern).
    * If a round assigns no node its first distance the BFS has converged
    * and later rounds are no-ops — exit early (same result, fewer rounds;
    * the probe is a cheap scan of the just-checkpointed table).
    */
  def distanceToFlagged(edges: DataFrame, nodes: DataFrame,
      flagged: DataFrame, maxHops: Int): DataFrame = {
    var dist = nodes.join(flagged.withColumn("d", lit(0L)), Seq("node"), "left")
    var h = 1
    var converged = false
    while (h <= maxHops && !converged) {
      val frontier = edges
        .join(dist.where(col("d") === h - 1), edges("src") === dist("node"))
        .select(col("dst").as("node"), lit(h.toLong).as("nd"))
        .distinct()
      dist = dist.join(frontier, Seq("node"), "left")
        .select(col("node"), least(col("d"), col("nd")).as("d"))
        .localCheckpoint() // bounded loop: same lineage-truncation rule as PageRank
      converged = dist.where(col("d") === h).isEmpty
      h += 1
    }
    dist
  }
}
