package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank as a declarative DataFrame loop (the GraphX
  * `staticPageRank` convention: pr₀ = 1, prₜ₊₁ = 0.15 + d·Σ_in pr/odeg,
  * so ranks average 1 instead of summing to 1 — N never appears, which
  * keeps the oracle SQL free of a global count).
  *
  * Each iteration is one join of edges against the current rank table
  * plus one aggregation on the destination key. The rank table has one
  * row per NODE, so on a 100 TB event log (whose distinct-entity graph
  * is orders of magnitude smaller) Catalyst/AQE turns the join
  * broadcast- or shuffle-side as node count dictates; the edge table
  * partitioning on src is reused across all iterations via the cache.
  */
object PageRank {

  /** `edges` must already be symmetrized (both directions present) with
    * columns (src, dst); every node therefore has outdegree >= 1 and the
    * dangling-mass term vanishes.
    */
  def run(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val ed = edges.select(col("src"), col("dst"))
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("odeg")).cache()
    val nodes = deg.select(col("src").as("node"))
    val withDeg = ed.join(deg, "src").cache()

    var ranks = nodes.withColumn("pr", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("odeg")).as("mass"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("mass"), lit(0.0))).as("pr"))
    }
    ranks
  }

  /** Unrolled DuckDB oracle for [[run]]: one CTE per iteration with the
    * identical formula, so values agree to summation-order noise.
    */
  def oracleSql(edgesCte: String, iters: Int = 10, damping: Double = 0.85,
      round: String => String = identity): String = {
    val base = s"""WITH e AS ($edgesCte),
ed AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
deg AS (SELECT src, count(*) AS odeg FROM ed GROUP BY 1),
n AS (SELECT DISTINCT src AS node FROM ed),
r0 AS (SELECT node, 1.0::DOUBLE AS pr FROM n)"""
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
  SELECT n.node, ${1.0 - damping} + $damping * coalesce(m.mass, 0) AS pr
  FROM n LEFT JOIN (
    SELECT ed.dst AS node, sum(r${i - 1}.pr / deg.odeg) AS mass
    FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.node
            JOIN deg ON ed.src = deg.src
    GROUP BY 1) m USING (node))"""
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT node, ${round(s"pr")} AS pr FROM r$iters"
  }
}
