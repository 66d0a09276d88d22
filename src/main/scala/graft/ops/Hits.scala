package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (hubs & authorities) over a DIRECTED edge list.
  * On the customer→merchant transaction graph: authority = merchants
  * that concentrate flow from strong hubs, hub = customers that spray
  * flow across strong authorities — the complementary view to PageRank's
  * undirected prominence (q84), and the classic layering-pattern lens.
  *
  * The recurrence runs UNNORMALIZED — normalization commutes through a
  * linear recurrence, so dividing once by the final L1 mass gives the
  * same scores as per-step normalization while keeping both the Spark
  * loop and the unrolled oracle to ONE join+agg per half-step (per-step
  * scalar-subquery normalizers would make each oracle CTE
  * multi-referenced and blow up CTE inlining). Double headroom is ample:
  * raw mass grows by ~avg-degree per half-step, 1e308 allows hundreds of
  * iterations at any realistic degree.
  *
  * Same execution posture as [[PageRank.runDataFrame]]: one join +
  * aggregation per half-step, lineage truncated per iteration. Every
  * node on each side touches an edge by construction (sides are DEFINED
  * by edge endpoints), so no outer join is needed. The DuckDB oracle
  * unrolls the identical recurrence, so values agree to summation-order
  * noise (absorbed by the caller's rounding).
  */
object Hits {

  /** Returns (node, side ∈ {hub, auth}, score); each side's scores sum
    * to 1.
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    // iters = 0 would emit the uniform hub init labeled as BOTH sides
    // (auth never computed) — not a defined HITS state
    require(iters >= 1, s"Hits.run: iters must be >= 1, got $iters")
    val ed = edges.select(col("src"), col("dst")).localCheckpoint()
    var hub = ed.select(col("src").as("node")).distinct()
      .withColumn("s", lit(1.0))
    var auth = hub // placeholder; iters >= 1 always overwrites
    for (_ <- 1 to iters) {
      auth = ed.join(hub, ed("src") === hub("node"))
        .groupBy(ed("dst")).agg(sum(col("s")).as("s"))
        .select(col("dst").as("node"), col("s"))
        .localCheckpoint()
      hub = ed.join(auth, ed("dst") === auth("node"))
        .groupBy(ed("src")).agg(sum(col("s")).as("s"))
        .select(col("src").as("node"), col("s"))
        .localCheckpoint()
    }
    def norm(df: DataFrame, side: String): DataFrame =
      df.crossJoin(broadcast(df.agg(sum(col("s")).as("tot"))))
        .select(col("node"), lit(side).as("side"), (col("s") / col("tot")).as("s"))
    norm(hub, "hub").unionByName(norm(auth, "auth"))
  }

  /** Unrolled DuckDB oracle: one single-referenced CTE per half-step,
    * normalization only at the end (the final pair is referenced twice —
    * value and mass — which is the only CTE re-evaluation in the plan).
    */
  def oracleSql(edgesCte: String, iters: Int,
      round: String => String = identity): String = {
    val base = s"""WITH e AS ($edgesCte),
h0 AS (SELECT DISTINCT src AS node, 1.0::DOUBLE AS s FROM e)"""
    val steps = (1 to iters).map { i =>
      s"""a$i AS (SELECT e.dst AS node, sum(h.s) AS s
  FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1),
h$i AS (SELECT e.src AS node, sum(a.s) AS s
  FROM e JOIN a$i a ON e.dst = a.node GROUP BY 1)"""
    }
    (base +: steps).mkString(",\n") +
      s"""
SELECT node, side, ${round(s"s / tot")} AS s FROM (
  SELECT node, 'hub' AS side, s, (SELECT sum(s) FROM h$iters) AS tot FROM h$iters
  UNION ALL
  SELECT node, 'auth' AS side, s, (SELECT sum(s) FROM a$iters) AS tot FROM a$iters)"""
  }
}
