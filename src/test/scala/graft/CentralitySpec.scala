package graft

import graft.ops.Centrality
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed oracle for Brandes betweenness + closeness on the path
  * graph m1–c1–m2–c2–m3 (networkx-normalized conventions).
  */
class CentralitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("path-graph centralities match networkx-normalized values") {
    val tx = Seq(
      (1L, "m1", 10.0), (1L, "m2", 10.0),
      (2L, "m2", 10.0), (2L, "m3", 10.0)
    ).toDF("customer_id", "merchant_id", "amount")
    val got = Centrality.customerCentralities(tx)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // P5 path: customers sit at positions 1 and 3.
    // closeness(c) = (4/7)*(4/4); betweenness(c) = 3/((5-1)(5-2)/2) = 0.5
    assert(math.abs(got(1L)._1 - 4.0 / 7.0) < 1e-9)
    assert(math.abs(got(1L)._2 - 0.5) < 1e-9)
    assert(math.abs(got(2L)._1 - 4.0 / 7.0) < 1e-9)
    assert(math.abs(got(2L)._2 - 0.5) < 1e-9)
  }

  test("auto-landmark guard engages above maxExactSources and equals the explicit sample") {
    val tx = graft.tables.Tables.transactions(spark, "/root/testdata/sf0.001")
    // the graph has more than 5 nodes, so exact mode must auto-switch to
    // the 5-landmark approximation rather than silently run n sweeps
    val auto = Centrality.customerCentralities(tx, maxExactSources = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val explicitSample = Centrality.customerCentralities(tx, sampleSources = Some(5))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(auto == explicitSample)
    val exact = Centrality.customerCentralities(tx)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(auto != exact) // proves the guard actually reduced the source set
  }

  test("edge cap refuses a collect beyond maxDriverEdges instead of OOMing the driver") {
    val tx = graft.tables.Tables.transactions(spark, "/root/testdata/sf0.001")
    val e = intercept[IllegalArgumentException] {
      Centrality.customerCentralities(tx, maxDriverEdges = 3)
    }
    assert(e.getMessage.contains("maxDriverEdges") || e.getMessage.contains("cap"), e.getMessage)
  }

  test("landmark sampling path (100 TB posture) runs and underestimates exact betweenness") {
    val tx = graft.tables.Tables.transactions(spark, "/root/testdata/sf0.001")
    val exact = Centrality.customerCentralities(tx)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sampled = Centrality.customerCentralities(tx, sampleSources = Some(20))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sampled.nonEmpty)
    // per-source contributions are non-negative, so a source subset can
    // only underestimate
    sampled.foreach { case (k, b) => assert(b <= exact.getOrElse(k, 0.0) + 1e-12) }
  }
}
