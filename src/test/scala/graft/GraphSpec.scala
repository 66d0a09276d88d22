package graft

import graft.ops.GraphOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("communities: two disjoint rings resolve to two components with correct sizes") {
    // ring A: customers 1,2 share merchant mA; ring B: customers 3,4,5 share mB
    val tx = Seq(
      (1L, "mA", 10.0), (2L, "mA", 20.0),
      (3L, "mB", 30.0), (4L, "mB", 40.0), (5L, "mB", 50.0)
    ).toDF("customer_id", "merchant_id", "amount")
    val got = GraphOps.communities(tx)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(1L)._1 == got(2L)._1 && got(1L)._2 == 2L)
    assert(got(3L)._1 == got(4L)._1 && got(4L)._1 == got(5L)._1 && got(3L)._2 == 3L)
    assert(got(1L)._1 != got(3L)._1)
  }
}
