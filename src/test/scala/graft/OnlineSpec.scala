package graft

import graft.online.{SnapshotStore, StreamingSnapshot}
import graft.sources.Generator
import graft.streaming.{StreamTxn, StreamingFeatures}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end §3.1 spine: generator -> stream -> stateful features ->
  * online snapshot -> point lookup with TTL.
  */
class OnlineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .getOrCreate()

  test("generator burst -> streaming features -> snapshot upsert -> TTL lookup") {
    import spark.implicits._
    val events = Generator.burst(spark, customerId = 7L)
      .select(col("customer_id"), unix_micros(col("event_timestamp")).as("ts_micros"),
        col("amount"), col("merchant_id"), lit("10.0.0.1").as("ip_address"),
        col("transaction_id"))
      .as[StreamTxn].collect().sortBy(_.ts_micros)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[StreamTxn]
    val store = new SnapshotStore
    val query = StreamingSnapshot.start(StreamingFeatures.customerFeatures(input.toDS()), store)
    try {
      input.addData(events.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    // the sink writes partition-parallel from tasks — no driver funnel
    assert(store.driverWrites == 0, "snapshot upserts must not run on the driver")
    assert(store.taskWrites > 0)

    val snap = store.get(7L).get
    assert(snap.txn_count_60s == 50)          // all 50 burst txns within 60 s
    assert(snap.velocity_score_1h == 50 / 60.0)
    assert(store.get(999L).isEmpty)           // cold key -> default path
    val lastTs = events.last.ts_micros
    assert(store.getFresh(7L, lastTs + 1000).isDefined)
    assert(store.getFresh(7L, lastTs + 86401L * 1000000).isEmpty) // TTL expired
  }

  test("seeded generator is deterministic and shaped like the reference") {
    val a = Generator.transactions(spark, 1000).collect()
    val b = Generator.transactions(spark, 1000).collect()
    assert(a.sameElements(b))
    val df = Generator.transactions(spark, 1000)
    val hot = df.where(col("customer_id") < 100).count().toDouble / 1000
    assert(hot > 0.3 && hot < 0.45, s"hot-key share $hot") // 30% + base-rate overlap
    assert(df.where(col("is_suspicious")).count() < 100)
  }
}
