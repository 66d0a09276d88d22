package graft.online

import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.StreamFeatures
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Streaming online-store sink (SURVEY S6): the reference pipelines
  * per-key HSET+EXPIRE into Redis per event
  * (`flink_job/aml_stream_processor.py:203-221`). Spark-side the sink is
  * `foreachBatch` performing an idempotent latest-wins upsert per entity:
  * replays of a micro-batch (at-least-once delivery) converge to the same
  * snapshot, upgrading the reference's non-transactional writes to
  * effectively-exactly-once.
  *
  * The store here is an in-JVM map (the local test/serving harness); the
  * WRITE PATH is the production shape: every partition upserts directly
  * from its task (the per-executor connection pattern of a KV/Delta
  * sink), so no row ever funnels through the driver. Swapping in Redis /
  * Delta MERGE replaces only [[SnapshotStore.forId]]'s resolution (a
  * client-pool lookup) and [[SnapshotStore.upsert]]'s body.
  */
class SnapshotStore(val id: String) {
  def this() = this(java.util.UUID.randomUUID().toString)

  private val rows = new ConcurrentHashMap[Long, StreamFeatures]()
  private val taskW = new AtomicLong()
  private val driverW = new AtomicLong()

  /** Latest-wins merge of a row batch. `ConcurrentHashMap.merge` is
    * atomic per key and the merge function is commutative-associative
    * (event-time order, amount tie-break), so concurrent partition
    * writers converge to the same snapshot in any interleaving.
    */
  def upsert(batch: Iterator[StreamFeatures]): Unit = {
    if (TaskContext.get() != null) taskW.incrementAndGet()
    else driverW.incrementAndGet()
    batch.foreach { f =>
      rows.merge(f.customer_id, f,
        (old, neu) =>
          if (neu.ts_micros > old.ts_micros ||
            (neu.ts_micros == old.ts_micros && neu.amount >= old.amount)) neu
          else old)
    }
  }

  def get(customerId: Long): Option[StreamFeatures] = Option(rows.get(customerId))

  /** TTL read-side filter (Redis EXPIRE 86400 equivalent). */
  def getFresh(customerId: Long, nowMicros: Long, ttlSeconds: Long = 86400): Option[StreamFeatures] =
    get(customerId).filter(_.ts_micros > nowMicros - ttlSeconds * 1000000L)

  def size: Int = rows.size

  /** Upsert calls that ran inside a Spark task (the distributed path). */
  def taskWrites: Long = taskW.get()

  /** Upsert calls that ran on the driver — the spec gate asserts this
    * stays ZERO for the streaming sink.
    */
  def driverWrites: Long = driverW.get()
}

object SnapshotStore {
  private val registry = new ConcurrentHashMap[String, SnapshotStore]()

  /** Task-side store resolution by id — the seam where a production sink
    * resolves its per-executor KV client instead. In-JVM (local[n]) this
    * returns the exact instance the driver registered.
    */
  def forId(id: String): SnapshotStore =
    registry.computeIfAbsent(id, new SnapshotStore(_))

  private[online] def register(store: SnapshotStore): Unit =
    registry.put(store.id, store)
}

object StreamingSnapshot {
  /** Wire a feature stream into the store. Each micro-batch first
    * reduces to ONE row per key (`reduceGroups` — partial map-side
    * combine, so a hot key's thousands of in-batch updates become one
    * upsert), then every partition writes its keys straight from the
    * task via `foreachPartition`. The driver never iterates rows — the
    * previous `toLocalIterator` funnel is gone; at 100 TB/day stream
    * scale the write fan-out is #partitions-wide and bounded by
    * one row per (key, batch).
    */
  def start(features: Dataset[StreamFeatures], store: SnapshotStore): StreamingQuery = {
    SnapshotStore.register(store)
    val sid = store.id
    features.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[StreamFeatures], _: Long) =>
        import batch.sparkSession.implicits._
        batch.groupByKey(_.customer_id)
          .reduceGroups { (a: StreamFeatures, b: StreamFeatures) =>
            if (b.ts_micros > a.ts_micros ||
              (b.ts_micros == a.ts_micros && b.amount >= a.amount)) b
            else a
          }
          .map(_._2)
          .foreachPartition { (it: Iterator[StreamFeatures]) =>
            SnapshotStore.forId(sid).upsert(it)
          }
      }
      .start()
  }
}
