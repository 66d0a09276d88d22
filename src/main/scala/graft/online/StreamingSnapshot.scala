package graft.online

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.StreamFeatures
import java.util.concurrent.ConcurrentHashMap

/** Streaming online-store sink (SURVEY S6): the reference pipelines
  * per-key HSET+EXPIRE into Redis per event
  * (`flink_job/aml_stream_processor.py:203-221`). Spark-side the sink is
  * `foreachBatch` performing an idempotent latest-wins upsert per entity:
  * replays of a micro-batch (at-least-once delivery) converge to the same
  * snapshot, upgrading the reference's non-transactional writes to
  * effectively-exactly-once.
  *
  * The store here is an in-JVM map (the test/serving harness); swapping
  * in Delta `MERGE` or a KV store only replaces [[SnapshotStore.upsert]].
  */
class SnapshotStore extends Serializable {
  private val rows = new ConcurrentHashMap[Long, StreamFeatures]()

  def upsert(batch: Iterator[StreamFeatures]): Unit =
    batch.foreach { f =>
      rows.merge(f.customer_id, f,
        (old, neu) =>
          if (neu.ts_micros > old.ts_micros ||
            (neu.ts_micros == old.ts_micros && neu.amount >= old.amount)) neu
          else old)
    }

  def get(customerId: Long): Option[StreamFeatures] = Option(rows.get(customerId))

  /** TTL read-side filter (Redis EXPIRE 86400 equivalent). */
  def getFresh(customerId: Long, nowMicros: Long, ttlSeconds: Long = 86400): Option[StreamFeatures] =
    get(customerId).filter(_.ts_micros > nowMicros - ttlSeconds * 1000000L)

  def size: Int = rows.size
}

object StreamingSnapshot {
  /** Wire a feature stream into the store with foreachBatch. Note: with
    * an in-JVM store this supports local[
    * ] testing; production swaps the
    * lambda body for a Delta MERGE / KV pipeline write.
    */
  def start(features: Dataset[StreamFeatures], store: SnapshotStore): StreamingQuery =
    features.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[StreamFeatures], _: Long) =>
        batch.toLocalIterator().forEachRemaining(f => store.upsert(Iterator(f)))
      }
      .start()
}
