package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming exact-dedup gate — the online twin of
  * `scale/Dedup.exactGroups` (q28): keyed by content fingerprint, the
  * FIRST document carrying a fingerprint is kept and becomes the
  * canonical; every later arrival is rejected with a pointer to it.
  *
  * State per fingerprint is two scalars (canonical id + duplicate
  * count), so the gate is O(1) per event and state grows with DISTINCT
  * content, not stream volume — the shape an ingest-time dedup needs at
  * 100 TB, where replaying a batch pair-join per micro-batch would be
  * quadratic. Arrival order inside a micro-batch is event-time (ties by
  * doc id), so replaying a log ordered by id reproduces the batch
  * min-id canonicals exactly (StreamingSpec pins this).
  */
case class StreamDoc(fp: String, doc_id: Long, ts_micros: Long)

case class DedupDecision(fp: String, doc_id: Long, ts_micros: Long,
    keep: Boolean, canonical_id: Long, n_seen: Long)

class DedupProcessor extends StatefulProcessor[String, StreamDoc, DedupDecision] {
  @transient private var canonical: ValueState[Long] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    canonical = getHandle.getValueState[Long]("canonical",
      Encoders.scalaLong, TTLConfig.NONE)
    seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[StreamDoc],
      timerValues: TimerValues): Iterator[DedupDecision] = {
    var n = if (seen.exists()) seen.get() else 0L
    val out = rows.toArray.sortBy(d => (d.ts_micros, d.doc_id)).map { d =>
      val first = !canonical.exists()
      if (first) canonical.update(d.doc_id)
      n += 1
      DedupDecision(key, d.doc_id, d.ts_micros, first, canonical.get(), n)
    }
    seen.update(n)
    out.iterator
  }
}

object DedupProcessor {
  def screen(docs: Dataset[StreamDoc]): Dataset[DedupDecision] = {
    implicit val enc: Encoder[DedupDecision] = Encoders.product[DedupDecision]
    docs.groupByKey(_.fp)(Encoders.STRING)
      .transformWithState(new DedupProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
