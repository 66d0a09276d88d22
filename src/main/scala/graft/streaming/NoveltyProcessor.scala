package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming new-counterparty detector — the online twin of
  * `ops/AmlPatterns.noveltyRatio` (q110): per event, whether this
  * customer has EVER transacted with this merchant before, plus the
  * running distinct-merchant count.
  *
  * State is a per-key map of seen merchants plus one counter, so each
  * event costs O(1) state lookups (containsKey + put) — no list rebuild,
  * no per-event scan of history, and emission order inside a micro-batch
  * follows event time like the other processors. The map grows with the
  * customer's distinct counterparties (bounded by merchant cardinality,
  * not event volume) — the right state shape at 100 TB, where per-event
  * histories are unbounded but counterparty sets are not.
  */
case class NoveltyEvent(customer_id: Long, ts_micros: Long,
    merchant_id: String, first_seen: Boolean, known_merchants: Long)

class NoveltyProcessor extends StatefulProcessor[Long, StreamTxn, NoveltyEvent] {
  @transient private var seen: MapState[String, Boolean] = _
  @transient private var nKnown: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getMapState[String, Boolean]("seen",
      Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
    nKnown = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[StreamTxn],
      timerValues: TimerValues): Iterator[NoveltyEvent] = {
    var n = if (nKnown.exists()) nKnown.get() else 0L
    val out = rows.toArray.sortBy(_.ts_micros).iterator.map { e =>
      val first = !seen.containsKey(e.merchant_id)
      if (first) {
        seen.updateValue(e.merchant_id, true)
        n += 1
      }
      NoveltyEvent(key, e.ts_micros, e.merchant_id, first, n)
    }.toArray
    nKnown.update(n)
    out.iterator
  }
}

object NoveltyProcessor {
  def screen(events: Dataset[StreamTxn]): Dataset[NoveltyEvent] = {
    implicit val enc: Encoder[NoveltyEvent] = Encoders.product[NoveltyEvent]
    events.groupByKey(_.customer_id)(Encoders.scalaLong)
      .transformWithState(new NoveltyProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
