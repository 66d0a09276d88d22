package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming mirrored-amount detector — the online twin of
  * `ops/AmlPatterns.mirrorPairs` (q118): per event, how many prior
  * in-window transactions of the SAME customer moved the SAME exact
  * cents through a DIFFERENT merchant, plus the customer's running pair
  * total. The cumulative total equals the batch pair count: every
  * unordered pair is counted exactly once, when its LATER element
  * arrives (ties included — whichever of two equal-timestamp events is
  * processed second sees the first).
  *
  * State is a map keyed by integer cents whose values are the in-window
  * (ts, merchant) entries for that amount — an event only ever touches
  * its own cents bucket (O(bucket), not O(history)), and the bucket is
  * pruned to the window on every touch, so state is bounded by the
  * window's distinct-amount activity. Production deployments put a
  * processing-time TTL on the map (`TTLConfig`) so buckets idle longer
  * than the window expire without being touched; the contract here is
  * event-time in-order per key, which the Kafka key=customer_id
  * partitioning provides (reference `producer/transaction_producer.py:151-155`).
  */
case class MirrorEntry(ts_micros: Long, merchant_id: String)
case class MirrorBucket(entries: Seq[MirrorEntry])
case class MirrorAlert(customer_id: Long, ts_micros: Long, cents: Long,
    hits_in_window: Long, total_pairs: Long)

class MirrorProcessor(windowMicros: Long)
    extends StatefulProcessor[Long, StreamTxn, MirrorAlert] {
  @transient private var byCents: MapState[Long, MirrorBucket] = _
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    byCents = getHandle.getMapState[Long, MirrorBucket]("byCents",
      Encoders.scalaLong, Encoders.product[MirrorBucket], TTLConfig.NONE)
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[StreamTxn],
      timerValues: TimerValues): Iterator[MirrorAlert] = {
    var t = if (total.exists()) total.get() else 0L
    val out = rows.toArray.sortBy(_.ts_micros).iterator.map { e =>
      val cents = StreamConv.cents(e.amount) // batch HALF_UP parity (negatives)
      val prior =
        if (byCents.containsKey(cents)) byCents.getValue(cents).entries else Seq.empty
      // |a.us - b.us| <= W is inclusive, so the window keeps ts >= cur - W
      val kept = prior.filter(_.ts_micros >= e.ts_micros - windowMicros)
      val hits = kept.count(_.merchant_id != e.merchant_id).toLong
      t += hits
      byCents.updateValue(cents,
        MirrorBucket(kept :+ MirrorEntry(e.ts_micros, e.merchant_id)))
      MirrorAlert(key, e.ts_micros, cents, hits, t)
    }.toArray
    total.update(t)
    out.iterator
  }
}

object MirrorProcessor {
  def screen(events: Dataset[StreamTxn], windowSeconds: Long): Dataset[MirrorAlert] = {
    implicit val enc: Encoder[MirrorAlert] = Encoders.product[MirrorAlert]
    events.groupByKey(_.customer_id)(Encoders.scalaLong)
      .transformWithState(new MirrorProcessor(windowSeconds * 1000000L),
        TimeMode.None(), OutputMode.Append())
  }
}
