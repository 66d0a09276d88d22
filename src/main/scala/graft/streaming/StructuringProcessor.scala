package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming structuring (smurfing) screen — the online twin of
  * `ops/AmlPatterns.structuring` (q79): per customer, the running count
  * and share of just-under-threshold amounts, emitted per event with the
  * same band/flag semantics.
  *
  * State is TWO counters per key (running aggregate shape), so each
  * event costs O(1) state reads/writes and the state size is independent
  * of history length — unlike the reference's rebuild-the-list-per-event
  * pattern (`real_time_processor.py:129-151`) and unlike the trailing-
  * window processors, which genuinely need the event list. Amounts are
  * integer cents, so the counters and band predicate are exact.
  */
case class StructuringAlert(customer_id: Long, ts_micros: Long,
    band_cnt: Long, n: Long, band_share: Double, flagged: Boolean)

class StructuringProcessor(loCents: Long, hiCents: Long, minCount: Int,
    minShare: Double) extends StatefulProcessor[Long, StreamTxn, StructuringAlert] {
  @transient private var bandCnt: ValueState[Long] = _
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    bandCnt = getHandle.getValueState[Long]("band", Encoders.scalaLong, TTLConfig.NONE)
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[StreamTxn],
      timerValues: TimerValues): Iterator[StructuringAlert] = {
    var b = if (bandCnt.exists()) bandCnt.get() else 0L
    var n = if (total.exists()) total.get() else 0L
    val out = rows.toArray.sortBy(_.ts_micros).iterator.map { e =>
      val c = StreamConv.cents(e.amount) // batch HALF_UP parity (negatives)
      if (c >= loCents && c < hiCents) b += 1
      n += 1
      val share = b.toDouble / n
      StructuringAlert(key, e.ts_micros, b, n, share,
        b >= minCount && share > minShare)
    }.toArray
    bandCnt.update(b)
    total.update(n)
    out.iterator
  }
}

object StructuringProcessor {
  /** Wire the screen onto a stream (threshold in currency units, band =
    * [0.9·T, T) like the batch operator).
    */
  def screen(events: Dataset[StreamTxn], threshold: Double = 100.0,
      minCount: Int = 3, minShare: Double = 0.1): Dataset[StructuringAlert] = {
    implicit val enc: Encoder[StructuringAlert] = Encoders.product[StructuringAlert]
    events.groupByKey(_.customer_id)(Encoders.scalaLong)
      .transformWithState(
        new StructuringProcessor(math.round(threshold * 90), math.round(threshold * 100),
          minCount, minShare),
        TimeMode.None(), OutputMode.Append())
  }
}
