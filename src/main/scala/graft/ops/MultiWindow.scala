package graft.ops

import graft.schema.FeatureViews
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** One-pass multi-window kernel: the 100 TB execution path for the full
  * 12-kind × 6-window feature view (SURVEY W1/A1–A14).
  *
  * The window-function form (q37) re-scans each frame per output row —
  * per-row cost O(frame × kinds). This kernel keeps, per customer, ONE
  * ring buffer and per-window start pointers that only move forward, so
  * every event is added once and evicted once per window: amortized
  * O(windows) per row regardless of frame size. Same distribution
  * contract as the window form (hash-partition by customer, sort within
  * partition); only the per-partition evaluation changes — it is the
  * batch twin of the streaming processor's incremental state
  * (graft.streaming.FeatureProcessor).
  *
  * Float caveat: running add/evict sums and the sum-of-squares variance
  * differ from the frame-rescan bits by ~1e-9 relative, so the
  * ORACLE-gated q37 stays on the window form; this kernel is
  * property-tested against it (MultiWindowSpec: exact for counts /
  * distinct / min / max, 1e-9 for sums / ratios / std).
  */
object MultiWindow {

  private val windowSecs: Seq[Long] = FeatureViews.windows6.map(_._2)

  def outputSchema: StructType = {
    val feats = for {
      (wName, _) <- FeatureViews.windows6
      kind <- FeatureViews.kinds
    } yield {
      val n = kind.featureName(wName)
      if (kind.double) StructField(n, DoubleType, nullable = false)
      else StructField(n, LongType, nullable = false)
    }
    StructType(
      StructField("transaction_id", LongType, nullable = false) +:
      StructField("customer_id", LongType, nullable = false) +: feats)
  }

  /** df needs: transaction_id, customer_id (long), event_timestamp,
    * amount, merchant_id, ip_address.
    */
  def fullViewOnePass(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val prepared = df.select(
        col("transaction_id").cast("long"),
        col("customer_id").cast("long"),
        unix_micros(col("event_timestamp")).as("tm"),
        col("amount").cast("double"),
        hour(col("event_timestamp")).as("hr"),
        dayofweek(col("event_timestamp")).as("dow"),
        col("merchant_id").cast("string"),
        col("ip_address").cast("string"))
      .repartition(col("customer_id"))
      .sortWithinPartitions(col("customer_id"), col("tm"), col("transaction_id"))
    val rdd = prepared.queryExecution.toRdd.mapPartitions { iter =>
      // RANGE frames include PEERS — rows with the same (customer, ts)
      // that sort after the current row are still inside its frame. So the
      // unit of processing is the tie-run, not the row: add the whole run,
      // then emit one (identical) feature vector per member.
      val extracted = iter.map { ir =>
        (ir.getLong(0), ir.getLong(1), ir.getLong(2), ir.getDouble(3),
          ir.getInt(4), ir.getInt(5), ir.getUTF8String(6).toString,
          if (ir.isNullAt(7)) "" else ir.getUTF8String(7).toString)
      }.buffered
      val state = new PartitionState()
      new Iterator[Row] {
        private val pending = mutable.Queue.empty[Row]
        def hasNext: Boolean = pending.nonEmpty || extracted.hasNext
        def next(): Row = {
          if (pending.isEmpty) {
            val first = extracted.next()
            val run = mutable.ArrayBuffer(first)
            while (extracted.hasNext &&
                extracted.head._2 == first._2 && extracted.head._3 == first._3)
              run += extracted.next()
            pending ++= state.processRun(run)
          }
          pending.dequeue()
        }
      }
    }
    spark.createDataFrame(rdd, outputSchema)
  }

  /** Buffered event: flags precomputed once (night / weekend / business). */
  private final class Ev(val tm: Long, val amount: Double, val merchant: String,
                         val ip: String, val night: Boolean, val weekend: Boolean,
                         val business: Boolean)

  /** Per-window incremental state over the shared event buffer. */
  private final class WinState(val secs: Long) {
    var start = 0 // index into the customer buffer
    var sum = 0.0
    var sumSq = 0.0
    var nNight = 0L
    var nWeekend = 0L
    var nBusiness = 0L
    val merchants = new mutable.HashMap[String, Int]()
    val ips = new mutable.HashMap[String, Int]()
    // monotonic deques of buffer indices for max / min
    val maxq = new java.util.ArrayDeque[Int]()
    val minq = new java.util.ArrayDeque[Int]()

    private def bump(m: mutable.HashMap[String, Int], k: String, d: Int): Unit = {
      val n = m.getOrElse(k, 0) + d
      if (n == 0) m.remove(k) else m.update(k, n)
    }

    def add(i: Int, e: Ev): Unit = {
      sum += e.amount; sumSq += e.amount * e.amount
      if (e.night) nNight += 1
      if (e.weekend) nWeekend += 1
      if (e.business) nBusiness += 1
      bump(merchants, e.merchant, 1)
      if (e.ip.nonEmpty) bump(ips, e.ip, 1) // null ip -> not a distinct value
      while (!maxq.isEmpty && buf(maxq.peekLast()).amount <= e.amount) maxq.pollLast()
      maxq.addLast(i)
      while (!minq.isEmpty && buf(minq.peekLast()).amount >= e.amount) minq.pollLast()
      minq.addLast(i)
    }

    def evictThrough(t: Long): Unit = {
      // strict (t-W, t]: evict events with tm <= t - W*1e6
      val cutoff = t - secs * 1000000L
      while (start < buf.length && buf(start).tm <= cutoff) {
        val e = buf(start)
        sum -= e.amount; sumSq -= e.amount * e.amount
        if (e.night) nNight -= 1
        if (e.weekend) nWeekend -= 1
        if (e.business) nBusiness -= 1
        bump(merchants, e.merchant, -1)
        if (e.ip.nonEmpty) bump(ips, e.ip, -1)
        if (!maxq.isEmpty && maxq.peekFirst() == start) maxq.pollFirst()
        if (!minq.isEmpty && minq.peekFirst() == start) minq.pollFirst()
        start += 1
      }
    }

    var buf: mutable.ArrayBuffer[Ev] = _
    def reset(b: mutable.ArrayBuffer[Ev]): Unit = {
      buf = b; start = 0; sum = 0.0; sumSq = 0.0
      nNight = 0; nWeekend = 0; nBusiness = 0
      merchants.clear(); ips.clear(); maxq.clear(); minq.clear()
    }
  }

  private final class PartitionState {
    private var customer = Long.MinValue
    private var first = true
    private val buf = new mutable.ArrayBuffer[Ev]()
    private val wins = windowSecs.map(new WinState(_)).toArray
    private val nFeat = windowSecs.length * FeatureViews.kinds.length

    /** One tie-run of rows sharing (customer, tm): add all, evict, compute
      * the shared feature tail once, emit one Row per member.
      */
    def processRun(run: mutable.ArrayBuffer[(Long, Long, Long, Double, Int, Int, String, String)]): Seq[Row] = {
      val cust = run.head._2
      val tm = run.head._3
      if (first || cust != customer) {
        customer = cust; first = false
        buf.clear()
        wins.foreach(_.reset(buf))
      } else if (buf.length > 65536 && wins.forall(_.start > 16384)) {
        // compaction: a very long-lived hot customer grows buf within the
        // task; drop the prefix every window has already evicted
        val drop = wins.map(_.start).min
        buf.remove(0, drop)
        wins.foreach { w =>
          w.start -= drop
          val mq = w.maxq.toArray(new Array[Integer](0)).map(_ - drop)
          w.maxq.clear(); mq.foreach(i => w.maxq.addLast(i))
          val nq = w.minq.toArray(new Array[Integer](0)).map(_ - drop)
          w.minq.clear(); nq.foreach(i => w.minq.addLast(i))
        }
      }
      for (r <- run) {
        val e = new Ev(r._3, r._4, r._7, r._8,
          r._5 < 6 || r._5 > 22,
          r._6 == 1 || r._6 == 7,
          r._5 >= 9 && r._5 <= 17)
        val idx = buf.length
        buf += e
        wins.foreach(_.add(idx, e))
      }
      val tail = new Array[Any](nFeat)
      var o = 0
      var wi = 0
      while (wi < wins.length) {
        val w = wins(wi)
        w.evictThrough(tm)
        val cnt = (buf.length - w.start).toLong
        val cntD = cnt.toDouble
        val mean = w.sum / cntD
        val varPop = math.max(w.sumSq / cntD - mean * mean, 0.0)
        // kinds order: count, sum, avg, max, min, std, uniq_merch, uniq_ip,
        // velocity, night_ratio, weekend_ratio, business_ratio
        tail(o) = cnt; o += 1
        tail(o) = w.sum; o += 1
        tail(o) = mean; o += 1
        tail(o) = buf(w.maxq.peekFirst()).amount; o += 1
        tail(o) = buf(w.minq.peekFirst()).amount; o += 1
        tail(o) = if (cnt <= 1) 0.0 else math.sqrt(varPop); o += 1
        tail(o) = w.merchants.size.toLong; o += 1
        tail(o) = w.ips.size.toLong; o += 1
        tail(o) = cntD / (windowSecs(wi) / 60.0); o += 1
        tail(o) = w.nNight / cntD; o += 1
        tail(o) = w.nWeekend / cntD; o += 1
        tail(o) = w.nBusiness / cntD; o += 1
        wi += 1
      }
      run.toSeq.map { r =>
        val values = new Array[Any](2 + nFeat)
        values(0) = r._1
        values(1) = cust
        System.arraycopy(tail, 0, values, 2, nFeat)
        Row.fromSeq(values.toIndexedSeq)
      }
    }
  }
}
