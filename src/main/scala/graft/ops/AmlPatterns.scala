package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transaction-pattern detectors from the AML literature that the
  * reference's feature families gesture at but never implement
  * (reference `api/main.py:175-200` hard-codes one amount threshold;
  * these generalize it to the classic structuring / digit-distribution
  * / round-number tests).
  *
  * All three are single-shuffle groupBy aggregations with map-side
  * partial aggregation — at 100 TB the reduce state is one row per
  * entity (or per digit), so they scale with key cardinality, not data
  * volume. Amounts are converted to exact integer cents first so that
  * every predicate and sum is integer-exact and engine-independent.
  */
object AmlPatterns {

  /** Money as integer cents: 2-dp doubles land within 1 ulp of an
    * integer after *100, so half-away rounding is exact on any engine.
    */
  def cents(amount: Column): Column = round(amount * 100).cast("long")

  /** Structuring ("smurfing") screen: repeated amounts just under a
    * reporting threshold. Band = [0.9·T, T); a customer is flagged when
    * the band holds at least `minCount` transactions AND more than
    * `minShare` of their activity.
    *
    * One row per customer: band_cnt, band_sum_cents, band_share, flagged.
    */
  def structuring(tx: DataFrame, threshold: Double, minCount: Int = 3,
      minShare: Double = 0.1): DataFrame = {
    val c = cents(col("amount"))
    val lo = math.round(threshold * 90).toDouble // 0.9·T in cents, exact
    val hi = math.round(threshold * 100).toDouble
    val inBand = c >= lo && c < hi
    tx.groupBy(col("customer_id"))
      .agg(
        count(when(inBand, 1)).as("band_cnt"),
        coalesce(sum(when(inBand, c)), lit(0L)).as("band_sum_cents"),
        count(lit(1)).as("n"))
      .select(col("customer_id"), col("band_cnt"), col("band_sum_cents"),
        (col("band_cnt").cast("double") / col("n")).as("band_share"),
        // the share is ONE division (exact-rounded identically on any
        // IEEE engine), so the > comparison is engine-independent
        (col("band_cnt") >= minCount &&
          col("band_cnt").cast("double") / col("n") > minShare).as("flagged"))
  }

  /** Benford first-significant-digit test over positive amounts: observed
    * digit frequency vs the Benford expectation log10(1+1/d), with the
    * per-digit chi-square contribution. 9 rows out regardless of input
    * size. The first significant digit is read off the integer cents
    * string (scale-invariant, no cross-engine log10-of-amount edge).
    */
  def benford(tx: DataFrame): DataFrame = {
    val digit = substring(cents(col("amount")).cast("string"), 1, 1).cast("long")
    val byDigit = tx.where(col("amount") > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("cnt"))
    val total = byDigit.agg(sum(col("cnt")).cast("double").as("n"))
    val bf = log10(lit(1.0) + lit(1.0) / col("digit"))
    byDigit.crossJoin(broadcast(total))
      .select(col("digit"), col("cnt"),
        (col("cnt") / col("n")).as("obs_freq"),
        bf.as("benford_freq"),
        (pow(col("cnt") - col("n") * bf, 2) / (col("n") * bf)).as("chi2_term"))
  }

  /** Exponentially time-decayed activity features: each transaction
    * contributes exp(-ln2 · age/halfLife) as of the anchor instant, so
    * a customer's "decayed count" is a recency-weighted intensity and
    * the "decayed sum" a recency-weighted exposure — the streaming-
    * friendly alternative to maintaining K trailing windows (one running
    * product updates the whole feature on each event). One groupBy
    * shuffle; the anchor is an explicit column so backfills stay
    * point-in-time correct (pass the label row's timestamp, not now()).
    */
  def decayedActivity(tx: DataFrame, anchor: Column,
      halfLifeSeconds: Double): DataFrame = {
    // age in exact integer micros; one double multiply + exp per row
    // (identical literal lambda on the oracle side)
    val lambda = math.log(2.0) / (halfLifeSeconds * 1e6)
    val age = unix_micros(anchor) - unix_micros(col("event_timestamp"))
    val w = exp(age * -lambda)
    tx.groupBy(col("customer_id"))
      .agg(
        sum(w).as("decayed_count"),
        sum(w * col("amount")).as("decayed_amount"),
        count(lit(1)).as("n"))
  }

  /** Shared-identifier pair mining: customer pairs ranked by how many
    * identifiers (IPs, devices) they share — the "same laptop, many
    * accounts" ring signal. The top `hubFrac` fraction of identifiers BY
    * DEGREE RANK is dropped first (NAT gateways and public WiFi share an
    * IP across thousands of genuine users; the hub cut is what keeps the
    * self-join from going quadratic on hub identifiers at scale — the
    * same bound the MinHash df-cut applies to hub shingles). A rank cut
    * rather than an absolute degree: it adapts to any data scale and
    * avoids comparing integers against an interpolated float quantile.
    */
  def sharedIdPairs(tx: DataFrame, identifier: Column, hubFrac: Double,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = tx.select(col("customer_id"), identifier.as("ident"))
      .where(col("ident").isNotNull).distinct()
    val deg = e.groupBy(col("ident")).agg(count(lit(1)).as("deg"))
    // degree rank via the two-pass range-partitioned rank: the identifier
    // table is entity-scale, still one task under a bare Window.orderBy
    val ranked = graft.ops.GlobalOrder.withRowNumber(deg,
        Seq(col("deg"), col("ident")), "rk", total = Some("n_ident"))
      .where(col("rk") <= floor(col("n_ident") * (1.0 - hubFrac)))
    val kept = e.join(ranked.select(col("ident")), "ident")
    // self-join kept deliberately: exchange reuse shuffles `kept` once and
    // reads it for both sides, and the whole join+count pipeline stays in
    // whole-stage codegen. The posting-list collect_set + pair-expansion
    // alternative (one exchange fewer on paper) measured ~20% slower here —
    // ObjectHashAggregate + interpreted higher-order lambdas lose more than
    // the exchange saves, and the hub cut already bounds the join fan-out.
    kept.as("a").join(kept.as("b"),
        col("a.ident") === col("b.ident") &&
          col("a.customer_id") < col("b.customer_id"))
      .groupBy(col("a.customer_id").as("c1"), col("b.customer_id").as("c2"))
      .agg(count(lit(1)).as("shared_ids"))
      .orderBy(col("shared_ids").desc, col("c1").asc, col("c2").asc)
      .limit(topK)
  }

  /** Market-basket lift between merchant pairs (reference's co-occurrence
    * screen): lift(m1,m2) = P(m1,m2) / (P(m1)·P(m2)) over distinct
    * (customer, merchant) baskets — all-integer counts, so the ratio is
    * ONE exact division (engine-independent).
    *
    * `keepFrac` is the OUTPUT CONTRACT knob: a hub customer with m
    * merchants emits O(m²) pairs from the self-join, so `keepFrac < 1.0`
    * applies the same degree-RANK cut as [[sharedIdPairs]] — drop the
    * top `1-keepFrac` largest baskets first, then compute all lift
    * statistics WITHIN the kept population so the ratio stays coherent.
    * `keepFrac = 1.0` (default) is the untrimmed full-population lift;
    * callers that trim must surface that in their own contract.
    */
  def cooccurrenceLift(tx: DataFrame, keepFrac: Double = 1.0): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"cooccurrenceLift: keepFrac must be in (0, 1], got $keepFrac")
    val all = tx.select(col("customer_id"), col("merchant_id")).distinct()
    val e =
      if (keepFrac >= 1.0) all
      else {
        val deg = all.groupBy(col("customer_id")).agg(count(lit(1)).as("deg"))
        val kept = graft.ops.GlobalOrder.withRowNumber(deg,
            Seq(col("deg"), col("customer_id")), "rk", total = Some("n_cust"))
          .where(col("rk") <= floor(col("n_cust") * keepFrac))
          .select(col("customer_id"))
        all.join(kept, "customer_id")
      }
    // customer count as a broadcast 1-row aggregate, not an eager
    // .count() — one lazy plan, and the repeated `e` subtrees dedup
    // through ReusedExchange
    val nc = e.agg(countDistinct(col("customer_id")).as("nc"))
    val per = e.groupBy(col("merchant_id")).agg(count(lit(1)).as("cnt"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.customer_id") === col("b.customer_id") &&
          col("a.merchant_id") < col("b.merchant_id"))
      .groupBy(col("a.merchant_id").as("m1"), col("b.merchant_id").as("m2"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(per.select(col("merchant_id").as("m1"), col("cnt").as("n1"))), "m1")
      .join(broadcast(per.select(col("merchant_id").as("m2"), col("cnt").as("n2"))), "m2")
      .crossJoin(broadcast(nc))
      .select(col("m1"), col("m2"), col("n_both"),
        ((col("n_both") * col("nc")).cast("double") / (col("n1") * col("n2"))).as("lift"))
  }

  /** New-counterparty novelty: of each customer's transactions in the
    * trailing `windowSeconds` before `anchor`, how many went to a merchant
    * that customer had NEVER used before the window started. Mule and
    * layering accounts light up here — organic customers mostly revisit
    * known merchants. Boundary is strict on the window start (`ts > cut`
    * recent, `ts <= cut` history) on epoch-micros, matching the engine's
    * (t-W, t] trailing-window contract. One left join of the recent slice
    * against the distinct historical pair set (both shuffles on the same
    * composite key); customers with no recent activity emit no row.
    */
  def noveltyRatio(tx: DataFrame, anchor: Column, windowSeconds: Long): DataFrame = {
    val cut = unix_micros(anchor) - windowSeconds * 1000000L
    val us = unix_micros(col("event_timestamp"))
    val recent = tx.where(us > cut)
      .select(col("customer_id"), col("merchant_id"))
    val known = tx.where(us <= cut)
      .select(col("customer_id"), col("merchant_id")).distinct()
      .withColumn("known", lit(true))
    recent.join(known, Seq("customer_id", "merchant_id"), "left")
      .groupBy(col("customer_id"))
      .agg(count(lit(1)).as("recent_cnt"),
        count(when(col("known").isNull, 1)).as("novel_cnt"))
      .withColumn("novelty_ratio",
        col("novel_cnt").cast("double") / col("recent_cnt"))
  }

  /** Dormancy screen: per-customer inter-transaction gaps (exact micros)
    * — the longest gap ever, the gap immediately before the LATEST
    * transaction, and a reactivation flag when that last gap exceeds
    * `reactivationSeconds` (long-dormant account suddenly active — a
    * takeover/mule signal). Single-transaction customers have NULL gaps
    * and are not flagged. One window pass on the canonical
    * (customer, ts) ordering, then one groupBy.
    */
  def dormancy(tx: DataFrame, reactivationSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val us = unix_micros(col("event_timestamp"))
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(us, col("transaction_id"))
    val wDesc = Window.partitionBy(col("customer_id"))
      .orderBy(us.desc, col("transaction_id").desc)
    tx.select(col("customer_id"),
        (us - lag(us, 1).over(w)).as("gap_us"),
        row_number().over(wDesc).as("rn_desc"))
      .groupBy(col("customer_id"))
      .agg(count(lit(1)).as("n"),
        max(col("gap_us")).as("max_gap_us"),
        max(when(col("rn_desc") === 1, col("gap_us"))).as("last_gap_us"))
      .withColumn("reactivated",
        coalesce(col("last_gap_us") > reactivationSeconds * 1000000L, lit(false)))
  }

  /** Rapid same-counterparty repeats: the SAME customer hitting the SAME
    * merchant again within `windowSeconds` of the previous attempt — the
    * card-testing / double-charge velocity pattern (distinct from
    * [[mirrorPairs]], which requires DIFFERENT merchants). One lag window
    * over the (customer, merchant) key: per-key cost is the sort the
    * feature views already pay; no self-join, so hot keys cannot fan out
    * quadratically. Emits the repeat row with its gap and both amounts.
    */
  def rapidRepeats(tx: DataFrame, windowSeconds: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("customer_id"), col("merchant_id"))
      .orderBy(col("tm"), col("transaction_id"))
    tx.select(col("transaction_id"), col("customer_id"), col("merchant_id"),
        col("amount"), unix_micros(col("event_timestamp")).as("tm"))
      .withColumn("prev_tm", lag(col("tm"), 1).over(w))
      .withColumn("prev_amount", lag(col("amount"), 1).over(w))
      .where(col("prev_tm").isNotNull &&
        col("tm") - col("prev_tm") <= windowSeconds * 1000000L)
      .select(col("transaction_id"), col("customer_id"), col("merchant_id"),
        (col("tm") - col("prev_tm")).as("gap_us"), col("amount"), col("prev_amount"))
  }

  /** Mirrored-amount pairs: the SAME customer moving the SAME exact cents
    * through DIFFERENT merchants within `windowSeconds` — classic
    * split-payment / layering structure that per-merchant screens miss.
    * Self-join on the composite (customer, cents) key, so the fan-out is
    * bounded by per-key repetition, not customer volume; pair direction
    * is fixed by the (time, id) tuple so each unordered pair counts once.
    */
  def mirrorPairs(tx: DataFrame, windowSeconds: Long): DataFrame = {
    val c = tx.select(col("customer_id"), col("transaction_id"),
      col("merchant_id"), cents(col("amount")).as("cents"),
      unix_micros(col("event_timestamp")).as("us"))
    val winUs = windowSeconds * 1000000L
    c.as("a").join(c.as("b"),
        col("a.customer_id") === col("b.customer_id") &&
          col("a.cents") === col("b.cents") &&
          col("a.merchant_id") =!= col("b.merchant_id") &&
          abs(col("a.us") - col("b.us")) <= winUs &&
          (col("a.us") < col("b.us") ||
            (col("a.us") === col("b.us") &&
              col("a.transaction_id") < col("b.transaction_id"))))
      .groupBy(col("a.customer_id").as("customer_id"))
      .agg(count(lit(1)).as("mirror_pairs"),
        countDistinct(col("a.cents")).as("mirror_cents"))
  }

  /** Per-entity Benford first-digit chi-square, as a ranked suspicion
    * score. Uses the algebraic identity
    * Σ_d (c_d − n·p_d)²/(n·p_d)  =  Σ_{observed d} c_d²/(n·p_d) − n,
    * so digits the entity never produced need no generated zero rows —
    * the whole screen is one groupBy(entity, digit) plus one
    * groupBy(entity). Digit read off the cents string, like [[benford]].
    */
  def benfordByEntity(tx: DataFrame, entity: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dig = substring(cents(col("amount")).cast("string"), 1, 1).cast("long")
    val counts = tx.where(col("amount") > 0)
      .groupBy(entity.as("entity"), dig.as("dig"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("entity"))))
    val p = log(10.0, lit(1.0) + lit(1.0) / col("dig"))
    counts.groupBy(col("entity"))
      .agg(first(col("n")).as("n"),
        (sum(col("c") * col("c") / (col("n") * p)) - first(col("n")))
          .as("chi2"))
  }

  /** Identifier churn: how often a customer's IP CHANGES between
    * consecutive transactions (device/proxy rotation — a takeover and
    * anonymization signal that distinct-count alone misses: 100 txns
    * alternating between 2 IPs is 99 switches but only 2 distinct).
    * Switches compare consecutive non-null identifiers; the rate
    * normalizes by transitions (n−1), NULL for single-event customers.
    */
  def ipChurn(tx: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(unix_micros(col("event_timestamp")), col("transaction_id"))
    tx.select(col("customer_id"), col("ip_address"),
        lag(col("ip_address"), 1).over(w).as("prev"))
      .groupBy(col("customer_id"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("ip_address")).as("distinct_ips"),
        count(when(col("prev").isNotNull && col("prev") =!= col("ip_address"), 1))
          .as("ip_switches"))
      .withColumn("switch_rate",
        when(col("n") > 1, col("ip_switches").cast("double") / (col("n") - 1)))
  }

  /** Round-number bias per merchant: the share of whole-currency and
    * multiple-of-ten amounts. Human-chosen (laundered) amounts skew
    * round; organic ones are uniform in the cents digits.
    */
  def roundBias(tx: DataFrame): DataFrame = {
    val c = cents(col("amount"))
    tx.groupBy(col("merchant_id"))
      .agg(
        count(lit(1)).as("n"),
        count(when(c % 100 === 0, 1)).as("whole_cnt"),
        count(when(c % 1000 === 0, 1)).as("ten_cnt"))
      .select(col("merchant_id"), col("n"), col("whole_cnt"),
        (col("whole_cnt").cast("double") / col("n")).as("whole_ratio"),
        col("ten_cnt"),
        (col("ten_cnt").cast("double") / col("n")).as("ten_ratio"))
  }

  /** First-order Markov sequence anomaly — the closed-form stand-in for
    * the reference's LSTM sequence scorer (reference
    * `models/advanced_models.py:144-172` fits an LSTM over per-customer
    * event sequences): fit a Laplace-smoothed transition model over
    * consecutive merchant symbols (per customer, deterministic
    * (event_time, transaction_id) order) on the whole corpus, then score
    * each customer by the mean negative log-likelihood of their observed
    * transitions. High avg_nll = a customer whose merchant sequence the
    * corpus-level model finds surprising.
    *
    * p(cur|prev) = (c(prev,cur)+1) / (c(prev)+V), V = distinct symbols —
    * all integers, so the probability is one exact division per step.
    *
    * Scale shape: ONE shuffle partitions events by customer for the lag
    * window; the per-customer aggregation reuses that partitioning. The
    * transition matrix is ≤ V² rows and the vocabulary count is one row,
    * so every model join broadcasts — entity-scale data never moves a
    * second time. Customers with fewer than two events have no
    * transitions and drop out (AUC of a sequence model needs a
    * sequence), matching the oracle.
    */
  /** The fitted transition model of [[markovNll]] as driver-side state
    * (≤ V²+V+1 entries — model-size, like a trained LR's weights), for
    * serving on the streaming path: `nll(prev, cur)` is the same
    * Laplace-smoothed negative log-likelihood the batch query computes,
    * extended to unseen transitions (count 0) so an online scorer never
    * rejects a novel pair.
    */
  final case class MarkovModel(trans: Map[(String, String), Long],
      fromTot: Map[String, Long], vocab: Long) {
    require(vocab >= 1, s"MarkovModel: empty vocabulary")
    def nll(prev: String, cur: String): Double = {
      val c = trans.getOrElse((prev, cur), 0L)
      val ct = fromTot.getOrElse(prev, 0L)
      -math.log((c + 1).toDouble / (ct + vocab))
    }
  }

  /** Fit [[MarkovModel]] on a transaction corpus — the collect is the
    * transition matrix only (≤ V² rows, counted BEFORE collecting),
    * never entity-scale data. `maxEntries` caps the driver-side model:
    * a high-cardinality symbol space (e.g. raw merchant ids at 100 TB)
    * must be bucketed into categories first — the batch [[markovNll]]
    * has no such limit because it never collects the matrix.
    */
  def markovFit(tx: DataFrame, maxEntries: Long = 100000L): MarkovModel = {
    val transDf = markovSteps(tx)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c"))
    val n = transDf.count()
    require(n <= maxEntries,
      s"markovFit: $n distinct transitions exceed the $maxEntries driver-model " +
        "cap; bucket the symbol column into categories before fitting")
    val trans = transDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val v = tx.agg(count_distinct(col("merchant_id"))).head().getLong(0)
    MarkovModel(trans,
      trans.groupMapReduce(_._1._1)(_._2)(_ + _), v)
  }

  /** The shared transition view of both Markov entry points: per
    * customer, (prev, cur) symbol pairs in deterministic
    * (event_timestamp, transaction_id) order. ONE definition so the
    * served model ([[markovFit]]) can never diverge from the batch
    * scorer ([[markovNll]]) on ordering or transition semantics.
    */
  private def markovSteps(tx: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("event_timestamp"), col("transaction_id"))
    tx.select(col("customer_id"), col("merchant_id").as("cur"),
        lag(col("merchant_id"), 1).over(w).as("prev"))
      .where(col("prev").isNotNull)
  }

  def markovNll(tx: DataFrame): DataFrame = {
    val steps = markovSteps(tx)
    val trans = steps.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c"))
    val fromTot = trans.groupBy(col("prev")).agg(sum(col("c")).as("ct"))
    val vocab = tx.agg(count_distinct(col("merchant_id")).as("v"))
    val p = (col("c") + lit(1)).cast("double") / (col("ct") + col("v"))
    steps
      .join(broadcast(trans), Seq("prev", "cur"))
      .join(broadcast(fromTot), Seq("prev"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll", -log(p))
      .groupBy(col("customer_id"))
      .agg(count(lit(1)).as("n_steps"), avg(col("nll")).as("avg_nll"))
  }
}
