package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives — the scale-safe replacement
  * for `Window.orderBy(...)` with no partition key, which funnels the
  * whole input through ONE task (Spark logs `WindowExec: No Partition
  * Defined` and moves all rows to a single partition: the q91/q155-class
  * scale killer called out in round 3).
  *
  * Shape: two-pass partition-offset ranking over ORDER-ALIGNED buckets.
  *
  *  1. Bucket boundaries = exact `percentile` of the first order key
  *     over a deterministic hash-sample of the input (one tiny broadcast
  *     row). NOT `repartitionByRange`: Spark's range partitioner samples
  *     with an RDD-id-derived seed, so two physical executions of the
  *     same exchange can pick DIFFERENT boundaries — and this plan
  *     consumes the bucketed child twice (once for local ranks, once
  *     for bucket counts). With boundaries that are a pure deterministic
  *     function of the data, every re-execution agrees bit-for-bit, no
  *     matter how AQE schedules or reuses stages.
  *  2. Each row's bucket = #boundaries before its key in order
  *     direction — a 1-row broadcast join plus an O(#buckets) array
  *     scan per row. Buckets are disjoint, exhaustive, and aligned with
  *     the global order (ties on the key share a bucket).
  *  3. A PARTITIONED window computes the local rank / running sum
  *     inside each bucket; per-bucket summaries (≤ #shuffle-partitions
  *     rows at any data scale) are prefix-summed with a triangular
  *     self-join (no window ⇒ no single-partition WindowExec at all)
  *     and broadcast back as offsets.
  *
  * Rank and count arithmetic is integer-exact, so the two-pass result
  * is bit-identical to the single-sort form; cumulative sums of
  * integral/decimal columns are likewise exact. Floating-point cumsums
  * would re-associate across bucket boundaries, so `withCumSums`
  * REJECTS float/double sum columns — sum exact integers (e.g. cents)
  * or decimals and divide at the end.
  *
  * Ties: the order should be TOTAL (append a unique id tie-break) for
  * deterministic ranks — same contract as the single-sort form.
  *
  * `sampleMod`: 1-in-`sampleMod` rows feed the exact-percentile
  * boundary estimate; its buffer holds the distinct sampled keys, so
  * scale it with the data (default 64 is fine to ~10⁹ rows; at 10¹²
  * use ~64k). Boundary QUALITY only affects balance, never
  * correctness — an empty sample degrades to one bucket.
  */
object GlobalOrder {
  private val BKT = "__go_bkt"

  /** First order key as a double (bucketing only — the local sort uses
    * the full-precision order), whether it ascends, and whether nulls
    * sort first under the effective null ordering (Spark defaults:
    * asc → NULLS FIRST, desc → NULLS LAST; explicit `_nulls_first` /
    * `_nulls_last` variants respected).
    */
  private def firstKey(order: Seq[Column]): (Column, Boolean, Boolean) = {
    val (key, asc, nullsFirst) =
      org.apache.spark.sql.graftbridge.ColumnBridge.sortKey(order.head)
    (key.cast("double"), asc, nullsFirst)
  }

  /** Input tagged with its order-aligned bucket id (bucket 0 = first in
    * the global order). Deterministic: identical across re-executions.
    * Null keys route to the first bucket under NULLS FIRST and to the
    * last (index = #boundaries) under NULLS LAST, so bucketing stays
    * aligned with the global order for every asc/desc × nulls variant;
    * the partitioned local sort then places nulls correctly WITHIN the
    * bucket.
    */
  private def bucketed(df: DataFrame, order: Seq[Column], sampleMod: Int): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val (key, asc, nullsFirst) = firstKey(order)
    val probs = (1 until p).map(_.toDouble / p)
    val bnd = df
      .where(pmod(xxhash64(key), lit(sampleMod)) === 0)
      .agg(percentile(key, typedlit(probs)).as("__bnd"))
    val nullBkt = if (nullsFirst) lit(0) else size(col("__bnd"))
    df.crossJoin(broadcast(bnd))
      .withColumn(BKT, when(col("__bnd").isNull, lit(0))
        .when(key.isNull, nullBkt)
        .otherwise(size(filter(col("__bnd"), b => if (asc) b < key else b > key))))
      .drop("__bnd")
  }

  /** Exclusive prefix (`__off_<c>`) of each summary column over the
    * per-bucket summary, in bucket order — a triangular self-join over
    * ≤ #shuffle-partitions rows, deliberately window-free.
    */
  private def withOffsets(summary: DataFrame, cols: Seq[String]): DataFrame = {
    val other = summary.select(
      col(BKT).as("__b2") +: cols.map(c => col(c).as(s"__x_$c")): _*)
    summary.join(other, col("__b2") < col(BKT), "left")
      .groupBy(col(BKT) +: cols.map(col): _*)
      .agg(
        coalesce(sum(col(s"__x_${cols.head}")), lit(0L)).as(s"__off_${cols.head}"),
        cols.tail.map(c => coalesce(sum(col(s"__x_$c")), lit(0L)).as(s"__off_$c")): _*)
  }

  /** `df` + `rn` = 1-based global row number under the total order
    * `order`, and (optionally) `total` = the global row count — the
    * distributed twin of `row_number().over(Window.orderBy(order))` +
    * `count().over(Window.partitionBy())`.
    */
  def withRowNumber(df: DataFrame, order: Seq[Column], rn: String,
      total: Option[String] = None, sampleMod: Int = 64): DataFrame = {
    val b = bucketed(df, order, sampleMod)
    val local = b.withColumn("__lrn",
      row_number().over(Window.partitionBy(col(BKT)).orderBy(order: _*)))
    val counts = b.groupBy(col(BKT)).agg(count(lit(1)).as("__c"))
    val side0 = withOffsets(counts, Seq("__c"))
    val side = total.foldLeft(side0) { (d, t) =>
      d.crossJoin(broadcast(counts.agg(sum(col("__c")).as(t))))
    }
    local.join(broadcast(side.drop("__c")), BKT)
      .withColumn(rn, col("__off___c") + col("__lrn"))
      .drop(BKT, "__lrn", "__off___c")
  }

  /** `df` + inclusive running sums (`out` named) of each `expr` under
    * the total order `order` — the distributed twin of
    * `sum(e).over(Window.orderBy(order).rowsBetween(unboundedPreceding,
    * currentRow))`. Integral sums are exact; see the class note on
    * floating-point association before using with doubles.
    */
  def withCumSums(df: DataFrame, order: Seq[Column],
      sums: Seq[(Column, String)], sampleMod: Int = 64): DataFrame = {
    // Guard: floating-point running sums would re-associate across bucket
    // boundaries (local + offset ≠ left-to-right global fold), silently
    // breaking the bit-identical-to-single-sort contract. Integral and
    // decimal addition is exact, so those are safe.
    df.select(sums.map { case (e, out) => e.as(out) }: _*).schema.foreach { f =>
      require(f.dataType != org.apache.spark.sql.types.DoubleType &&
              f.dataType != org.apache.spark.sql.types.FloatType,
        s"withCumSums(${f.name}): float/double running sums re-associate " +
        "across buckets and lose bit-identity with the single-sort form; " +
        "sum exact integers/decimals (e.g. cents) and divide at the end")
    }
    val b = bucketed(df, order, sampleMod)
    val wLoc = Window.partitionBy(col(BKT)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(b) { case (d, (e, out)) =>
      d.withColumn(out, sum(e).over(wLoc))
    }
    // Per-bucket totals AND non-null counts: a bucket whose prefix of `e`
    // is entirely null has a null local running sum, but the single-sort
    // global sum would still be non-null whenever any EARLIER bucket held
    // a non-null value — so the merge must fall back to the offset alone
    // in that case (and stay null only when the whole global prefix is).
    val aggExprs = sums.flatMap { case (e, out) =>
      Seq(sum(e).as(s"__t_$out"), count(e).as(s"__n_$out")) }
    val totals = b.groupBy(col(BKT)).agg(aggExprs.head, aggExprs.tail: _*)
    val side = withOffsets(totals,
      sums.flatMap(s => Seq(s"__t_${s._2}", s"__n_${s._2}")))
    val offCols = sums.flatMap(s =>
      Seq(col(s"__off___t_${s._2}"), col(s"__off___n_${s._2}")))
    val withOff = local.join(
      broadcast(side.select(col(BKT) +: offCols: _*)), BKT)
    sums.foldLeft(withOff) { case (d, (_, out)) =>
      val off = col(s"__off___t_$out")
      val priorN = col(s"__off___n_$out")
      d.withColumn(out,
          when(col(out).isNotNull, col(out) + off)
            .otherwise(when(priorN > 0, off)))
        .drop(s"__off___t_$out", s"__off___n_$out")
    }.drop(BKT)
  }

  /** PER-PARTITION running sums under a shared bucket layout: the
    * [[withCumSums]] machinery with every window / total / offset scoped
    * by `partNames` — ONE boundary probe, ONE bucket shuffle, ONE
    * offset join for ALL partitions, instead of one full pipeline per
    * partition value (the fused tree fits run one pipeline per LEVEL
    * where the per-feature form ran |features|).
    *
    * Bucket boundaries come from the COMBINED first-order-key
    * distribution, so each (partition, bucket) cell is that partition's
    * contiguous key range — cumsums stay exact and bit-identical to the
    * per-partition [[withCumSums]] (integral sums only, same guard).
    * Balance note: a partition whose keys concentrate in few buckets
    * (e.g. a 24-value categorical next to a continuous column) yields
    * small skewed cells — bounded by that partition's distinct-value
    * count, which is exactly the table the per-partition form would
    * single-pipeline anyway.
    */
  def withCumSumsBy(df: DataFrame, partNames: Seq[String],
      order: Seq[Column], sums: Seq[(Column, String)],
      sampleMod: Int = 64): DataFrame = {
    require(partNames.nonEmpty, "withCumSumsBy: need partition columns")
    df.select(sums.map { case (e, out) => e.as(out) }: _*).schema.foreach { f =>
      require(f.dataType != org.apache.spark.sql.types.DoubleType &&
              f.dataType != org.apache.spark.sql.types.FloatType,
        s"withCumSumsBy(${f.name}): float/double running sums re-associate " +
        "across buckets; sum exact integers/decimals and divide at the end")
    }
    val part = partNames.map(col)
    val b = bucketed(df, order, sampleMod)
    val wLoc = Window.partitionBy(part :+ col(BKT): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(b) { case (d, (e, out)) =>
      d.withColumn(out, sum(e).over(wLoc))
    }
    val aggExprs = sums.flatMap { case (e, out) =>
      Seq(sum(e).as(s"__t_$out"), count(e).as(s"__n_$out")) }
    val totals = b.groupBy(part :+ col(BKT): _*).agg(aggExprs.head, aggExprs.tail: _*)
    val sumCols = sums.flatMap(s => Seq(s"__t_${s._2}", s"__n_${s._2}"))
    val other = totals.select(
      partNames.map(n => col(n).as(s"__p2_$n")) ++
        (col(BKT).as("__b2") +: sumCols.map(c => col(c).as(s"__x_$c"))): _*)
    // null-safe (<=>) key equality throughout: a NULL partition-key
    // value forms its own cumsum group (matching window PARTITION BY
    // semantics) instead of being silently dropped by the offset join
    // and the final equi-join
    val joinCond = partNames.map(n => col(s"__p2_$n") <=> col(n))
      .reduce(_ && _) && col("__b2") < col(BKT)
    val side = totals.join(other, joinCond, "left")
      .groupBy(part ++ (col(BKT) +: sumCols.map(col)): _*)
      .agg(
        coalesce(sum(col(s"__x_${sumCols.head}")), lit(0L)).as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c => coalesce(sum(col(s"__x_$c")), lit(0L)).as(s"__off_$c")): _*)
      .select(partNames.map(n => col(n).as(s"__s2_$n")) ++
        (col(BKT).as("__sb") +: sumCols.map(c => col(s"__off_$c"))): _*)
    val offCond = partNames.map(n => col(s"__s2_$n") <=> col(n))
      .reduce(_ && _) && col("__sb") === col(BKT)
    val withOff = local.join(broadcast(side), offCond)
      .drop(partNames.map(n => s"__s2_$n"): _*).drop("__sb")
    sums.foldLeft(withOff) { case (d, (_, out)) =>
      val off = col(s"__off___t_$out")
      val priorN = col(s"__off___n_$out")
      d.withColumn(out,
          when(col(out).isNotNull, col(out) + off)
            .otherwise(when(priorN > 0, off)))
        .drop(s"__off___t_$out", s"__off___n_$out")
    }.drop(BKT)
  }

  /** `df` + `rn` = 1-based row number WITHIN each `partNames` group under
    * the total order `order` — the distributed twin of
    * `row_number().over(Window.partitionBy(partNames).orderBy(order))`,
    * but scale-safe when the partition key is low-cardinality (a
    * per-source or per-class rank over a corpus would otherwise funnel
    * each group through ONE task; Spark never subdivides a window
    * partition). A row number is the inclusive running count of 1s under
    * a total order, so this is [[withCumSumsBy]] with `lit(1L)`:
    * the order-aligned range bucketing subdivides every group across
    * tasks and the per-(group, bucket) offsets restore the global rank
    * exactly. The result is bit-identical to the single-task window
    * (ties: same total-order contract).
    */
  def withRowNumberBy(df: DataFrame, partNames: Seq[String],
      order: Seq[Column], rn: String, sampleMod: Int = 64): DataFrame =
    withCumSumsBy(df, partNames, order, Seq((lit(1L), rn)), sampleMod)

  /** Exact SQL `NTILE(k)` bucket from a global row number and total count:
    * the first `n % k` buckets get `n div k + 1` rows, the rest `n div k`.
    */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    // all in long `div` arithmetic: Column `/` is double division, whose
    // 53-bit mantissa rounds above 2^53 rows — off-by-one buckets at the
    // extreme of the design scale
    import org.apache.spark.sql.graftbridge.ColumnBridge.intDiv
    val bs = intDiv(n, lit(k.toLong)) // n div k
    val rem = (n % k).cast("long")
    val bigSpan = rem * (bs + 1) // rows covered by the n%k-sized buckets
    when(rn <= bigSpan, intDiv(rn - 1, bs + 1) + 1)
      .otherwise(rem + intDiv(rn - bigSpan - 1, greatest(bs, lit(1L))) + 1)
      .cast("int")
  }

  /** `percent_rank()` from a total-order global row number: (rn-1)/(n-1),
    * 0 for a single row (ranks equal row numbers when the order is total).
    */
  def percentRankOf(rn: Column, n: Column): Column =
    when(n === 1, lit(0.0)).otherwise((rn - 1).cast("double") / (n - 1))

  /** `cume_dist()` under a total order: rn/n. */
  def cumeDistOf(rn: Column, n: Column): Column = rn.cast("double") / n
}
