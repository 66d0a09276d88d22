package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Column generators for the per-entity trailing-window feature families
  * (SURVEY §2.3 A1–A14). All are plain `Column` expressions over the one
  * canonical window spec — whole-stage-codegen friendly, no UDFs.
  *
  * Empty-window semantics: the reference defaults every feature to 0.0
  * rather than null/NaN (reference `aml_stream_processor.py:158-163,186`);
  * since the current row is always in frame the only null sources are
  * n<=1 stddev and explicitly-conditional aggregates — both coalesced.
  */
object CoreFeatures {
  import Trailing._

  /** count of events in the trailing window (A1). */
  def txnCount(w: WindowSpec, secs: Long): Column =
    count(lit(1)).over(lastSeconds(w, secs))

  /** sum(amount) (A2). */
  def amountSum(amount: Column, w: WindowSpec, secs: Long): Column =
    sum(amount).over(lastSeconds(w, secs))

  def amountAvg(amount: Column, w: WindowSpec, secs: Long): Column =
    avg(amount).over(lastSeconds(w, secs))

  def amountMax(amount: Column, w: WindowSpec, secs: Long): Column =
    max(amount).over(lastSeconds(w, secs))

  def amountMin(amount: Column, w: WindowSpec, secs: Long): Column =
    min(amount).over(lastSeconds(w, secs))

  /** Population stddev — the reference divides by n, not n-1
    * (`aml_stream_processor.py:180-186`); 0.0 when the window has one row.
    */
  def amountStdPop(amount: Column, w: WindowSpec, secs: Long): Column =
    coalesce(stddev_pop(amount).over(lastSeconds(w, secs)), lit(0.0))

  /** Exact distinct count over the trailing frame (A7/A8).
    * `countDistinct` is unsupported in window frames; the engine's native
    * [[graft.functions.ExactDistinct]] aggregate IS legal there and emits
    * only the cardinality — unlike the `size(collect_set(...))` fallback,
    * which materializes a deduped array per OUTPUT ROW before taking its
    * size. The scale path swaps in `approx_count_distinct` via
    * [[approxDistinctOver]].
    */
  def distinctOver(c: Column, w: WindowSpec, secs: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.ExactDistinct(ColumnBridge.expression(c))
      .toAggregateExpression()).over(lastSeconds(w, secs))
  }

  /** HLL-sketched distinct for the 100 TB path (not oracle-exact). */
  def approxDistinctOver(c: Column, w: WindowSpec, secs: Long): Column =
    approx_count_distinct(c).over(lastSeconds(w, secs))

  /** velocity = count / minutes-in-window, canonicalized per SURVEY A11 to
    * the job-1 definition count/60 for 1h (`aml_stream_processor.py:176-177`),
    * generalized to count / window-minutes.
    */
  def velocity(w: WindowSpec, secs: Long): Column =
    txnCount(w, secs).cast("double") / lit(secs / 60.0)

  /** Night predicate: hour < 6 OR hour > 22 (`aml_stream_processor.py:189-193`). */
  def isNight(ts: Column): Column = hour(ts) < 6 || hour(ts) > 22

  /** Weekend: Python weekday()>=5 == Sat/Sun == Spark dayofweek in {7,1}
    * (`generate_sample_data.py:72`; SURVEY §4.3 trap 2).
    */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** Business hours: hour between 9 and 17 (notebook cell-4). */
  def isBusinessHours(ts: Column): Column = hour(ts).between(9, 17)

  /** Conditional count over a trailing window (A12/A13). */
  def condCount(pred: Column, w: WindowSpec, secs: Long): Column =
    sum(when(pred, 1L).otherwise(0L)).over(lastSeconds(w, secs))

  /** Conditional ratio = conditional count / total count (A14). */
  def condRatio(pred: Column, w: WindowSpec, secs: Long): Column =
    avg(when(pred, 1.0).otherwise(0.0)).over(lastSeconds(w, secs))

  /** All features of the reference's customer+behavioral views, computed
    * per event in one pass over one window spec (one shuffle, one sort).
    * Input df needs columns: customer_id, merchant_id, amount, ip_address,
    * event_timestamp.
    */
  def customerFeatures(df: DataFrame): DataFrame = {
    val w = spec(col("customer_id"), col("event_timestamp"))
    val amount = col("amount")
    df.select(
      col("transaction_id"), col("customer_id"), col("merchant_id"), amount,
      col("event_timestamp"),
      amountSum(amount, w, 60).as("txn_amount_sum_60s"),
      amountSum(amount, w, 300).as("txn_amount_sum_5m"),
      amountSum(amount, w, 3600).as("txn_amount_sum_1h"),
      txnCount(w, 60).as("txn_count_60s"),
      txnCount(w, 300).as("txn_count_5m"),
      txnCount(w, 600).as("txn_count_10m"),
      txnCount(w, 3600).as("txn_count_1h"),
      distinctOver(col("ip_address"), w, 3600).as("unique_ips_1h"),
      distinctOver(col("merchant_id"), w, 3600).as("unique_merchants_1h"),
      velocity(w, 3600).as("velocity_score_1h"),
      amountStdPop(amount, w, 3600).as("amount_deviation_score_1h"),
      condCount(isNight(col("event_timestamp")), w, 86400).as("night_txn_count_24h"),
      condCount(isWeekend(col("event_timestamp")), w, 604800).as("weekend_txn_count_7d"),
      amountAvg(amount, w, 3600).as("avg_txn_amount_1h"),
      amountMax(amount, w, 3600).as("max_txn_amount_1h"))
  }

  /** Merchant-entity view (A9/A10) — same operators, merchant key. */
  def merchantFeatures(df: DataFrame): DataFrame = {
    val w = spec(col("merchant_id"), col("event_timestamp"))
    df.select(
      col("transaction_id"), col("merchant_id"), col("event_timestamp"),
      txnCount(w, 3600).as("merchant_txn_count_1h"),
      amountSum(col("amount"), w, 3600).as("merchant_txn_amount_sum_1h"),
      amountAvg(col("amount"), w, 3600).as("merchant_avg_txn_amount_1h"),
      distinctOver(col("customer_id"), w, 3600).as("merchant_unique_customers_1h"))
  }
}
