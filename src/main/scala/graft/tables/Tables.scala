package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver TESTDATA star schema (see TESTDATA.md) and the
  * canonical "transaction" view the feature engine operates on.
  *
  * The reference engine's event record (reference
  * `offline_data/generate_sample_data.py:65-75`) maps onto the driver's
  * `events` table as: `user_id` -> customer key, `event_type` -> merchant
  * key, `value` -> amount, `props.$.k` -> ip-like attribute, `ts` ->
  * event_timestamp.
  */
object Tables {
  /** Constant session-wide parquet read pins (the UTC-pin convention —
    * these values NEVER vary, so there is no call-order dependence to
    * inherit; Spark 4.1 exposes no per-read option for either key):
    *   - inferTimestampNTZ=false: timestamps written without
    *     isAdjustedToUTC (DuckDB-style naive micros) must read as
    *     session-TZ TIMESTAMP, not TIMESTAMP_NTZ — under the engine's
    *     fixed UTC session the LTZ read is the identity on the stored
    *     micros and matches DuckDB's naive view, while an NTZ column
    *     would poison `unix_micros`/interval arithmetic throughout.
    *   - nanosAsLong=true: TIMESTAMP(NANOS) parquet (one of the driver's
    *     events.ts layouts) reads as a long instead of erroring; see
    *     [[events]] for the ns->us dispatch.
    * The mainline session builders (Bench/Verify/Soak/Timing) set both at
    * construction; this guard covers sessions built elsewhere (specs) and
    * writes only when the value actually differs.
    */
  def pinParquetConfs(spark: SparkSession): Unit =
    Seq("spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true").foreach {
      case (k, v) => if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    pinParquetConfs(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.ts` arrives in one of two driver layouts: parquet
    * TIMESTAMP(NANOS) — which Spark 4 only reads as a long, so truncate
    * ns->us with integer DIV (a double division would lose precision above
    * 2^53 ns; DuckDB performs the same truncation, keeping oracles exact) —
    * or a native microsecond TIMESTAMP (isAdjustedToUTC=false -> Spark
    * reads TIMESTAMP_NTZ; under the engine's fixed UTC session the cast to
    * TIMESTAMP is the identity on the stored micros, matching DuckDB's
    * naive read). Dispatch on the scanned schema so both layouts produce
    * the identical event_timestamp column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts DIV 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(s"events.ts: unexpected type $other")
    }
    raw.withColumn("ts", ts)
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Canonical transaction view: the AML engine's event schema expressed
    * over the driver's `events` table. Column pruning still reaches the
    * parquet scan because these are pure projections.
    */
  def transactions(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id").as("transaction_id"),
      col("ts").as("event_timestamp"),
      col("user_id").as("customer_id"),
      col("event_type").as("merchant_id"),
      col("value").as("amount"),
      get_json_object(col("props"), "$.k").as("ip_address"))
}
