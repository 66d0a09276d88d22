package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream ingestion/emission codecs (SURVEY S1/S9/S10).
  *
  * The reference consumes JSON transactions from Kafka topic
  * `transactions` keyed by customer id
  * (`flink_job/aml_stream_processor.py:339-360`,
  * `producer/transaction_producer.py:142-161`) and emits JSON feature
  * vectors downstream. Here both codecs are schema-checked Catalyst
  * expressions (`from_json`/`to_json`) rather than per-record
  * try/except parsing; malformed records surface in `_corrupt_record`
  * instead of being silently swallowed.
  */
object EventStream {

  /** Wire schema of the reference's transaction JSON
    * (`transaction_producer.py:124-140`).
    */
  val txnSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("customer_id", StringType),
    StructField("merchant_id", StringType),
    StructField("amount", DoubleType),
    StructField("ip_address", StringType),
    StructField("event_timestamp", StringType), // ISO-8601, Z suffix
    StructField("_corrupt_record", StringType)))

  /** Kafka source -> decoded event columns. Requires the Kafka connector
    * on the classpath; in offline tests [[decode]] is driven by a static
    * or file-stream frame instead.
    */
  def fromKafka(spark: SparkSession, servers: String, topic: String = "transactions"): DataFrame =
    decode(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .select(col("value").cast("string").as("json")))

  /** JSON decode: ISO ts (`Z` handled by Spark's parser) -> TimestampType;
    * corrupt records kept, not dropped.
    */
  def decode(raw: DataFrame): DataFrame =
    raw.select(from_json(col("json"), txnSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")).as("t"))
      .select(
        col("t.transaction_id"),
        col("t.customer_id"),
        col("t.merchant_id"),
        col("t.amount"),
        col("t.ip_address"),
        to_timestamp(col("t.event_timestamp")).as("event_timestamp"),
        col("t._corrupt_record"))

  /** Feature emission: JSON payload keyed by entity for a Kafka sink
    * (the reference's downstream emit, `aml_stream_processor.py:121-125`).
    */
  def encodeFeatures(features: DataFrame, keyCol: String): DataFrame =
    features.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(features.columns.map(col): _*)).as("value"))
}
