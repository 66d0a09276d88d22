package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transaction generator (SURVEY S2/S3; reference
  * `producer/transaction_producer.py` + `offline_data/generate_sample_data.py`):
  * seeded column expressions over `spark.range` — no driver-side loops, so
  * generating 10^12 rows is just a bigger range.
  *
  * Reproduces the reference's shape: lognormal(3, 1.5) amounts rounded to
  * 2 dp, skewed hot keys (30% of traffic on the first `hotCustomers`
  * customers, `transaction_producer.py:82-85`), a 5% suspicious tail with
  * uniform(5000, 50000) amounts, and dotted-quad IPs.
  */
object Generator {

  def transactions(spark: SparkSession, n: Long, customers: Int = 1000,
                   merchants: Int = 500, hotCustomers: Int = 100,
                   startTs: String = "2024-01-01 00:00:00", spanDays: Int = 30,
                   seed: Long = 42L): DataFrame = {
    val base = spark.range(n)
    base.select(
        col("id").as("transaction_id"),
        when(rand(seed) < 0.3, (rand(seed + 1) * hotCustomers).cast("long"))
          .otherwise((rand(seed + 2) * customers).cast("long")).as("customer_id"),
        concat(lit("MERCH_"), lpad((rand(seed + 3) * merchants).cast("long").cast("string"), 5, "0"))
          .as("merchant_id"),
        when(rand(seed + 4) < 0.05, round(rand(seed + 5) * 45000 + 5000, 2))
          .otherwise(round(exp(randn(seed + 6) * 1.5 + 3.0), 2)).as("amount"),
        concat_ws(".",
          (rand(seed + 7) * 223 + 1).cast("int"),
          (rand(seed + 8) * 255).cast("int"),
          (rand(seed + 9) * 255).cast("int"),
          (rand(seed + 10) * 254 + 1).cast("int")).as("ip_address"),
        timestamp_micros(unix_micros(lit(startTs).cast("timestamp")) +
          (rand(seed + 11) * spanDays * 86400000000.0).cast("long")).as("event_timestamp"),
        (rand(seed + 4) < 0.05).as("is_suspicious"))
  }

  /** Burst fixture (reference `transaction_producer.py:218-243`): `count`
    * txns for one customer inside `seconds`, amounts 1000–5000.
    */
  def burst(spark: SparkSession, customerId: Long, count: Int = 50,
            seconds: Int = 30, startTs: String = "2024-01-10 12:00:00",
            seed: Long = 42L): DataFrame =
    spark.range(count).select(
      col("id").as("transaction_id"),
      lit(customerId).as("customer_id"),
      lit("MERCH_00001").as("merchant_id"),
      round(rand(seed) * 4000 + 1000, 2).as("amount"),
      lit("10.0.0.1").as("ip_address"),
      timestamp_micros(unix_micros(lit(startTs).cast("timestamp")) +
        (col("id") * (seconds * 1000000L / count))).as("event_timestamp"),
      col("id").cast("int").as("burst_sequence"))
}
