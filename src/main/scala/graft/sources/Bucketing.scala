package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout materialization for co-located joins (SURVEY §4.2,
  * build-prompt scale list): at 100 TB the transaction history and every
  * per-entity feature/snapshot table should be written bucketed by the
  * entity key so entity-keyed joins and window backfills read both sides
  * pre-partitioned — no Exchange on either side, the shuffle is paid once
  * at write time instead of per query.
  *
  * Spark-native mechanics: `DataFrameWriter.bucketBy(n, key).sortBy(key)`
  * + `saveAsTable` (bucket metadata lives in the catalog; plain
  * `.parquet()` paths cannot carry it). Readers then plan
  * `SortMergeJoin` with no exchange when both sides share the bucket
  * spec, as BucketingSpec asserts. The bucket count is the unit of join
  * parallelism — at 100 TB pick ~2-4x the executor-core count and keep it
  * IDENTICAL across co-bucketed tables (a mismatch reintroduces the
  * shuffle on one side).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table keyed by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on the same key with the
    * same bucket count; the physical plan carries no Exchange.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
