package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch file-format surface beyond parquet (SURVEY §2.1: the reference
  * reads/writes JSON events and appends JSONL metrics; CSV is the usual
  * interchange for labels/feedback).
  *
  * Schemas are always EXPLICIT: on a 100 TB lake, schema inference is a
  * full extra scan, and silently drifting inferred types (int vs long,
  * ts formats) corrupt downstream joins. Malformed records are kept in a
  * `_corrupt_record` column (PERMISSIVE) so ingestion can quarantine
  * rather than crash or silently drop.
  */
object Formats {

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Metrics-sink shape (`scripts/monitoring.py:596-597`): append JSONL. */
  def appendJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("append").json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
