package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint report: evaluate a set of
  * column-level constraints over a table in ONE aggregation pass and
  * return a row per constraint (`constraint, metric, passed`).
  *
  * All single-table constraints fold into one `agg(...)` — one scan, one
  * reduce to a single row — regardless of how many constraints are
  * declared; the unpivot to report rows happens on that single row.
  * Referential checks are separate anti-join counts (each a broadcast
  * join when the key side is entity-sized). This is the training-data
  * gate a 100 TB ingest runs before a corpus version is blessed.
  */
object QualityChecks {

  sealed trait Check { def name: String }
  /** metric = fraction of non-null rows. */
  case class NotNull(name: String, col: Column, minRate: Double = 1.0) extends Check
  /** metric = distinct/total (1.0 == unique). */
  case class Unique(name: String, col: Column) extends Check
  /** metric = fraction of rows inside [lo, hi). */
  case class InRange(name: String, col: Column, lo: Double, hi: Double,
      minRate: Double = 1.0) extends Check

  /** One aggregation pass over `df`; a (constraint, metric, passed) row
    * per check.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map {
      case NotNull(n, c, _) =>
        (count(c).cast("double") / count(lit(1))).as(n)
      case Unique(n, c) =>
        (countDistinct(c).cast("double") / count(lit(1))).as(n)
      case InRange(n, c, lo, hi, _) =>
        (count(when(c >= lo && c < hi, 1)).cast("double") / count(lit(1))).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = checks.map { ck =>
      val pass = ck match {
        case NotNull(n, _, r) => col(n) >= r
        case Unique(n, _) => col(n) === 1.0
        case InRange(n, _, _, _, r) => col(n) >= r
      }
      struct(lit(ck.name).as("constraint"), col(ck.name).as("metric"),
        pass.as("passed"))
    }
    row.select(explode(array(out: _*)).as("r")).select(col("r.*"))
  }

  /** Referential-integrity check: the fraction of `fk` values present in
    * `pk` (left anti-join count). One row, same report schema.
    */
  def refIntegrity(name: String, fact: DataFrame, fk: Column,
      dim: DataFrame, pk: Column): DataFrame = {
    val total = fact.where(fk.isNotNull).count()
    val orphans = fact.select(fk.as("k")).where(col("k").isNotNull)
      .join(dim.select(pk.as("k")).distinct(), Seq("k"), "left_anti").count()
    val rate = if (total == 0) 1.0 else (total - orphans).toDouble / total
    fact.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(name, rate, orphans == 0L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("constraint",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("metric",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("passed",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }
}
