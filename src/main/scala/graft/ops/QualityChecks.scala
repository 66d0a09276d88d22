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
    * `pk`. One row, same report schema — and ONE lazy pass over the fact
    * table (left join against the distinct key side + a single
    * aggregation), composable with [[report]] via union like any other
    * DataFrame instead of running eager driver-side counts.
    */
  def refIntegrity(name: String, fact: DataFrame, fk: Column,
      dim: DataFrame, pk: Column): DataFrame =
    fact.select(fk.as("k")).where(col("k").isNotNull)
      .join(dim.select(pk.as("k")).distinct().withColumn("__hit", lit(1)),
        Seq("k"), "left")
      .agg(count(lit(1)).as("total"), count(col("__hit")).as("ok"))
      .select(lit(name).as("constraint"),
        when(col("total") === 0, 1.0)
          .otherwise(col("ok").cast("double") / col("total")).as("metric"),
        (col("ok") === col("total")).as("passed"))
}
