package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and their DuckDB oracles live in per-family [[QueryPack]]s
  * under graft.queries; this object is just the aggregated registry.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] =
    Seq(CoreQueries, ProfileQueries, RelationalQueries, ScaleQueries,
      PipelineQueries, ServingQueries, OlapQueries, DomainQueries, ModelQueries)

  /** Flagship: the full window-features -> risk-score pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.defs("q08_risk_score")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** DuckDB-equivalent SQL per query key (driver correctness gate). */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
