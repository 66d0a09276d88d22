package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.round

package object queries {
  type Q = (SparkSession, String) => DataFrame

  /** One operator family: named Spark queries + their DuckDB oracle SQL.
    * Oracle SQL references the driver's bare table names (events, lineitem,
    * documents, ...) over the same sf directory.
    */
  trait QueryPack {
    def defs: Map[String, Q]
    def oracle: Map[String, String]
  }

  /** Round derived doubles on BOTH sides (Spark + oracle SQL) so that
    * order-of-summation float noise cannot flip the driver's hash compare.
    * 6 dp leaves ~100x margin over worst-case double accumulation error at
    * sf0.1 magnitudes.
    */
  def r6(c: Column): Column = round(c, 6)
}
