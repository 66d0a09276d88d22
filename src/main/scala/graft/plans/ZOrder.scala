package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout: interleaving the bits of
  * two sort dimensions gives a single sort key under which ranges of
  * EITHER dimension cluster into few contiguous runs — so parquet
  * row-group min/max stats prune scans filtered on either column, where
  * a lexicographic sort only prunes its leading column.
  *
  * The z-value is a pure bitwise Column expression (codegen'd, no UDF);
  * the layout step is `repartitionByRange` + in-partition sort — exactly
  * the write-side shuffle a 100 TB table pays once to make every
  * subsequent selective scan cheap.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns (x gets the even bit positions, y the odd). 2·bits <= 63.
    */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && 2 * bits <= 63, s"bits must be in [1,31]: $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { j =>
      shiftleft(shiftright(xm, j).bitwiseAND(lit(1L)), 2 * j)
        .bitwiseOR(shiftleft(shiftright(ym, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` by the z-value of (x, y): range-partition on it, sort
    * within partitions. Each output partition then covers a compact
    * z-interval — a 2-D tile, tight in BOTH dimensions.
    */
  def layout(df: DataFrame, x: Column, y: Column, bits: Int = 21,
      partitions: Int = 32): DataFrame = {
    val z = zValue(x, y, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** DuckDB twin of [[zValue]] for oracle SQL (same bit algebra). */
  def zValueSql(x: String, y: String, bits: Int = 21): String = {
    val mask = (1L << bits) - 1
    // every shift is parenthesized: DuckDB gives | and << one precedence
    // level (left-assoc), so a bare `a << j | b << k` nests the shifts
    val terms = (0 until bits).flatMap { j =>
      Seq(s"(((($x & $mask) >> $j) & 1) << ${2 * j})",
        s"(((($y & $mask) >> $j) & 1) << ${2 * j + 1})")
    }
    terms.mkString("(", " | ", ")")
  }
}
