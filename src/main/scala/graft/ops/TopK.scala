package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public face of the bounded native top-k
  * ([[graft.functions.TopKAgg]]): the k best rows per group under
  * (metric asc|desc, idCol asc), emitted as
  * (part…, idCol, metric, payload…, rank:long) with rank 1..k —
  * bit-identical to `row_number().over(Window.partitionBy(part…)
  * .orderBy(metric, id))` filtered to k, but with PARTIAL buffers
  * bounded by k: the group's corpus-scale candidate list collapses
  * map-side and the exchange carries |groups|·k rows at any data
  * scale. Use this whenever k is bounded (top-k lists, posting
  * truncation, probe selection); the two-pass
  * [[GlobalOrder.withRowNumberBy]] remains the tool when the FULL rank
  * is consumed (fraction cuts, NTILE phases, running sums).
  *
  * `asc = false` encodes the key by numeric negation — bit-consistent
  * for doubles/longs under the SQL total order; `idCol` must be unique
  * within a group so payload fields never enter the comparison.
  */
object TopK {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def byGroup(df: DataFrame, partNames: Seq[String], metric: String,
      asc: Boolean, idCol: String, k: Int,
      payload: Seq[String] = Nil): DataFrame = {
    val key: Column = if (asc) col(metric) else -col(metric)
    val packed = struct(key.as("__o") +: col(idCol).as("__i") +:
      col(metric).as("__m") +: payload.map(col): _*)
    val agg = column(graft.functions.TopKAgg(expression(packed), k)
      .toAggregateExpression())
    df.groupBy(partNames.map(col): _*).agg(agg.as("__tk"))
      .select(partNames.map(col) :+
        posexplode(col("__tk")).as(Seq("__p", "__e")): _*)
      .select(partNames.map(col) ++ Seq(
        col("__e").getField("__i").as(idCol),
        col("__e").getField("__m").as(metric)) ++
        payload.map(p => col("__e").getField(p).as(p)) :+
        (col("__p").cast("long") + 1L).as("rank"): _*)
  }
}
