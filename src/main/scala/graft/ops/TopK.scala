package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

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
  * KEY CONTRACT (loud, not silent): `asc = false` encodes the order
  * key by numeric negation, which is exact for every FINITE NON-NULL
  * metric (the rounded doubles and ids every current caller feeds).
  * The two inputs where negation diverges from `desc` raise at eval
  * time instead of mis-ranking: NaN (−NaN == NaN, so a NaN metric
  * would sort LAST under the negated ascending order instead of FIRST
  * as under `desc` — reachable, e.g. cosine of a zero-norm embedding)
  * and a NULL metric (the interpreted struct ordering is NULLS FIRST
  * ascending, vs `desc`'s NULLS LAST). Long.MinValue negation would
  * overflow and also raises. −0.0 needs no guard: it negates to +0.0,
  * and Spark's SQL total order compares the two zeros equal, so ranks
  * are unaffected.
  */
object TopK {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** The descending-order key: negation with loud guards for the
    * values negation cannot order like `desc` (NaN / NULL / the
    * unnegatable Long.MinValue). Guards compile to one codegen branch
    * per row; the raise carries the metric name.
    */
  private def descKey(df: DataFrame, metric: String): Column = {
    val m = col(metric)
    def fail(why: String): Column = raise_error(lit(
      s"TopK.byGroup: $why '$metric' cannot ride the negated descending " +
        "key (it would rank differently from row_number().over(desc)) — " +
        "filter or normalize the metric first"))
    val guarded = df.schema(metric).dataType match {
      case DoubleType | FloatType =>
        when(m.isNull, fail("NULL metric"))
          .when(isnan(m), fail("NaN metric"))
          .otherwise(m)
      case LongType =>
        when(m.isNull, fail("NULL metric"))
          .when(m === lit(Long.MinValue), fail("Long.MinValue metric"))
          .otherwise(m)
      // sub-long integrals widen to LONG before negation, which makes
      // the negation exact for their ENTIRE range (−Int.MinValue fits in
      // a long) — the ADVICE-r15 fix: the old shared `=== Long.MinValue`
      // guard could never match an Int/Short/Byte value (the comparison
      // widens the VALUE, not the range), so Int.MinValue silently
      // wrapped under the un-widened negation and ranked first
      case IntegerType | ShortType | ByteType =>
        when(m.isNull, fail("NULL metric")).otherwise(m.cast(LongType))
      case _ =>
        when(m.isNull, fail("NULL metric")).otherwise(m)
    }
    -guarded
  }

  def byGroup(df: DataFrame, partNames: Seq[String], metric: String,
      asc: Boolean, idCol: String, k: Int,
      payload: Seq[String] = Nil): DataFrame = {
    val key: Column = if (asc) col(metric) else descKey(df, metric)
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
