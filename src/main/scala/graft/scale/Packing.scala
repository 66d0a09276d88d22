package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pretraining sequence packing: concatenate the corpus in a fixed
  * deterministic order and chunk it into fixed-length training sequences
  * ("concat-and-chunk", the standard LLM pretraining layout — every doc
  * boundary inside a chunk becomes an EOS token downstream). The engine's
  * job is the EXACT global token offset of every document — a corpus-wide
  * running sum — and the per-bin occupancy report a data engineer reads
  * before launching a run.
  *
  * Scale shape: the offsets come from [[graft.ops.GlobalOrder.withCumSums]]
  * (integral token counts — exact, and no single-partition window at any
  * corpus size); the doc→bin fan-out is `explode(sequence(first,last))`,
  * bounded per doc by ⌈tokens/binSize⌉+1, so a 100 TB corpus packs with
  * two shuffles (offset bucketing + the bin groupBy).
  */
object Packing {

  /** Per-document placement: global start/end token offsets under
    * `order`, first/last bin of size `binSize`, and whether the doc
    * crosses a bin boundary.
    */
  def placements(docs: DataFrame, order: Seq[Column], tokens: Column,
      binSize: Long): DataFrame = {
    require(binSize >= 1, s"placements: binSize must be >= 1, got $binSize")
    import org.apache.spark.sql.graftbridge.ColumnBridge.intDiv
    val cum = graft.ops.GlobalOrder.withCumSums(
      docs.withColumn("__tok", tokens.cast("long")), order,
      Seq(col("__tok") -> "end_off"))
    cum
      .withColumn("start_off", col("end_off") - col("__tok"))
      .withColumn("first_bin", intDiv(col("start_off"), lit(binSize)))
      // empty docs (0 tokens) sit at a point offset: first_bin == last_bin
      .withColumn("last_bin",
        greatest(intDiv(col("end_off") - 1, lit(binSize)), col("first_bin")))
      .withColumn("spans_boundary", col("last_bin") > col("first_bin"))
      .drop("__tok")
  }

  /** Per-bin occupancy: how many docs contribute tokens to each bin, how
    * many tokens the bin holds (== binSize for every bin but the last),
    * how many docs it fully contains, and how many continue into the next
    * bin. `docs` must carry tokens > 0 rows only if empty docs should not
    * count as contributors (an empty doc contributes no tokens but would
    * still land on a bin edge); callers filter first.
    */
  def binReport(docs: DataFrame, order: Seq[Column], tokens: Column,
      binSize: Long): DataFrame = {
    val p = placements(docs, order, tokens, binSize)
    p.select(col("start_off"), col("end_off"),
        explode(sequence(col("first_bin"), col("last_bin"))).as("bin"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("end_off"), (col("bin") + 1) * binSize) -
          greatest(col("start_off"), col("bin") * binSize)).as("bin_tokens"),
        sum(when(col("start_off") >= col("bin") * binSize &&
          col("end_off") <= (col("bin") + 1) * binSize, 1L).otherwise(0L))
          .as("n_contained"),
        sum(when(col("end_off") > (col("bin") + 1) * binSize, 1L)
          .otherwise(0L)).as("n_continuing"))
  }
}
