package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.scale.Dedup

/** Streaming NEAR-dup gate against a FROZEN corpus index — the
  * incremental-ingest complement of [[DedupProcessor]] (which dedups the
  * stream against itself, exactly): every incoming document is checked
  * for simhash proximity to yesterday's corpus, the shape a daily
  * crawl-delta pipeline runs (the batch twin is `Dedup.incrementalDedup`,
  * q154).
  *
  * The index is the 32-bit one-pass simhash kernel fingerprint, banded
  * into 4×8-bit keys and GROUPED per (band, key) into candidate lists —
  * so the stream side is four stream-static equi-joins (each 1:1 after
  * the grouping) plus a per-row fold over the merged candidates: no
  * stream-side state, no aggregation, append-safe, composable with the
  * curation counter processor. Pigeonhole: hamming ≤ 3 over 4 bands
  * leaves at least one band intact, so the banding misses nothing at
  * the default threshold.
  *
  * Scale notes: candidate-list size per (band, key) grows with corpus
  * over 2⁸ buckets per band — at corpora where that row outgrows a task,
  * widen the fingerprint and the band key together (the kernel
  * generalizes; 64-bit/16-bit banding gives 65k buckets). The static
  * side is re-read per micro-batch; persist the index DataFrame.
  */
object NearDupGate {
  val Bands = 4
  val BandBits = 8

  private def bandKey(fp: Column, b: Int): Column =
    shiftright(fp, b * BandBits).bitwiseAND(lit((1 << BandBits) - 1))

  /** Band-grouped candidate index over the frozen corpus: one row per
    * (band, key) carrying the (simhash, doc_id) structs that hash there.
    * Token-less docs carry no fingerprint and are absent (as in the
    * batch simhash operator).
    */
  def buildIndex(corpus: DataFrame, id: Column, text: Column): DataFrame = {
    val fps = Dedup.simhash(corpus, id, text)
    fps.select(col("simhash"), col("doc_id"),
        explode(array((0 until Bands).map(b =>
          struct(lit(b).as("band"),
            bandKey(col("simhash"), b).as("key"))): _*)).as("e"))
      .select(col("e.band").as("band"), col("e.key").as("key"),
        col("simhash"), col("doc_id"))
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("simhash").as("fp"),
        col("doc_id").as("id"))).as("cands"))
  }

  /** Append the gate columns (simhash, n_cands, min_hamming, match_id,
    * is_neardup) to ANY frame carrying a `text` column — the composition
    * point the curation counters use; every input column passes through.
    */
  def withFlags(df: DataFrame, index: DataFrame, maxHamming: Int): DataFrame = {
    val produced = Seq("simhash", "n_cands", "min_hamming", "match_id",
      "is_neardup") ++
      (0 until Bands).flatMap(b => Seq(s"__k$b", s"__c$b")) ++ Seq("__n", "__b")
    val clash = df.columns.toSeq.intersect(produced)
    require(clash.isEmpty,
      s"NearDupGate.withFlags: input columns collide with the gate's " +
        s"output/internal names: ${clash.mkString(", ")}")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val fp = ColumnBridge.column(graft.functions.SimHash32(
      ColumnBridge.expression(col("text"))))
    var cur = df.withColumn("simhash", fp)
    (0 until Bands).foreach { b =>
      val side = index.where(col("band") === b)
        .select(col("key").as(s"__k$b"), col("cands").as(s"__c$b"))
      cur = cur.join(side,
        bandKey(col("simhash"), b) === col(s"__k$b"), "left")
    }
    // a pair matching in several bands must count ONCE: keep each
    // candidate only at its FIRST matching band (∀ b' < b: band b'
    // differs) — the same set array_distinct would produce, but as a
    // per-element bit test instead of O(n²) struct comparisons (the
    // distinct form measured 1470 s at 10× band density; this one 3 s)
    val empty = array().cast("array<struct<fp:long,id:bigint>>")
    val merged = concat((0 until Bands).map { b =>
      val base = coalesce(col(s"__c$b"), empty)
      if (b == 0) base
      else filter(base, c => (0 until b).map(bp =>
        bandKey(c.getField("fp"), bp) =!= bandKey(col("simhash"), bp))
        .reduce(_ && _))
    }: _*)
    val ham = (c: Column) =>
      bit_count(c.getField("fp").bitwiseXOR(col("simhash")))
    // fold to (min hamming, lowest id at that hamming); 33 > any 32-bit
    // distance, so the seed never survives a nonempty candidate list
    val best = aggregate(merged,
      struct(lit(33).as("h"), lit(Long.MaxValue).as("i")),
      (acc, c) => when(
        ham(c) < acc.getField("h") ||
          (ham(c) === acc.getField("h") && c.getField("id") < acc.getField("i")),
        struct(ham(c).as("h"), c.getField("id").as("i"))).otherwise(acc))
    cur.withColumn("__n", coalesce(size(merged), lit(0)))
      .withColumn("__b", best)
      .drop((0 until Bands).flatMap(b => Seq(s"__k$b", s"__c$b")): _*)
      .withColumn("n_cands", col("__n"))
      .withColumn("min_hamming", when(col("__b.h") < 33, col("__b.h")))
      .withColumn("match_id", when(col("__b.h") < 33, col("__b.i")))
      .withColumn("is_neardup",
        coalesce(col("__b.h") <= maxHamming, lit(false)))
      .drop("__n", "__b")
  }

  /** Flag a document stream against the index: per doc, the number of
    * banded candidates, the minimum hamming distance among them (NULL
    * when no candidate), the lowest-id best match, and the gate decision
    * `is_neardup = min_hamming ≤ maxHamming`. Works identically on a
    * batch frame (batch==stream parity is the StreamingSpec gate).
    */
  def flagged(docs: Dataset[QualityDoc], index: DataFrame,
              maxHamming: Int = 3): DataFrame =
    withFlags(docs.toDF().select(col("doc_id"), col("text")), index, maxHamming)
      .select(col("doc_id"), col("simhash"), col("n_cands"),
        col("min_hamming"), col("match_id"), col("is_neardup"))
}
