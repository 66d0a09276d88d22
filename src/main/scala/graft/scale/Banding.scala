package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared SimHash banding machinery — ONE home for the layout
  * config, the grouped candidate index, and the per-row flag fold, so
  * every near-dup surface (the streaming gate, the batch audits, the
  * contamination screens) runs the same corpus-scale shape instead of
  * re-hardcoding a banded self-join (the VERDICT-r14 finding: a
  * per-(band, key) cell SELF-join emits ~cell²/2 candidate pairs —
  * quadratic per cell — while this grouped-index fold scans each cell
  * list once per probe row, inside the row, with no pair
  * materialization in any exchange).
  *
  * Layouts: `Config()` is the 32-bit 4×8 default (256 buckets/band —
  * q260's frozen contract); [[wide64]] is the corpus-scale 4×16 layout
  * over the 64-bit kernel (65 536 buckets/band, 256× the spread at the
  * same `bands` = 4 pigeonhole). Pigeonhole: hamming ≤ `bands`−1 leaves
  * at least one band intact, so banding misses nothing at any
  * `maxHamming < bands`.
  */
object Banding {
  val Bands = 4
  val BandBits = 8

  /** Banding layout: `bands`·`bandBits` must tile the fingerprint width
    * exactly (every bit in exactly one band — the pigeonhole argument
    * needs the partition). `wide` switches to the 64-bit kernel
    * ([[graft.functions.SimHash64]]).
    */
  final case class Config(bands: Int = Bands, bandBits: Int = BandBits,
      wide: Boolean = false) {
    val bits: Int = if (wide) 64 else 32
    require(bands >= 2 && bandBits >= 1,
      s"Banding.Config: need >=2 bands of >=1 bit, got $bands x $bandBits")
    require(bands * bandBits == bits,
      s"Banding.Config: $bands bands x $bandBits bits must tile the " +
        s"$bits-bit fingerprint exactly")

    /** One above any possible hamming distance — the fold seed. */
    private[graft] def hamSentinel: Int = bits + 1
  }

  /** The corpus-scale layout: 64-bit fingerprints, 4×16-bit banding,
    * 65 536 buckets per band.
    */
  val wide64: Config = Config(bands = 4, bandBits = 16, wide = true)

  private[graft] def bandKey(fp: Column, b: Int, cfg: Config): Column =
    shiftright(fp, b * cfg.bandBits)
      .bitwiseAND(lit((1L << cfg.bandBits) - 1L))

  private[graft] def fpOf(text: Column, cfg: Config): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    if (cfg.wide)
      ColumnBridge.column(graft.functions.SimHash64(
        ColumnBridge.expression(text)))
    else
      ColumnBridge.column(graft.functions.SimHash32(
        ColumnBridge.expression(text)))
  }

  /** Band-grouped candidate index over a frozen corpus: one row per
    * (band, key) carrying the (simhash, doc_id) structs that hash
    * there. Token-less docs carry no fingerprint and are absent (as in
    * the batch simhash operator).
    */
  def buildIndex(corpus: DataFrame, id: Column, text: Column,
      cfg: Config = Config(), maxCellSize: Option[Int] = None): DataFrame = {
    val fps = if (cfg.wide) Dedup.simhash64(corpus, id, text)
      else Dedup.simhash(corpus, id, text)
    val cells = fps.select(col("simhash"), col("doc_id"),
        explode(array((0 until cfg.bands).map(b =>
          struct(lit(b).as("band"),
            bandKey(col("simhash"), b, cfg).as("key"))): _*)).as("e"))
      .select(col("e.band").as("band"), col("e.key").as("key"),
        col("simhash"), col("doc_id"))
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("simhash").as("fp"),
        col("doc_id").as("id"))).as("cands"))
    // the VERDICT-r15 mega-cell guard: a boilerplate-dominated corpus
    // (identical templates repeated millions of times) hashes every copy
    // to the SAME fingerprint, hence the same cell in EVERY band — one
    // unbounded list row OOMs its task and every probe's fold goes
    // O(corpus). When `maxCellSize` is set, the guard runs as an EAGER
    // count-only aggregation at build time (the SemanticGate.fit
    // pattern): partial counts are scalar-sized, so the check completes
    // and raises BEFORE any collect_list buffer materializes — an
    // in-plan size() check after the agg would OOM in the aggregation
    // itself on the very corpus it guards. Opt-in, because the extra
    // pass re-reads the corpus unless the caller persists; the default
    // stays lazy. The structural fix is [[selfAuditCollapsed]]:
    // exact-dup pre-collapse bounds cells by DISTINCT near-dup mass
    // before banding.
    maxCellSize.foreach { bound =>
      require(bound > 0, s"Banding.buildIndex: maxCellSize $bound must be positive")
      val row = fps.select(col("simhash"),
          explode(array((0 until cfg.bands).map(b =>
            struct(lit(b).as("band"),
              bandKey(col("simhash"), b, cfg).as("key"))): _*)).as("e"))
        .groupBy(col("e.band"), col("e.key"))
        .agg(count(lit(1)).as("__n"))
        .agg(max(col("__n")).as("m")).head()
      val worst = if (row.isNullAt(0)) 0L else row.getLong(0)
      require(worst <= bound,
        s"Banding.buildIndex: a (band, key) cell holds $worst candidates " +
          s"(> $bound) — exact-dup pre-collapse the corpus " +
          "(selfAuditCollapsed) or widen the layout (wide64)")
    }
    cells
  }

  /** Append the gate columns (simhash, n_cands, min_hamming, match_id,
    * is_neardup) to ANY frame carrying a `text` column — the
    * composition point the curation counters and the batch audits
    * share; every input column passes through. `cfg` must match the
    * one the index was built with (the band keys are its function).
    *
    * `lowerIdThan` (a column name in `df`) restricts candidates to
    * index ids strictly BELOW that column's value — the self-dedup
    * verdict ("am I a copy of an earlier doc?") when a corpus probes
    * its own index; `None` keeps every candidate (delta-vs-frozen,
    * eval-vs-train).
    *
    * `text` names the probe column (default the conventional `text` —
    * callers whose column is named otherwise pass theirs instead of
    * renaming the frame).
    */
  def withFlags(df: DataFrame, index: DataFrame, maxHamming: Int,
      cfg: Config = Config(), lowerIdThan: Option[String] = None,
      text: Column = col("text")): DataFrame = {
    require(maxHamming >= 0 && maxHamming < cfg.bands,
      s"Banding.withFlags: maxHamming $maxHamming needs < ${cfg.bands} " +
        "bands intact for the pigeonhole guarantee — raise bands or lower the threshold")
    val produced = Seq("simhash", "n_cands", "min_hamming", "match_id",
      "is_neardup") ++
      (0 until cfg.bands).flatMap(b => Seq(s"__k$b", s"__c$b")) ++ Seq("__n", "__b")
    val clash = df.columns.toSeq.intersect(produced)
    require(clash.isEmpty,
      s"Banding.withFlags: input columns collide with the gate's " +
        s"output/internal names: ${clash.mkString(", ")}")
    var cur = df.withColumn("simhash", fpOf(text, cfg))
    (0 until cfg.bands).foreach { b =>
      val side = index.where(col("band") === b)
        .select(col("key").as(s"__k$b"), col("cands").as(s"__c$b"))
      cur = cur.join(side,
        bandKey(col("simhash"), b, cfg) === col(s"__k$b"), "left")
    }
    // a pair matching in several bands must count ONCE: keep each
    // candidate only at its FIRST matching band (∀ b' < b: band b'
    // differs) — the same set array_distinct would produce, but as a
    // per-element bit test instead of O(n²) struct comparisons (the
    // distinct form measured 1470 s at 10× band density; this one 3 s)
    val empty = array().cast("array<struct<fp:long,id:bigint>>")
    val mergedAll = concat((0 until cfg.bands).map { b =>
      val base = coalesce(col(s"__c$b"), empty)
      if (b == 0) base
      else filter(base, c => (0 until b).map(bp =>
        bandKey(c.getField("fp"), bp, cfg) =!= bandKey(col("simhash"), bp, cfg))
        .reduce(_ && _))
    }: _*)
    val merged = lowerIdThan match {
      case Some(n) => filter(mergedAll, c => c.getField("id") < col(n))
      case None => mergedAll
    }
    // hoist the hamming metric: ONE bit_count per candidate into a
    // (h, id) struct, then fold over the pairs — the raw fold evaluated
    // the xor/bit_count 2–3× per candidate (condition + both struct
    // branches), the VERDICT-r13 constant-factor note
    val pairs = transform(merged, c => struct(
      bit_count(c.getField("fp").bitwiseXOR(col("simhash"))).as("h"),
      c.getField("id").as("i")))
    // fold to (min hamming, lowest id at that hamming); the sentinel
    // exceeds any possible distance, so it never survives a nonempty list
    val best = aggregate(pairs,
      struct(lit(cfg.hamSentinel).as("h"), lit(Long.MaxValue).as("i")),
      (acc, c) => when(
        c.getField("h") < acc.getField("h") ||
          (c.getField("h") === acc.getField("h") &&
            c.getField("i") < acc.getField("i")),
        c).otherwise(acc))
    cur.withColumn("__n", coalesce(size(merged), lit(0)))
      .withColumn("__b", best)
      .drop((0 until cfg.bands).flatMap(b => Seq(s"__k$b", s"__c$b")): _*)
      .withColumn("n_cands", col("__n"))
      .withColumn("min_hamming",
        when(col("__b.h") < cfg.hamSentinel, col("__b.h")))
      .withColumn("match_id",
        when(col("__b.h") < cfg.hamSentinel, col("__b.i")))
      .withColumn("is_neardup",
        coalesce(col("__b.h") <= maxHamming, lit(false)))
      .drop("__n", "__b")
  }

  /** The corpus SELF-audit ("is each doc a near-copy of an earlier
    * one?") with EXACT-DUP PRE-COLLAPSE — the structural fix for the
    * mega-cell failure mode: only exact-dup CANONICALS (min doc id per
    * content hash, q28's rule) are banded, so every (band, key) cell is
    * bounded by the corpus's DISTINCT near-dup mass no matter how
    * boilerplate-heavy the raw corpus is; exact-dup members then
    * re-attach to their canonical's verdict without touching the index.
    *
    * Emits one row per input doc: doc_id, canonical_id, min_hamming,
    * match_id, is_neardup — PROVABLY EQUAL on the verdict triple
    * (min_hamming, match_id, is_neardup) to the uncollapsed
    * `withFlags(corpus, buildIndex(corpus), lowerIdThan = id)` audit,
    * because exact dups share their canonical's fingerprint bit-for-bit:
    * (a) for a canonical c, every full-audit candidate d < c has
    * hamming(c, d) = hamming(c, canonical(d)) with canonical(d) ≤ d < c,
    * so min-hamming and the lowest-id-at-min (always achieved by a
    * canonical) are unchanged when only canonicals are banded; (b) a
    * member d sits at hamming 0 from its canonical c < d, so its verdict
    * is (0, lowest doc id sharing d's fingerprint, true) — and that
    * lowest id is itself a canonical (any doc's canonical shares its
    * fingerprint at a lower-or-equal id). Token-less and SQL-NULL texts
    * carry no fingerprint: their whole exact-group audits
    * (NULL, NULL, false), exactly as the uncollapsed audit flags them
    * (NULL texts group under a non-colliding sentinel hash so the
    * one-row-per-doc contract survives the equi-joins). BandingSpec asserts
    * the triple equality against the uncollapsed audit on a
    * 50%-boilerplate corpus, both layouts.
    *
    * `maxCellSize` passes through to [[buildIndex]] — after the
    * collapse it bounds DISTINCT near-dup mass per cell, a guard a
    * boilerplate corpus can actually satisfy.
    */
  def selfAuditCollapsed(docs: DataFrame, id: Column, text: Column,
      maxHamming: Int, cfg: Config = Config(),
      maxCellSize: Option[Int] = None): DataFrame = {
    // NULL-safe content hash: md5(NULL) is NULL and equi-joins drop
    // NULL keys — without the sentinel a NULL-text doc would vanish
    // from the output entirely, breaking the one-row-per-doc contract.
    // The 4-char sentinel cannot collide with a 32-hex md5; NULL-text
    // docs form one exact group whose audit is (NULL, NULL, false) on
    // both the collapsed and raw paths (their canonical carries no
    // fingerprint), matching q28's exactGroups, whose window
    // partitioning also groups NULLs together.
    val keyed = docs.select(id.as("doc_id"), text.as("__t"),
      coalesce(md5(text), lit("null")).as("__h"))
    val canonIds = keyed.groupBy(col("__h"))
      .agg(min(col("doc_id")).as("canonical_id"))
    // ONE canonicalization join feeds both the canonical frame and the
    // member re-attach (a second keyed ⋈ canonIds would re-hash the
    // corpus); callers at corpus scale should checkpoint `docs` — this
    // API adds no persistence of its own, like every sibling
    val withCanon = keyed.join(canonIds, Seq("__h"))
    val canonDocs = withCanon.where(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("__t"))
    val index = buildIndex(canonDocs, col("doc_id"), col("__t"), cfg,
      maxCellSize)
    val cFlags = withFlags(canonDocs, index, maxHamming, cfg,
        lowerIdThan = Some("doc_id"), text = col("__t"))
      .select(col("doc_id").as("canonical_id"), col("simhash"),
        col("min_hamming").as("__cmh"), col("match_id").as("__cmi"),
        col("is_neardup").as("__cnd"))
    // hamming-0 attach point for members: the LOWEST canonical id per
    // fingerprint (= the lowest doc id sharing the fingerprint, since
    // every doc's canonical shares its fp at a lower-or-equal id)
    val byFp = cFlags.where(col("simhash").isNotNull)
      .groupBy(col("simhash")).agg(min(col("canonical_id")).as("__c0"))
    val isCanon = col("doc_id") === col("canonical_id")
    withCanon.select(col("doc_id"), col("canonical_id"))
      .join(cFlags.join(byFp, Seq("simhash"), "left"), Seq("canonical_id"))
      .select(col("doc_id"), col("canonical_id"),
        when(isCanon, col("__cmh"))
          .when(col("simhash").isNotNull, lit(0)).as("min_hamming"),
        when(isCanon, col("__cmi"))
          .when(col("simhash").isNotNull, col("__c0")).as("match_id"),
        when(isCanon, col("__cnd"))
          .otherwise(col("simhash").isNotNull).as("is_neardup"))
  }
}
