package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A FROZEN corpus-trigram language model: the per-trigram log
  * probabilities of [[graft.scale.TextOps.trigramLmScore]]'s count
  * table, collected once at fit time (the table is character-trigram-
  * vocabulary-sized — bounded by the alphabet cubed, never corpus-
  * sized) into an open-addressing long→double map so a STREAM can score
  * documents as a pure per-row projection: no explode, no per-batch
  * aggregation, no join — the serving shape every other frozen model in
  * the engine uses, at O(text length) per row with O(1) lookups.
  *
  * Scoring contract (bit-compatible with the batch operator on a
  * frozen corpus): trigram = consecutive code-point triple of
  * `lower(regexp_replace(text, "\\s+", " "))`; per INSTANCE log
  * probability `ln(c/total)` exactly as the batch column computes it;
  * score = the mean over instances PRESENT in the table (the batch
  * inner join's semantics — an unseen trigram contributes neither
  * numerator nor denominator); no scored instance → NULL (the batch
  * left join's missing-row semantics). Keys are the same packed
  * 3×21-bit code-point triples as [[TrigramKernel]] — no string
  * allocation per trigram on the hot path.
  */
final class TrigramLm private (keys: Array[Long], vals: Array[Double])
    extends Serializable {

  private val mask = keys.length - 1

  /** Entries stored (for bound checks / introspection). */
  def size: Int = vals.count(!_.isNaN)

  /** Stored entries as (packed code-point key, logp), key-sorted — the
    * [[graft.scoring.ModelStore]] serialization view; logps round-trip
    * IEEE-exact through parquet, so [[TrigramLm.fromLogps]] rebuilds a
    * bitwise-identical scorer.
    */
  def entries: Seq[(Long, Double)] =
    keys.indices.collect { case i if keys(i) != -1L => (keys(i), vals(i)) }
      .sortBy(_._1)

  private def logpOf(key: Long): Double = {
    var h = key ^ (key >>> 33)
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    var idx = (h & mask).toInt
    while (true) {
      val cur = keys(idx)
      if (cur == key) return vals(idx)
      if (cur == -1L) return Double.NaN
      idx = (idx + 1) & mask
    }
    Double.NaN // unreachable
  }

  /** Mean per-instance log probability of the text's known trigrams;
    * NaN marks "no scored trigram" (mapped to NULL by the expression).
    */
  def score(t: UTF8String): Double = {
    val bytes = t.toLowerCase.getBytes
    val n = bytes.length
    val norm = new Array[Byte](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (TrigramKernel.isWs(bytes(i))) {
        norm(m) = ' '; m += 1
        while (i < n && TrigramKernel.isWs(bytes(i))) i += 1
      } else { norm(m) = bytes(i); m += 1; i += 1 }
    }
    if (m < 3) return Double.NaN
    var cpCount = 0
    var c0 = 0L
    var c1 = 0L
    var p = 0
    var hit = 0L
    var sum = 0.0
    while (p < m) {
      val b = norm(p) & 0xff
      var cp = 0
      if (b < 0x80) { cp = b; p += 1 }
      else if ((b & 0xe0) == 0xc0) {
        cp = ((b & 0x1f) << 6) | (norm(p + 1) & 0x3f); p += 2
      } else if ((b & 0xf0) == 0xe0) {
        cp = ((b & 0x0f) << 12) | ((norm(p + 1) & 0x3f) << 6) | (norm(p + 2) & 0x3f)
        p += 3
      } else {
        cp = ((b & 0x07) << 18) | ((norm(p + 1) & 0x3f) << 12) |
          ((norm(p + 2) & 0x3f) << 6) | (norm(p + 3) & 0x3f)
        p += 4
      }
      cpCount += 1
      if (cpCount >= 3) {
        val lp = logpOf((c0 << 42) | (c1 << 21) | cp)
        if (!lp.isNaN) { hit += 1; sum += lp }
      }
      c0 = c1
      c1 = cp
    }
    if (hit == 0) Double.NaN else sum / hit.toDouble
  }
}

object TrigramLm {

  /** Pack one 3-code-point trigram string into the table key; strings
    * that are not exactly 3 code points are rejected (they cannot come
    * from the batch count table).
    */
  private def packKey(tri: String): Long = {
    var p = 0
    var cnt = 0
    var c0 = 0L
    var c1 = 0L
    var c2 = 0L
    while (p < tri.length) {
      val cp = tri.codePointAt(p)
      p += Character.charCount(cp)
      cnt += 1
      c0 = c1; c1 = c2; c2 = cp.toLong
    }
    require(cnt == 3, s"TrigramLm: '$tri' is not a 3-code-point trigram")
    (c0 << 42) | (c1 << 21) | c2
  }

  /** Freeze a (trigram, count) table. `total` is the corpus trigram
    * instance total — per-key logp is `ln(c/total)` in the batch
    * column's exact IEEE operation.
    */
  def fromCounts(entries: Seq[(String, Long)], total: Long): TrigramLm = {
    val tt = total.toDouble
    build(entries.map { case (tri, c) =>
      (packKey(tri), math.log(c.toDouble / tt)) })
  }

  /** Rebuild from stored (packed key, logp) rows — the ModelStore
    * round trip; logps are taken verbatim (no recount), so the rebuilt
    * scorer is bitwise-identical to the exported one.
    */
  def fromLogps(entries: Seq[(Long, Double)]): TrigramLm = build(entries)

  private def build(entries: Seq[(Long, Double)]): TrigramLm = {
    require(entries.nonEmpty, "TrigramLm: empty table")
    var cap = 8
    while (cap < entries.size * 2) cap <<= 1
    val keys = Array.fill(cap)(-1L)
    val vals = Array.fill(cap)(Double.NaN)
    val mask = cap - 1
    entries.foreach { case (key, logp) =>
      require(key >= 0, s"TrigramLm: negative packed key $key")
      var h = key ^ (key >>> 33)
      h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33
      var idx = (h & mask).toInt
      while (keys(idx) != -1L && keys(idx) != key) idx = (idx + 1) & mask
      keys(idx) = key
      vals(idx) = logp
    }
    new TrigramLm(keys, vals)
  }
}

/** `trigram_lm_score(text)` under a frozen [[TrigramLm]] — DoubleType,
  * NULL when the text has no trigram present in the model. The model
  * rides the plan as a codegen reference object (one broadcast-sized
  * map per executor, zero per-row allocation).
  */
case class TrigramLmScore(child: Expression, lm: TrigramLm)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_lm_score expects a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = lm.score(input.asInstanceOf[UTF8String])
    if (s.isNaN) null else java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramLm", lm, classOf[TrigramLm].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.score($c);
      if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = -1.0; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): TrigramLmScore =
    copy(child = c)
  override def prettyName: String = "trigram_lm_score"
}
