package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass char-trigram statistics: `trigram_stats(text)` returns
  * `(total_trigrams << 32) | distinct_trigrams` over the code-point
  * trigrams of the lowercased, whitespace-collapsed text — the exact
  * counts of the composable
  * `transform(sequence(...), i -> substring(t, i, 3))` + `array_distinct`
  * form, without materializing a per-row array of trigram strings
  * (interpreted lambda + one String allocation per trigram). A trigram
  * is its code-point triple, so three 21-bit code points pack into one
  * non-negative long and distinctness runs in an open-addressing long
  * set — no string hashing at all. Packing both counts into one long
  * keeps the expression a scalar (struct outputs fall out of
  * whole-stage codegen).
  */
case class TrigramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_stats expects a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TrigramKernel.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramKernel.compute($c)")

  override protected def withNewChildInternal(c: Expression): TrigramStats =
    copy(child = c)
  override def prettyName: String = "trigram_stats"
}

object TrigramKernel {

  // Java regex \s set (ASCII-only); UTF-8 continuation bytes are >= 0x80,
  // so byte-level matching equals the regexp_replace('\s+', ' ') contract.
  // (shared with the frozen-LM scorer, which normalizes identically)
  private[functions] def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Packed (total << 32) | distinct; 0L for texts shorter than 3 chars
    * after normalization.
    */
  def compute(t: UTF8String): Long = {
    val bytes = t.toLowerCase.getBytes
    val n = bytes.length
    // collapse every \s+ run to one ' ' (regexp_replace semantics: no trim)
    val norm = new Array[Byte](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        norm(m) = ' '; m += 1
        while (i < n && isWs(bytes(i))) i += 1
      } else { norm(m) = bytes(i); m += 1; i += 1 }
    }
    if (m < 3) return 0L // < 3 bytes implies < 3 code points
    // open-addressing long set; distinct keys <= code points <= m bytes,
    // capacity 2m keeps the load factor under 0.5
    var cap = 8
    while (cap < m * 2) cap <<= 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L) // keys are always >= 0
    val mask = cap - 1
    var distinct = 0
    var cpCount = 0
    var c0 = 0L
    var c1 = 0L
    var p = 0
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
        val key = (c0 << 42) | (c1 << 21) | cp // 3 x 21 bits, bit 63 clear
        var h = key ^ (key >>> 33)
        h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33
        var idx = (h & mask).toInt
        var done = false
        while (!done) {
          val cur = table(idx)
          if (cur == key) done = true
          else if (cur == -1L) { table(idx) = key; distinct += 1; done = true }
          else idx = (idx + 1) & mask
        }
      }
      c0 = c1
      c1 = cp
    }
    if (cpCount < 3) 0L
    else ((cpCount - 2).toLong << 32) | distinct.toLong
  }
}
