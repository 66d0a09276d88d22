package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher repetition statistics: `gopher_stats(text)` returns
  * the EIGHT exact integers the Rae et al. table-A1 word-n-gram battery
  * (and its unigram/dup-word siblings) reduces to — `[n_tokens,
  * word_chars, top2_chars, top3_chars, top4_chars, dup5_tokens,
  * n_distinct_tokens, top1_chars]` — computed per row, so the battery
  * becomes a narrow projection instead of a tagged explode + (doc,
  * gram) aggregation + positional window (three doc-keyed exchanges).
  * All quantities are integer counts over the lowercased
  * whitespace-tokenized text, so the downstream rounded fractions are
  * bit-identical to the composable operator's by construction
  * ([[graft.scale.TextOps.gopherRepetitionComposable]] is the
  * property-test twin, the [[TrigramStats]] precedent). Zero masses
  * stand in for the composable form's missing-gram NULLs — identical
  * after the shared `coalesce(mass/denom, 0.0)` column math.
  *
  * Semantics pinned to the composable form: tokens are maximal runs of
  * non-ASCII-whitespace code points of `lower(text)` (Java regex `\S+`
  * is ASCII-only); a gram's character mass is its token code points
  * (separators excluded) times its occurrence count; `dup5_tokens` is
  * the exact interval union of the token spans of duplicated positional
  * 5-grams. Gram identity is token-SEQUENCE identity (tokens cannot
  * contain the join separator, so this equals the joined-string
  * equality the explode form groups on).
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    GopherKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherKernel.compute($c)")

  override protected def withNewChildInternal(c: Expression): GopherStats =
    copy(child = c)
  override def prettyName: String = "gopher_stats"
}

object GopherKernel {

  /** `[n_tokens, word_chars, top2, top3, top4, dup5_tokens,
    * n_distinct, top1]`. */
  def compute(t: UTF8String): ArrayData = {
    val bytes = t.toLowerCase.getBytes
    val nB = bytes.length
    // tokenize: byte ranges + code-point lengths (continuation bytes
    // are >= 0x80, so ASCII-ws boundaries are byte-exact)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var cps = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < nB) {
      if (TrigramKernel.isWs(bytes(i))) i += 1
      else {
        val s = i
        var cp = 0
        while (i < nB && !TrigramKernel.isWs(bytes(i))) {
          if ((bytes(i) & 0xc0) != 0x80) cp += 1
          i += 1
        }
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
          cps = java.util.Arrays.copyOf(cps, nTok * 2)
        }
        starts(nTok) = s; ends(nTok) = i; cps(nTok) = cp
        nTok += 1
      }
    }
    var wordChars = 0L
    i = 0
    while (i < nTok) { wordChars += cps(i); i += 1 }
    val out = new Array[Long](8)
    out(0) = nTok.toLong
    out(1) = wordChars
    if (nTok >= 1) {
      // intern tokens to ids: gram identity = token-id sequence
      val ids = new Array[Int](nTok)
      val idCps = new Array[Int](nTok)
      val intern = new java.util.HashMap[String, Integer](nTok * 2)
      i = 0
      while (i < nTok) {
        val s = new String(bytes, starts(i), ends(i) - starts(i), "UTF-8")
        val cur = intern.get(s)
        if (cur == null) {
          ids(i) = intern.size; idCps(ids(i)) = cps(i)
          intern.put(s, ids(i))
        } else ids(i) = cur.intValue()
        i += 1
      }
      // unigram stats: distinct count + heaviest token char mass
      out(6) = intern.size.toLong
      val idCount = new Array[Long](intern.size)
      i = 0
      while (i < nTok) { idCount(ids(i)) += 1L; i += 1 }
      var top1 = 0L
      i = 0
      while (i < intern.size) {
        val mass = idCount(i) * idCps(i)
        if (mass > top1) top1 = mass
        i += 1
      }
      out(7) = top1
      // n = 2..4: per distinct gram, count + token char mass; top = max
      var n = 2
      while (n <= 4 && nTok >= n) {
        val m = new java.util.HashMap[String, Array[Long]]()
        var p = 0
        while (p <= nTok - n) {
          val sb = new java.lang.StringBuilder(n * 7)
          var ch = 0L
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(',')
            sb.append(ids(p + j)); ch += cps(p + j); j += 1
          }
          val key = sb.toString
          val slot = m.get(key)
          if (slot == null) m.put(key, Array(1L, ch))
          else slot(0) += 1L
          p += 1
        }
        var top = 0L
        val it = m.values().iterator()
        while (it.hasNext) {
          val v = it.next(); val mass = v(0) * v(1)
          if (mass > top) top = mass
        }
        out(n) = top
        n += 1
      }
      // duplicated positional 5-grams -> exact token interval union
      if (nTok >= 5) {
        val counts = new java.util.HashMap[String, Array[Long]]()
        val keys = new Array[String](nTok - 4)
        var p = 0
        while (p <= nTok - 5) {
          val sb = new java.lang.StringBuilder(35)
          var j = 0
          while (j < 5) {
            if (j > 0) sb.append(','); sb.append(ids(p + j)); j += 1
          }
          keys(p) = sb.toString
          val slot = counts.get(keys(p))
          if (slot == null) counts.put(keys(p), Array(1L)) else slot(0) += 1L
          p += 1
        }
        var cov = 0L
        var maxEnd = 0L
        p = 0
        while (p <= nTok - 5) {
          if (counts.get(keys(p))(0) > 1L) {
            val end = p + 5L
            val from = math.max(p.toLong, maxEnd)
            if (end > from) cov += end - from
            if (end > maxEnd) maxEnd = end
          }
          p += 1
        }
        out(5) = cov
      }
    }
    new GenericArrayData(out)
  }
}
