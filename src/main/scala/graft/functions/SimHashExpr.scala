package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 32-bit SimHash: `simhash32(text)` tokenizes on whitespace,
  * hashes each token (first 4 md5 bytes, unsigned — the `Dedup.md5Int`
  * contract), accumulates the ±1 bit votes, and folds the sign vector
  * into the fingerprint. NULL when the text has no tokens (matching the
  * explode→groupBy form, where a token-less doc produces no group).
  *
  * This replaces an explode of every token (10M+ rows at sf0.1) plus a
  * 32-aggregate shuffle with ONE JVM call per document — the whole
  * operator becomes a narrow projection, which is the difference between
  * a token-count-shaped shuffle and none at all on a 100 TB corpus.
  * Tokenization is Java-regex `\S+` semantics (whitespace =
  * space/tab/LF/VT/FF/CR) over the lowercased text, identical to the
  * composable form it replaces and to the DuckDB oracle.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val r = SimHashKernel.compute(input.asInstanceOf[UTF8String])
    if (r == SimHashKernel.Empty) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: two simhash32 calls can share one codegen stage — a
      // fixed local name would be a Janino redefinition error
      val sh = ctx.freshName("simhash")
      s"""
      long $sh = graft.functions.SimHashKernel.compute($c);
      if ($sh == java.lang.Long.MIN_VALUE) { // SimHashKernel.Empty
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $sh;
      }"""
    })

  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
  override def prettyName: String = "simhash32"
}

/** One-pass 64-bit SimHash — the widened-fingerprint twin of
  * [[SimHash32]] for corpus-scale banding (16-bit band keys need 64
  * fingerprint bits). Token hash = the first 8 md5 bytes big-endian, so
  * the TOP 32 fingerprint bits vote on exactly the bytes the 32-bit
  * kernel uses: `simhash64(t) >>> 32 == simhash32(t)` by construction
  * (the spec gate). No sentinel: a 64-bit fingerprint can take any long
  * value, so emptiness is returned out-of-band via a one-slot buffer.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val buf = SimHashKernel.evalBuf.get()
    if (SimHashKernel.compute64(input.asInstanceOf[UTF8String], buf))
      java.lang.Long.valueOf(buf(0))
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("long[]", "simhash64Buf",
      v => s"$v = new long[1];")
    nullSafeCodeGen(ctx, ev, c => s"""
      if (graft.functions.SimHashKernel.compute64($c, $buf)) {
        ${ev.value} = $buf[0];
      } else {
        ${ev.isNull} = true;
      }""")
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHashKernel {
  /** Sentinel for "no tokens" (cannot collide: fingerprints are 32-bit). */
  val Empty: Long = Long.MinValue

  /** Interpreted-eval scratch for [[compute64]] (codegen allocates its
    * own mutable slot per stage).
    */
  private[functions] val evalBuf = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](1)
  }

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // Java regex \s set -- the tokenizer contract of the composable form.
  // All six are single ASCII bytes, and UTF-8 continuation bytes are
  // >= 0x80, so byte-level splitting equals char-level splitting.
  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** Tokenize the lowercased UTF-8 bytes directly -- no String, no
    * per-token substring/encode allocations; one reused digest.
    */
  def compute(t: UTF8String): Long = {
    val bytes = t.toLowerCase.getBytes
    val md = mdPool.get()
    val votes = new Array[Int](32)
    var any = false
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        any = true
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
          ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        var j = 0
        while (j < 32) {
          if (((h >>> j) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    if (!any) return Empty
    var fp = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  /** 64-bit one-pass SimHash into `out(0)`; returns false (out untouched)
    * when the text has no tokens. Token hash = first 8 md5 bytes
    * big-endian: bits 32..63 vote on bytes 0..3 (the 32-bit kernel's
    * exact hash), bits 0..31 on bytes 4..7.
    */
  def compute64(t: UTF8String, out: Array[Long]): Boolean = {
    val bytes = t.toLowerCase.getBytes
    val md = mdPool.get()
    val votes = new Array[Int](64)
    var any = false
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        any = true
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    if (!any) return false
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    out(0) = fp
    true
  }
}
