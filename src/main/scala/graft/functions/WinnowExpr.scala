package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing kernel: `winnow(text, k, w)` returns the distinct
  * window-min k-gram hashes of the input as `array<long>`.
  *
  * The composable form (transform/slice/array_min higher-order exprs) is
  * narrow but pays interpreted lambda dispatch per ELEMENT and O(n·w)
  * slice allocations; this kernel is one JVM call per ROW — k-gram md5s
  * plus a monotonic-deque sliding minimum, O(n) amortized, zero
  * allocation beyond the hash array. Hash contract identical to
  * `Dedup.md5Int` (first 4 md5 bytes as unsigned 32-bit), so the DuckDB
  * oracle reproduces values exactly.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow expects a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowKernel.compute($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
  override def prettyName: String = "winnow"
}

object WinnowKernel {
  /** Distinct sliding-window minima of the k-gram hash sequence; empty
    * array when the text has no complete window (numChars < w + k - 1).
    */
  def compute(t: UTF8String, k: Int, w: Int): ArrayData = {
    val nGrams = t.numChars() - (k - 1)
    val nWins = nGrams - (w - 1)
    if (nWins < 1) return new GenericArrayData(Array.emptyLongArray)

    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val d = md.digest(t.substringSQL(i + 1, k).getBytes)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }

    // monotonic deque of indices: front = min of the current window
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hs(deque(head)))
      i += 1
    }

    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
