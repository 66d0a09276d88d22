package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin polynomial rolling-hash fingerprints:
  * `rolling_hashes(text, k, stride)` returns
  * `h(i) = Σ_{j<k} code(t[i+j])·B^{k-1-j} mod M` for the sampled positions
  * `i ≡ 0 (mod stride)`, as `array<long>`.
  *
  * The kernel is O(1) PER POSITION (true rolling update), vs O(k) for
  * hash-per-gram — at 100 TB corpus scale this is the fingerprinting
  * inner loop. The value contract is pure modular arithmetic over code
  * points, so the DuckDB oracle reproduces it with a k-term polynomial
  * per sampled position (same values, naive cost): the scale-path
  * implementation is checked by a naive-formula oracle.
  *
  * Symbols are Unicode CODE POINTS (the alphabet DuckDB's
  * substr/unicode() sees), so astral-plane chars neither shift sampled
  * positions nor change values vs the oracle. B = 257, M = 1e9+7
  * (prime); worst intermediates (M-1)·B and 0x10FFFF·(M-1) both sit
  * far below 2^63, on the Spark and DuckDB (BIGINT) sides alike.
  */
case class RollingHashes(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes expects a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHashKernel.compute(input.asInstanceOf[UTF8String], k, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashKernel.compute($c, $k, $stride)")

  override protected def withNewChildInternal(c: Expression): RollingHashes =
    copy(child = c)
  override def prettyName: String = "rolling_hashes"
}

object RollingHashKernel {
  val B = 257L
  val M = 1000000007L

  def compute(t: UTF8String, k: Int, stride: Int): ArrayData = {
    require(k >= 1 && stride >= 1,
      s"rolling_hashes: k and stride must be >= 1, got k=$k stride=$stride")
    // roll over code points (not UTF-16 units) — the same alphabet the
    // oracle's substr/unicode() sees, so astral chars don't shift positions
    val s = t.toString
    val cps = s.codePoints().toArray
    val n = cps.length - (k - 1)
    if (n < 1) return new GenericArrayData(Array.emptyLongArray)

    var bk = 1L // B^(k-1) mod M
    var j = 1
    while (j < k) { bk = bk * B % M; j += 1 }

    val out = new Array[Long]((n + stride - 1) / stride)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    var pos = 1
    while (pos < n) {
      var d = h - cps(pos - 1).toLong * bk % M
      if (d < 0) d += M
      h = (d * B + cps(pos + k - 1)) % M
      if (pos % stride == 0) out(pos / stride) = h
      pos += 1
    }
    new GenericArrayData(out)
  }
}
