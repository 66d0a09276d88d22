package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}
import scala.collection.mutable

/** Bounded top-k as a NATIVE mergeable aggregate: keeps the `k` SMALLEST
  * child values under the type's total order and emits them sorted
  * ascending. Callers encode a descending key by negation and append a
  * unique tie-break field, so "the k best rows per group" becomes
  *
  *   groupBy(group).agg(top_k(struct(orderKey, id, payload…), k))
  *
  * This is the per-group top-k shape NEITHER alternative reaches:
  *   - `row_number().over(Window.partitionBy(group))` funnels each
  *     group's whole candidate list through ONE task (the r12/r13
  *     scale-killer class);
  *   - the two-pass GlobalOrder rank is scale-safe but exchanges the
  *     full candidate set (corpus-scale rows through the bucket
  *     shuffle) to rank rows it then throws away.
  * Here the PARTIAL (map-side) buffer is bounded by `k`, so a corpus of
  * candidates collapses to ≤ k rows per (task, group) before the
  * exchange — the shuffle carries |groups|·k rows at any data scale,
  * and the common case (a candidate worse than the current k-th) costs
  * ONE comparison against the buffer's tail.
  *
  * Determinism: with a total order (unique tie-break before any payload
  * field), the emitted array — and therefore rank = 1 + position — is
  * bit-identical to the window / GlobalOrder forms.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(k >= 1, s"top_k: k must be >= 1, got $k")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  // mirror InternalRow.copyValue: every buffered value must be detached
  // from the reused input-row buffer, including a TOP-LEVEL array/map
  // child (struct children are covered by InternalRow.copy's deep copy)
  private def copyOf(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case x => x
  }

  /** Insert keeping `buf` sorted ascending and bounded by k. The
    * overwhelmingly common case — buffer full, value not better than
    * the tail — is ONE comparison, no copy.
    */
  private def insert(buf: mutable.ArrayBuffer[Any], v: Any): Unit = {
    if (buf.length >= k && ord.gteq(v, buf.last)) return
    // binary search for the insertion point (first element > v)
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lteq(buf(mid), v)) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, copyOf(v))
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[Any], b2: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    // b2's elements are already detached copies; insert skips the copy
    // only through the fast-path rejection, so reuse insert directly
    b2.foreach { v =>
      if (!(b1.length >= k && ord.gteq(v, b1.last))) {
        var lo = 0
        var hi = b1.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ord.lteq(b1(mid), v)) lo = mid + 1 else hi = mid
        }
        b1.insert(lo, v)
        if (b1.length > k) b1.remove(b1.length - 1)
      }
    }
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    buf.foreach { v =>
      row.update(0, v)
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val arr = new Array[Byte](sz)
      in.readFully(arr)
      val u = new UnsafeRow(1)
      u.pointTo(arr, sz)
      buf += copyOf(u.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
  override def prettyName: String = "top_k"
}
