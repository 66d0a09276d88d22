package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.io._

/** One-pass distributed Gram matrix over an embedding column — the
  * scale-correct kernel for dimension covariance / correlation screens
  * (dead dims, redundant dims) on a vector corpus.
  *
  * The composable alternative (posexplode + self-join on the row id +
  * per-pair `corr`) shuffles n·d(d+1)/2 rows — 2e12 at n=1e9, d=64. This
  * aggregate keeps d sums + d(d+1)/2 product sums in a single mergeable
  * buffer: each partition folds its rows locally, partials merge once at
  * the final reduce, nothing row-shaped ever shuffles. Output layout is
  * one flat double array:
  *
  *   [ n, d, sum(x_0)..sum(x_{d-1}),
  *     upper-triangle row-major sum(x_i*x_j) for i<=j ]
  *
  * from which covariance or Pearson correlation of any (i,j) is closed
  * form. Null vectors are ignored; a vector whose length differs from
  * the rest of the corpus FAILS the query (both in update and in merge):
  * tolerating it in either path would make the result depend on which
  * partition the ragged row landed in. Screen ragged corpora first
  * (corpus QA gate, q89).
  */
case class GramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramAgg.Buf] with UnaryLike[Expression] {

  // lazy: child is unresolved at construction time (NullType dataType)
  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"gram_agg needs array<float|double>, got $t")
  }

  override def createAggregationBuffer(): GramAgg.Buf = new GramAgg.Buf

  override def update(buf: GramAgg.Buf, input: InternalRow): GramAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.d == 0 && d > 0) buf.init(d)
      // zero-length arrays are ignorable like nulls; a nonzero mismatch is
      // a ragged corpus and must fail identically on every partitioning
      if (d > 0 && d != buf.d) throw new IllegalStateException(
        s"gram_agg: mixed embedding dimensions ${buf.d} vs $d in input")
      if (d == buf.d && d > 0) {
        val x = new Array[Double](d)
        var i = 0
        while (i < d) {
          x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          buf.sums(i) += x(i)
          i += 1
        }
        var k = 0
        i = 0
        while (i < d) {
          var j = i
          while (j < d) { buf.prods(k) += x(i) * x(j); k += 1; j += 1 }
          i += 1
        }
        buf.n += 1
      }
    }
    buf
  }

  override def merge(a: GramAgg.Buf, b: GramAgg.Buf): GramAgg.Buf = {
    if (a.d == 0) return b
    if (b.d == 0) return a
    // A ragged corpus (mixed embedding dims) must fail loudly: silently
    // keeping one side would make the Gram matrix depend on which
    // partition's partial arrived first — partition-order-dependent output
    if (b.d != a.d) throw new IllegalStateException(
      s"gram_agg: mixed embedding dimensions ${a.d} vs ${b.d} across partials")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < a.prods.length) { a.prods(i) += b.prods(i); i += 1 }
    a.n += b.n
    a
  }

  override def eval(buf: GramAgg.Buf): Any = {
    val d = buf.d
    val out = new Array[Double](2 + d + d * (d + 1) / 2)
    out(0) = buf.n.toDouble
    out(1) = d.toDouble
    System.arraycopy(buf.sums, 0, out, 2, d)
    System.arraycopy(buf.prods, 0, out, 2 + d, buf.prods.length)
    new GenericArrayData(out)
  }

  override def serialize(buf: GramAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeLong(buf.n); o.writeInt(buf.d)
    buf.sums.foreach(o.writeDouble)
    buf.prods.foreach(o.writeDouble)
    o.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new GramAgg.Buf
    val n = in.readLong(); val d = in.readInt()
    if (d > 0) {
      buf.init(d); buf.n = n
      var i = 0
      while (i < buf.sums.length) { buf.sums(i) = in.readDouble(); i += 1 }
      i = 0
      while (i < buf.prods.length) { buf.prods(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): GramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
  override def prettyName: String = "gram_agg"
}

object GramAgg {
  /** d sums + upper-triangle product sums; d fixed by the first vector. */
  final class Buf {
    var n: Long = 0L
    var d: Int = 0
    var sums: Array[Double] = Array.emptyDoubleArray
    var prods: Array[Double] = Array.emptyDoubleArray
    def init(dim: Int): Unit = {
      d = dim
      sums = new Array[Double](dim)
      prods = new Array[Double](dim * (dim + 1) / 2)
    }
  }
}
