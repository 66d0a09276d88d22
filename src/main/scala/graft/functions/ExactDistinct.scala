package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import java.io._
import scala.collection.mutable

/** Exact distinct count as a native Catalyst aggregate, legal inside
  * window frames (SURVEY §4.2: `countDistinct` is rejected there, and the
  * `size(collect_set(...))` workaround materializes an array per output
  * row). Buffer is a hash set; eval emits only the cardinality.
  *
  * The 100 TB switch: this exact form for oracle parity,
  * `approx_count_distinct` (HLL) behind the same call-site when sketches
  * are acceptable.
  */
case class ExactDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashSet[Any] = mutable.HashSet.empty

  override def update(buf: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    if (v != null) buf += (v match {
      case s: UTF8String => s.clone() // row buffers are reused; detach
      case x => x
    })
    buf
  }

  override def merge(b1: mutable.HashSet[Any], b2: mutable.HashSet[Any]): mutable.HashSet[Any] =
    b1 ++= b2

  override def eval(buf: mutable.HashSet[Any]): Any = buf.size.toLong

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeInt(buf.size)
    buf.foreach(oos.writeObject)
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = ois.readInt()
    val buf = mutable.HashSet.empty[Any]
    var i = 0
    while (i < n) { buf += ois.readObject(); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): ExactDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ExactDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ExactDistinct =
    copy(child = newChild)
  override def prettyName: String = "exact_distinct"
}

/** Gini coefficient as a native aggregate (SURVEY §2.8 "v2" path for
  * A15): the higher-order-expression form materializes a sorted array
  * per output row; this buffer accumulates raw doubles, merges across
  * partitions, and sorts once at eval — legal in groupBy and in window
  * frames. Formula per `real_time_processor.py:213-228`.
  */
case class GiniAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[Double] = mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[Double], input: InternalRow): mutable.ArrayBuffer[Double] = {
    child.eval(input) match {
      case null => ()
      case d: org.apache.spark.sql.types.Decimal => buf += d.toDouble
      case n: Number => buf += n.doubleValue()
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[Double], b2: mutable.ArrayBuffer[Double]): mutable.ArrayBuffer[Double] =
    b1 ++= b2

  override def eval(buf: mutable.ArrayBuffer[Double]): Any = {
    val n = buf.length
    if (n <= 1) return 0.0
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    var s = 0.0
    var ix = 0.0
    var i = 0
    while (i < n) { s += sorted(i); ix += (i + 1) * sorted(i); i += 1 }
    if (s <= 0) 0.0 else 2.0 * ix / (n * s) - (n + 1.0) / n
  }

  override def serialize(buf: mutable.ArrayBuffer[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new mutable.ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += bb.getDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): GiniAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GiniAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): GiniAgg =
    copy(child = newChild)
  override def prettyName: String = "gini_agg"
}

object GraftFunctions {
  /** Imperative twin of [[graft.GraftExtensions]]: registers the same
    * function table into an already-built session; idempotent.
    */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }
}
