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

object GraftFunctions {
  /** Register the engine's native functions into a session; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "exact_distinct", exprs => ExactDistinct(exprs.head), "scala_udf")
}
