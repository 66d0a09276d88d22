package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String
import java.io._
import scala.collection.mutable

/** Shared machinery for histogram-shaped aggregates (SURVEY §2.8 "v2":
  * entropy/HHI over an open-hash of counts instead of the two-level
  * groupBy). Buffer = value -> count map; merge sums counts; the final
  * statistic differs per subclass.
  */
abstract class HistogramAgg extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {
  def child: Expression

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] = mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match { case s: UTF8String => s.clone(); case x => x }
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Any, Long], b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeInt(buf.size)
    buf.foreach { case (k, c) => oos.writeObject(k); oos.writeLong(c) }
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = ois.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) { val k = ois.readObject(); buf.update(k, ois.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
}

/** Shannon entropy (log2) of the value histogram; 0.0 when <=1 distinct
  * (reference `advanced_features.py:197-208`).
  */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HistogramAgg {

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.size <= 1) return 0.0
    val total = buf.valuesIterator.sum.toDouble
    -buf.valuesIterator.map { c =>
      val p = c / total
      p * math.log(p) / math.log(2.0)
    }.sum
  }

  override def withNewMutableAggBufferOffset(offset: Int): EntropyAgg = copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): EntropyAgg = copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): EntropyAgg = copy(child = newChild)
  override def prettyName: String = "entropy_agg"
}

/** Herfindahl–Hirschman index of the value histogram
  * (reference `advanced_features.py:307-311`).
  */
case class HhiAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HistogramAgg {

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val total = buf.valuesIterator.sum.toDouble
    if (total == 0) return 0.0
    buf.valuesIterator.map { c => val p = c / total; p * p }.sum
  }

  override def withNewMutableAggBufferOffset(offset: Int): HhiAgg = copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HhiAgg = copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HhiAgg = copy(child = newChild)
  override def prettyName: String = "hhi_agg"
}
