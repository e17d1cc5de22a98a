package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Elementwise sum of `array<double>` rows — the vector reduction Spark
  * lacks natively (per-element explode + groupBy would shuffle
  * rows × dim instead of one fixed buffer per partition). Same contract
  * family as [[GramianAgg]]: first non-null row fixes the length, null
  * rows are skipped, merge is one daxpy. Used for PCA projection
  * (summing per-variant coordinate contributions) and any vector-mean
  * computation. */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  @transient private lazy val blas = dev.ludovic.netlib.blas.BLAS.getInstance()

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val raw = child.eval(input)
    if (raw == null) return b
    val v = raw.asInstanceOf[ArrayData].toDoubleArray()
    if (b.isEmpty) return v.clone()
    require(b.length == v.length, s"vec_sum: length ${v.length} != ${b.length}")
    blas.daxpy(b.length, 1.0, v, 1, b, 1)
    b
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    require(x.length == y.length, s"vec_sum: buffer ${y.length} != ${x.length}")
    blas.daxpy(x.length, 1.0, y, 1, x, 1)
    x
  }

  override def eval(b: Array[Double]): Any =
    if (b.isEmpty) null else new GenericArrayData(b)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.length)
    bb.putInt(b.length)
    b.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new Array[Double](n)
    var i = 0
    while (i < n) { b(i) = bb.getDouble(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)
}

object VecSumAgg {
  def of(vec: Column): Column =
    bridge.column(VecSumAgg(bridge.expression(vec)).toAggregateExpression())
}
