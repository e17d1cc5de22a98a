package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Unboxed per-sample depth aggregation as a `TypedImperativeAggregate`
  * (the SampleDepthAgg Aggregator's measured weakness is its Seq[Int]
  * input encoder: one boxed Integer per genotype call, which loses to
  * the exploded long view once rows are wide). This form reads the
  * ArrayData buffer directly — zero boxing at any width — and keeps the
  * same shape: one (sum, cnt, min, max) vector buffer per partition,
  * merged once, no explode, no wide shuffle.
  *
  * Output: array<struct<sample_idx:int, n:bigint, mean_dp:double,
  * min_dp:int, max_dp:int>> (min/max null when a sample has no called
  * depths; -1 depths are missing and excluded, like the long view).
  */
case class DepthStatsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DepthBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "depth_stats"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sample_idx", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("mean_dp", DoubleType, nullable = false),
    StructField("min_dp", IntegerType, nullable = true),
    StructField("max_dp", IntegerType, nullable = true))))

  override def createAggregationBuffer(): DepthBuf =
    DepthBuf(Array.empty, Array.empty, Array.empty, Array.empty)

  private def ensure(b: DepthBuf, n: Int): DepthBuf =
    if (b.sum.length >= n) b
    else {
      val g = DepthBuf(
        java.util.Arrays.copyOf(b.sum, n), java.util.Arrays.copyOf(b.cnt, n),
        java.util.Arrays.copyOf(b.min, n), java.util.Arrays.copyOf(b.max, n))
      java.util.Arrays.fill(g.min, b.min.length, n, Int.MaxValue)
      java.util.Arrays.fill(g.max, b.max.length, n, Int.MinValue)
      g
    }

  override def update(b0: DepthBuf, input: InternalRow): DepthBuf = {
    val v = child.eval(input)
    if (v == null) return b0
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = ensure(b0, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = arr.getInt(i)
        if (d >= 0) {
          b.sum(i) += d; b.cnt(i) += 1
          if (d < b.min(i)) b.min(i) = d
          if (d > b.max(i)) b.max(i) = d
        }
      }
      i += 1
    }
    b
  }

  override def merge(x: DepthBuf, y: DepthBuf): DepthBuf = {
    val n = math.max(x.sum.length, y.sum.length)
    val a = ensure(x, n); val b = ensure(y, n)
    var i = 0
    while (i < n) {
      a.sum(i) += b.sum(i); a.cnt(i) += b.cnt(i)
      if (b.min(i) < a.min(i)) a.min(i) = b.min(i)
      if (b.max(i) > a.max(i)) a.max(i) = b.max(i)
      i += 1
    }
    a
  }

  override def eval(b: DepthBuf): Any = {
    val out = new Array[Any](b.sum.length)
    var i = 0
    while (i < b.sum.length) {
      out(i) =
        if (b.cnt(i) == 0)
          new GenericInternalRow(Array[Any](i, 0L, Double.NaN, null, null))
        else
          new GenericInternalRow(Array[Any](
            i, b.cnt(i), b.sum(i).toDouble / b.cnt(i), b.min(i), b.max(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: DepthBuf): Array[Byte] = {
    val n = b.sum.length
    val bb = ByteBuffer.allocate(4 + n * (8 + 8 + 4 + 4))
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.sum(i)); bb.putLong(b.cnt(i)); bb.putInt(b.min(i)); bb.putInt(b.max(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DepthBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = DepthBuf(new Array[Long](n), new Array[Long](n), new Array[Int](n), new Array[Int](n))
    var i = 0
    while (i < n) { b.sum(i) = bb.getLong(); b.cnt(i) = bb.getLong(); b.min(i) = bb.getInt(); b.max(i) = bb.getInt(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DepthStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DepthStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DepthStatsAgg =
    copy(child = newChildren.head)
}

object DepthStatsAgg {
  /** Aggregate Column over an array<int> depth column. */
  def of(dp: Column): Column = {
    val agg = DepthStatsAgg(bridge.expression(dp))
    bridge.column(agg.toAggregateExpression())
  }
}
