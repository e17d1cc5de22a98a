package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Compact mergeable depth histogram for the approximate median: exact
  * unit bins for depths < 256 (covers real sequencing depth almost
  * always), then 8 log2 sub-bins per octave up to Int.MaxValue — 440
  * bins total, 3.5 KB of Long counts per sample. The median is EXACT
  * whenever the true median depth is < 256; above that the error is
  * bounded by the sub-bin width (≤ 1/8 of the value, reported at the
  * bin midpoint) — same spirit as percentile_approx's bounded-error
  * contract but mergeable in O(bins) and fully deterministic.
  */
object DepthHist {
  val ExactBins = 256
  val SubBins = 8
  // octaves k = 8..30 (2^8 .. Int.MaxValue)
  val Bins: Int = ExactBins + (30 - 8 + 1) * SubBins // 440

  @inline def binOf(d: Int): Int =
    if (d < ExactBins) d
    else {
      val k = 31 - Integer.numberOfLeadingZeros(d) // floor(log2 d), 8..30
      val sub = ((d.toLong - (1L << k)) * SubBins >> k).toInt // 0..7
      ExactBins + (k - 8) * SubBins + sub
    }

  /** Representative value reported for a bin (bin midpoint above 256). */
  @inline def repOf(bin: Int): Double =
    if (bin < ExactBins) bin.toDouble
    else {
      val k = 8 + (bin - ExactBins) / SubBins
      val sub = (bin - ExactBins) % SubBins
      val lo = (1L << k) + ((sub.toLong << k) / SubBins)
      val hi = (1L << k) + (((sub + 1L) << k) / SubBins) - 1
      (lo + hi) / 2.0
    }

  /** Lower median (value at rank floor((n-1)/2)) from one sample's
    * bin-count slice; NaN when the sample has no called depths. */
  def median(hist: Array[Long], off: Int, cnt: Long): Double = {
    if (cnt == 0L) return Double.NaN
    val target = (cnt - 1) / 2
    var cum = 0L
    var b = 0
    while (b < Bins) {
      cum += hist(off + b)
      if (cum > target) return repOf(b)
      b += 1
    }
    Double.NaN // unreachable when counts are consistent
  }
}

/** Aggregation buffer: one slot per sample index; `hist` is null when
  * the median is disabled (lean 24 B/sample), else a flattened
  * n×[[DepthHist.Bins]] count matrix. */
final case class DepthHistBuf(
    sum: Array[Long], cnt: Array[Long], min: Array[Int], max: Array[Int],
    hist: Array[Long])

/** Unboxed per-sample depth aggregation as a `TypedImperativeAggregate`
  * (the SampleDepthAgg Aggregator's measured weakness is its Seq[Int]
  * input encoder: one boxed Integer per genotype call, which loses to
  * the exploded long view once rows are wide). This form reads the
  * ArrayData buffer directly — zero boxing at any width — and keeps the
  * same shape: one (sum, cnt, min, max[, hist]) vector buffer per
  * partition, merged once, no explode, no wide shuffle.
  *
  * Output: array<struct<sample_idx:int, n:bigint, mean_dp:double,
  * min_dp:int, max_dp:int, median_dp_approx:double>> (min/max/median
  * null when a sample has no called depths; -1 depths are missing and
  * excluded, like the long view). With `withMedian=false` the median
  * column is always null and the buffer stays 24 B/sample; enabled it
  * costs [[DepthHist.Bins]]×8 B ≈ 3.5 KB/sample/partition-buffer —
  * fine to ~100k samples per executor, switch to the long view beyond.
  */
case class DepthStatsAgg(
    child: Expression,
    withMedian: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DepthHistBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "depth_stats"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sample_idx", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("mean_dp", DoubleType, nullable = false),
    StructField("min_dp", IntegerType, nullable = true),
    StructField("max_dp", IntegerType, nullable = true),
    StructField("median_dp_approx", DoubleType, nullable = true))))

  override def createAggregationBuffer(): DepthHistBuf =
    DepthHistBuf(Array.empty, Array.empty, Array.empty, Array.empty,
      if (withMedian) Array.empty else null)

  private def ensure(b: DepthHistBuf, n: Int): DepthHistBuf =
    if (b.sum.length >= n) b
    else {
      val g = DepthHistBuf(
        java.util.Arrays.copyOf(b.sum, n), java.util.Arrays.copyOf(b.cnt, n),
        java.util.Arrays.copyOf(b.min, n), java.util.Arrays.copyOf(b.max, n),
        if (withMedian) java.util.Arrays.copyOf(b.hist, n * DepthHist.Bins) else null)
      java.util.Arrays.fill(g.min, b.min.length, n, Int.MaxValue)
      java.util.Arrays.fill(g.max, b.max.length, n, Int.MinValue)
      g
    }

  override def update(b0: DepthHistBuf, input: InternalRow): DepthHistBuf = {
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
          if (withMedian) b.hist(i * DepthHist.Bins + DepthHist.binOf(d)) += 1
        }
      }
      i += 1
    }
    b
  }

  override def merge(x: DepthHistBuf, y: DepthHistBuf): DepthHistBuf = {
    val n = math.max(x.sum.length, y.sum.length)
    val a = ensure(x, n); val b = ensure(y, n)
    var i = 0
    while (i < n) {
      a.sum(i) += b.sum(i); a.cnt(i) += b.cnt(i)
      if (b.min(i) < a.min(i)) a.min(i) = b.min(i)
      if (b.max(i) > a.max(i)) a.max(i) = b.max(i)
      i += 1
    }
    if (withMedian) {
      var j = 0
      while (j < n * DepthHist.Bins) { a.hist(j) += b.hist(j); j += 1 }
    }
    a
  }

  override def eval(b: DepthHistBuf): Any = {
    val out = new Array[Any](b.sum.length)
    var i = 0
    while (i < b.sum.length) {
      out(i) =
        if (b.cnt(i) == 0)
          new GenericInternalRow(Array[Any](i, 0L, Double.NaN, null, null, null))
        else {
          val med: Any =
            if (withMedian) DepthHist.median(b.hist, i * DepthHist.Bins, b.cnt(i)) else null
          new GenericInternalRow(Array[Any](
            i, b.cnt(i), b.sum(i).toDouble / b.cnt(i), b.min(i), b.max(i), med))
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: DepthHistBuf): Array[Byte] = {
    val n = b.sum.length
    val histLen = if (withMedian) n * DepthHist.Bins else 0
    val bb = ByteBuffer.allocate(4 + n * (8 + 8 + 4 + 4) + histLen * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.sum(i)); bb.putLong(b.cnt(i)); bb.putInt(b.min(i)); bb.putInt(b.max(i)); i += 1 }
    var j = 0
    while (j < histLen) { bb.putLong(b.hist(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DepthHistBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = DepthHistBuf(new Array[Long](n), new Array[Long](n), new Array[Int](n), new Array[Int](n),
      if (withMedian) new Array[Long](n * DepthHist.Bins) else null)
    var i = 0
    while (i < n) { b.sum(i) = bb.getLong(); b.cnt(i) = bb.getLong(); b.min(i) = bb.getInt(); b.max(i) = bb.getInt(); i += 1 }
    var j = 0
    while (j < (if (withMedian) n * DepthHist.Bins else 0)) { b.hist(j) = bb.getLong(); j += 1 }
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
  def of(dp: Column, withMedian: Boolean = false): Column = {
    val agg = DepthStatsAgg(bridge.expression(dp), withMedian)
    bridge.column(agg.toAggregateExpression())
  }
}
