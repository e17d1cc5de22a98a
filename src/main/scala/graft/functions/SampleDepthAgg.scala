package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise depth aggregation across the sample axis WITHOUT the
  * exploded long view (SURVEY.md §4.2 escalation (2a): Aggregator UDAF).
  *
  * `Stats.sampleDepthStats` explodes to (variant × sample) rows — at
  * 1M×50 that's a 50M-row shuffle for a 50-row answer. This Aggregator
  * folds each partition's dp arrays into ONE (sum, count, min, max)
  * vector quadruple; the shuffle then carries a single buffer per
  * partition (classic partial aggregation, but over vectors). Missing
  * depths (-1 sentinel) are excluded from all statistics, matching the
  * long-view semantics. Median still needs the long view — this is the
  * mean/min/max fast path.
  *
  * Crossover (measured): 13× faster than the long view at 50 samples,
  * but ~3× SLOWER at 2000 samples — the Aggregator input encoder boxes
  * every depth into Seq[Int], and boxing dominates once rows are wide.
  * Rule: fast path for cohorts up to a few hundred samples; long view
  * (codegen'd explode) beyond. A TypedImperativeAggregate reading
  * ArrayData directly would win at every width — round-2 candidate.
  */
final case class DepthBuf(sum: Array[Long], cnt: Array[Long], min: Array[Int], max: Array[Int])
final case class DepthOut(sample_idx: Int, n: Long, mean_dp: Double, min_dp: Option[Int], max_dp: Option[Int])
final case class DepthStats(stats: Seq[DepthOut])

object SampleDepthAgg extends Aggregator[Seq[Int], DepthBuf, DepthStats] {

  override def zero: DepthBuf = DepthBuf(Array.empty, Array.empty, Array.empty, Array.empty)

  private def ensure(b: DepthBuf, n: Int): DepthBuf =
    if (b.sum.length >= n) b
    else {
      val grown = DepthBuf(
        java.util.Arrays.copyOf(b.sum, n), java.util.Arrays.copyOf(b.cnt, n),
        java.util.Arrays.copyOf(b.min, n), java.util.Arrays.copyOf(b.max, n))
      java.util.Arrays.fill(grown.min, b.min.length, n, Int.MaxValue)
      java.util.Arrays.fill(grown.max, b.max.length, n, Int.MinValue)
      grown
    }

  override def reduce(b0: DepthBuf, dp: Seq[Int]): DepthBuf = {
    if (dp == null) return b0
    val b = ensure(b0, dp.length)
    var i = 0
    while (i < dp.length) {
      val v = dp(i)
      if (v >= 0) { // -1 = missing sentinel
        b.sum(i) += v; b.cnt(i) += 1
        if (v < b.min(i)) b.min(i) = v
        if (v > b.max(i)) b.max(i) = v
      }
      i += 1
    }
    b
  }

  override def merge(x: DepthBuf, y0: DepthBuf): DepthBuf = {
    val n = math.max(x.sum.length, y0.sum.length)
    val a = ensure(x, n); val y = ensure(y0, n)
    var i = 0
    while (i < n) {
      a.sum(i) += y.sum(i); a.cnt(i) += y.cnt(i)
      if (y.min(i) < a.min(i)) a.min(i) = y.min(i)
      if (y.max(i) > a.max(i)) a.max(i) = y.max(i)
      i += 1
    }
    a
  }

  override def finish(b: DepthBuf): DepthStats = DepthStats(
    b.sum.indices.map { i =>
      if (b.cnt(i) == 0) DepthOut(i, 0L, Double.NaN, None, None)
      else DepthOut(i, b.cnt(i), b.sum(i).toDouble / b.cnt(i), Some(b.min(i)), Some(b.max(i)))
    })

  override def bufferEncoder: Encoder[DepthBuf] = Encoders.product[DepthBuf]
  override def outputEncoder: Encoder[DepthStats] = Encoders.product[DepthStats]
}
