package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-bucketed interval join (SURVEY.md §4.2: the rewrite the
  * interval-join literature recommends when a θ-join would otherwise
  * cross-product).
  *
  * Joining points (chrom, pos) to intervals (chrom, start, end] naively
  * is an equi-join on chrom with a range residual — every point meets
  * every interval of its chromosome (22 keys → massive skew at genome
  * scale). Bucketizing turns it into a true equi-join: intervals are
  * exploded to the fixed-size bins they overlap; points fall in exactly
  * one bin; the join key is (chrom, bin) and the residual re-checks the
  * exact bounds. Shuffle volume: points once, intervals × avg-bins-per-
  * interval (bounded by interval length / binSize). No broadcast
  * requirement, no skew on chromosome keys.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` containing them.
    * Interval semantics match Filters.inRegions: start < pos ≤ end. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      chromCol: String = "chrom",
      posCol: String = "pos",
      startCol: String = "start",
      endCol: String = "end",
      binSize: Long = 1000000L): DataFrame = {
    require(binSize > 0)
    // collision-free bin column (the AsOf fresh() convention): a user
    // "_bin" column on either side would be overwritten and dropped
    val bin = freshName("_bin", points.columns.toSet ++ intervals.columns)
    val p = points.withColumn(bin, floor(col(posCol) / binSize))
    val iv = intervals
      .withColumn(bin, explode(sequence(
        floor((col(startCol) + 1) / binSize), floor(col(endCol) / binSize))))
    p.join(iv, Seq(chromCol, bin))
      .filter(col(posCol) > col(startCol) && col(posCol) <= col(endCol))
      .drop(bin)
  }

  private def freshName(base: String, taken: Set[String]): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .filterNot(taken).next()

  /** Keep variants falling inside ANY interval (the scalable form of
    * Filters.inRegions when the region list is a table, not a literal):
    * left-semi over the bucketed join. */
  def filterInRegions(
      variants: DataFrame,
      regions: DataFrame,
      binSize: Long = 1000000L): DataFrame = {
    val bin = freshName("_bin", variants.columns.toSet ++ regions.columns)
    val iv = regions.withColumn(bin, explode(sequence(
      floor((col("start") + 1) / binSize), floor(col("end") / binSize))))
    val v = variants.withColumn(bin, floor(col("pos") / binSize))
    v.join(iv,
        v("chrom") === iv("chrom") && v(bin) === iv(bin) &&
          v("pos") > iv("start") && v("pos") <= iv("end"),
        "left_semi")
      .drop(bin)
  }
}
