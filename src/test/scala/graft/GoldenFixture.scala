package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.{VariantSchema, VariantsMetadata}
import scala.jdk.CollectionConverters._

/** The v6-golden fixture: 6 variants × 4 samples, diploid, hand-computed
  * expected values — FIXTURES.md §B (mirrors the reference's inline-golden
  * test style over tiny VCFs). */
object GoldenFixture {

  val meta: VariantsMetadata = VariantsMetadata(Seq("s0", "s1", "s2", "s3"), ploidy = 2)

  private def gt(pairs: (Int, Int)*): Seq[Seq[Int]] = pairs.map(p => Seq(p._1, p._2))

  // (id, chrom, pos, ref, alt, qual, gt, dp, gq, ao, ro)
  val rows: Seq[Row] = Seq(
    Row("chr1", 100L, "v1", "A", Seq("T"), 50.0,
      gt((0, 0), (0, 1), (1, 1), (0, 0)), Seq(10, 3, 8, 20), Seq(99.0, 20.0, 45.0, 99.0),
      Seq(Seq(2), Seq(1), Seq(7), Seq(5)), Seq(8, 2, 1, 15)),
    Row("chr1", 200L, "v2", "C", Seq("G"), 40.0,
      gt((0, 0), (-1, -1), (0, 0), (0, 0)), Seq(12, 0, 9, 11), Seq(80.0, 0.0, 60.0, 70.0),
      null, null),
    Row("chr1", 300L, "v3", "G", Seq("A", "T"), 60.0,
      gt((0, 1), (1, 2), (2, 2), (-1, -1)), Seq(7, 14, 6, 1), Seq(50.0, 90.0, 40.0, 5.0),
      null, null),
    Row("chr2", 50L, "v4", "T", Seq("C"), 90.0,
      gt((0, 1), (0, 1), (0, 1), (0, 1)), Seq(30, 25, 18, 22), Seq(99.0, 99.0, 99.0, 99.0),
      null, null),
    Row("chr2", 150L, "v5", "A", Seq("C"), 5.0,
      gt((-1, -1), (-1, -1), (-1, -1), (-1, -1)), Seq(0, 0, 0, 0), Seq(0.0, 0.0, 0.0, 0.0),
      null, null),
    Row("chr2", 250L, "v6", "A", Seq("G"), 70.0,
      gt((1, 1), (1, 1), (1, 1), (0, 1)), Seq(15, 16, 14, 9), Seq(95.0, 96.0, 94.0, 33.0),
      null, null)
  ) // field order matches VariantSchema: chrom,pos,id,ref,alt,qual,gt,dp,gq,ao,ro

  def df(spark: SparkSession): DataFrame =
    spark.createDataFrame(rows.asJava, VariantSchema.schema)

  /** Column `c` of `df` keyed by variant id (driver-side, tiny). */
  def byId[T](df: DataFrame, c: String): Map[String, T] =
    df.select("id", c).collect().map(r => r.getString(0) -> r.getAs[T](1)).toMap
}
