package graft

import org.apache.spark.sql.functions._

/** Approximate sketches (SURVEY.md §2.4 last row): built-ins are the
  * implementation; these tests pin accuracy envelopes on driver data.
  * Approx results are bench-path only — they never enter oracle queries
  * (HLL estimates can't hash-match DuckDB). */
class SketchSpec extends SparkTestBase {

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("HLL approx_count_distinct within 5% rsd of exact") {
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.05).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.15, s"exact=$exact approx=$approx")
  }

  test("approx quantiles bracket the exact median") {
    val Array(q25, q50, q75) = li.stat.approxQuantile("l_quantity", Array(0.25, 0.5, 0.75), 0.01)
    assert(q25 <= q50 && q50 <= q75)
    val exactMedian = li.select(expr("percentile(l_quantity, 0.5)")).head().getDouble(0)
    assert(math.abs(q50 - exactMedian) <= 2.0, s"approx=$q50 exact=$exactMedian")
  }

  test("percentile_approx groups (the per-sample depth-stats path)") {
    val rows = li.groupBy("l_returnflag")
      .agg(expr("percentile_approx(l_quantity, 0.5)").as("med"))
      .collect()
    assert(rows.length === 3)
    rows.foreach(r => assert(r.getDouble(1) >= 1.0 && r.getDouble(1) <= 50.0))
  }
}
