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

  test("Misra-Gries heavy hitters: frequent items present, estimates within n/k") {
    import spark.implicits._
    import graft.functions.HeavyHittersAgg
    // known frequencies: 3 heavy tokens + 200 rare ones, shuffled
    // deterministically; n = 11_500, k = 10 → n/k = 1_150
    val truth = Map("alpha" -> 5000, "beta" -> 3000, "gamma" -> 1500) ++
      (0 until 200).map(i => s"rare$i" -> 10).toMap
    val n = truth.values.sum
    val k = 10
    val data = truth.toSeq.flatMap { case (t, c) => Seq.fill(c)(t) }
      .sortBy(_.hashCode) // deterministic interleaving of heavy + rare
    val df = data.toDF("tok").repartition(8) // force multi-buffer merge
    val hh = df.select(HeavyHittersAgg.of(col("tok"), k).as("hh"))
      .selectExpr("explode(hh) AS e").select("e.item", "e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh.size <= k - 1)
    Seq("alpha", "beta", "gamma").foreach { t =>
      assert(hh.contains(t), s"item with count ${truth(t)} > n/k must be present")
      assert(hh(t) <= truth(t) && hh(t) >= truth(t) - n / k,
        s"$t est=${hh(t)} true=${truth(t)} n/k=${n / k}")
    }
  }
}
