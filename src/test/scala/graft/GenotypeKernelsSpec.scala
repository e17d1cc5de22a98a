package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Golden-value tests for every genotype kernel — FIXTURES.md §B.2. */
class GenotypeKernelsSpec extends SparkTestBase {

  private lazy val stats = Stats.variantStats(GoldenFixture.df(spark)).cache()

  test("call rate") {
    val g = GoldenFixture.byId[Double](stats, "call_rate")
    assertNear(g("v1"), 1.0); assertNear(g("v2"), 0.75); assertNear(g("v3"), 0.75)
    assertNear(g("v4"), 1.0); assertNear(g("v5"), 0.0); assertNear(g("v6"), 1.0)
  }

  test("called / missing counts partition the sample axis") {
    val called = GoldenFixture.byId[Long](stats, "n_called")
    val missing = GoldenFixture.byId[Long](stats, "n_missing")
    for (v <- Seq("v1", "v2", "v3", "v4", "v5", "v6"))
      assert(called(v) + missing(v) === 4L, s"$v")
    assert(called("v2") === 3L && missing("v5") === 4L)
  }

  test("allele counts (the workhorse kernel)") {
    val g = GoldenFixture.byId[Seq[Long]](stats, "allele_counts")
    assert(g("v1") === Seq(5L, 3L))
    assert(g("v2") === Seq(6L, 0L))
    assert(g("v3") === Seq(1L, 2L, 3L))
    assert(g("v4") === Seq(4L, 4L))
    assert(g("v5") === Seq(0L, 0L))
    assert(g("v6") === Seq(1L, 7L))
  }

  test("major allele frequency (MAF)") {
    val g = GoldenFixture.byId[Double](stats, "maf")
    assertNear(g("v1"), 0.625); assertNear(g("v2"), 1.0); assertNear(g("v3"), 0.5)
    assertNear(g("v4"), 0.5); assertNear(g("v5"), Double.NaN); assertNear(g("v6"), 0.875)
  }

  test("MAC = second-most-frequent allele count (pinned definition)") {
    val g = GoldenFixture.byId[Long](stats, "mac")
    assert(g("v1") === 3L); assert(g("v2") === 0L)
    assert(g("v3") === 2L) // multi-allelic: second-most-frequent, NOT least (FIXTURES §B.2 footnote)
    assert(g("v4") === 4L); assert(g("v5") === 0L); assert(g("v6") === 1L)
  }

  test("observed heterozygosity") {
    val g = GoldenFixture.byId[Double](stats, "obs_het")
    assertNear(g("v1"), 0.25); assertNear(g("v2"), 0.0); assertNear(g("v3"), 2.0 / 3.0)
    assertNear(g("v4"), 1.0); assertNear(g("v5"), Double.NaN); assertNear(g("v6"), 0.25)
  }

  test("unbiased expected heterozygosity (Nei)") {
    val g = GoldenFixture.byId[Double](stats, "exp_het")
    assertNear(g("v1"), 0.535714, 1e-5); assertNear(g("v2"), 0.0)
    assertNear(g("v3"), 0.733333, 1e-5); assertNear(g("v4"), 0.571429, 1e-5)
    assertNear(g("v5"), Double.NaN); assertNear(g("v6"), 0.25)
  }

  test("depth-based MAF uses AO/RO (v1 only; null where fields absent)") {
    import graft.functions.GenotypeKernels
    val df = GoldenFixture.df(spark).select(
      col("id"),
      GenotypeKernels.majorAlleleFreqByDepth(col("ao"), col("ro"), size(col("alt"))).as("dmaf"))
    val rows = df.collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assertNear(rows("v1").get, 26.0 / 41.0, 1e-6)
    assert(rows("v2").isEmpty && rows("v5").isEmpty)
  }

  test("allele freqs sum to 1 where called") {
    val g = GoldenFixture.byId[Seq[Double]](stats, "allele_freqs")
    assertNear(g("v1").sum, 1.0); assertNear(g("v3").sum, 1.0)
    assert(g("v5").forall(_.isNaN))
  }
}
