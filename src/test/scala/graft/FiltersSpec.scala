package graft

import org.apache.spark.sql.functions._
import graft.operators.{Filters, Stats, VariantPipeline}
import graft.functions.GenotypeKernels

/** Filter + mask golden tests — FIXTURES.md §B.2 filter table. */
class FiltersSpec extends SparkTestBase {

  private def fixture = GoldenFixture.df(spark)
  private def keptIds(r: Filters.FilterResult): Set[String] =
    r.kept.select("id").collect().map(_.getString(0)).toSet

  test("call rate >= 0.8 keeps v1 v4 v6, with FLT_STATS partition") {
    val r = Filters(fixture, Filters.byCallRate(0.8))
    assert(keptIds(r) === Set("v1", "v4", "v6"))
    assert(r.stats === Filters.FilterStats(3, 3))
  }

  test("major freq <= 0.7 drops near-fixed + monomorphic + NaN rows") {
    val r = Filters(fixture, Filters.byMaf(max = 0.7))
    assert(keptIds(r) === Set("v1", "v3", "v4"))
    assert(r.stats === Filters.FilterStats(3, 3))
  }

  test("MAC >= 2 (second-most-frequent definition)") {
    val r = Filters(fixture, Filters.byMac(min = 2))
    assert(keptIds(r) === Set("v1", "v3", "v4"))
  }

  test("variable variants (>= 2 alleles observed)") {
    val r = Filters(fixture, Filters.variableOnly)
    assert(keptIds(r) === Set("v1", "v3", "v4", "v6"))
  }

  test("biallelic only (<= 2 alleles observed; empty vacuously kept)") {
    val r = Filters(fixture, Filters.biallelicOnly)
    assert(keptIds(r) === Set("v1", "v2", "v4", "v5", "v6"))
  }

  test("region chr1:150-400 keeps v2 v3") {
    val r = Filters(fixture, Filters.inRegions(Seq(("chr1", 150L, 400L))))
    assert(keptIds(r) === Set("v2", "v3"))
    val out = Filters(fixture, Filters.outRegions(Seq(("chr1", 150L, 400L))))
    assert(keptIds(out) === Set("v1", "v4", "v5", "v6"))
  }

  test("depth-based MAF filter: AO/RO rows only (null stats drop rows)") {
    // v1: depth maf = 26/41 ≈ 0.634 → kept at max=0.7; all other rows have
    // no AO/RO → null stat → null predicate → dropped
    val r = Filters(fixture, Filters.byMafDepth(max = 0.7))
    assert(keptIds(r) === Set("v1"))
    val strict = Filters(fixture, Filters.byMafDepth(max = 0.6))
    assert(keptIds(strict) === Set.empty)
  }

  test("qual filter") {
    val r = Filters(fixture, Filters.byQual(50.0))
    assert(keptIds(r) === Set("v1", "v3", "v4", "v6"))
  }

  test("depth mask: DP<5 -> missing; row count unchanged; v1 post-state") {
    val masked = Filters.maskByDepth(fixture, 5)
    assert(masked.count() === 6)
    val s = Stats.variantStats(masked)
    val rate = GoldenFixture.byId[Double](s, "call_rate")
    assertNear(rate("v1"), 0.75)
    val counts = GoldenFixture.byId[Seq[Long]](s, "allele_counts")
    assert(counts("v1") === Seq(4L, 2L))
    val het = GoldenFixture.byId[Double](s, "obs_het")
    assertNear(het("v1"), 0.0)
  }

  test("GQ mask: GQ<30 matches depth-mask v1 state; v6/s3 (GQ 33) survives") {
    val masked = Filters.maskByQual(fixture, 30.0)
    val s = Stats.variantStats(masked)
    val rate = GoldenFixture.byId[Double](s, "call_rate")
    assertNear(rate("v1"), 0.75)
    assertNear(rate("v6"), 1.0)
  }

  test("masking never increases call rate (property over fixture)") {
    val before = GoldenFixture.byId[Double](Stats.variantStats(fixture), "call_rate")
    val after = GoldenFixture.byId[Double](Stats.variantStats(Filters.maskByDepth(fixture, 10)), "call_rate")
    for (v <- before.keys) {
      val b = before(v); val a = after(v)
      assert(a.isNaN && b.isNaN || a <= b + 1e-12, s"$v: $b -> $a")
    }
  }

  test("keep samples [s1,s3]: axis-1 projection + metadata update") {
    val (df2, meta2) = Filters.keepSamples(fixture, GoldenFixture.meta, Seq("s1", "s3"))
    assert(meta2.samples === Seq("s1", "s3"))
    val s = Stats.variantStats(df2)
    val counts = GoldenFixture.byId[Seq[Long]](s, "allele_counts")
    assert(counts("v1") === Seq(3L, 1L))
    assertNear(GoldenFixture.byId[Double](s, "call_rate")("v1"), 1.0)
    val gts = df2.filter(col("id") === "v1").select("gt").head().getSeq[Seq[Int]](0)
    assert(gts === Seq(Seq(0, 1), Seq(0, 0)))
  }

  test("remove samples = complement of keep") {
    val (df2, meta2) = Filters.removeSamples(fixture, GoldenFixture.meta, Seq("s0", "s2"))
    assert(meta2.samples === Seq("s1", "s3"))
    assert(df2.count() === 6)
  }

  test("observed FLT_STATS ride the caller's action — no extra aggregation job") {
    val (kept, obs) = Filters.applyObserved(fixture, Filters.byCallRate(0.8))
    assert(kept.select("id").collect().map(_.getString(0)).toSet === Set("v1", "v4", "v6"))
    val m = obs.get // available because the collect above ran the plan
    assert(m("n_kept") === 3L && m("n_total") === 6L)
    // metrics counted PRE-filter rows: the filter was not pushed through
    // the CollectMetrics barrier
    val (kept2, obs2) = Filters.applyObserved(fixture, Filters.byQual(40.0), "q")
    assert(kept2.count() === 5L)
    assert(obs2.get("n_total") === 6L)
  }

  test("observed pipeline: cumulative stage counts from the action itself") {
    val (out, obs) = VariantPipeline(fixture)
      .maskByDepth(5)
      .byCallRate(0.8)
      .byMaf(max = 0.7)
      .runObserved()
    assert(out.select("id").collect().map(_.getString(0)).toSet === Set("v4"))
    val m = obs.get
    assert(m("n_input") === 6L && m("k0") === 2L && m("k1") === 1L)
  }

  test("pipeline: mask then two filters — all stats from one pass") {
    val r = VariantPipeline(fixture)
      .maskByDepth(5)
      .byCallRate(0.8)
      .byMaf(max = 0.7)
      .run()
    assert(r.nInput === 6)
    val stats = r.stats.toMap
    // post-mask call rates: v1 .75, v2 .5, v3 .5, v4 1.0, v5 0, v6 1.0
    assert(stats("call_rate") === Filters.FilterStats(2, 4))
    // of v4 (maf .5) and v6 (maf .875): only v4 survives
    assert(stats("maf") === Filters.FilterStats(1, 1))
    assert(r.variations.select("id").collect().map(_.getString(0)).toSet === Set("v4"))
    // N_KEPT + N_FILTERED_OUT telescopes back to the input count
    assert(stats("call_rate").total === 6)
  }

  test("pipeline: 4-stage composition (qual, regions, biallelic, mac) telescopes") {
    val r = VariantPipeline(fixture)
      .byQual(40.0)                                  // keeps v1 v2 v3 v4 v6 (5)
      .inRegions(Seq(("chr1", 0L, 1000L), ("chr2", 0L, 260L)))  // all 5 remain
      .biallelicOnly()                               // drops v3 → v1 v2 v4 v6 (4)
      .byMac(min = 2)                                // v1(3) v4(4) keep; v2(0) v6(1) drop
      .run()
    assert(r.nInput === 6)
    val stats = r.stats.toMap
    assert(stats("qual").nKept === 5)
    assert(stats("regions").nKept === 5)
    assert(stats("biallelic").nKept === 4)
    assert(stats("mac").nKept === 2)
    // telescoping: each stage's total = previous stage's kept
    assert(r.stats.map(_._2.total) === Seq(6L, 5L, 5L, 4L))
    assert(r.variations.select("id").collect().map(_.getString(0)).toSet === Set("v1", "v4"))
  }

  test("allele counts sum equals called allele total (ploidy invariant)") {
    val df = fixture.select(
      GenotypeKernels.calledAlleleCount(col("gt")).as("t"),
      GenotypeKernels.alleleCounts(col("gt"), size(col("alt")) + 1).as("c"))
    df.collect().foreach { r =>
      assert(r.getLong(0) === r.getSeq[Long](1).sum)
    }
  }
}
