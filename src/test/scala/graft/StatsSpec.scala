package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

class StatsSpec extends SparkTestBase {

  private def fixture = GoldenFixture.df(spark)

  test("long view: one row per (variant, sample), gt/dp/gq aligned") {
    val lv = Stats.longView(fixture)
    assert(lv.count() === 24) // 6 variants × 4 samples
    val v1s1 = lv.filter(col("id") === "v1" && col("sample_idx") === 1).head()
    assert(v1s1.getAs[Seq[Int]]("gt") === Seq(0, 1))
    assert(v1s1.getAs[Int]("dp") === 3)
    assert(v1s1.getAs[Double]("gq") === 20.0)
  }

  test("per-sample depth stats (axis-1 aggregation)") {
    val s = Stats.sampleDepthStats(fixture).collect()
    assert(s.length === 4)
    val s0 = s.find(_.getAs[Int]("sample_idx") == 0).get
    // s0 depths: 10, 12, 7, 30, 0, 15
    assert(s0.getAs[Long]("n") === 6)
    assertNear(s0.getAs[Double]("mean_dp"), (10 + 12 + 7 + 30 + 0 + 15) / 6.0)
    assert(s0.getAs[Int]("min_dp") === 0)
    assert(s0.getAs[Int]("max_dp") === 30)
  }

  test("fast per-sample depth stats (Aggregator) ≡ long-view aggregation") {
    val slow = Stats.sampleDepthStats(fixture).collect()
      .map(r => r.getAs[Int]("sample_idx") -> (r.getAs[Long]("n"), r.getAs[Double]("mean_dp"), r.getAs[Int]("min_dp"), r.getAs[Int]("max_dp"))).toMap
    val fastRows = Stats.sampleDepthStatsFast(fixture).collect()
    val fast = fastRows
      .map(r => r.getAs[Int]("sample_idx") -> (r.getAs[Long]("n"), r.getAs[Double]("mean_dp"), r.getAs[Int]("min_dp"), r.getAs[Int]("max_dp"))).toMap
    assert(fast === slow)
    // approx median is EXACT below depth 256 (unit bins): lower median of
    // each sample's called depths, computed here from the long view
    val exactMed = Stats.longView(fixture).filter(col("dp") >= 0)
      .collect().groupBy(_.getAs[Int]("sample_idx"))
      .map { case (s, rows) =>
        val ds = rows.map(_.getAs[Int]("dp")).sorted
        s -> ds((ds.length - 1) / 2).toDouble
      }
    fastRows.foreach { r =>
      assert(r.getAs[Double]("median_dp_approx") === exactMed(r.getAs[Int]("sample_idx")))
    }
  }

  test("DepthHist: log-bin median bounded error above 256, exact below") {
    import graft.functions.DepthHist
    // every depth below 256 maps to its own bin and reps back exactly
    (0 until 256).foreach(d => assert(DepthHist.repOf(DepthHist.binOf(d)) === d.toDouble))
    // above 256: representative within 1/8 relative error, bins monotone
    Seq(256, 300, 1000, 5000, 123456, 10000000, Int.MaxValue).foreach { d =>
      val rep = DepthHist.repOf(DepthHist.binOf(d))
      assert(math.abs(rep - d) <= d / 8.0 + 1, s"d=$d rep=$rep")
    }
    assert(DepthHist.binOf(255) < DepthHist.binOf(256))
    assert(DepthHist.binOf(511) < DepthHist.binOf(512))
  }

  test("histogram: fixed bins, clamped edges, NaN dropped") {
    val h = Stats.histogram(
      Stats.variantStats(fixture), col("call_rate"), 0.0, 1.0, nBins = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // call rates: 1.0 .75 .75 1.0 0.0 1.0 → bin0: {0.0}, bin3: {.75,.75,1,1,1}
    assert(h(0L) === 1L)
    assert(h(3L) === 5L) // 1.0 clamps into the top bin like numpy's inclusive right edge
    assert(h.values.sum === 6L)
  }

  test("dataset summary: one job, NaN-excluded means") {
    val r = Stats.datasetSummary(fixture).head()
    assert(r.getAs[Long]("n_variants") === 6)
    // mean call rate over all 6 (none NaN): (1+.75+.75+1+0+1)/6
    assertNear(r.getAs[Double]("mean_call_rate"), 4.5 / 6.0)
    // maf NaN for v5 → mean over 5
    assertNear(r.getAs[Double]("mean_maf"), (0.625 + 1.0 + 0.5 + 0.5 + 0.875) / 5.0)
  }

  test("Hudson F_ST: hand-computed variants, null where undefined") {
    import spark.implicits._
    val df = Seq(
      // pA: 0,0,0,1 → n=4 p=.25; pB: 1,1,1,1 → n=4 p=1
      // num = .5625 − .25·.75/3 − 0 = .5; den = .25·0 + 1·.75 = .75
      (1, Seq(Seq(0, 0), Seq(0, 1), Seq(1, 1), Seq(1, 1))),
      // fixed same allele both groups → num 0, den 0 → fst null
      (2, Seq(Seq(0, 0), Seq(0, 0), Seq(0, 0), Seq(0, 0))),
      // pA sample missing: n=2 p=.5; pB: n=4 p=.25
      // num = .0625 − .5·.5/1 − .25·.75/3 = −.25; den = .375+.125 = .5
      (3, Seq(Seq(-1, -1), Seq(0, 1), Seq(0, 1), Seq(0, 0))),
      // group A entirely missing → n=0 → all null
      (4, Seq(Seq(-1, -1), Seq(-1, -1), Seq(0, 1), Seq(0, 0))))
      .toDF("vid", "gt")
    val r = Stats.fstHudson(df, "gt", Seq(0, 1), Seq(2, 3))
      .select("vid", "fst_num", "fst_den", "fst")
      .collect().map(x => x.getInt(0) -> x).toMap
    assertNear(r(1).getDouble(1), 0.5)
    assertNear(r(1).getDouble(2), 0.75)
    assertNear(r(1).getDouble(3), 2.0 / 3.0)
    assertNear(r(2).getDouble(1), 0.0)
    assertNear(r(2).getDouble(2), 0.0)
    assert(r(2).isNullAt(3)) // den = 0 → undefined
    assertNear(r(3).getDouble(1), -0.25)
    assertNear(r(3).getDouble(2), 0.5)
    assertNear(r(3).getDouble(3), -0.5)
    assert(r(4).isNullAt(1) && r(4).isNullAt(2) && r(4).isNullAt(3))
  }

  test("Nei identity terms and genome-wide D from hand-computed frequencies") {
    import spark.implicits._
    val df = Seq(
      // v1: pA=.25 (alleles 0,0,0,1), pB=1 → jx=.625, jy=1, jxy=.25
      (1, Seq(Seq(0, 0), Seq(0, 1), Seq(1, 1), Seq(1, 1))),
      // v2: A sample missing → pA=.5 (n=2), pB=.25 → jx=.5, jy=.625, jxy=.5
      (2, Seq(Seq(-1, -1), Seq(0, 1), Seq(0, 0), Seq(0, 1))),
      // v3: group A entirely missing → all three NULL (excluded locus)
      (3, Seq(Seq(-1, -1), Seq(-1, -1), Seq(0, 1), Seq(0, 0))))
      .toDF("vid", "gt")
    val r = Stats.neiIdentity(df, "gt", Seq(0, 1), Seq(2, 3))
      .select("vid", "jx", "jy", "jxy")
      .collect().map(x => x.getInt(0) -> x).toMap
    assertNear(r(1).getDouble(1), 0.625)
    assertNear(r(1).getDouble(2), 1.0)
    assertNear(r(1).getDouble(3), 0.25)
    assertNear(r(2).getDouble(1), 0.5)
    assertNear(r(2).getDouble(2), 0.625)
    assertNear(r(2).getDouble(3), 0.5)
    assert(r(3).isNullAt(1) && r(3).isNullAt(2) && r(3).isNullAt(3))
    // D over the two informative loci: means jx=.5625 jy=.8125 jxy=.375
    val expected = -math.log(0.375 / math.sqrt(0.5625 * 0.8125))
    assertNear(Stats.neiD(df, "gt", Seq(0, 1), Seq(2, 3)), expected)
    // identical groups → I = 1 → D = 0
    val same = Seq(
      (1, Seq(Seq(0, 1), Seq(1, 1), Seq(0, 1), Seq(1, 1))),
      (2, Seq(Seq(0, 0), Seq(0, 1), Seq(0, 0), Seq(0, 1)))).toDF("vid", "gt")
    assertNear(Stats.neiD(same, "gt", Seq(0, 1), Seq(2, 3)), 0.0)
  }

  test("Tajima components and D on a hand-computed complete-sites cohort") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(Seq(0, 0), Seq(0, 1))),   // c0=3 c1=1: segregating, c0·c1=3
      (2, Seq(Seq(0, 1), Seq(1, 1))),   // c0=1 c1=3: segregating, 3
      (3, Seq(Seq(0, 0), Seq(0, 0))),   // monomorphic complete site
      (4, Seq(Seq(-1, -1), Seq(0, 1)))) // missing call → excluded
      .toDF("vid", "gt")
    val c = Stats.tajimaComponents(df, "gt").head()
    assert(c.getLong(0) === 4L)  // n_hap
    assert(c.getLong(1) === 3L)  // complete sites
    assert(c.getLong(2) === 2L)  // segregating
    assert(c.getLong(3) === 6L)  // Σ c0·c1
    // π = 6/C(4,2) = 1.0; θ_W = 2/a1; D per Tajima 1989 eq. 38
    assertNear(Stats.tajimaD(df, "gt").get, -0.709896167879475, 1e-12)
    // no segregating site → undefined
    assert(Stats.tajimaD(df.filter(col("vid") === 3), "gt").isEmpty)
  }

  test("LD pairs: composite r² from hand-computed dosage sums") {
    import spark.implicits._
    val df = Seq(
      // dosages: v1 [0,1,2,-1], v2 [1,1,2,0], v3 [1,1,1,1] (monomorphic)
      (1L, Seq(Seq(0, 0), Seq(0, 1), Seq(1, 1), Seq(-1, -1))),
      (2L, Seq(Seq(0, 1), Seq(0, 1), Seq(1, 1), Seq(0, 0))),
      (3L, Seq(Seq(0, 1), Seq(1, 0), Seq(0, 1), Seq(1, 0))))
      .toDF("pos", "gt")
    val p = Stats.ldPairs(df, "gt", "pos", 2L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(p.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L))) // every pair once
    val v12 = p((1L, 2L)) // complete samples 0-2: x=[0,1,2] y=[1,1,2]
    assert(v12.getAs[Long]("n_called") === 3L)
    assert(v12.getAs[Long]("ld_num") === 3L)  // 3·5 − 3·4
    assert(v12.getAs[Long]("ld_vx") === 6L)   // 3·5 − 9
    assert(v12.getAs[Long]("ld_vy") === 2L)   // 3·6 − 16
    assertNear(v12.getAs[Double]("r2"), 0.75) // 9 / 12
    assert(p((1L, 3L)).isNullAt(6)) // v3 monomorphic → vy = 0 → null
    assert(p((2L, 3L)).isNullAt(6))
  }

  test("LD prune drops the later variant of each high-LD pair") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Seq(0, 0), Seq(0, 1), Seq(1, 1), Seq(-1, -1))),
      (2L, Seq(Seq(0, 1), Seq(0, 1), Seq(1, 1), Seq(0, 0))),
      (3L, Seq(Seq(0, 1), Seq(1, 0), Seq(0, 1), Seq(1, 0))))
      .toDF("pos", "gt")
    // only pair (1,2) exceeds 0.7 (r² = .75) → pos 2 dropped, 1 and 3 kept
    val kept = Stats.ldPrune(df, "gt", "pos", 2L, 0.7)
      .select("pos").as[Long].collect().sorted
    assert(kept === Array(1L, 3L))
  }

  test("LD banding: far-apart variants never pair") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Seq(0, 0), Seq(1, 1))),
      (100L, Seq(Seq(0, 0), Seq(1, 1))))
      .toDF("pos", "gt")
    assert(Stats.ldPairs(df, "gt", "pos", 5L).count() === 0L)
  }

  test("mendelErrors: hand trios — consistent, impossible, and skipped-missing") {
    import spark.implicits._
    // samples: 0=child 1=father 2=mother
    val df = Seq(
      // child 0/1, father 0/0, mother 1/1 → consistent
      (1L, Seq(Seq(0, 1), Seq(0, 0), Seq(1, 1))),
      // child 1/1, father 0/0, mother 1/1 → father can't give a 1
      (2L, Seq(Seq(1, 1), Seq(0, 0), Seq(1, 1))),
      // child 0/0, father 1/1, mother 0/1 → error (father gives only 1)
      (3L, Seq(Seq(0, 0), Seq(1, 1), Seq(0, 1))),
      // father missing → skipped entirely
      (4L, Seq(Seq(0, 1), Seq(-1, -1), Seq(1, 1))),
      // hom child needs the allele from BOTH parents: 0/0 with 0/1 + 0/1 ok
      (5L, Seq(Seq(0, 0), Seq(0, 1), Seq(0, 1)))).toDF("pos", "gt")
    val out = Stats.mendelErrors(df, "gt", "pos", Seq((0, 1, 2)))
      .orderBy("pos").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 0L, 0L), (5L, 1L, 0L)))
  }

  test("mendelErrors: haploid child (chrY/male-X) skips like a missing call — no NULL poisoning, no ANSI throw") {
    import spark.implicits._
    val df = Seq(
      // haploid child call → trio skipped at this variant (the c1/c2
      // rule needs a diploid child); the row must still count the
      // OTHER diploid trio, not go null
      (1L, Seq(Seq(0), Seq(0, 0), Seq(1, 1), Seq(1, 1), Seq(0, 0), Seq(1, 1))),
      // both trios diploid: trio 1 consistent, trio 2 errors
      (2L, Seq(Seq(0, 1), Seq(0, 0), Seq(1, 1), Seq(1, 1), Seq(0, 0), Seq(0, 0)))
    ).toDF("pos", "gt")
    val out = Stats.mendelErrors(df, "gt", "pos", Seq((0, 1, 2), (3, 4, 5)))
      .orderBy("pos").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 1L), (2L, 2L, 1L)))
  }

  test("ibsPairs/kingPairs: 0/1-sample cohorts yield zero pair rows (sequence would count DOWN)") {
    import spark.implicits._
    // one sample → sequence(0, -1) = [0,-1] without the guard: a bogus
    // self-pair plus an index-0 element_at that throws
    val one = Seq((1L, Seq(Seq(0, 1)))).toDF("pos", "gt")
    assert(Stats.ibsPairs(one).count() === 0L)
    assert(Stats.kingPairs(one).count() === 0L)
    // mixed widths: the 1-sample variant contributes nothing, the
    // 3-sample variant still produces its 3 pairs
    val mixed = Seq(
      (1L, Seq(Seq(0, 1))),
      (2L, Seq(Seq(0, 1), Seq(1, 1), Seq(0, 0)))).toDF("pos", "gt")
    assert(Stats.ibsPairs(mixed).count() === 3L)
  }

  test("mendelErrors (per-trio dosage): haploid calls skip like missing — no spurious male-X errors") {
    import spark.implicits._
    // haploid son [0] with hom-alt mother: the legitimate male-X
    // transmission the diploid dosage rule would flag as an error
    val df = Seq(
      (1L, Seq(Seq(0), Seq(1), Seq(1, 1))),
      // diploid variant: consistent
      (2L, Seq(Seq(0, 1), Seq(0, 0), Seq(1, 1)))).toDF("pos", "gt")
    val out = Stats.mendelErrors(df, "gt", Seq((0, 1, 2)))
      .select("n_tested", "n_errors").as[(Long, Long)].head()
    assert(out === ((1L, 0L)), s"haploid variant must be skipped, got $out")
  }

  test("frohSummary: ratio over CALLED sites; zero-run samples surface with froh 0") {
    import spark.implicits._
    // sample 0: 3-site run + lone hom among 5 called (site 6 missing)
    // sample 1: never homozygous → 0 runs, froh 0
    val df = Seq(
      (1L, Seq(Seq(0, 0), Seq(0, 1))),
      (2L, Seq(Seq(1, 1), Seq(0, 1))),
      (3L, Seq(Seq(0, 0), Seq(1, 0))),
      (4L, Seq(Seq(0, 1), Seq(0, 1))),
      (5L, Seq(Seq(1, 1), Seq(0, 1))),
      (6L, Seq(Seq(-1, -1), Seq(0, 1)))).toDF("pos", "gt")
    val out = Stats.frohSummary(df, "gt", "pos", minSites = 3)
      .orderBy("sample_idx")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((0, 5L, 1L, 3L, 3.0 / 5.0), (1, 6L, 0L, 0L, 0.0)))
  }

  test("rohSegments: hand-planted runs break on het AND missing, minSites gates") {
    import spark.implicits._
    // sample 0 track over 8 sites: hom hom hom HET hom MISS hom hom
    //   → runs (1..3, 3 sites) and (7..8, 2 sites); the lone site 5 run
    //     is cut by minSites = 2
    // sample 1: all het → no runs
    val df = Seq(
      (1L, Seq(Seq(0, 0), Seq(0, 1))),
      (2L, Seq(Seq(1, 1), Seq(0, 1))),
      (3L, Seq(Seq(0, 0), Seq(1, 0))),
      (4L, Seq(Seq(0, 1), Seq(0, 1))),
      (5L, Seq(Seq(1, 1), Seq(0, 1))),
      (6L, Seq(Seq(-1, -1), Seq(0, 1))),
      (7L, Seq(Seq(0, 0), Seq(0, 1))),
      (8L, Seq(Seq(0, 0), Seq(1, 0)))).toDF("pos", "gt")
    val out = Stats.rohSegments(df, "gt", "pos", minSites = 2)
      .orderBy("sample_idx", "start_pos")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out === Seq((0, 1L, 3L, 3L), (0, 7L, 8L, 2L)))
    // minSites = 1 recovers the singleton run between het and missing
    val all = Stats.rohSegments(df, "gt", "pos", minSites = 1)
      .orderBy("sample_idx", "start_pos")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(all === Seq((0, 1L, 3L, 3L), (0, 5L, 5L, 1L), (0, 7L, 8L, 2L)))
  }
}
