package graft

import org.apache.spark.sql.Row
import graft.core.VariantSchema
import graft.operators.{Filters, Stats}
import scala.util.Random

/** Property tests (seeded-random, SURVEY.md §5.2(3)): the codegen'd
  * gt_stats expression must agree with the interpreted HOF kernels on
  * arbitrary genotype matrices, and the domain invariants must hold. */
class GtStatsPropertySpec extends SparkTestBase {

  import scala.jdk.CollectionConverters._

  /** Random gt matrix: 0-12 samples, ploidy 1-4, alleles in {-1,0,1,2}
    * weighted toward called hom-ref. */
  private def randVariants(rnd: Random, n: Int): Seq[Seq[Seq[Int]]] =
    (0 until n).map { _ =>
      val nSamples = rnd.nextInt(13)
      val ploidy = 1 + rnd.nextInt(4)
      Seq.fill(nSamples)(Seq.fill(ploidy) {
        val r = rnd.nextInt(100)
        if (r < 5) -1 else if (r < 50) 0 else if (r < 85) 1 else 2
      })
    }

  private def mkDf(variants: Seq[Seq[Seq[Int]]]) = {
    val rows = variants.zipWithIndex.map { case (gt, i) =>
      Row("chr1", i.toLong, s"v$i", "A", Seq("T", "G"), 50.0, gt,
        gt.map(_ => 10), gt.map(_ => 99.0), null, null)
    }
    spark.createDataFrame(rows.asJava, VariantSchema.schema)
  }

  test("codegen gt_stats ≡ interpreted HOF kernels on random matrices") {
    for (seed <- 1 to 8) {
      val df = mkDf(randVariants(new Random(seed), 25))
      val fast = Stats.variantStats(df).orderBy("pos").collect()
      val slow = Stats.variantStatsHof(df).orderBy("pos").collect()
      assert(fast.length === slow.length)
      fast.zip(slow).foreach { case (f, h) =>
        for (c <- Seq("call_rate", "maf", "obs_het", "exp_het")) {
          val a = f.getAs[Double](c); val b = h.getAs[Double](c)
          assert(a.isNaN && b.isNaN || math.abs(a - b) < 1e-12,
            s"seed=$seed $c: $a vs $b @ ${f.getString(2)}")
        }
        for (c <- Seq("n_called", "n_missing", "mac", "n_alleles_obs"))
          assert(f.getAs[Long](c) === h.getAs[Long](c), s"seed=$seed $c @ ${f.getString(2)}")
        assert(f.getAs[scala.collection.Seq[Long]]("allele_counts") === h.getAs[scala.collection.Seq[Long]]("allele_counts"),
          s"seed=$seed counts @ ${f.getString(2)}")
      }
    }
  }

  test("invariant: 0 < maf <= 1 when defined; counts non-negative, major <= total") {
    for (seed <- 10 to 14) {
      val stats = Stats.variantStats(mkDf(randVariants(new Random(seed), 20))).collect()
      stats.foreach { r =>
        val counts = r.getAs[scala.collection.Seq[Long]]("allele_counts")
        val maf = r.getAs[Double]("maf")
        if (!maf.isNaN) {
          assert(maf > 0.0 && maf <= 1.0, s"seed=$seed maf=$maf")
          assert(counts.forall(_ >= 0L) && counts.max <= counts.sum)
        } else assert(counts.sum === 0L, s"seed=$seed NaN maf but counts=$counts")
      }
    }
  }

  test("invariant: masking never increases call rate (random thresholds)") {
    for (seed <- 20 to 24) {
      val rnd = new Random(seed)
      val df = mkDf(randVariants(rnd, 15))
      val minDp = rnd.nextInt(61)
      val before = Stats.variantStats(df).select("pos", "call_rate").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val after = Stats.variantStats(Filters.maskByDepth(df, minDp)).select("pos", "call_rate")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      before.foreach { case (pos, b) =>
        val a = after(pos)
        assert(a.isNaN && b.isNaN || a <= b + 1e-12, s"seed=$seed pos $pos: $b -> $a")
      }
    }
  }

  test("codegen MaskGt ≡ HOF zip_with masking on random matrices") {
    import org.apache.spark.sql.functions._
    import graft.functions.{GenotypeKernels, MaskGt}
    for (seed <- 40 to 44) {
      val rnd = new Random(seed)
      val df = mkDf(randVariants(rnd, 20))
        .withColumn("dp", transform(col("gt"), _ => lit(rnd.nextInt(40)).cast("int")))
      val thr = rnd.nextInt(40)
      val fast = df.select(col("pos"), MaskGt.of(col("gt"), col("dp"), thr.toDouble).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[scala.collection.Seq[Int]](1)).toMap
      val slow = df.select(col("pos"), GenotypeKernels.maskGtByDepth(col("gt"), col("dp"), thr).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[scala.collection.Seq[Int]](1)).toMap
      assert(fast.keySet === slow.keySet, s"seed=$seed")
      fast.keySet.foreach { k =>
        assert(fast(k).map(_.toSeq) === slow(k).map(_.toSeq), s"seed=$seed pos=$k thr=$thr")
      }
    }
  }

  test("invariant: filter stats partition the input (N_KEPT + N_OUT = N)") {
    for (seed <- 30 to 34) {
      val rnd = new Random(seed)
      val variants = randVariants(rnd, 20)
      val df = mkDf(variants)
      val r = Filters(df, Filters.byCallRate(rnd.nextDouble()))
      assert(r.stats.total === variants.length.toLong, s"seed=$seed")
      assert(r.kept.count() === r.stats.nKept, s"seed=$seed")
    }
  }
}
