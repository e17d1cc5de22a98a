package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Kinship

/** Scale rehearsal for the kinship/PCA surface: a deterministic
  * synthetic diploid cohort generated ON EXECUTORS (no driver collect,
  * no RNG), timing the one-pass GramianAgg GRM at a cohort width where
  * the exploded-pairs twin is already infeasible, and the exploded twin
  * at a width where both run — the §2.3-style wide/narrow switchover,
  * measured. Timings comparable WITHIN one run only (shared box).
  * Run: sbt "runMain graft.examples.KinshipScaleDemo [nVariants] [nSamples]". */
object KinshipScaleDemo {

  /** Synthetic biallelic cohort: two planted populations (sample halves
    * lean to opposite alleles on half the variants) plus deterministic
    * per-(variant, sample) mixing and ~5% missing calls. */
  def synthGt(spark: SparkSession, nVariants: Long, nSamples: Int): DataFrame =
    spark.range(nVariants).select(col("id").as("vid"))
      .withColumn("gt", transform(sequence(lit(0), lit(nSamples - 1)), sIdx => {
        val h = pmod(col("vid") * 7919L + sIdx * 104729L + col("vid") * sIdx, lit(1000L))
        // population lean as a THRESHOLD shift (a modular shift of a
        // uniform value stays uniform — no structure): on even variants
        // the first half of the cohort calls alt at p≈0.35, the second
        // at p≈0.65 — the divergence PCA must find
        val thr = lit(500L) + when(pmod(col("vid"), lit(2)) === 0,
          when(sIdx < nSamples / 2, lit(150L)).otherwise(lit(-150L))).otherwise(lit(0L))
        when(h < 50, array(lit(-1), lit(-1))) // ~5% missing
          .otherwise(array(
            when(pmod(h * 13L, lit(1000L)) < thr, lit(0)).otherwise(lit(1)),
            when(pmod(h * 7L, lit(1000L)) < thr, lit(0)).otherwise(lit(1))))
      }))

  def main(args: Array[String]): Unit = {
    val nVariants = args.headOption.map(_.toLong).getOrElse(200000L)
    val nSamples = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .appName("kinship-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // wide cohort: gramian path only (the exploded twin would emit
    // S(S+1)/2 ≈ 2M pair rows PER VARIANT here)
    val wide = synthGt(spark, nVariants, nSamples).localCheckpoint()
    ScaleDemo.time(s"generate ${nVariants / 1000}k variants × $nSamples samples")(
      wide.count())
    var tri: (Int, Array[Double], Double) = null
    ScaleDemo.time(s"GramianAgg GRM ($nSamples samples → " +
      s"${nSamples.toLong * (nSamples + 1) / 2 / 1000}k-entry buffer)") {
      tri = Kinship.grmTriangle(wide, "gt")
    }
    println(s"    den=${tri._3.round} diag[0]=${(tri._2(0) / tri._3).formatted("%.4f")}")
    ScaleDemo.time(s"eigSym PCA ($nSamples×$nSamples, top 10, from the computed GRM)") {
      val (eig, proj) = Kinship.pcaFromTriangle(spark, tri, 10)
      val pc1 = proj.orderBy(col("sample_idx")).collect().map(_.getSeq[Double](1).head)
      val (a, b) = (pc1.take(nSamples / 2), pc1.drop(nSamples / 2))
      // sign-majority split (a strict max<min check fails on single
      // outlier samples even at 5σ group separation)
      val split = (a.count(_ > 0) + b.count(_ <= 0)).toDouble / nSamples
      val frac = math.max(split, 1.0 - split)
      println(f"    λ=${eig.take(3).map(v => f"$v%.1f").mkString(",")} " +
        f"PC1 sign-splits planted halves at ${frac * 100}%.1f%%")
    }

    // IBS at the same width: the exploded pair form would emit
    // s(s-1)/2 ≈ 500k terms PER VARIANT here; the gramian form is six
    // matrix aggregates over indicator arrays (one scan, no explode)
    ScaleDemo.time(s"ibsGramian ($nSamples samples — exploded twin would " +
      s"shuffle ${nSamples.toLong * (nSamples - 1) / 2 / 1000}k terms/variant)") {
      val top = graft.operators.Stats.ibsGramian(wide, "gt")
        .orderBy(col("si"), col("sj")).head()
      println(s"    ibs(0,1)=${top.getLong(2)}/${top.getLong(3)}")
    }

    // biobank-width cohort: the driver triangle is infeasible here
    // (50k samples → 10 GB of S(S+1)/2 doubles), so this is the
    // gramian-free escalation's rehearsal — pcaRandomized holds only
    // S×m doubles anywhere (m = k + oversample; ~5 MB at 50k), and
    // each iteration is one ProjOuterAgg pass over the variants
    val nWide = args.drop(2).headOption.map(_.toInt).getOrElse(50000)
    val vWide = 1000L
    val huge = synthGt(spark, vWide, nWide).localCheckpoint()
    ScaleDemo.time(s"generate ${vWide} variants × ${nWide / 1000}k samples")(
      huge.count())
    ScaleDemo.time(s"pcaRandomized ($nWide samples — driver triangle would " +
      s"need ${nWide.toLong * (nWide + 1) / 2 * 8 / (1 << 20)} MB; S×m state is " +
      s"${nWide.toLong * 13 * 8 / (1 << 20)} MB)") {
      val (eig, proj) = Kinship.pcaRandomized(huge, "gt", k = 5, iters = 6)
      val pc1 = proj.orderBy(col("sample_idx")).collect().map(_.getSeq[Double](1).head)
      val (a, b) = (pc1.take(nWide / 2), pc1.drop(nWide / 2))
      val split = (a.count(_ > 0) + b.count(_ <= 0)).toDouble / nWide
      val frac = math.max(split, 1.0 - split)
      println(f"    λ=${eig.take(3).map(v => f"$v%.1f").mkString(",")} " +
        f"PC1 sign-splits planted halves at ${frac * 100}%.1f%%")
    }

    // blocked GRM store past the driver-triangle default cap (10k):
    // peak memory is one blockSize² block PER CONCURRENT TASK (33 MB
    // at 2048) — block size trades per-task memory against job count,
    // and local[N] runs N tasks of one job in ONE shared heap, so the
    // single box wants modest blocks; a real cluster spreads the same
    // buffers across executors and takes 4096-8192. Scans are
    // column-pruned slices of the blocked parquet, zero shuffle. No
    // checkpoint needed: grmBlocksWrite materializes its own blocked
    // parquet, so the synthetic source is scanned exactly once.
    val nBlocked = 12288
    val blocked = synthGt(spark, vWide, nBlocked)
    val grmPath = java.nio.file.Files.createTempDirectory("grm_blocks").toString
    ScaleDemo.time(s"grmBlocksWrite ($nBlocked samples, blockSize=2048 → " +
      s"${((nBlocked + 2047) / 2048) * ((nBlocked + 2047) / 2048 + 1) / 2} block jobs)") {
      Kinship.grmBlocksWrite(blocked, grmPath, "gt", blockSize = 2048)
    }
    ScaleDemo.time("grmFromBlocks long-form view (count only — the full " +
      "S² explode is the consumer's choice)") {
      val n = Kinship.grmFromBlocks(spark, grmPath).count()
      println(s"    $n kinship entries")
    }

    // blocked pair-count store (IBS + KING past the ~9k gramian
    // envelope): one indicator parquet, B(B+1)/2 block-pair jobs of
    // twelve OuterSums each, long-form views map-only off the store
    // blockSize 1024 here, not 2048: each job holds TWELVE blockSize²
    // buffers per task (vs grmBlocksWrite's one), so the single shared
    // local[N] heap wants the next block size down — 12 × 8.4 MB =
    // 100 MB/task; a real cluster spreads tasks and takes 2048
    val nPair = 6144
    val pairGt = synthGt(spark, vWide, nPair)
    val pairPath = java.nio.file.Files.createTempDirectory("pair_blocks").toString
    ScaleDemo.time(s"PairBlocks.write ($nPair samples, blockSize=1024 → " +
      s"${((nPair + 1023) / 1024) * ((nPair + 1023) / 1024 + 1) / 2} block jobs × 12 terms)") {
      graft.operators.PairBlocks.write(pairGt, pairPath, "gt", blockSize = 1024)
    }
    ScaleDemo.time("ibsFromBlocks + kingFromBlocks long views (count only)") {
      val ni = graft.operators.PairBlocks.ibsFromBlocks(spark, pairPath).count()
      val nk = graft.operators.PairBlocks.kingFromBlocks(spark, pairPath).count()
      println(s"    $ni ibs pairs, $nk king pairs")
    }

    // narrow cohort: both paths run — the switchover measurement
    val nNarrow = 96
    val narrow = synthGt(spark, nVariants, nNarrow).localCheckpoint()
    narrow.count()
    ScaleDemo.time(s"GramianAgg GRM ($nNarrow samples)") {
      Kinship.grmTriangle(narrow, "gt")
    }
    ScaleDemo.time(s"exploded grmPairs ($nNarrow samples, " +
      s"${nNarrow * (nNarrow + 1) / 2} pairs/variant)") {
      Kinship.grmPairs(narrow, "gt").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
