package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Eval, Ivf, Similarity}

/** IVF index LIFECYCLE rehearsal — the ANN-tier analog of
  * [[Curate10MDemo]]: not one search measured once, but the index as
  * it lives over months, at a scale the unit specs never reach:
  *
  *   build (4M base) → 6 drifted appends (×500k, a NEW region of the
  *   space the frozen quantizer never saw) → GDPR deletes (2%) →
  *   compaction → [[Ivf.retrainAtomic]] quantizer refresh
  *
  * After every stage the SAME two probe panels re-measure recall@10
  * against brute-force truth over the CURRENT survivors: `base` probes
  * (the distribution the quantizer was trained on) and `drift` probes
  * (the appended region). The hypothesis under test is the documented
  * append trade ([[Ivf.appendToIndexAtomic]]: quantizer fixed, drift
  * degrades) and the retrain repair ([[Ivf.retrainAtomic]]: cells move
  * to the observed data, recall recovers without re-embedding).
  *
  * Also printed per stage: segment count, the largest cell's share of
  * all index rows, and mean rows scanned per probe at nprobe=8 (probe
  * cells are re-derived driver-side from the ≤k-row centroid table —
  * a bounded envelope, the [[Ivf.train]] convention). Cell skew is the
  * cost story: drifted vectors crowd into the few frontier cells of
  * the stale quantizer, so every drift-region probe scans those giant
  * cells; the refresh redistributes them.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.examples.IvfLifecycleDemo [nBase] [dim]"
  */
object IvfLifecycleDemo {
  private val K = 128 // coarse cells
  private val NProbe = 8
  private val TopK = 10
  // fixed row-scan budget for [[Ivf.topKJoinBudget]] — ~5.8% of the
  // final 6.86M corpus, the work nprobe=8/128 implies under UNIFORM
  // cells. Fixed-nprobe recall conflates quality with scanned rows
  // when the quantizer is stale (drift probes hit giant frontier
  // cells); the budget column holds cost constant so recall across
  // quantizer generations is comparable.
  private val ScanBudget = 400000L

  /** Deterministic clustered vector: center drawn from [c0, c0+nC),
    * coordinates pure hashes (the [[AnnScaleDemo.synthVecs]] shape). */
  private def vecExpr(id: org.apache.spark.sql.Column, dim: Int,
                      c0: Int, nC: Int) = {
    val c = pmod(xxhash64(id), lit(nC.toLong)) + lit(c0.toLong)
    transform(sequence(lit(1), lit(dim)), i => {
      val center = (pmod(c * 7919L + i * 104729L, lit(2000L)) - 1000L)
        .cast("double") / 1000.0
      val noise = (pmod(xxhash64(id, i), lit(600L)) - 300L)
        .cast("double") / 1000.0
      (center + noise).cast("float")
    })
  }

  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(4000000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val batchN = nBase / 8 // 6 appends → +75% corpus growth
    val spark = SparkSession.builder()
      .appName("ivf-lifecycle-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.AtomicCommit

    def mkVecs(ids: org.apache.spark.sql.Dataset[java.lang.Long],
               c0: Int, nC: Int): DataFrame =
      ids.select(col("id").as("vec_id"),
        vecExpr(col("id"), dim, c0, nC).as("embedding"))

    // base draws from centers 0..31; appends from 32..47 (the drift)
    val base = mkVecs(spark.range(nBase), 0, 32).localCheckpoint()
    ScaleDemo.time(s"generate base ${nBase / 1000000}M × $dim")(base.count())

    // fixed probe panels: 100 base-region + 100 drift-region vectors,
    // all of which remain in the corpus for the whole lifecycle
    val probesBase = base.filter(col("vec_id") < 100)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      .localCheckpoint()
    val driftRows = mkVecs(spark.range(nBase, nBase + 6 * batchN), 32, 16)
    val probesDrift = driftRows.filter(col("vec_id") < nBase + 100)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      .localCheckpoint()

    val root = java.nio.file.Files.createTempDirectory("ivflife").toString

    /** recall@10 (panel vs brute-force truth over current survivors),
      * segment count, max-cell share, mean rows scanned per probe. */
    def stageReport(label: String): Unit = {
      val segs = Ivf.indexSegments(spark, root)
      val idx = Ivf.readIndex(spark, root).localCheckpoint()
      val n = idx.count()
      val cents = Ivf.loadCentroids(spark, segs.head)
      val cellSizes = idx.groupBy(col("ivf_cell")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap // ≤ K rows
      def rowsPerProbe(probes: DataFrame): (Double, Double) = {
        val ps = probes.select("p_emb").collect() // 100-row panel
          .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        val scanned = ps.map { p =>
          cents.map { case (cid, c) =>
            var d = 0.0; var i = 0
            while (i < dim) { val t = p(i) - c(i); d += t * t; i += 1 }
            (d, cid)
          }.sortBy(_._1).take(NProbe).map(x => cellSizes.getOrElse(x._2, 0L)).sum
        }
        // budget probing scans the nearest-first cell prefix whose
        // exclusive running count is < ScanBudget (Ivf.budgetCellsExpr)
        val scannedB = ps.map { p =>
          val order = Ivf.probeCells(cents, p, cents.size)
          var s = 0L
          val it = order.iterator
          while (it.hasNext && s < ScanBudget) s += cellSizes.getOrElse(it.next(), 0L)
          s
        }
        (scanned.sum.toDouble / scanned.length,
         scannedB.sum.toDouble / scannedB.length)
      }
      /** (recall at fixed nprobe, recall at fixed row budget) vs ONE
        * brute-force truth pass. */
      def recalls(probes: DataFrame): (Double, Double) = {
        val truth = Similarity.bruteForceTopKJoin(idx, "embedding", probes,
          "probe_id", "p_emb", k = TopK, tieBreak = Seq("vec_id")).localCheckpoint()
        val gotN = Ivf.topKJoin(idx, "embedding", cents, probes,
          "probe_id", "p_emb", k = TopK, nprobe = NProbe, tieBreak = Seq("vec_id"))
        val gotB = Ivf.topKJoinBudget(idx, "embedding", cents, cellSizes, probes,
          "probe_id", "p_emb", k = TopK, maxScanRows = ScanBudget,
          tieBreak = Seq("vec_id"))
        (Eval.meanRecallAtK(gotN, truth, "probe_id", "vec_id", TopK),
         Eval.meanRecallAtK(gotB, truth, "probe_id", "vec_id", TopK))
      }
      val maxShare = if (n == 0) 0.0 else cellSizes.values.max.toDouble / n
      val (rb, rbB) = recalls(probesBase)
      val (rd, rdB) = recalls(probesDrift)
      val (rpp, rppB) = rowsPerProbe(probesDrift)
      println(f"$label%-34s rows=$n%9d segs=${segs.size}%2d " +
        f"recall[base]=$rb%.3f recall[drift]=$rd%.3f " +
        f"maxCell=${maxShare * 100}%.1f%% rows/probe=$rpp%,.0f | " +
        f"@${ScanBudget / 1000}k-budget recall[base]=$rbB%.3f " +
        f"recall[drift]=$rdB%.3f rows/probe=$rppB%,.0f")
    }

    ScaleDemo.time(s"saveIndexAtomic (k=$K, 2 Lloyd rounds)") {
      Ivf.saveIndexAtomic(base, "vec_id", "embedding", root, K, iters = 2)
    }
    stageReport("built (base only)")

    ScaleDemo.time(s"6 × appendToIndexAtomic (${batchN / 1000}k drifted each)") {
      (0 until 6).foreach { b =>
        val lo = nBase + b * batchN
        Ivf.appendToIndexAtomic(
          mkVecs(spark.range(lo, lo + batchN), 32, 16), "embedding", root)
      }
    }
    stageReport("after drifted appends")

    // GDPR wave: delete 2% of all ids (never the probe panels)
    val nTotal = nBase + 6 * batchN
    val doomed = spark.range(nTotal)
      .filter(pmod(col("id"), lit(50L)) === 7 &&
        col("id") >= 200 && !(col("id") >= nBase && col("id") < nBase + 200))
      .select(col("id").as("vec_id"))
    ScaleDemo.time("deleteFromIndexAtomic (2% tombstones)") {
      Ivf.deleteFromIndexAtomic(doomed, root)
    }
    stageReport("after deletes (tombstoned)")

    ScaleDemo.time("compactIndexAtomic") {
      Ivf.compactIndexAtomic(spark, root)
    }
    stageReport("after compaction")

    ScaleDemo.time(s"retrainAtomic (k=$K from committed segments)") {
      Ivf.retrainAtomic(spark, root, "vec_id", "embedding", K, iters = 2)
    }
    stageReport("after quantizer retrain")

    // the 100 TB shape: Lloyd over a 512-points-per-centroid radix
    // subsample instead of the full corpus; the only full passes left
    // are the final re-assign + write that any retrain pays
    ScaleDemo.time(s"retrainAtomic sampled (${512 * K} train rows)") {
      Ivf.retrainAtomic(spark, root, "vec_id", "embedding", K, iters = 2,
        maxTrainRows = Some(512L * K))
    }
    stageReport("after sampled retrain")

    // census sidecar vs scan (r14): the serve path's per-cell census is
    // a manifest sum of per-segment sidecars — time both against the
    // final composition and assert the sum IS the scan
    val sideCensus = ScaleDemo.time("census from _census sidecars") {
      Ivf.indexCellCounts(spark, root)
    }
    val scanCensus = ScaleDemo.time("census from full-index scan") {
      Ivf.cellCounts(Ivf.readIndex(spark, root))
    }
    require(sideCensus == scanCensus, "census sidecar sum != index scan")

    // lifecycle invariants, asserted not eyeballed
    val finalIdx = Ivf.readIndex(spark, root)
    val expected = nTotal - doomed.count()
    val got = finalIdx.count()
    require(got == expected, s"row count $got != expected $expected")
    require(finalIdx.join(doomed, Seq("vec_id"), "left_semi").count() == 0,
      "deleted ids resurfaced after retrain")
    println(s"IVF-LIFECYCLE invariants hold: $got rows, deletes stayed dead, " +
      s"versions=${AtomicCommit.latest(spark, root).map(_._1).getOrElse(-1L)}")
    spark.stop()
  }
}
