package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Ivf, LogReg}

/** Scale rehearsal for the D4 curation pair (Tirumala et al. 2023:
  * SemDeDup then prototypicality pruning) and the hashed-feature
  * logistic gate, at corpus scale with planted ground truth:
  *
  *  1. D4 — a clustered synthetic embedding corpus (200 natural
  *     clusters) with every 50th vector a near-copy of its
  *     predecessor; measure semantic-dedup recall on the planted
  *     copies, then the prune's per-cell floor semantics, then the
  *     one-call [[Dedup.d4]] composition.
  *  2. hashed LR — [[LogReg.trainHashed]] (m=10k buckets) on a
  *     labeled topic corpus: per-iteration gradient-pass wall time
  *     (the m+1-row driver envelope claim, measured) and holdout
  *     accuracy of the map-only scorer.
  *
  * The quadratic-control claim under test in stage 1: within-cell
  * pair volume is n²/(2k), so k is the knob — at the demo's n=250k /
  * k=512 that is ~6·10⁷ scored pairs, NOT the 3·10¹⁰ of all-pairs.
  * Timings comparable within one run only (README "Timing noise").
  *
  * Run: sbt "runMain graft.examples.D4ScaleDemo [nVecs] [nDocs]". */
object D4ScaleDemo {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(250000L)
    val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .appName("d4-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 16

    // ── 1. D4 ────────────────────────────────────────────────────────
    // Every 50th vector copies its predecessor's cluster AND noise
    // seed, plus a ±0.005 perturbation → cos ≈ 0.99999 with the source;
    // ordinary same-cluster neighbours differ by ±0.5/dim noise on a
    // ~unit center (cos ≈ 0.8), far below tau = 0.99.
    val id = col("id")
    val src = when(pmod(id, lit(50L)) === 0 && id > 0, id - 1).otherwise(id)
    val vec = transform(sequence(lit(1), lit(dim)), j => {
      val c = pmod(src, lit(200L))
      val center = (pmod(c * 7919L + j * 104729L, lit(2000L)) - 1000L)
        .cast("double") / 1000.0
      val noise = (pmod(xxhash64(src, j), lit(1000L)) - 500L).cast("double") / 1000.0
      val wiggle = (pmod(xxhash64(id, j), lit(10L)) - 5L).cast("double") / 1000.0
      (center + noise + wiggle).cast("float")
    })
    val corpus = spark.range(nVecs)
      .select(id.as("vec_id"), vec.as("embedding")).localCheckpoint()
    val planted = nVecs / 50
    ScaleDemo.time(s"generate ${nVecs / 1000}k × $dim vectors")(corpus.count())

    var centroids: Seq[(Int, Array[Double])] = null
    ScaleDemo.time("IVF train (k=512, 2 rounds)") {
      centroids = Ivf.train(corpus, "vec_id", "embedding", k = 512, iters = 2)
    }

    var afterDedup = 0L
    ScaleDemo.time("semanticDedup tau=0.99") {
      afterDedup = Dedup.semanticDedup(corpus, "vec_id", "embedding",
        centroids, tau = 0.99).count()
    }
    val caught = nVecs - afterDedup
    println(f"    planted near-copies $planted%d, dropped $caught%d " +
      f"(recall ${caught.toDouble / planted}%.3f; >1.0 = natural twins)")

    var afterPrune = 0L
    ScaleDemo.time("prototypicalityPrune 10%") {
      afterPrune = Dedup.prototypicalityPrune(corpus, "vec_id", "embedding",
        centroids, dropFrac = 0.1).count()
    }
    println(f"    survivors $afterPrune%d / $nVecs%d " +
      f"(${100.0 * afterPrune / nVecs}%.1f%% ≥ 90%% by floor semantics)")

    ScaleDemo.time("d4 (dedup + prune, one call)") {
      println(s"    d4 survivors = ${
        Dedup.d4(corpus, "vec_id", "embedding", centroids,
          tau = 0.99, dropFrac = 0.1).count()}")
    }

    // ── 2. hashed LR ─────────────────────────────────────────────────
    // 30-token docs, every 5th ON-topic (last 10 tokens from a 40-word
    // topic vocabulary) — linearly separable through the bucket hash.
    val onTopic = pmod(id, lit(5L)) === 0
    val body = transform(sequence(lit(0), lit(29)), w =>
      when(onTopic && w >= 20,
        concat(lit("topic"), pmod(abs(xxhash64(id, w)), lit(40L))))
        .otherwise(concat(lit("t"), pmod(abs(xxhash64(id, w)), lit(50021L)))))
    val docs = spark.range(nDocs)
      .select(id.as("doc_id"), array_join(body, " ").as("text"),
        onTopic.cast("double").as("y"))
      .localCheckpoint()
    ScaleDemo.time(s"generate ${nDocs / 1000}k labeled docs")(docs.count())

    val train = docs.filter(pmod(col("doc_id"), lit(10L)) < 8)
    val hold = docs.filter(pmod(col("doc_id"), lit(10L)) >= 8)
    var model: LogReg.HashedModel = null
    ScaleDemo.time("trainHashed m=10k, 3 iters") {
      model = LogReg.trainHashed(train, "text", col("y"), m = 10000,
        lr = 0.5, iters = 3)
    }
    ScaleDemo.time("scoreHashed holdout (map-only)") {
      val acc = LogReg.scoreHashed(hold, "text", model)
        .agg(avg((col("pred") === col("y").cast("int")).cast("double")))
        .head().getDouble(0)
      println(f"    holdout accuracy = $acc%.4f")
    }
    spark.stop()
  }
}
