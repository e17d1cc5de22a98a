package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Eval, Ivf, Pq, Similarity}

/** ANN tier rehearsal: one synthetic clustered corpus, every search
  * tier measured against the SAME brute-force ground truth with the
  * library's recall@k operator (Eval.recallAtK) — the tuning loop a
  * user of the index tiers actually runs, wired end-to-end:
  *
  *   brute force (truth) → LSH buckets → IVF float → IVF int8+rerank
  *   → IVF PQ+rerank
  *
  * Prints recall@10, wall time, and the on-disk bytes of the three
  * persisted index tiers (float / int8 / PQ). Timings comparable
  * WITHIN one run only. Run:
  * sbt "runMain graft.examples.AnnScaleDemo [nVecs] [dim] [nProbes]". */
object AnnScaleDemo {

  /** Deterministic clustered corpus: 32 planted centers (pure id
    * hashes), each vector = its center + bounded hash noise. */
  def synthVecs(spark: SparkSession, n: Long, dim: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("embedding", transform(sequence(lit(1), lit(dim)), i => {
        val c = pmod(col("vec_id"), lit(32L))
        val center = (pmod(c * 7919L + i * 104729L, lit(2000L)) - 1000L).cast("double") / 1000.0
        val noise = (pmod(xxhash64(col("vec_id"), i), lit(600L)) - 300L)
          .cast("double") / 1000.0
        (center + noise).cast("float")
      }))

  private def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    val s = java.nio.file.Files.walk(root)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val nProbes = args.drop(2).headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .appName("ann-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = synthVecs(spark, n, dim).localCheckpoint()
    ScaleDemo.time(s"generate ${n / 1000}k × $dim clustered vectors")(corpus.count())
    val probes = corpus.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      .localCheckpoint()

    var truth: DataFrame = null
    ScaleDemo.time(s"brute-force truth ($nProbes probes × ${n / 1000}k, k=10)") {
      truth = Similarity.bruteForceTopKJoin(corpus, "embedding", probes,
        "probe_id", "p_emb", k = 10, tieBreak = Seq("vec_id")).localCheckpoint()
      truth.count()
    }

    def report(name: String)(result: => DataFrame): Unit =
      ScaleDemo.time(name) {
        val r = Eval.meanRecallAtK(result, truth, "probe_id", "vec_id", 10)
        println(f"    recall@10 = $r%.3f")
      }

    report(s"LSH topKJoin (16-bit buckets, multi-probe)") {
      Similarity.lshTopKJoin(corpus, "embedding", probes, "probe_id", "p_emb",
        dim = dim, k = 10, bits = 16, multiProbe = true, tieBreak = Seq("vec_id"))
    }

    var centroids: Seq[(Int, Array[Double])] = null
    ScaleDemo.time("IVF train (k=64 cells, 2 Lloyd rounds, spread init)") {
      centroids = Ivf.train(corpus, "vec_id", "embedding", k = 64, iters = 2,
        spreadInit = true)
    }
    val base = java.nio.file.Files.createTempDirectory("annidx")
    val (fPath, qPath, pqPath) =
      (s"$base/float", s"$base/int8", s"$base/pq")
    ScaleDemo.time("persist float index") {
      Ivf.saveIndex(corpus.select("vec_id", "embedding"), "embedding", centroids, fPath)
    }
    report("IVF float topKJoin (nprobe 8/64)") {
      Ivf.topKJoin(spark.read.parquet(fPath), "embedding", centroids, probes,
        "probe_id", "p_emb", k = 10, nprobe = 8, tieBreak = Seq("vec_id"))
    }

    ScaleDemo.time("persist int8 index") {
      Ivf.saveIndexQ(corpus, "vec_id", "embedding", centroids, qPath)
    }
    report("IVF int8 topKJoinQ + exact re-rank (nprobe 8, rerank 4×)") {
      Ivf.topKJoinQ(spark.read.parquet(qPath), "vec_id", centroids, probes,
        "probe_id", "p_emb", k = 10, nprobe = 8, rerank = Some((corpus, "embedding")))
    }

    var books: Pq.Codebooks = null
    ScaleDemo.time("PQ train (m=8, ksub=64, 20k-row sample)") {
      books = Pq.train(corpus.filter(col("vec_id") % lit(math.max(1L, n / 20000)) === 0),
        "vec_id", "embedding", m = 8, ksub = 64)
    }
    ScaleDemo.time("persist PQ index (8 bytes/vector)") {
      Ivf.saveIndexPQ(corpus, "vec_id", "embedding", centroids, books, pqPath)
    }
    // PQ's coded ranking is coarse at this noise scale (within-cluster
    // neighbors differ by less than a quantization cell) — the tuning
    // lever recall@k exposes is the re-rank pool: 32× means 320 exact
    // dots per probe, still ~1% of the probed cells' rows
    report("IVF PQ topKJoinPQ + exact re-rank (nprobe 8, rerank 32×)") {
      Ivf.topKJoinPQ(spark.read.parquet(pqPath), "vec_id", centroids, books, probes,
        "probe_id", "p_emb", k = 10, nprobe = 8,
        rerank = Some((corpus, "embedding")), rerankFactor = 32)
    }

    println(f"    index bytes: float=${dirBytes(fPath)}%,d int8=${dirBytes(qPath)}%,d pq=${dirBytes(pqPath)}%,d")
    spark.stop()
  }
}
