package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** Measurement story for VERDICT r16 #6 — "manifest-backed advise
  * counts + parallel reshard", priced at the shard counts where the
  * r16 implementations actually hurt:
  *
  *   1. `adviseShardCount` at 64 shards. The r16 path ran one
  *      `spark.read.parquet(shard).count()` JOB per shard — 64 full
  *      scheduler round-trips to learn 64 numbers. The r17 path reads
  *      each atomic shard's `rows:` manifest lines from `_commits/`
  *      driver-side: zero Spark jobs (the IVF census precedent,
  *      CensusCostProbe). This probe measures both on the same layout.
  *   2. `reshardSignatureStores` 8 → 16 shards. The r16 loop rebuilt
  *      shards serially — each build pays its driver-side planning,
  *      commit, and vacuum walls alone while 31 cores idle between
  *      jobs. r17 runs the (disjoint-output) builds from a bounded
  *      pool (`spark.graft.reshardParallelism`, default 8). Same
  *      corpus, serial-vs-parallel, wall-clock compared.
  *
  * Run: sbt "runMain graft.examples.ShardScaleProbe [docsPerShard]"
  */
object ShardScaleProbe {
  def main(args: Array[String]): Unit = {
    val perShard = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .appName("shard-scale-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic corpus: `tenants` tenants, unique 20-word texts
    def corpus(tenants: Int, docs: Long) = spark.range(docs)
      .select(col("id").as("doc_id"),
        concat(lit("t"), pmod(xxhash64(col("id")), lit(tenants.toLong))
          .cast("string")).as("tenant"),
        array_join(transform(sequence(lit(1), lit(20)), w =>
          concat(lit("u"), xxhash64(col("id"), w).cast("string"))), " ")
          .as("text"))
    val tmp = java.nio.file.Files.createTempDirectory("shardscale")

    // ── probe 1: advise at 64 shards, manifest vs count jobs ──
    val n64 = 64
    val root64 = tmp.resolve("s64").toString
    val (_, wBuild64) = timed {
      DocPipeline.reshardSignatureStores(
        corpus(256, n64.toLong * perShard), root64, col("tenant"), n64,
        atomicStore = true, shardTag = "tenant")
    }
    val (adv, wAdvise) = timed {
      DocPipeline.adviseShardCount(spark, root64, n64)
    }
    // (hash routing may leave a shard tenant-less — only PRESENT
    // shards have dirs, and the advise prices exactly those)
    require(adv.shardDocs.size >= n64 - 4 &&
      adv.totalDocs == n64.toLong * perShard, adv.toString)
    // the counterfactual the r16 code paid: one count JOB per shard
    // over the committed union
    val (cf, wCountJobs) = timed {
      adv.shardDocs.keys.toSeq.sorted.map { s =>
        val sp = DocPipeline.shardPath(root64, s)
        val vs = graft.sources.AppendStore.liveVersions(spark, sp)
        spark.read.parquet(vs.map(v =>
          graft.sources.AtomicCommit.versionDir(sp, v)): _*).count()
      }.sum
    }
    require(cf == adv.totalDocs, s"counterfactual $cf != ${adv.totalDocs}")
    println(f"SHARD-SCALE advise: ${adv.shardDocs.size} atomic shards, " +
      f"${adv.totalDocs}%,d docs " +
      f"(layout built in $wBuild64%.1f s) — manifest-backed advise " +
      f"$wAdvise%.2f s (zero Spark jobs), per-shard count jobs " +
      f"$wCountJobs%.2f s (${wCountJobs / math.max(wAdvise, 1e-9)}%.0fx)")

    // ── probe 2: reshard 8 -> 16, serial vs parallel builds ──
    val base = corpus(256, 16L * perShard)
    def reshardTo(dst: String): Unit =
      DocPipeline.reshardSignatureStores(base, dst, col("tenant"), 16,
        atomicStore = true, shardTag = "tenant")
    spark.conf.set("spark.graft.reshardParallelism", "1")
    val (_, wSerial) = timed(reshardTo(tmp.resolve("r16serial").toString))
    spark.conf.set("spark.graft.reshardParallelism", "8")
    val (_, wPar) = timed(reshardTo(tmp.resolve("r16par").toString))
    spark.conf.unset("spark.graft.reshardParallelism")
    // identical layouts: same per-shard row counts either way
    val serialAdv = DocPipeline.adviseShardCount(
      spark, tmp.resolve("r16serial").toString, 16)
    val parAdv = DocPipeline.adviseShardCount(
      spark, tmp.resolve("r16par").toString, 16)
    require(serialAdv.shardDocs == parAdv.shardDocs,
      s"parallel reshard changed the layout: $serialAdv vs $parAdv")
    println(f"SHARD-SCALE reshard 8->16 (16 shard builds, " +
      f"${16L * perShard}%,d docs): serial $wSerial%.1f s, parallel(8) " +
      f"$wPar%.1f s (${wSerial / math.max(wPar, 1e-9)}%.1fx) — " +
      "identical per-shard layouts")
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
