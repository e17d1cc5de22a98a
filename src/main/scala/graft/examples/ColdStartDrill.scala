package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** Cold-start DISASTER drill (r16 — the unexplored operational axis the
  * r15 verdict named): the signature store is LOST outright (directory
  * gone — a bucket lifecycle rule, a fat-fingered rm, a failed region)
  * while its bloom sidecar survives STALE, traffic keeps queuing, and
  * the deployment must rebuild everything from the ACCEPTED CORPUS —
  * the one artifact the store design treats as the source of truth
  * (`rebuildSignatureStore` scaladoc). The drill times every phase of
  * the documented recovery and proves rejection parity at the end.
  *
  * Why a restart-without-rebuild is the trap being drilled: an absent
  * store BOOTSTRAPS empty (by design — first deployment), so a crashed
  * operator who just restarts the stream gets a working pipeline that
  * silently re-accepts every re-crawl of the lost history. The honest
  * recovery is rebuild-then-restart, and the `_sig_meta` +
  * bloom-invalidate ordering inside [[DocPipeline.rebuildSignatureStore]]
  * makes the rebuilt store safe to serve the moment the restart lands.
  *
  * Phases (each timed, `nDocs` = 1M default):
  *   1. STEADY: bootstrap the store from the corpus, run one streamed
  *      batch (builds the bloom sidecar), stop — the pre-disaster
  *      state, including the accepted rows of that last batch.
  *   2. DISASTER: store directory deleted; bloom sidecar left behind
  *      (stale: it covers rows that no longer exist anywhere).
  *   3. REBUILD while traffic queues: `rebuildSignatureStore` from the
  *      full accepted corpus (original + the streamed batch's
  *      survivors). Invalidates the stale bloom FIRST (crash below
  *      leaves a missing sidecar — next start rebuilds, never trusts
  *      stale coverage).
  *   4. RESTART: the queued traffic replays through a fresh stream —
  *      first batch pays the bloom `fromStore` rebuild (sidecar
  *      absent), then: re-crawls of the ORIGINAL corpus and of the
  *      pre-disaster batch's accepted docs → 0 accepted; queued fresh
  *      docs → all accepted.
  *
  * Run: sbt "runMain graft.examples.ColdStartDrill [nDocs]".
  */
object ColdStartDrill {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .appName("cold-start-drill")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def docText(id: Column) =
      array_join(transform(sequence(lit(1), lit(50)),
        w => concat(lit("u"), xxhash64(id, w).cast("string"))), " ")

    val tmp = java.nio.file.Files.createTempDirectory("coldstart")
    val store = tmp.resolve("sig").toString
    val corpus = spark.range(nDocs)
      .select(col("id").as("doc_id"), docText(col("id")).as("text"))

    // ── 1. STEADY state ──
    val (_, wBoot) = timed(DocPipeline.rebuildSignatureStore(corpus, store))
    // fresh traffic: unique text per id; re-crawls: the text of a
    // pseudo-randomly chosen corpus doc under a NEW doc_id
    def freshRows(from: Long, n: Long) =
      spark.range(from, from + n)
        .select(col("id"), docText(col("id")).cast("string"))
        .as[(Long, String)].collect().toSeq
    def reRows(from: Long, n: Long) =
      spark.range(from, from + n)
        .select(col("id"), docText(pmod(xxhash64(col("id")), lit(nDocs))).cast("string"))
        .as[(Long, String)].collect().toSeq
    var accepted = Set.empty[Long]
    val in1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q1 = DocPipeline.streamIncremental(
      in1.toDF().toDF("doc_id", "text"), store, minWords = 10) { (df, _) =>
      accepted = df.select("doc_id").as[Long].collect().toSet
    }
    val (_, wFirst) = timed {
      // 15k fresh + 15k re-crawls of the corpus
      in1.addData(freshRows(9000000L, 15000L) ++ reRows(9100000L, 15000L))
      q1.processAllAvailable()
    }
    q1.stop()
    val steadyAccepted = accepted
    require(steadyAccepted.count(_ < 9100000L) == 15000 &&
      steadyAccepted.count(_ >= 9100000L) == 0,
      s"steady-state parity broken before the drill: ${steadyAccepted.size}")
    println(f"COLD-START 1. steady: bootstrap $nDocs%,d docs $wBoot%.1f s; " +
      f"first streamed batch (bloom build + 30k docs) $wFirst%.1f s")

    // ── 2. DISASTER: store gone, bloom sidecar left stale ──
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
    require(!new java.io.File(store).exists(), "store still present")
    require(new java.io.File(graft.sources.StoreBloom.bloomDir(store)).exists(),
      "drill setup: the stale bloom sidecar must survive the disaster")
    println("COLD-START 2. disaster: store deleted; stale bloom sidecar remains")

    // ── 3. REBUILD from the accepted corpus while traffic queues ──
    val fullAccepted = corpus.unionByName(
      spark.range(9000000L, 9015000L)
        .select(col("id").as("doc_id"), docText(col("id")).as("text")))
    val (_, wRebuild) = timed(DocPipeline.rebuildSignatureStore(
      fullAccepted, store))
    require(!new java.io.File(graft.sources.StoreBloom.bloomDir(store)).exists(),
      "rebuild must invalidate the stale sidecar before serving")
    println(f"COLD-START 3. rebuild from accepted corpus " +
      f"(${nDocs + 15000L}%,d docs) $wRebuild%.1f s; stale bloom invalidated")

    // ── 4. RESTART under the queued traffic ──
    val queued =
      reRows(9200000L, 10000L) ++                // re-crawls of original corpus
        spark.range(9000000L, 9005000L)          // re-crawls of batch survivors
          .select(col("id") + 1000000L, docText(col("id")).cast("string"))
          .as[(Long, String)].collect().toSeq ++
        freshRows(9300000L, 10000L)              // genuinely fresh
    val in2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = DocPipeline.streamIncremental(
      in2.toDF().toDF("doc_id", "text"), store, minWords = 10) { (df, _) =>
      accepted = df.select("doc_id").as[Long].collect().toSet
    }
    val (_, wReplay) = timed {
      in2.addData(queued)
      q2.processAllAvailable()
    }
    q2.stop()
    val reCorpus = accepted.count(id => id >= 9200000L && id < 9210000L)
    val reBatch = accepted.count(id => id >= 10000000L && id < 10006000L)
    val fresh = accepted.count(id => id >= 9300000L)
    require(reCorpus == 0, s"$reCorpus re-crawls of the lost corpus leaked")
    require(reBatch == 0, s"$reBatch re-crawls of pre-disaster accepted docs leaked")
    require(fresh == 10000, s"fresh eaten after recovery: $fresh of 10000")
    println(f"COLD-START 4. restart: queued 25k-doc replay $wReplay%.1f s " +
      "(includes bloom fromStore rebuild) — re-crawls 0/15000 leaked, " +
      s"fresh $fresh/10000 accepted")
    println(f"COLD-START total recovery (rebuild + replay): " +
      f"${wRebuild + wReplay}%.1f s for ${nDocs + 15000L}%,d accepted docs")
    spark.stop()
  }
}
