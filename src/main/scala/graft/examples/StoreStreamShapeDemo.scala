package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** Measures the r15 store-side exchange discipline at operational
  * shape: a large persisted signature store vs a small incremental
  * batch — the steady state every long-running dedup deployment lives
  * in. The legacy plan SMJ'd the store on every batch (fp anti-join,
  * band-key candidate join, shingle verify join, plus the hub-guard's
  * full-store key aggregate); the r15 plan semi-filters each store
  * read by broadcast batch keys, so the store is scanned (column-
  * pruned) but never shuffled. This demo runs the SAME batch against
  * the SAME store under both plans (threshold -1 = legacy, default =
  * semi) and reports wall + total shuffle bytes. At 100 TB the legacy
  * shuffle grows with the corpus while the semi plan's stays
  * batch-sized — the numbers here are the small-scale print of that
  * asymmetry. Timings comparable WITHIN one run only (shared box).
  * Run: sbt "runMain graft.examples.StoreStreamShapeDemo [storeDocs] [batchDocs]". */
object StoreStreamShapeDemo {

  def main(args: Array[String]): Unit = {
    val storeDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val batchDocs = args.drop(1).headOption.map(_.toLong).getOrElse(30000L)
    val spark = SparkSession.builder()
      .appName("store-stream-shape-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    // store: accepted corpus of 60-token docs with a shared vocabulary
    // (so band keys and shingles look organic, not per-doc-unique);
    // batch: 10% exact re-crawls, 10% near-dups of stored docs (one
    // token changed), 80% fresh
    // xxhash64(seed, i): distinct seeds give independent sequences (a
    // linear-congruence form here collides whole documents for seeds
    // equal mod the vocabulary size — the first cut of this fixture
    // silently made every "fresh" doc an exact re-crawl)
    def tokens(seed: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 60).map(i =>
        concat(lit(s"w${i}_"), pmod(xxhash64(seed, lit(i)), lit(50000L)))): _*)
    val storeDir = java.nio.file.Files.createTempDirectory("shape-store")
      .resolve("sigs").toString
    val corpus = spark.range(1, storeDocs + 1)
      .select(col("id").as("doc_id"), tokens(col("id")).as("text"))
    ScaleDemo.time(s"build signature store (${storeDocs / 1000}k docs, parquet)") {
      DocPipeline.signatures(corpus).write.mode("overwrite").parquet(storeDir)
    }
    val store = spark.read.parquet(storeDir)
    println(s"  store rows: ${store.count()}")

    val nEx = batchDocs / 10
    val nNear = batchDocs / 10
    val exacts = spark.range(1, nEx + 1)
      .select((col("id") + 2 * storeDocs).as("doc_id"), tokens(col("id")).as("text"))
    val nears = spark.range(1, nNear + 1)
      .select((col("id") + 3 * storeDocs).as("doc_id"),
        concat(substring_index(tokens(col("id") + nEx), " ", 59),
          lit(" zz_changed")).as("text"))
    val fresh = spark.range(1, batchDocs - nEx - nNear + 1)
      .select((col("id") + 4 * storeDocs).as("doc_id"),
        tokens(col("id") + storeDocs * 7).as("text"))
    val batch = exacts.unionByName(nears).unionByName(fresh).localCheckpoint()
    println(s"  batch rows: ${batch.count()} (${nEx} exact re-crawls, " +
      s"${nNear} near-dups, rest fresh)")
    println(s"  candidate pairs at guard=100k: " +
      DocPipeline.incrementalCandidateVolume(batch, store,
        maxStoreBandDf = 100000L))

    def run(label: String, thr: String): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      // warm nothing: each mode pays its own scan; same box, same data
      Thread.sleep(2000) // drain listener from prior phase
      val before = shuffleBytes.get()
      ScaleDemo.time(label) {
        val n = DocPipeline.prepareIncremental(batch, store,
          maxStoreBandDf = 100000L).count()
        println(s"  accepted: $n")
      }
      Thread.sleep(3000) // listener bus drains async
      println(f"  shuffle bytes: ${(shuffleBytes.get() - before) / 1e6}%.1f MB")
    }
    run("prepareIncremental LEGACY plan (threshold -1: store rides SMJs)", "-1")
    run("prepareIncremental SEMI plan (measured broadcast semi-filters)", "64MB")
    // second semi run with warm page cache to show the steady-state cost
    run("prepareIncremental SEMI plan (repeat, warm cache)", "64MB")

    spark.stop()
  }
}
