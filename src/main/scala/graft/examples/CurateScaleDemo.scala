package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.ext.{Curate, Web}

/** Scale rehearsal for the [[graft.ext.Curate]] FACADE — the one-call
  * nine-stage curation funnel — on a ~10⁶-doc synthetic corpus
  * (VERDICT r11 #9). The individual operators each have their own
  * rehearsal (CorpusScaleDemo/CurationDemo); what has only been
  * exercised at spec scale is their COMPOSITION inside one facade call
  * (normalize → line dedup → sentence dedup → gate → near-dup
  * ordering), so this demo runs the facade end-to-end with EVERY stage
  * enabled and then prints the per-stage shuffle-volume table from a
  * stage-completion listener: each Spark stage reports its shuffle
  * read/write bytes with its call site, which attributes the exchange
  * to the library operator that planned it.
  *
  * Run: sbt "runMain graft.examples.CurateScaleDemo [nDocs]". Timings
  * comparable within one run only (shared box, README "Timing noise").
  */
object CurateScaleDemo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .appName("curate-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus: mostly-UNIQUE 30-token docs over a 50k-token space
    // (CorpusScaleDemo.synthDocs has only ~3000 distinct texts — a
    // dedup funnel run on it measures annihilation, not throughput),
    // with planted families every 50 docs: doc 50g is a template,
    // 50g+2 its EXACT copy (fingerprint dedup), 50g+1 a one-token
    // NEAR-dup (MinHash banding + verify). Wrapped as web pages so
    // every facade stage does real work — markup (stripHtml), a
    // corpus-wide footer line (lineDedup), a period every 8 tokens
    // (sentenceDedup gets real units), a per-doc URL over ~2.2k hosts
    // (domain + robots gates).
    val i = col("id")
    val grp = floor(i / 50L)
    val role = pmod(i, lit(50L)) // 0=template, 1=near-dup, 2=exact copy
    val seed = when(role === 1 || role === 2, grp * 50L).otherwise(i)
    // xxhash64 breaks linearity: a pmod-linear token stream collides
    // whole BODIES whenever seed ≡ seed' (mod vocab), silently turning
    // the corpus into exact duplicates past 50k docs (measured: 36% of
    // a 100k corpus annihilated by line dedup before this hash)
    val body = array_join(transform(sequence(lit(0), lit(29)),
      w => concat(lit("t"),
        pmod(abs(xxhash64(seed, w)), lit(50021L)),
        when(pmod(w, lit(8)) === 7, lit(".")).otherwise(lit("")))), " ")
    val docs = spark.range(nDocs).select(
        i.as("doc_id"),
        concat(lit("lang"), pmod(i, lit(20L))).as("lang"),
        concat(body,
          when(role === 1, lit(" extraneous")).otherwise(lit(""))).as("raw"))
      .select(col("doc_id"), col("lang"),
        // constant h1: a per-doc id in the header would inject 5
        // differing shingles per family pair, dragging shingle jaccard
        // to ~0.74 < τ=0.8 — the near-dup stage would (correctly, per
        // its contract) reject the plants; with it constant, the exact
        // copy is byte-identical post-strip and the near-dup pair
        // differs by one planted token (shingle jaccard ≈ 0.73,
        // hence τ = 0.7 below)
        concat(
          lit("<html><head><script>var x=1;</script></head><body><h1>Document</h1><p>"),
          col("raw"),
          lit("</p><p>All rights reserved footer line.</p></body></html>"))
          .as("text"),
        concat(lit("https://h"), pmod(col("doc_id"), lit(23L)),
          lit(".src"), pmod(col("doc_id"), lit(97L)),
          lit(".example/d/"), col("doc_id")).as("url"))
      .localCheckpoint() // isolate generation cost from facade timing
    println(s"CURATE-SCALE input docs = ${docs.count()}")

    val robotsFrame = docs.select(Web.host(col("url")).as("host")).distinct()
      .withColumn("body", lit("User-agent: *\nDisallow: /d/9\n"))
      .localCheckpoint()
    val bench = docs.filter(pmod(col("doc_id"), lit(4096L)) === 0)
      .select(col("doc_id"),
        regexp_replace(col("text"), "<[^>]*>", " ").as("text"))
      .localCheckpoint()

    // per-Spark-stage shuffle volumes, attributed by call site
    final case class StageRow(name: String, readMb: Double, writeMb: Double,
                              records: Long)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        // AQE stages surface as thread-pool call sites; the long-form
        // details still carry the planning stack — the first graft.*
        // frame names the library operator that planned the exchange
        val site = e.stageInfo.details.linesIterator
          .map(_.trim).find(_.contains("graft."))
          .map(_.stripPrefix("at ")).getOrElse(e.stageInfo.name.linesIterator.next())
        if (m != null) rows.add(StageRow(site,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.shuffleWriteMetrics.recordsWritten))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val full = Curate.Config(
      htmlInput = true,
      urlCol = Some("url"),
      blockedDomains = Seq("src3.example", "h11.src5.example"),
      robots = Some(robotsFrame),
      lineDedup = true,
      sentenceDedup = true,
      minWords = 10,
      maxTopTokenFrac = 0.5,
      blockPhrases = Seq("w13 w500"),
      minhashK = 8, bands = 4, tau = 0.7,
      benchmark = Some(bench))

    // per-stage attribution by PREFIX DIFFERENCING: each run enables
    // one more facade stage; the survivor delta is that stage's kill
    // count and the shuffle-write delta its marginal exchange volume
    // (AQE thread-pool stages carry no user call site, so listener
    // attribution by stack is blind — differencing is the honest way)
    import scala.jdk.CollectionConverters._
    val prefixes: Seq[(String, Curate.Config)] = Seq(
      "strip+gates+neardup (floor)" -> Curate.Config(htmlInput = true,
        minWords = 10, maxTopTokenFrac = 0.5,
        blockPhrases = Seq("w13 w500"), minhashK = 8, bands = 4, tau = 0.7),
      "+ domain blocklist" -> full.copy(robots = None,
        lineDedup = false, sentenceDedup = false, benchmark = None),
      "+ robots gate" -> full.copy(
        lineDedup = false, sentenceDedup = false, benchmark = None),
      "+ line dedup" -> full.copy(sentenceDedup = false, benchmark = None),
      "+ sentence dedup" -> full.copy(benchmark = None),
      "+ decontaminate (FULL facade)" -> full)
    var prevN = nDocs
    var prevW = 0.0
    println(f"${"facade prefix"}%-30s ${"docs out"}%10s ${"stage kill"}%10s ${"marginal shuffle MB"}%20s ${"sec"}%7s")
    prefixes.foreach { case (label, cfg) =>
      val t0 = System.nanoTime()
      val n = Curate.run(docs, cfg).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val w = rows.asScala.map(_.writeMb).sum
      println(f"$label%-30s $n%10d ${prevN - n}%10d ${w - prevW}%20.1f $sec%7.1f")
      prevN = n; prevW = w
    }
    spark.sparkContext.removeSparkListener(listener)
    val totW = rows.asScala.map(_.writeMb).sum
    val totR = rows.asScala.map(_.readMb).sum
    println(f"CURATE-SCALE cumulative shuffle write = $totW%.1f MB, read = $totR%.1f MB, spark stages = ${rows.size}")

    // near-dup recall probe — the r11 BOILERPLATE HAZARD re-measured
    // after the rehash-family fix (TextHash.rehash scaladoc): the
    // floor config leaves the corpus-wide footer line in every
    // signature (no lineDedup upstream). r11 measured 2/20 planted
    // pairs caught under the correlated a_i=2i+3 family; the fixed
    // family should not let any single hot token own all components,
    // and maxSignatureDf drops the footer tokens from banding
    // entirely. Plants: role==1 docs (one-token near-dups of their
    // group template, shingle jaccard ≈ 0.73 ≥ τ=0.7).
    val plantIds = spark.range(nDocs).select(i.as("doc_id"))
      .filter(pmod(col("doc_id"), lit(50L)) === 1)
      .localCheckpoint()
    val nPlants = plantIds.count()
    // the facade now defaults maxSignatureDf = 100k (r13) — the
    // unguarded row must opt out explicitly to measure the raw hazard
    val floorCfg = prefixes.head._2
    Seq("fixed hashes, guard OFF" ->
          floorCfg.copy(maxSignatureDf = Long.MaxValue),
        "fixed hashes + default maxSignatureDf=100k" ->
          floorCfg).foreach { case (label, cfg) =>
      val surv = Curate.run(docs, cfg).select("doc_id")
      val caught = plantIds.join(surv, Seq("doc_id"), "left_anti").count()
      println(f"CURATE-SCALE near-dup recall [$label]: $caught/$nPlants plants caught (footer IN signatures)")
    }
    spark.stop()
  }
}
