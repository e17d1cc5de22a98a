package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Corpus
import graft.operators.ZOrder

/** Scale rehearsal for the corpus-shaping operators: a deterministic
  * synthetic corpus generated ON EXECUTORS (spark.range arithmetic, no
  * driver collect, no RNG state), then wall-times for stratified
  * sampling, sequence packing, decontamination and Z-order layout at a
  * size where per-partition behavior matches what a 1000-executor
  * cluster sees per task at 100 TB. Timings are comparable WITHIN one
  * run only (shared box, ±50% across runs — README "Timing noise").
  * Run: sbt "runMain graft.examples.CorpusScaleDemo [nDocs]". */
object CorpusScaleDemo {

  /** Synthetic documents: ~40-token texts over a 1k-word vocabulary,
    * 20 languages × 50 sources, deterministic per id. */
  def synthDocs(spark: SparkSession, nDocs: Long): DataFrame = {
    val i = col("_i")
    spark.range(nDocs).select(col("id").as("_i")).select(
      i.as("doc_id"),
      concat(lit("lang"), pmod(i, lit(20L))).as("lang"),
      concat(lit("src"), pmod(i * 7L, lit(50L))).as("source"),
      array_join(transform(sequence(lit(0), pmod(i, lit(30L)).cast("int") + 20),
        w => concat(lit("w"), pmod(i * 131L + w * 97L, lit(1000L)))), " ").as("text"))
  }

  /** Dedup-measurement corpus: per-doc DISTINCT body text (xxhash
    * words over a 10^8 space — [[synthDocs]]'s periodic generator has
    * only ~3,000 distinct texts corpus-wide, which collapses any
    * dedup map-side and lets text compress ~15x through a shuffle),
    * with one of 40 shared 24-token boilerplate chunks planted at the
    * head of every 4th doc — the template traffic chunk dedup exists
    * to cut. */
  def dedupDocs(spark: SparkSession, nDocs: Long,
                bodyWords: Int = 27): DataFrame =
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat(
        when(pmod(col("id"), lit(4L)) === 0,
          concat(array_join(transform(sequence(lit(1), lit(24)),
            j => concat(lit("bp"), pmod(col("id"), lit(40L)), lit("x"), j)),
            " "), lit(" "))).otherwise(lit("")),
        array_join(transform(
          sequence(lit(0), pmod(col("id"), lit(20L)).cast("int") + (bodyWords - 1)),
          w => concat(lit("w"), pmod(xxhash64(col("id"), w), lit(100000000L)))),
          " ")).as("text"))

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .appName("corpus-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = synthDocs(spark, nDocs)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .localCheckpoint() // isolate generation cost from operator timing

    ScaleDemo.time(s"generate ${nDocs / 1000}k docs")(docs.count())

    ScaleDemo.time("stratifiedSample 10%") {
      Corpus.stratifiedSample(docs, Seq("lang", "source"), 0.1, "doc_id").count()
    }
    ScaleDemo.time("stratifiedSampleN 1000") {
      Corpus.stratifiedSampleN(docs, Seq("lang", "source"), 1000, "doc_id").count()
    }
    ScaleDemo.time("packSequences 8k budget") {
      Corpus.packSequences(docs, "doc_id", "n_tok", 8192, Seq("lang"))
        .groupBy("lang", "bin_id").count().count()
    }
    // bench side: every 4096th doc — ~nDocs/4096 held-out docs
    val bench = docs.filter(pmod(col("doc_id"), lit(4096L)) === 0)
      .select("doc_id", "text").localCheckpoint()
    ScaleDemo.time("contaminationScores n=13") {
      Corpus.contaminationScores(docs, bench, "doc_id", "text", n = 13).count()
    }
    ScaleDemo.time("zorder layout 64 parts") {
      ZOrder.layout(
        docs.withColumn("x", pmod(col("doc_id") * 2654435761L, lit(4096L)))
          .withColumn("y", pmod(col("doc_id") * 40503L, lit(4096L))),
        Seq("x", "y"), bits = 12, numPartitions = 64)
        .foreach(_ => ()) // materialize the exchange + sort
    }
    // near-dup components: 6250 path components of diameter 32 (200k
    // edges) — pointer doubling converges in ~log2(32) rounds, not 32
    val edges = spark.range(200000L)
      .select((col("id") + floor(col("id") / 32) * 1000000L).as("a"),
        (col("id") + floor(col("id") / 32) * 1000000L + 1L).as("b"))
    ScaleDemo.time("transitiveClusters 200k edges") {
      graft.ext.Dedup.transitiveClusters(edges.toDF(), "a", "b").count()
    }
    // round-6 operators at the same corpus size
    ScaleDemo.time("chunkDocs 24/4 (map-only)") {
      Corpus.chunkDocs(docs, "doc_id", "text", maxTokens = 24, overlap = 4).count()
    }
    // marginal shuffle of the slim chunk-dedup reassembly (r14): the
    // election/drop traffic is 16-byte-md5 + scalar rows only — chunk
    // TEXT must never cross an exchange (the r13 unitDedup pattern).
    // Measured on the DISTINCT-text corpus ([[dedupDocs]]) — the
    // periodic synthDocs fixture understates the win by construction
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    val chunkCorpus = dedupDocs(spark, nDocs).localCheckpoint()
    chunkCorpus.count()
    val chunkShuffle0 = shuffleBytes.get()
    ScaleDemo.time("chunkDedup 24-token (slim rebuild)") {
      graft.ext.Dedup.chunkDedup(chunkCorpus, "doc_id", "text", 24)
        .agg(sum("n_dropped")).collect()
    }
    Thread.sleep(3000) // listener bus drains async
    println(f"  chunkDedup marginal shuffle ${(shuffleBytes.get() - chunkShuffle0) / 1e6}%.0f MB")
    ScaleDemo.time("bm25 3-term query") {
      graft.ext.Search.bm25(docs, "doc_id", "text", Seq("w1", "w500", "w999")).count()
    }
    ScaleDemo.time("invertedIndex 1k vocab") {
      graft.ext.Search.invertedIndex(docs, "doc_id", "text").count()
    }
    ScaleDemo.time("unigramLogProb") {
      graft.ext.TextAnalysis.unigramLogProb(docs, "doc_id", "text").count()
    }
    ScaleDemo.time("upsert 1% changelog") {
      graft.operators.Merge.upsert(
        docs.select(col("doc_id"), col("lang"), lit(0L).as("v")),
        docs.filter(pmod(col("doc_id"), lit(100L)) === 0)
          .select(col("doc_id"), lit("upd").as("lang"), lit(1L).as("v")),
        Seq("doc_id"), "v").count()
    }
    // variable-span ExactSubstr pass: the 1k-word vocabulary makes
    // 5-gram collisions organic, so the df table and the doc-keyed
    // window both do real work (spans found, not a no-op scan)
    ScaleDemo.time("duplicatedSpans n=5") {
      graft.ext.Dedup.duplicatedSpans(docs, "doc_id", "text",
        n = 5, minDocs = 2, minTokens = 20).count()
    }
    ScaleDemo.time("spanDedup n=5 (detect+rebuild)") {
      graft.ext.Dedup.spanDedup(docs, "doc_id", "text",
        n = 5, minDocs = 2, minTokens = 20)
        .agg(sum("n_removed")).collect()
    }
    // TRUE ExactSubstr (diagonal match grid): the self-join is Σ df²
    // per shingle, so maxDf is load-bearing — THIS corpus is the
    // degenerate case that proves it: its organic shingles have df ∈
    // {1} ∪ [65+] (measured: uncapped grid = 2.5e9 rows at just 50k
    // docs, i.e. boilerplate squared), so maxDf=64 excludes all of it
    // and the planted passages below are the entire capped workload —
    // exactly the cap's job on a template-heavy web crawl. Plant: 1 in
    // 50 docs carries a 25-token passage shared by its group — group
    // count scales with the corpus so df ≈ 8 at ANY size (64 grid
    // rows per passage shingle, mid-df, inside the cap).
    val nGroups = math.max(1L, nDocs / 400L)
    val spanCorpus = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(50L)) === 0,
        concat(col("text"), lit(" "), array_join(transform(
          sequence(lit(1), lit(25)),
          j => concat(lit("p"), pmod(col("doc_id") / 50L, lit(nGroups)).cast("long"),
            lit("x"), j)), " ")))
        .otherwise(col("text")).as("text"))
      .localCheckpoint()
    ScaleDemo.time("exact-span df histogram (cap context)") {
      import graft.ext.{TextHash => TH}
      val d = spanCorpus
        .select(col("doc_id"),
          explode(TH.shingleHashes(TH.wordHashes(col("text")), 5)).as("sh"))
        .distinct()
        .groupBy("sh").agg(count(lit(1)).as("df"))
      d.select(
        sum(when(col("df").between(2, 64), col("df") * col("df"))).as("grid_rows_capped"),
        sum(when(col("df") >= 2, col("df") * col("df"))).as("grid_rows_uncapped"),
        max(col("df")).as("max_df")).collect()
        .foreach(r => println(s"  [exact-span] capped/uncapped/maxdf = $r"))
    }
    ScaleDemo.time("duplicatedSpansExact n=5 maxDf=64") {
      graft.ext.Dedup.duplicatedSpansExact(spanCorpus, "doc_id", "text",
        n = 5, minTokens = 20, maxDf = 64).count()
    }
    ScaleDemo.time("spanDedupExact n=5 maxDf=64 (grid+rebuild)") {
      graft.ext.Dedup.spanDedupExact(spanCorpus, "doc_id", "text",
        n = 5, minTokens = 20, maxDf = 64)
        .agg(sum("n_removed")).collect()
    }
    // langid profile training at corpus scale (the production path:
    // train on the big labeled corpus, not the stock seeds): the seed
    // sentences replicate to nDocs/20 labeled docs via an executor-side
    // join — corpus touched once, one gram explode → (lang, gram) sum →
    // per-lang top-K window; only K·nLangs rows reach the driver.
    // (locally: a bare block here would parse as .apply on the
    // preceding expression's Array[Row] result)
    locally {
      import graft.ext.LangId
      val seedRows = LangId.seeds.toSeq.flatMap { case (l, ts) =>
        ts.zipWithIndex.map { case (t, j) => (l, j.toLong, t) }
      }
      val nSent = seedRows.groupBy(_._1).map(_._2.size).min.toLong
      val seedsDf = spark.createDataFrame(seedRows).toDF("lang", "j", "seed_text")
      val langsArr = LangId.seeds.keys.toSeq.sorted
      val nLangs = langsArr.length
      val feed = spark.range(nDocs / 20)
        .select(col("id"),
          element_at(
            array(langsArr.map(lit): _*),
            (pmod(col("id"), lit(nLangs.toLong)) + 1).cast("int")).as("lang"),
          pmod(floor(col("id") / nLangs).cast("long"), lit(nSent)).as("j"))
        .join(seedsDf, Seq("lang", "j"))
        .select(col("lang"), col("seed_text").as("text"))
      ScaleDemo.time(s"langid trainProfiles $nLangs langs × ${nDocs / 20 / 1000}k docs") {
        val trained = LangId.trainProfiles(feed, "lang", "text")
        require(trained.length == nLangs, s"trained ${trained.length} profiles")
        trained.length
      }
    }
    // classifier gate: 3-iteration logreg train = 3 map-side agg passes
    // over the cached feature frame; AUC/PR = one groupBy on the score
    // + a distinct-scores-only window (score here has ≤ ~30 distinct
    // values, the realistic quantized-score regime)
    val lbl = when(pmod(col("doc_id"), lit(20L)) === 0, 1.0).otherwise(0.0)
    val featFrame = docs.select(
      lit(1.0).as("b"),
      (col("n_tok") / lit(50.0)).as("x1"),
      (length(col("text")) / (lit(10.0) * col("n_tok"))).as("x2"),
      lbl.as("y")).localCheckpoint()
    ScaleDemo.time("logReg train 3 iters") {
      graft.ext.LogReg.train(featFrame,
        Seq(col("b"), col("x1"), col("x2")), col("y"), lr = 0.5, iters = 3)
    }
    ScaleDemo.time("binaryAuc + prCurve") {
      graft.ext.Eval.binaryAuc(featFrame, col("x1"), col("y")).collect()
      graft.ext.Eval.prCurve(featFrame, col("x1"), col("y")).count()
    }
    ScaleDemo.time("reliabilityBins 10") {
      graft.ext.Eval.reliabilityBins(
        featFrame.withColumn("p", col("x1") / (lit(1.0) + col("x1"))),
        col("p"), col("y")).count()
    }
    // crawl hygiene + shard materialization at the full corpus
    val withUrls = docs.withColumn("url",
      concat(lit("https://h"), pmod(col("doc_id"), lit(1000L)),
        lit(".site"), pmod(col("doc_id"), lit(97L)), lit(".example/p/"),
        col("doc_id")))
    ScaleDemo.time("blockByDomain 3 domains") {
      graft.ext.Web.blockByDomain(withUrls, "url", "doc_id",
        Seq("site13.example", "site31.example", "h7.site5.example")).count()
    }
    ScaleDemo.time("normalizeForDedup") {
      docs.select(graft.ext.TextNorm.normalizeForDedup(col("text")).as("n"))
        .select(sum(length(col("n")))).collect()
    }
    ScaleDemo.time("lineDedup (10-line docs)") {
      graft.ext.Dedup.lineDedup(
        docs.withColumn("t2", regexp_replace(col("text"), " w1", "\nw1")),
        "doc_id", "t2")
        .agg(sum("n_dropped")).collect()
    }
    ScaleDemo.time("materializePacked 8k bins") {
      graft.ext.Corpus.materializePacked(
        graft.ext.Corpus.packSequences(
          docs.withColumn("toks", split(col("text"), " ")),
          "doc_id", "n_tok", 8192, Seq("lang")),
        "doc_id", "toks", "bin_id", Seq("lang"))
        .agg(sum("n_tokens")).collect()
    }
    // late-round-11 kernels at the same corpus size — all map-only
    // except the KN LM (count tables broadcast back)
    ScaleDemo.time("phraseCounts 5k-phrase Aho-Corasick") {
      val dict = (0 until 5000).map(i =>
        s"w${i % 1000} w${(i * 7 + i / 1000) % 1000}") // 5k distinct real pairs
      docs.select(sum(graft.ext.PhraseMatch.totalCount(col("text"), dict)))
        .collect()
    }
    ScaleDemo.time("unigramScore demo table") {
      docs.select(sum(graft.ext.Unigram
        .score(col("text"), graft.ext.Unigram.demoPieces).getField("cost")))
        .collect()
    }
    ScaleDemo.time("stripHtml (wrapped corpus)") {
      docs.select(sum(length(graft.ext.TextNorm.stripHtml(
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><script>var x;</script></body></html>")))))).collect()
    }
    ScaleDemo.time("sentences + lexicalStats") {
      docs.select(sum(size(graft.ext.TextAnalysis.sentences(col("text")))))
        .collect()
      graft.ext.TextAnalysis.lexicalStats(docs, "doc_id", "text")
        .agg(sum("entropy_e6")).collect()
    }
    ScaleDemo.time("bigramLogProbKN") {
      graft.ext.TextAnalysis.bigramLogProbKN(docs, "doc_id", "text")
        .agg(sum("lp_e6")).collect()
    }
    spark.stop()
  }
}
