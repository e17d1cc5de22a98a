package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Corpus, Dedup, DocPipeline, Eval, LogReg, Robots, TextNorm, Web}

/** End-to-end corpus curation over the real `documents` table — the
  * full pipeline a training-data engineer runs, each stage a library
  * operator, wall-timed per stage:
  *
  *   read → HTML strip → URL blocklist → robots.txt gate →
  *   classifier gate (train + gate) → C4 line dedup → normalize →
  *   phrase blocklist + exact + MinHash near-dup (DocPipeline) →
  *   bloom decontamination → train/val/test split → pack → materialize
  *   → atomic shard store write + manifest validation.
  *
  * Run: sbt "runMain graft.examples.CurationDemo [sfDir]". Counts are
  * printed per stage so the funnel is auditable; the final store is
  * written under java.io.tmpdir and validated via its manifest. */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("curation-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def stage[T](what: String)(f: => T): T = ScaleDemo.time(what)(f)

    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint()
    println(s"CURATE input docs = ${raw.count()}")

    // 0. web pages in, prose out — the real entry point of a web
    //    corpus is markup, so re-wrap the text as a page and strip it
    val pages = raw.withColumn("html", concat(
      lit("<html><head><script>var x = 1;</script></head><body><h1>Doc "),
      col("doc_id"), lit("</h1><p>"), col("text"),
      lit("</p></body></html>")))
    val docs = stage("0 stripHtml") {
      pages
        .withColumn("text",
          regexp_replace(TextNorm.stripHtml(col("html")), "\n", " "))
        .drop("html").localCheckpoint()
    }
    println(s"CURATE after html strip = ${docs.count()}")

    // 1. crawl hygiene: synthesize per-doc URLs, drop blocked domains
    val withUrls = docs.withColumn("url",
      concat(lit("https://h"), pmod(col("doc_id"), lit(23L)),
        lit(".src"), pmod(col("doc_id"), lit(7L)), lit(".example/d/"),
        col("doc_id")))
    val afterBlock = stage("1 blockByDomain") {
      Web.blockByDomain(withUrls, "url", "doc_id",
        Seq("src3.example", "h11.src5.example")).localCheckpoint()
    }
    println(s"CURATE after blocklist = ${afterBlock.count()}")

    // 1b. robots.txt compliance: every host serves the same policy
    //     here — paths under /d/1 are off limits (ids 1, 1x, 1xx…)
    val robotsFrame = afterBlock
      .select(Web.host(col("url")).as("host")).distinct()
      .withColumn("body", lit("User-agent: *\nDisallow: /d/1\n"))
    val afterRobots = stage("1b robots gate") {
      Robots.gateUrls(afterBlock, "url", robotsFrame, "host", "body")
        .filter(col("crawl_allowed")).drop("crawl_allowed")
        .localCheckpoint()
    }
    println(s"CURATE after robots = ${afterRobots.count()}")

    // 2. classifier gate: train on the 'mentions spark' signal, keep
    //    docs the model scores >= 0.5 (the fastText-style filter)
    val len = length(col("text"))
    val nt = size(split(col("text"), " ", -1))
    val feats = Seq(lit(1.0), nt / lit(100.0),
      len / (lit(10.0) * nt))
    val label = when(
      len - length(expr("replace(text, 'spark', '')")) > 0, 1.0)
      .otherwise(0.0)
    val (model, afterGate) = stage("2 train + gate") {
      val m = LogReg.train(afterRobots, feats, label, lr = 0.5, iters = 5)
      (m, LogReg.gate(afterRobots, feats, m, minProb = 0.5).localCheckpoint())
    }
    println(f"CURATE train acc = ${model.accuracy}%.3f; " +
      s"after gate = ${afterGate.count()}")
    val aucRow = Eval.binaryAuc(afterRobots, nt.cast("double"), label).head()
    println(f"CURATE gate signal AUC = ${aucRow.getDouble(0)}%.3f")

    // 3. C4 cross-corpus line dedup (line granularity boilerplate kill)
    val afterLines = stage("3 lineDedup") {
      Dedup.lineDedup(
        afterGate.withColumn("t2", regexp_replace(col("text"), " table ", "\n")),
        "doc_id", "t2")
        .join(afterGate.select("doc_id", "lang"), Seq("doc_id"))
        .select(col("doc_id"), col("lang"),
          regexp_replace(col("text_kept"), "\n", " ").as("text"))
        .filter(length(col("text")) > 0)
        .localCheckpoint()
    }
    println(s"CURATE after line dedup = ${afterLines.count()}")

    // 4. normalization feeds exact + MinHash near-dup (DocPipeline:
    //    length gate, language ID, fingerprint dedup, verified near-dup)
    val prepared = stage("4 normalize + DocPipeline.prepare") {
      DocPipeline.prepare(
        afterLines.withColumn("text", TextNorm.normalizeForDedup(col("text"))),
        minWords = 10, minhashK = 8, bands = 4, tau = 0.8,
        blockPhrases = Seq("key order sort"))
        .localCheckpoint()
    }
    println(s"CURATE after near-dup = ${prepared.count()}")

    // 5. bloom decontamination vs a held-out benchmark slice
    val bench = docs.filter(pmod(col("doc_id"), lit(97L)) === 0)
      .select("doc_id", "text")
    val clean = stage("5 bloomDecontaminate") {
      Corpus.bloomDecontaminate(prepared, bench, "doc_id", "text", n = 13)
        .localCheckpoint()
    }
    println(s"CURATE after decontamination = ${clean.count()}")

    // 6. deterministic split + pack + materialize the train shard
    val shards = stage("6 split + pack + materialize") {
      val split3 = Corpus.assignSplits(clean, "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      val train = split3.filter(col("split") === "train")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")))
      Corpus.materializePacked(
        Corpus.packSequences(train, "doc_id", "n_tok", 2048, Seq("lang")),
        "doc_id", "toks", "bin_id", Seq("lang"))
        .localCheckpoint()
    }
    println(s"CURATE packed rows = ${shards.count()}; " +
      s"tokens = ${shards.agg(sum("n_tokens")).head().getLong(0)}")

    // 7. atomic shard store + manifest validation
    val storeRoot = java.nio.file.Files
      .createTempDirectory("curation-store").toString
    stage("7 writeShardsAtomic + validate") {
      // ShardStore hash-shards on a NUMERIC id (Corpus.orderHash) —
      // derive a stable numeric pack key from (lang, bin)
      val flat = shards.select(
        concat_ws("#", col("lang"), col("bin_id")).as("pack_id"),
        xxhash64(col("lang"), col("bin_id")).as("pack_key"),
        col("n_docs"), col("n_tokens"),
        array_join(col("tokens"), " ").as("text"))
      graft.sources.ShardStore.writeShardsAtomic(
        flat, "pack_key", numShards = 16, root = storeRoot)
      val bad = graft.sources.ShardStore.validateShardsAt(
        spark, storeRoot, 1L)
        .filter(!col("ok")).count()
      require(bad == 0L, s"manifest validation failed for $bad shards")
    }
    println(s"CURATE store at $storeRoot v=1 validated")
    spark.stop()
  }
}
