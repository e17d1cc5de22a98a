package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Curate

/** 10M-doc Curate rehearsal (VERDICT r12 #6) — one order of magnitude
  * past [[CurateScaleDemo]], with the round-13 scale work in place:
  * slim unit-dedup reassembly (text never rides a shuffle), the
  * facade-default banding df-guard, OPH banding (minhashK = 16 engages
  * the k-threshold default), and the DSIR selection stage enabled
  * end-to-end at a budget (1M) far past the 65,536-row envelope bound,
  * so `Dsir.resampleAt`'s radix path is the one exercised.
  *
  * Corpus: [[CurateScaleDemo]]'s generator shape (mostly-unique
  * 30-token docs, planted exact/near-dup families every 50 docs, a
  * corpus-wide footer line, periods every 8 tokens) plus a planted
  * TOPIC: docs with id % 10 == 3 draw a third of their tokens from a
  * 200-token topical vocabulary, and the DSIR target is pure topical
  * prose — selection quality = on-topic fraction of the kept set.
  *
  * Attribution is prefix differencing, the [[CurateScaleDemo]]
  * convention: each run enables one more facade stage; the survivor
  * delta is that stage's kill count and the cumulative-shuffle-write
  * delta its marginal exchange volume.
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "runMain graft.examples.Curate10MDemo [nDocs]"
  */
object Curate10MDemo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .appName("curate-10m-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val i = col("id")
    val grp = floor(i / 50L)
    val role = pmod(i, lit(50L)) // 0=template, 1=near-dup, 2=exact copy
    val seed = when(role === 1 || role === 2, grp * 50L).otherwise(i)
    val onTopic = pmod(i, lit(10L)) === 3
    // xxhash64 generator (NOT pmod-linear: see CurateScaleDemo's
    // collision note); on-topic docs route every third token into the
    // 200-token topical vocabulary
    val body = array_join(transform(sequence(lit(0), lit(29)),
      w => concat(
        when(onTopic && pmod(w, lit(3)) === 0,
          concat(lit("topic"), pmod(abs(xxhash64(seed, w)), lit(200L))))
          .otherwise(concat(lit("t"),
            pmod(abs(xxhash64(seed, w)), lit(50021L)))),
        when(pmod(w, lit(8)) === 7, lit(".")).otherwise(lit("")))), " ")
    val docs = spark.range(nDocs).select(
        i.as("doc_id"),
        concat(
          body,
          when(role === 1, lit(" extraneous")).otherwise(lit("")),
          lit(" All rights reserved footer line.")).as("text"))
      .localCheckpoint() // isolate generation from facade timing
    println(s"CURATE-10M input docs = ${docs.count()}")

    val bench = docs.filter(pmod(col("doc_id"), lit(4096L)) === 0)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val target = spark.range(50000).select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(29)),
          w => concat(lit("topic"),
            pmod(abs(xxhash64(col("id") + 7777777L, w)), lit(200L)))), " ")
          .as("text"))
      .localCheckpoint()

    // per-Spark-stage shuffle-write totals for prefix differencing
    val writeMb = new java.util.concurrent.atomic.DoubleAdder()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) writeMb.add(m.shuffleWriteMetrics.bytesWritten / 1e6)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // minhashK = 16 → OPH banding by default (DocPipeline.OphDefaultMinK)
    val full = Curate.Config(
      lineDedup = true,
      sentenceDedup = true,
      minWords = 10,
      maxTopTokenFrac = 0.5,
      minhashK = 16, bands = 8, tau = 0.7,
      benchmark = Some(bench),
      dsirTarget = Some(target),
      dsirKeep = 1000000)

    val prefixes: Seq[(String, Curate.Config)] = Seq(
      "gates+neardup OPH (floor)" -> Curate.Config(minWords = 10,
        maxTopTokenFrac = 0.5, minhashK = 16, bands = 8, tau = 0.7),
      "+ line dedup" -> full.copy(sentenceDedup = false, benchmark = None,
        dsirTarget = None, dsirKeep = 0),
      "+ sentence dedup" -> full.copy(benchmark = None,
        dsirTarget = None, dsirKeep = 0),
      "+ decontaminate" -> full.copy(dsirTarget = None, dsirKeep = 0),
      "+ DSIR keep=1M (FULL)" -> full)
    var prevN = nDocs
    var prevW = 0.0
    println(f"${"facade prefix"}%-28s ${"docs out"}%10s ${"stage kill"}%11s ${"marginal shuffle MB"}%20s ${"sec"}%7s")
    var lastKept: org.apache.spark.sql.DataFrame = null
    prefixes.foreach { case (label, cfg) =>
      val t0 = System.nanoTime()
      lastKept = Curate.run(docs, cfg)
      val n = lastKept.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val w = writeMb.sum()
      println(f"$label%-28s $n%10d ${prevN - n}%11d ${w - prevW}%20.1f $sec%7.1f")
      prevN = n; prevW = w
    }
    spark.sparkContext.removeSparkListener(listener)

    // DSIR selection quality: on-topic fraction of the kept 1M (base
    // rate 10%; a working ratio estimator concentrates hard on topic)
    val keptOnTopic = lastKept
      .filter(pmod(col("doc_id"), lit(10L)) === 3).count()
    println(f"CURATE-10M DSIR kept on-topic = $keptOnTopic%d / 1000000")

    // near-dup recall at floor with the default df-guard: plants are
    // role==1 docs (one-token near-dups of their group template)
    val plantIds = spark.range(nDocs).select(i.as("doc_id"))
      .filter(pmod(col("doc_id"), lit(50L)) === 1).localCheckpoint()
    val nPlants = plantIds.count()
    val surv = Curate.run(docs, prefixes.head._2).select("doc_id")
    val caught = plantIds.join(surv, Seq("doc_id"), "left_anti").count()
    println(f"CURATE-10M near-dup recall [floor, OPH, default guard]: $caught/$nPlants plants caught")
    spark.stop()
  }
}
