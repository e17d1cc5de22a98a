package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.DocPipeline

/** The incremental-dedup store-side exchange discipline (r15): per
  * batch, the persisted store may be SCANNED but never shuffled,
  * sorted, or distinct-aggregated — at corpus scale the store dwarfs
  * every batch, so an O(store) exchange per batch is the deployment's
  * dominant steady-state cost. The discipline is a measured broadcast
  * semi-filter (batch keys → store reads); these tests pin (a) result
  * equality between the semi-filtered and legacy shuffle plans, and
  * (b) the shuffle-byte envelope: with the semi-filter the per-call
  * shuffle traffic must be BATCH-scale, independent of the store. */
class StoreShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private def withThreshold[T](v: String)(f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try f
    finally spark.conf.set(key, old)
  }

  /** Sum of shuffle bytes written across all stages during `f`. */
  private def shuffleBytesOf[T](f: => T): (T, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      Thread.sleep(1500) // listener bus drains async
      (r, bytes.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def longDoc(w: String, n: Int = 60): String =
    Array.tabulate(n)(i => s"$w$i").mkString(" ")

  test("prepareIncremental: semi-filtered and legacy shuffle plans accept " +
      "identical sets, with the hub guard on and off") {
    val stored = (1L to 50L).map(i => (i, longDoc(s"s$i")))
    val store = DocPipeline.signatures(
      DocPipeline.prepare(stored.toDF("doc_id", "text"), minWords = 10))
      .localCheckpoint(true)
    val nearOf7 = (longDoc("s7").split(" ").dropRight(1) :+ "changed").mkString(" ")
    val batch = (Seq(
      (101L, longDoc("s3")),  // exact dup of stored
      (102L, nearOf7),        // near dup of stored
      (103L, longDoc("f1")),  // fresh
      (104L, longDoc("f1")),  // in-batch exact dup
      (105L, longDoc("f2"))   // fresh
    ) ++ (200L to 230L).map(i => (i, longDoc(s"g$i")))).toDF("doc_id", "text")
    def ids(df: DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    for (guard <- Seq(Long.MaxValue, 100L)) {
      val semi = withThreshold("10MB") {
        ids(DocPipeline.prepareIncremental(batch, store, minWords = 10,
          maxStoreBandDf = guard))
      }
      val legacy = withThreshold("-1") {
        ids(DocPipeline.prepareIncremental(batch, store, minWords = 10,
          maxStoreBandDf = guard))
      }
      assert(semi === legacy, s"guard=$guard")
      assert(semi.contains(103L) && semi.contains(105L) &&
        !semi.contains(101L) && !semi.contains(102L) && !semi.contains(104L))
    }
  }

  test("prepareIncremental: per-call shuffle bytes are batch-scale under the " +
      "semi-filter — the store never rides an exchange") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore-shuffle").toFile
    try {
      // store: 10k long docs persisted as parquet (a real file scan, the
      // production shape); batch: 40 docs
      val stored = spark.range(1, 10001).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(i =>
          concat(lit("w"), col("id"), lit(s"x$i"))): _*).as("text"))
      DocPipeline.signatures(stored).write.mode("overwrite")
        .parquet(dir.getAbsolutePath)
      val store = spark.read.parquet(dir.getAbsolutePath)
      val batch = ((1L to 20L).map(i => (20000L + i, longDoc(s"b$i"))) ++
        (1L to 20L).map(i => (30000L + i, longDoc(s"c$i")))).toDF("doc_id", "text")

      def run(): Long = DocPipeline.prepareIncremental(
        batch, store, minWords = 10, maxStoreBandDf = 100000L).count()

      val (nSemi, semiBytes) = shuffleBytesOf(withThreshold("10MB")(run()))
      val (nLegacy, legacyBytes) = shuffleBytesOf(withThreshold("-1")(run()))
      assert(nSemi === nLegacy)
      assert(nSemi === 40L)
      // legacy SMJs shuffle the store's fps, band keys, and shingle
      // arrays; the semi plan's exchanges carry batch-scale rows only.
      // The 4x margin is far inside the measured gap (store is 250x the
      // batch) but far outside any codec/layout noise.
      assert(semiBytes * 4 < legacyBytes,
        s"semi=$semiBytes legacy=$legacyBytes — store-side exchange leaked back in")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("streamChunkDedup: semi-filtered and legacy store plans keep identical " +
      "text and grow the store identically") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def runMode(thr: String): (Seq[(Long, String)], Set[String]) =
      withThreshold(thr) {
        val dir = java.nio.file.Files.createTempDirectory("chunkstore").toFile
        dir.delete()
        val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
        val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
        val q = DocPipeline.streamChunkDedup(
          input.toDF().toDF("doc_id", "text"), dir.getAbsolutePath,
          chunkTokens = 4) { (df, _) =>
          out ++= df.select("doc_id", "text_kept").collect()
            .map(r => (r.getLong(0), r.getString(1)))
        }
        try {
          input.addData((1L, "a b c d e f g h"), (2L, "a b c d x y z w"))
          q.processAllAvailable()
          input.addData((3L, "e f g h p q r s"), (4L, "n o t h i n g new"))
          q.processAllAvailable()
          val hashes = spark.read.parquet(dir.getAbsolutePath)
            .select(hex(col("h")).as("h")).collect().map(_.getString(0)).toSet
          (out.sortBy(_._1).toSeq, hashes)
        } finally {
          q.stop()
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
        }
      }
    val (semiOut, semiStore) = runMode("10MB")
    val (legacyOut, legacyStore) = runMode("-1")
    assert(semiOut === legacyOut)
    assert(semiStore === legacyStore)
    // chunk "e f g h" was accepted in batch 1 (doc 1) → doc 3 loses it
    // cross-batch under BOTH plans
    assert(semiOut.find(_._1 == 3L).get._2 === "p q r s")
  }

  test("streamSpanDedup: semi-filtered and legacy store plans agree — the " +
      "post-filter distinct still guards the history left join") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val doc = (w: String) => Array.tabulate(30)(i => s"$w$i").mkString(" ")
    def runMode(thr: String): Seq[(Long, String)] =
      withThreshold(thr) {
        val dir = java.nio.file.Files.createTempDirectory("spanstore").toFile
        dir.delete()
        val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
        val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
        val q = DocPipeline.streamSpanDedup(
          input.toDF().toDF("doc_id", "text"), dir.getAbsolutePath,
          n = 5, minTokens = 20) { (df, _) =>
          out ++= df.select("doc_id", "text_kept").collect()
            .map(r => (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1)))
        }
        try {
          input.addData((1L, doc("a")), (2L, s"${doc("a")} tail piece"))
          q.processAllAvailable()
          input.addData((3L, s"prefix bit ${doc("a")}"), (4L, doc("z")))
          q.processAllAvailable()
          out.sortBy(_._1).toSeq
        } finally {
          q.stop()
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
        }
      }
    val semi = runMode("10MB")
    val legacy = runMode("-1")
    assert(semi === legacy)
    // doc 3's copied 30-token span is cut against batch-1 history under
    // both plans; its fresh prefix survives
    assert(semi.find(_._1 == 3L).get._2 === "prefix bit")
  }

  test("two atomic streams on one store path: the second fences the first — " +
      "its next append dies loudly before any data write") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fencedstream").toFile
    dir.delete()
    val long = (w: String) => Array.tabulate(12)(i => s"$w$i").mkString(" ")
    val acc1 = scala.collection.mutable.ArrayBuffer[Long]()
    val acc2 = scala.collection.mutable.ArrayBuffer[Long]()
    val in1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val in2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q1 = DocPipeline.streamIncremental(
      in1.toDF().toDF("doc_id", "text"), dir.getAbsolutePath,
      minWords = 4, atomicStore = true) { (df, _) =>
      acc1 ++= df.select("doc_id").as[Long].collect()
    }
    try {
      in1.addData((1L, long("a")), (2L, long("b")))
      q1.processAllAvailable()
      assert(acc1.sorted.toSeq === Seq(1L, 2L))
      // deploy mistake: a second stream pointed at the SAME store —
      // it claims a higher epoch at start and takes over
      val q2 = DocPipeline.streamIncremental(
        in2.toDF().toDF("doc_id", "text"), dir.getAbsolutePath,
        minWords = 4, atomicStore = true) { (df, _) =>
        acc2 ++= df.select("doc_id").as[Long].collect()
      }
      try {
        in2.addData((10L, long("c")), (11L, long("a"))) // 11 dups stored 1
        q2.processAllAvailable()
        assert(acc2.sorted.toSeq === Seq(10L))
        // the fenced stream's next batch dies at the fence: no sink
        // delivery, no data written
        in1.addData((20L, long("z")))
        val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q1.processAllAvailable()
        }
        def causes(t: Throwable): Seq[String] =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
            .map(e => Option(e.getMessage).getOrElse("")).toSeq
        assert(causes(err).exists(_.contains("writer fenced")),
          causes(err).mkString(" | "))
        assert(!acc1.contains(20L))
        // the store holds exactly the committed accepts, single copy
        val stored = graft.sources.AppendStore.readOr(spark,
          dir.getAbsolutePath, spark.range(0).toDF("x"))
          .select("doc_id").as[Long].collect().sorted
        assert(stored.toSeq === Seq(1L, 2L, 10L))
        // and the surviving stream keeps working
        in2.addData((12L, long("q")))
        q2.processAllAvailable()
        assert(acc2.sorted.toSeq === Seq(10L, 12L))
      } finally q2.stop()
    } finally {
      q1.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("streamEmbeddingDedup: semi-filtered and legacy store plans accept " +
      "identical vector sets") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(j => ((seed * 31 + j * 7) % 13).toFloat + 1f)
    def runMode(thr: String): Seq[Long] =
      withThreshold(thr) {
        val dir = java.nio.file.Files.createTempDirectory("embstore").toFile
        dir.delete()
        val accepted = scala.collection.mutable.ArrayBuffer[Long]()
        val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
        val q = DocPipeline.streamEmbeddingDedup(
          input.toDF().toDF("vec_id", "embedding"), dir.getAbsolutePath,
          dim = 8, idCol = "vec_id", vecCol = "embedding", tau = 0.999) { (df, _) =>
          accepted ++= df.select("vec_id").as[Long].collect()
        }
        try {
          input.addData((1L, vec(1)), (2L, vec(2)))
          q.processAllAvailable()
          // 3 = exact re-submit of 1 (cosine 1.0 vs history), 4 fresh
          input.addData((3L, vec(1)), (4L, vec(9)))
          q.processAllAvailable()
          accepted.sorted.toSeq
        } finally {
          q.stop()
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
        }
      }
    val semi = runMode("10MB")
    val legacy = runMode("-1")
    assert(semi === legacy)
    assert(semi === Seq(1L, 2L, 4L))
  }
}
