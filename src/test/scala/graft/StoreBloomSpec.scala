package graft

import org.apache.spark.sql.functions._
import graft.ext.DocPipeline
import graft.sources.StoreBloom

/** The r15 store-bloom fast path: results must be BIT-IDENTICAL with
  * the gate on and off (a bloom hit only routes to the full path; a
  * miss is a proof of absence), the sidecar must survive round-trips,
  * under-coverage must trigger rebuilds, and the streaming writer's
  * bloom-before-append ordering must keep crash replays safe. */
class StoreBloomSpec extends SparkTestBase {

  import spark.implicits._

  private def long(w: String) = Array.tabulate(40)(i => s"$w$i").mkString(" ")

  private def mkStore(words: String*): org.apache.spark.sql.DataFrame =
    DocPipeline.signatures(
      words.zipWithIndex.map { case (w, i) => (100L + i, long(w)) }
        .toDF("doc_id", "text"))

  test("sidecar round-trip preserves membership, coverage and capacity") {
    val dir = java.nio.file.Files.createTempDirectory("bloomrt").toString + "/store"
    val b = StoreBloom.create(expectedDocs = 1000, bands = 4)
    StoreBloom.addBatch(b, Array(7L, 8L), Array(70L, 71L, 80L))
    StoreBloom.save(spark, dir, b)
    val r = StoreBloom.load(spark, dir).get
    assert(r.rows === 2 && r.fpCap === 1000 && r.bandCap === 4000)
    assert(r.fp.mightContainLong(7L) && r.fp.mightContainLong(8L))
    assert(r.band.mightContainLong(70L) && r.band.mightContainLong(80L))
    StoreBloom.invalidate(spark, dir)
    assert(StoreBloom.load(spark, dir).isEmpty)
  }

  test("outgrown trigger: inserts past creation capacity demand a rebuild") {
    val b = StoreBloom.create(expectedDocs = 2, bands = 4)
    assert(!b.outgrown(4))
    StoreBloom.addBatch(b, Array.tabulate(3)(_.toLong),
      Array.tabulate(12)(_ + 100L))
    assert(b.outgrown(4))
  }

  test("fromStore covers every stored fp and band key (no false negatives)") {
    val store = mkStore("aaa", "bbb", "ccc")
    val b = StoreBloom.fromStore(store, bands = 4, minDocs = 16)
    val rows = store.select(col("fp"), col("band_keys")).collect()
    rows.foreach { r =>
      assert(b.fp.mightContainLong(r.getLong(0)))
      r.getSeq[Long](1).foreach(k => assert(b.band.mightContainLong(k)))
    }
    assert(b.rows === 3)
  }

  test("fromStore distributed rebuild (per-partition partials + treeReduce) " +
      "and the driver-serial fallback cover identically") {
    // ADVICE r15: the rebuild now genuinely aggregates per partition
    // (executor-parallel hashing, bitmap OR executor-side); the serial
    // toLocalIterator fold remains the memory-honest path for caps
    // whose full-size partial pair no task could hold. Same coverage
    // contract either way: every stored key present, same sizing.
    val store = mkStore("ddd", "eee", "fff").repartition(3)
    val dist = StoreBloom.fromStore(store, bands = 4, minDocs = 16)
    val serial = StoreBloom.fromStore(store, bands = 4, minDocs = 16,
      maxPartialBytes = 0L)
    val rows = store.select(col("fp"), col("band_keys")).collect()
    rows.foreach { r =>
      assert(dist.fp.mightContainLong(r.getLong(0)))
      assert(serial.fp.mightContainLong(r.getLong(0)))
      r.getSeq[Long](1).foreach { k =>
        assert(dist.band.mightContainLong(k))
        assert(serial.band.mightContainLong(k))
      }
    }
    assert(dist.rows === 3 && serial.rows === 3)
    assert(dist.fpCap === serial.fpCap && dist.bandCap === serial.bandCap)
    // an empty store still yields a correctly-sized (empty) pair
    val empty = StoreBloom.fromStore(mkStore().limit(0), bands = 4, minDocs = 16)
    assert(empty.rows === 0 && empty.fpCap === 16)
  }

  test("prepareIncremental accepted sets are bit-identical gate on/off: " +
      "mixed batch (exact dup, near dup, fresh) and all-fresh batch") {
    val store = mkStore("aaa", "bbb").cache()
    val gate = StoreBloom.fromStore(store, bands = 4, minDocs = 16)
    val mixed = Seq(
      (1L, long("aaa")),                                              // exact dup
      (2L, (long("bbb").split(" ").dropRight(1) :+ "x").mkString(" ")), // near dup
      (3L, long("zzz"))).toDF("doc_id", "text")                       // fresh
    def run(batch: org.apache.spark.sql.DataFrame,
            g: Option[StoreBloom.SigBlooms]): Set[Long] =
      DocPipeline.prepareIncrementalWithHashes(batch, store, "doc_id", "text",
        minWords = 10, minhashK = 8, bands = 4, tau = 0.8, bloomGate = g)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(mixed, Some(gate)) === run(mixed, None))
    assert(run(mixed, Some(gate)) === Set(3L))
    val fresh = Seq((5L, long("qqq")), (6L, long("rrr"))).toDF("doc_id", "text")
    assert(run(fresh, Some(gate)) === run(fresh, None))
    assert(run(fresh, Some(gate)) === Set(5L, 6L))
    // an over-representing gate (crash window: bloom saved, append
    // lost) must not reject — hits only ROUTE to the full path, and
    // the store itself has no row for doc 7
    StoreBloom.addBatch(gate,
      DocPipeline.signatures(Seq((7L, long("www"))).toDF("doc_id", "text"))
        .select("fp").collect().map(_.getLong(0)),
      Array.empty[Long])
    val replay = Seq((7L, long("www"))).toDF("doc_id", "text")
    assert(run(replay, Some(gate)) === Set(7L))
    store.unpersist()
  }

  test("streaming: bloom sidecar written before the append covers the " +
      "store, a stale sidecar rebuilds, history still wins after restart") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = java.nio.file.Files.createTempDirectory("bloomstream").toFile
    store.delete()
    val in1 = MemoryStream[(Long, String)]
    val q1 = DocPipeline.streamIncremental(
      in1.toDF().toDF("doc_id", "text"), store.getAbsolutePath,
      minWords = 10) { (_, _) => () }
    try { in1.addData((1L, long("aaa")), (2L, long("bbb"))); q1.processAllAvailable() }
    finally q1.stop()
    // the sidecar exists and covers the appended rows
    val b = StoreBloom.load(spark, store.getAbsolutePath).get
    assert(b.rows === 2)
    val storedFps = spark.read.parquet(store.getAbsolutePath)
      .select("fp").collect().map(_.getLong(0))
    storedFps.foreach(fp => assert(b.fp.mightContainLong(fp)))
    // poison the sidecar with an UNDER-covering bloom (rows = 0,
    // empty filters): the restart must detect rows < store rows,
    // rebuild from the store, and still reject history
    StoreBloom.save(spark, store.getAbsolutePath,
      StoreBloom.create(expectedDocs = 16, bands = 4))
    val in2 = MemoryStream[(Long, String)]
    var ok = Seq.empty[Long]
    val q2 = DocPipeline.streamIncremental(
      in2.toDF().toDF("doc_id", "text"), store.getAbsolutePath,
      minWords = 10) { (df, _) =>
      ok = df.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    }
    try {
      in2.addData(
        (3L, long("aaa")),  // exact re-crawl: must reject
        (4L, (long("bbb").split(" ").dropRight(1) :+ "x").mkString(" ")), // near
        (5L, long("fff"))) // fresh
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ok === Seq(5L), s"stale-sidecar restart must still dedup: $ok")
    // the rebuilt sidecar persisted with the new batch folded in
    assert(StoreBloom.load(spark, store.getAbsolutePath).get.rows === 3)
    // rebuildSignatureStore voids the sidecar
    DocPipeline.rebuildSignatureStore(
      Seq((1L, long("aaa")), (2L, long("bbb")), (5L, long("fff")))
        .toDF("doc_id", "text"),
      store.getAbsolutePath, minhashK = 8, bands = 4)
    assert(StoreBloom.load(spark, store.getAbsolutePath).isEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(store)
  }
}
