package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** Measures the LAST store-proportional per-batch term left after the
  * r15 exchange discipline: the store COLUMN SCAN. Every incremental
  * batch scans the store's fp column (exact anti-join), its band_keys
  * column — twice when the hub guard is finite — and (candidates only)
  * its shingles column. The store rides no exchange, but scan I/O is
  * O(store) per batch, so at a fixed batch size the per-batch wall
  * grows linearly with the store; this probe measures that slope in
  * isolation and answers §7.9 #2's gate: at what store/batch ratio
  * does scan I/O dominate the batch pipeline on this box?
  *
  * Isolation discipline: the corpus vocabulary is PER-DOC-UNIQUE
  * (full-width xxhash64 token names), so band buckets are pair-private
  * and the batch shares no fp, band key, or shingle with the store —
  * candidate volume is ~0 at every store size and the measured slope
  * is pure scan + semi-filter cost, not candidate growth (the
  * shared-vocab confound StoreStreamShapeDemo documents). The batch is
  * also ALL-FRESH, which is exactly the traffic class a per-version
  * fp/band bloom sidecar could fast-path — the slope here is the
  * ceiling such a sidecar could reclaim.
  *
  * Run: sbt "runMain graft.examples.ScanFloorDemo [batchDocs] [maxStoreM]".
  */
object ScanFloorDemo {

  def main(args: Array[String]): Unit = {
    val batchDocs = args.headOption.map(_.toLong).getOrElse(30000L)
    val maxStoreM = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("scan-floor-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("scanfloor")
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // per-doc-unique vocabulary: xxhash64(id, position) token names —
    // no cross-doc token collisions, so blocking is pair-private
    def docText(id: org.apache.spark.sql.Column) =
      array_join(transform(sequence(lit(1), lit(50)),
        w => concat(lit("u"), xxhash64(id, w))), " ")

    val batch = spark.range(900000000L, 900000000L + batchDocs)
      .select(col("id").as("doc_id"), docText(col("id")).as("text"))
      .localCheckpoint()
    // batch-only floor: the same pipeline against an empty store
    val emptyStore = DocPipeline.signatures(batch.limit(0))
    val batchOnly = (1 to 3).map(_ => timed(
      DocPipeline.prepareIncremental(batch, emptyStore, minWords = 10,
        maxStoreBandDf = 100000L).count())).min

    println(f"SCAN-FLOOR: batch $batchDocs%,d docs, batch-only pipeline $batchOnly%.2f s")
    var storeM = 1
    while (storeM <= maxStoreM) {
      val n = storeM * 1000000L
      val path = tmp.resolve(s"store_$storeM").toString
      val docs = spark.range(n)
        .select(col("id").as("doc_id"), docText(col("id")).as("text"))
      val wBuild = timed(
        graft.sources.AppendStore.sized(DocPipeline.signatures(docs))
          .write.parquet(path))
      val store = spark.read.parquet(path)
      // one unmeasured warmup: page cache + parquet footers — the
      // steady state a long-running deployment's executors sit in
      // (slower storage makes the COLD slope strictly worse)
      DocPipeline.prepareIncremental(batch, store, minWords = 10,
        maxStoreBandDf = 100000L).count()
      val walls = (1 to 3).map(_ => timed(
        DocPipeline.prepareIncremental(batch, store, minWords = 10,
          maxStoreBandDf = 100000L).count()))
      val w = walls.min
      val scanShare = 100.0 * (w - batchOnly) / w
      // the bloom fast path (r15): driver-held store blooms prove this
      // all-fresh batch can't match, so every store scan is skipped —
      // the per-batch wall should flatten to ~batch-only at EVERY
      // store size (the build is once per stream start / capacity
      // doubling, amortized across all batches in between)
      val wBloom0 = System.nanoTime()
      val gate = graft.sources.StoreBloom.fromStore(store, bands = 4)
      val wBloomBuild = (System.nanoTime() - wBloom0) / 1e9
      val bWalls = (1 to 3).map(_ => timed(
        DocPipeline.prepareIncrementalWithHashes(batch, store, "doc_id", "text",
          minWords = 10, minhashK = 8, bands = 4, tau = 0.8,
          maxStoreBandDf = 100000L, bloomGate = Some(gate)).count()))
      println(f"SCAN-FLOOR: store ${storeM}M (build $wBuild%.1f s) — per-batch wall " +
        f"$w%.2f s (min of ${walls.map(x => f"$x%.2f").mkString("/")}); " +
        f"store-proportional share ≈ $scanShare%.0f%%; bloom fast path " +
        f"${bWalls.min}%.2f s (bloom build $wBloomBuild%.1f s, once per start)")
      storeM *= 2
    }

    // ── SHARDED (r16): the structural close of the residual slope.
    // The same total corpus split into 8 per-tenant shards: a
    // tenant-affine batch (the deployment norm — each stream serves
    // one content domain) reads ONLY its shard's fp/band columns, so
    // its per-batch wall tracks the SHARD size, not the corpus size —
    // the flat-slope claim, measured through the real sharded
    // streaming path (routing census + per-shard store step included).
    // maxStoreM = 0 runs ONLY this section (skips the unsharded sweep)
    if (maxStoreM >= 8 || maxStoreM == 0) {
      val nShards = 8
      val root = tmp.resolve("sharded").toString
      // route each tenant through the production router so the demo
      // lays shards out exactly where streamIncrementalSharded looks
      val shardOfTenant = (0 until nShards).map { t =>
        t -> spark.range(1)
          .select(DocPipeline.shardOf(lit(s"tenant$t"), nShards))
          .head().getLong(0)
      }.toMap
      val wShardBuild = timed {
        (0 until nShards).foreach { t =>
          val docs = spark.range(t * 1000000L, (t + 1) * 1000000L)
            .select(col("id").as("doc_id"), docText(col("id")).as("text"))
          graft.sources.AppendStore.sized(DocPipeline.signatures(docs))
            .write.mode("append")
            .parquet(DocPipeline.shardPath(root, shardOfTenant(t)))
        }
      }
      val touched = shardOfTenant(3)
      val shardRows = spark.read.parquet(DocPipeline.shardPath(root, touched)).count()
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
      val q = DocPipeline.streamIncrementalSharded(
        in.toDF().toDF("doc_id", "tenant", "text"), root, col("tenant"),
        nShards, minWords = 10, bloom = false) { (_, _) => () }
      val shardWalls = try {
        (0 to 2).map { i =>
          val base = 950000000L + i * batchDocs
          val batchRows = spark.range(base, base + batchDocs)
            .select(col("id"), lit("tenant3"),
              docText(col("id")).cast("string"))
            .as[(Long, String, String)].collect().toSeq
          in.addData(batchRows)
          timed(q.processAllAvailable())
        }
      } finally q.stop()
      // walls(0) pays stream start-up (meta sidecars, first store
      // read); the steady state is the later batches. The stream wall
      // also includes the store APPEND + signature derivation the
      // unsharded sweep's bare prepareIncremental().count() does not —
      // so ALSO measure the identical bare call against the touched
      // shard's store: apples-to-apples with the sweep, the flat-slope
      // number
      println(f"SCAN-FLOOR SHARDED: ${nShards}M docs in $nShards shards " +
        f"(build $wShardBuild%.1f s); tenant-affine $batchDocs%,d-doc batch " +
        f"touches shard=$touched ($shardRows%,d rows) — streamed per-batch wall " +
        s"${shardWalls.map(x => f"$x%.2f").mkString("/")} s " +
        "(first = start-up; includes append + signatures)")
      val shardStore = spark.read.parquet(DocPipeline.shardPath(root, touched))
      DocPipeline.prepareIncremental(batch, shardStore, minWords = 10,
        maxStoreBandDf = 100000L).count() // warmup (page cache, footers)
      val bare = (1 to 3).map(_ => timed(
        DocPipeline.prepareIncremental(batch, shardStore, minWords = 10,
          maxStoreBandDf = 100000L).count())).min
      println(f"SCAN-FLOOR SHARDED: bare prepareIncremental vs the touched " +
        f"shard ($shardRows%,d rows) $bare%.2f s — compare the sweep's wall " +
        "at the SAME store size vs its 8M wall: the per-batch scan tracks " +
        "the shard, not the corpus")
    }
    spark.stop()
  }
}
