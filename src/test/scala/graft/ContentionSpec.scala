package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}

import org.apache.spark.sql.functions._
import graft.sources.{AppendStore, AtomicCommit}

/** Store concurrency under REAL contention — the execution evidence the
  * sequential fencing/vacuum specs cannot give (VERDICT r14 #4): racing
  * threads against one store exercise the rename-CAS and the
  * commit-to-vacuum window as they actually interleave, not as a
  * single-threaded script replays them. One JVM, many threads — the
  * same shape as two driver processes sharing a filesystem, because
  * every primitive under test (exists / rename / delete) goes through
  * the Hadoop FileSystem, not JVM state.
  *
  * Honest contracts pinned here, matching the scaladoc at each site:
  *   - AppendStore reads racing compact+vacuum either FAIL CLEANLY
  *     (missing-file class — the version the reader resolved fell past
  *     vacuum's retention floor; a retry succeeds) or return a
  *     CONSISTENT set: complete batches only, never a torn file set,
  *     never foreign rows. Duplicate ROWS are allowed only in the
  *     compact-commit-to-vacuum window (set-level equality, the
  *     documented dedup-store semantics).
  *   - The commit CAS admits ≥1 winner per version under a thread
  *     barrier (exactly one on HDFS-class rename-no-overwrite;
  *     RawLocalFileSystem can double-win — the scaladoc's "best-effort
  *     guard"), losers fail cleanly, and the committed manifest is a
  *     claimed winner's.
  *   - A fenced zombie cannot append after its retry claims a newer
  *     epoch, even when the zombie is already mid-flight; its
  *     uncommitted debris is invisible and vacuumable.
  */
class ContentionSpec extends SparkTestBase {

  import spark.implicits._

  private def batchDf(b: Int, rows: Int = 200) =
    spark.range(b.toLong * 100000L, b.toLong * 100000L + rows)
      .select(col("id"), lit(b).as("batch"))

  test("reader racing AppendStore compaction+vacuum: every successful read " +
      "is a complete-batch prefix set; failures are missing-file only") {
    val root = java.nio.file.Files.createTempDirectory("contread")
      .resolve("store").toString
    val nBatches = 6
    (0 until 3).foreach(b => AppendStore.append(batchDf(b), root))

    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var successes = 0
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val got = AppendStore.readOr(spark, root, sys.error("empty"))
            .select("id", "batch").collect()
          val byBatch = got.groupBy(_.getInt(1)).map { case (b, rs) =>
            b -> rs.map(_.getLong(0)).toSet }
          // complete batches only …
          byBatch.foreach { case (b, ids) =>
            if (ids != (b.toLong * 100000L until b.toLong * 100000L + 200).toSet)
              anomalies.add(s"torn batch $b: ${ids.size} rows")
          }
          // … forming a contiguous prefix of the append order (unions of
          // committed versions can never skip a batch: compaction folds
          // ALL committed content into the new version)
          val bs = byBatch.keySet
          if (bs.nonEmpty && bs != (0 to bs.max).toSet)
            anomalies.add(s"non-prefix batch set $bs")
          successes += 1
        } catch {
          case e: Throwable =>
            // benign = torn read, classified by the ONE shared engine
            // matcher (r19 — was an inline copy of the signature list)
            if (!graft.sources.TornReads.matches(e)) {
              val s = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
                .take(16).map(_.toString).mkString(" | ")
              anomalies.add(s"unexpected failure: $s")
            }
        }
      }
    })
    reader.start()
    try {
      (3 until nBatches).foreach { b =>
        AppendStore.append(batchDf(b), root)
        AppendStore.compact(spark, root) // fold + vacuum(keep=1), racing the reader
      }
    } finally { stop.set(true); reader.join(30000) }
    assert(anomalies.isEmpty, s"reader anomalies: ${anomalies.toArray.mkString("; ")}")
    assert(successes > 0, "degenerate race: reader never completed a read")
    // the settled store holds exactly every batch, once
    val fin = AppendStore.readOr(spark, root, sys.error("empty"))
    assert(fin.count() === nBatches * 200L)
    assert(fin.select("id").distinct().count() === nBatches * 200L)
  }

  test("commit CAS under a thread barrier: losers fail cleanly, the " +
      "committed manifest is a claimed winner's, the store stays readable") {
    // Honesty note: on HDFS-class filesystems rename-no-overwrite is
    // atomic and this race has EXACTLY one winner; LocalFileSystem's
    // rename is check-then-rename, so a barrier-released same-version
    // race can double-win, and — the measured finding this spec
    // produced — can interleave one writer's manifest BODY with the
    // other's checksum SIDECAR. Because rename is atomic per file, the
    // body is still exactly one racer's complete bytes; readBody's
    // checksum-fallback (added for this finding) recovers it, so a
    // torn sidecar no longer bricks the store (pre-fix, one tear made
    // latest/vacuum/every reader throw forever). Reaching the state at
    // all requires two unfenced writers committing the same version
    // simultaneously — a double violation of the single-writer +
    // fencing contract (AtomicCommit scaladoc records the limit). The
    // spec pins what holds on BOTH filesystems: losers fail cleanly
    // (false, never a throw), no tmp debris, and each round's manifest
    // resolves to a claimed winner's complete body — never torn bytes,
    // never a bricked store.
    val root = java.nio.file.Files.createTempDirectory("contcas")
      .resolve("store").toString
    AtomicCommit.commit(spark, root, 1L, "base")
    var torn = 0
    (0 until 10).foreach { round =>
      val v = AtomicCommit.nextVersion(spark, root)
      val barrier = new CyclicBarrier(4)
      val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (0 until 4).map { i =>
        new Thread(() => {
          try {
            barrier.await(120, TimeUnit.SECONDS)
            if (AtomicCommit.commit(spark, root, v, s"writer-$i")) wins.add(i)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(120000))
      assert(errs.isEmpty, s"round $round: racing commit threw ${errs.peek()}")
      assert(wins.size >= 1, s"round $round: no CAS winner for v=$v")
      val winners = wins.toArray(Array.empty[Integer]).map(i => s"writer-$i").toSet
      try {
        val (latestV, body) = AtomicCommit.latest(spark, root).get
        assert(latestV === v && winners.contains(body),
          s"round $round: committed body '$body' not among claimed winners $winners")
      } catch {
        case e: Throwable
            if Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
              .take(8).exists(_.isInstanceOf[org.apache.hadoop.fs.ChecksumException]) =>
          // local-FS torn manifest: detected loudly, never wrong data
          torn += 1
      }
    }
    info(s"torn manifests under the deliberate same-version race: $torn/10 " +
      "(0 on HDFS-class rename; any >0 here is the documented local-FS limit)")
    // the version chain is dense afterwards (torn versions still occupy
    // their slot — the race burned them, it did not corrupt neighbors)
    assert(AtomicCommit.committedVersions(spark, root) === (1L to 11L))
    // no tmp-commit debris left behind by any loser
    val leftover = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("_tmp-commit"))
    assert(leftover.isEmpty, s"tmp debris: ${leftover.map(_.getName).toSeq}")
  }

  test("exclusive-create publisher (the S3 conditional-PUT shape): the " +
      "same barrier race has EXACTLY one winner per round, zero torn " +
      "manifests, and the full store lifecycle runs through it") {
    // spark.graft.casPublisher=create routes BOTH CAS points (version
    // commits, epoch claims) through one exclusive create — no tmp
    // object, no rename — which is atomic even on LocalFileSystem, so
    // the rename test's documented double-win/torn-sidecar limit
    // cannot occur: the loser's create throws before a byte lands.
    // This is the executable form of the AtomicCommit scaladoc's
    // object-store claim (only the publication point needs a
    // primitive; everything else is write-once).
    val root = java.nio.file.Files.createTempDirectory("contcreate")
      .resolve("store").toString
    spark.conf.set("spark.graft.casPublisher", "create")
    try {
      AtomicCommit.commit(spark, root, 1L, "base")
      (0 until 10).foreach { round =>
        val v = AtomicCommit.nextVersion(spark, root)
        val barrier = new CyclicBarrier(4)
        val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val ts = (0 until 4).map { i =>
          new Thread(() => {
            try {
              barrier.await(120, TimeUnit.SECONDS)
              if (AtomicCommit.commit(spark, root, v, s"writer-$i")) wins.add(i)
            } catch { case t: Throwable => errs.add(t) }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join(120000))
        assert(errs.isEmpty, s"round $round: racing commit threw ${errs.peek()}")
        assert(wins.size === 1,
          s"round $round: exclusive create must have exactly one winner, got ${wins.size}")
        val (latestV, body) = AtomicCommit.latest(spark, root).get
        assert(latestV === v && body === s"writer-${wins.peek()}",
          s"round $round: body '$body' is not the sole winner's")
      }
      assert(AtomicCommit.committedVersions(spark, root) === (1L to 11L))
      // racing epoch claims through the same publisher: 4 threads all
      // acquire, all epochs distinct (each create-exclusive is won once)
      val eBarrier = new CyclicBarrier(4)
      val epochs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val ets = (0 until 4).map { _ =>
        new Thread(() => {
          eBarrier.await(120, TimeUnit.SECONDS)
          epochs.add(AtomicCommit.acquireEpoch(spark, root, "racer"))
        })
      }
      ets.foreach(_.start()); ets.foreach(_.join(120000))
      val es = epochs.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
      assert(es.size === 4 && es.distinct.size === 4, s"epoch collision: $es")
      // end-to-end: an AppendStore lifecycle (append/read/compact/vacuum)
      // over the create publisher — no path in the protocol depends on
      // rename semantics beyond the publisher
      import spark.implicits._
      val storeRoot = java.nio.file.Files.createTempDirectory("contcreate2")
        .resolve("astore").toString
      graft.sources.AppendStore.append((1L to 100L).toDF("id"), storeRoot)
      graft.sources.AppendStore.append((101L to 200L).toDF("id"), storeRoot)
      graft.sources.AppendStore.compact(spark, storeRoot)
      AtomicCommit.vacuum(spark, storeRoot, keepVersions = 1)
      val got = graft.sources.AppendStore
        .readOr(spark, storeRoot, sys.error("missing"))
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got === (1L to 200L).toArray, "lifecycle content drifted")
    } finally spark.conf.unset("spark.graft.casPublisher")
  }

  test("exclusive-create publication is atomic WITH content: local wins " +
      "ride a hard link (no empty-file window, no tmp debris) and " +
      "hdfs:// destinations are refused loudly") {
    // ADVICE r15: existence-atomicity is not publication-atomicity — a
    // create that claims the namespace before the bytes land can expose
    // a committed version with an empty manifest. Locally the fix is
    // link(2): dst appears with the tmp file's FULL content in one
    // syscall; on HDFS no such primitive backs create(dst,false), so
    // the publisher must refuse rather than publish a torn state.
    val dir = java.nio.file.Files.createTempDirectory("contlink")
    val rootPath = new org.apache.hadoop.fs.Path(dir.toString)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir.toString, "42")
    val pub = AtomicCommit.ExclusiveCreatePublisher
    assert(pub.publishIfAbsent(fs, rootPath, dst, "full-manifest".getBytes("UTF-8")))
    val nio = java.nio.file.Paths.get(dir.toString, "42")
    assert(new String(java.nio.file.Files.readAllBytes(nio), "UTF-8") === "full-manifest")
    // loser fails cleanly and leaves the winner's bytes untouched
    assert(!pub.publishIfAbsent(fs, rootPath, dst, "loser".getBytes("UTF-8")))
    assert(new String(java.nio.file.Files.readAllBytes(nio), "UTF-8") === "full-manifest")
    // no _tmp-cas debris from either attempt
    val names = {
      val s = java.nio.file.Files.list(dir)
      try {
        val it = s.iterator(); val b = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) b += it.next().getFileName.toString
        b.toSeq
      } finally s.close()
    }
    assert(names === Seq("42"), s"debris: $names")
    val e = intercept[IllegalArgumentException] {
      pub.publishIfAbsent(fs, rootPath,
        new org.apache.hadoop.fs.Path("hdfs://nn:8020/store/_commits/1"),
        "x".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("casPublisher=rename") ||
      e.getMessage.contains("spark.graft.casPublisher=rename"))
    // ADVICE r16: the scheme check is an ALLOWLIST — every
    // create-then-flush filesystem is refused, not just the literal
    // "hdfs": abfs creates the blob path entry at create() with data
    // landing only at flush/close, and viewfs/webhdfs route to HDFS
    // semantics under different scheme strings
    Seq("viewfs://cluster/store/_commits/1",
        "webhdfs://nn:50070/store/_commits/1",
        "abfs://c@acct.dfs.core.windows.net/store/_commits/1").foreach { u =>
      val ex = intercept[IllegalArgumentException] {
        pub.publishIfAbsent(fs, rootPath,
          new org.apache.hadoop.fs.Path(u), "x".getBytes("UTF-8"))
      }
      assert(ex.getMessage.contains("allowlist"), s"$u: ${ex.getMessage}")
    }
  }

  test("fenced zombie mid-flight: the retry's takeover makes the zombie's " +
      "next append fail, its debris stays invisible, vacuum clears it") {
    val root = java.nio.file.Files.createTempDirectory("contfence")
      .resolve("store").toString
    val zombieStarted = new CountDownLatch(1)
    val retryDone = new CountDownLatch(1)
    @volatile var zombieSecondAppend: Option[Throwable] = null
    val zombie = new Thread(() => {
      val e1 = AtomicCommit.acquireEpoch(spark, root, "attempt-1")
      AppendStore.append(batchDf(0), root, fenceEpoch = Some(e1))
      zombieStarted.countDown()
      // …the orchestrator declares this attempt stalled and retries;
      // the zombie wakes later and tries to keep writing
      assert(retryDone.await(30, TimeUnit.SECONDS))
      zombieSecondAppend =
        try { AppendStore.append(batchDf(9), root, fenceEpoch = Some(e1)); None }
        catch { case t: Throwable => Some(t) }
    })
    zombie.start()
    assert(zombieStarted.await(30, TimeUnit.SECONDS))
    val e2 = AtomicCommit.acquireEpoch(spark, root, "attempt-2")
    AppendStore.append(batchDf(1), root, fenceEpoch = Some(e2))
    retryDone.countDown()
    zombie.join(30000)
    // the zombie's post-takeover append died at the fence, BEFORE any
    // data write (no v= debris from it) — checkFence's contract
    assert(zombieSecondAppend != null && zombieSecondAppend.isDefined,
      "zombie append after takeover must fail")
    assert(zombieSecondAppend.get.getMessage.contains("fenced"))
    val content = AppendStore.readOr(spark, root, sys.error("empty"))
      .select("batch").distinct().collect().map(_.getInt(0)).toSet
    assert(content === Set(0, 1), s"store holds $content")
    // a zombie that instead died MID-DATA-WRITE leaves uncommitted
    // debris: invisible to readers, removed by vacuum
    batchDf(9).write.parquet(AtomicCommit.versionDir(root,
      AtomicCommit.nextVersion(spark, root)))
    assert(AppendStore.readOr(spark, root, sys.error("empty"))
      .select("batch").distinct().collect().map(_.getInt(0)).toSet === Set(0, 1))
    val removed = AtomicCommit.vacuum(spark, root, keepVersions = 2)
    assert(removed.exists(_.contains("v=")), s"vacuum removed: $removed")
    assert(AppendStore.readOr(spark, root, sys.error("empty")).count() === 400L)
  }

  test("compact crash window self-heals: a fold committed but not vacuumed " +
      "doubles rows (set unchanged); the re-run converges to single-copy") {
    val root = java.nio.file.Files.createTempDirectory("contheal")
      .resolve("store").toString
    (0 until 3).foreach(b => AppendStore.append(batchDf(b), root))
    // crash simulation: the fold lands and commits, then the process
    // dies before vacuum — exactly AppendStore.compact minus its vacuum
    val all = AppendStore.readOr(spark, root, sys.error("empty"))
    AppendStore.append(all, root)
    val dup = AppendStore.readOr(spark, root, sys.error("empty"))
    assert(dup.count() === 1200L, "commit-to-vacuum window must double rows")
    assert(dup.select("id").distinct().count() === 600L,
      "set-level content must be unchanged in the window")
    // plain compact() folds rows as-is (a generic append store cannot
    // know duplicates are semantic), so the window's row-doubles
    // SURVIVE a naive re-compact; recovery for set-semantics stores is
    // the rebucketEmbeddingStore pattern: fold the DISTINCT content,
    // then vacuum to the fold
    AppendStore.compact(spark, root)
    assert(AppendStore.readOr(spark, root, sys.error("empty")).count() === 1200L,
      "plain compact must not invent row dedup")
    val distinctFold = AppendStore.readOr(spark, root, sys.error("empty"))
      .distinct().localCheckpoint() // materialize BEFORE appending to the store it reads
    AppendStore.append(distinctFold, root)
    AtomicCommit.vacuum(spark, root, keepVersions = 1)
    val healed = AppendStore.readOr(spark, root, sys.error("empty"))
    assert(healed.count() === 600L && healed.select("id").distinct().count() === 600L)
  }
}
