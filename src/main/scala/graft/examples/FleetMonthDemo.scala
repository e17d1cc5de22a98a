package graft.examples

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.CutOps
import graft.ext.{DocPipeline, Eval, Ivf}
import graft.sources.{AppendStore, AtomicCommit}

/** THE FULL OPERATIONAL SUPERPOSITION (r17: VERDICT r16 #7's fleet;
  * r18: VERDICT r17 #1/#4/#6 — ANN serve, a rolling promotion, and a
  * reshard-canary day all INSIDE the same run): a 10M-class sharded
  * ops month where FOUR concurrent streaming writers (disjoint tenant
  * sets, one shared root), THREE sustained reader threads, rolling
  * per-shard maintenance, a mid-fleet monster-tenant promotion, a
  * side-by-side reshard racing live writer load, and a full IVF index
  * lifecycle all run AT THE SAME TIME — per-cycle invariants asserted
  * for every tenant, end-of-month audits exact.
  *
  *   - 8 tenants → 8 shards of ONE root (tenant-affine routing); the
  *     root is BOOTSTRAPPED with `reshardSignatureStores` (500k
  *     docs/tenant — `_shard_meta` finalized BEFORE any stream);
  *   - 4 concurrent `streamIncrementalSharded` writers, 2 tenants
  *     each, atomic stores, ALL SCOPED (r18 `tenantScope`): each
  *     writer declares its tenants and checks only its slice of the
  *     outlier table pins — the mechanism that makes the promotion
  *     day below a stop-one-writer operation;
  *   - per cycle and per tenant: 90k fresh (ALL accepted), 10k exact
  *     re-crawls of the boot corpus (ALL rejected), 2k CROSS-STREAM
  *     copies from the ring-adjacent tenant's previous cycle (ALL
  *     accepted — shards are independent dedup domains across writer
  *     PROCESSES);
  *   - readers run through everything: a dedup-probe reader against a
  *     LIVE writer's shard, an advise reader (manifest-priced totals
  *     never decrease), and — r18 — an IVF ANN SERVE reader
  *     ([[Ivf.indexSnapshot]] + [[Ivf.topKJoinBudget]], the ServeRace
  *     phase-1 contract: every read a complete committed snapshot
  *     clearing a fixed recall floor) racing the in-fleet IVF
  *     lifecycle: per-cycle anti-aligned appends + GDPR deletes, a
  *     compact every other cycle, `vacuum(keepVersions = 2)` (the
  *     IvfServeGraceProbe-measured serving cadence: keep=1 tore 9.1%
  *     of reads at load, keep=2 none), and a mid-month retrain;
  *   - ROLLING MAINTENANCE after cycle 4: one writer stopped, its two
  *     shards grace-compacted, writer restarted — the other three
  *     writers and all readers NEVER pause;
  *   - PROMOTION DAY after cycle 5 (r18): tenant 4 outgrows the
  *     router; ONLY its writer stops, `promoteTenants` rebuilds the
  *     tenant's dedicated store from the regenerated accepted corpus
  *     and re-pins its `out:` entry, the writer restarts on its new
  *     slice — the other three writers and all readers run straight
  *     through the re-pin (scoped checks: nothing in THEIR slice
  *     moved). After it: the tenant's old hash shard is FROZEN
  *     (manifest rows constant to month end), its boot re-crawls
  *     still reject (history carried), its fresh routes at shard=-1;
  *   - RESHARD-CANARY DAY overlapping the LAST cycle (r18): a
  *     side-by-side 16-shard root is rebuilt from the regenerated
  *     corpus WHILE the four writers drain their final batches, then
  *     the dedup-probe READER repoints to it mid-stream — the
  *     read-replica canary step of a side-by-side migration (writers
  *     repoint at their next maintenance window); the reader's
  *     accept/reject contract must hold on both roots;
  *   - end of month: per-store rows == that tenant's accepted docs
  *     (manifest-priced each cycle, distinct-counted at close); the
  *     cross-shard audit at exact k recovers the PROMOTION-AWARE
  *     planted truth (the promoted tenant's post-promotion copies
  *     live in its dedicated root, so its two ring pairs freeze at
  *     the promotion cycle); IVF deletes never resurface.
  *
  * Run: sbt "runMain graft.examples.FleetMonthDemo [cycles] [freshK]".
  * Defaults (8 cycles, 90k fresh) process ~10.4M docs and persist
  * ~9.8M signatures — set SPARK_DRIVER_MEM=48g for the full-scale
  * defaults: the MemoryStream test feed retains the whole month's
  * batches in the single demo JVM while the canary reshard overlaps
  * the final drain (a real deployment feeds from files/Kafka and
  * never holds this); the freshK=9000 smoke twin fits the 8g
  * default. */
object FleetMonthDemo {

  // the shared engine-side classifier (r19 — was a local copy)
  private def tornRead(e: Throwable): Boolean =
    graft.sources.TornReads.matches(e)

  /** A racing reader; `clean` exceptions count as bounded retries
    * (the serve reader's torn-listing contract), anything else is
    * fatal. */
  private final class Reader(name: String, done: AtomicBoolean,
                             clean: Throwable => Boolean = _ => false)(read: () => Unit)
      extends Thread(name) {
    val reads = new AtomicInteger(0)
    val retries = new AtomicInteger(0)
    val fatal = new AtomicReference[Throwable](null)
    override def run(): Unit =
      while (!done.get() && fatal.get() == null) {
        try { read(); reads.incrementAndGet() }
        catch {
          case e: Throwable if clean(e) => retries.incrementAndGet()
          case e: Throwable => fatal.set(e)
        }
      }
    def check(): Unit = if (fatal.get() != null) throw fatal.get()
  }

  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(8)
    val freshK = args.lift(1).map(_.toLong).getOrElse(90000L)
    require(cycles >= 8, "the superposition needs >= 8 cycles for its days")
    val nShards = 8; val nStreams = 4
    val bootN = 500000L; val reK = 10000L; val crossK = 2000L
    val promoteAfter = 5 // promotion lands between cycle 5 and 6
    val promotedT = 4    // tenant index; writer 2 owns tenants 4,5
    val spark = SparkSession.builder()
      .appName("fleet-month-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // 8 tenants, one per shard (probe key space until all shards hit)
    val route = (0 until 256).map(i => s"ten$i").toDF("k")
      .select(col("k"), DocPipeline.shardOf(col("k"), nShards).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val tenants: Seq[(String, Long)] =
      route.groupBy(_._2).map(_._2.head).toSeq.sortBy(_._2)
    require(tenants.size == nShards)

    def docText(cid: org.apache.spark.sql.Column) = array_join(
      transform(sequence(lit(1), lit(40)), w =>
        concat(lit("u"), xxhash64(cid, w).cast("string"))), " ")
    def bootBase(t: Int) = 900000000L + t * 1000000L
    def base(c: Int, t: Int) = (c.toLong * nShards + t) * 10000000L

    val tmp = java.nio.file.Files.createTempDirectory("fleetmonth")
    val root = tmp.resolve("store").toString

    // deterministic regeneration of any tenant's accepted corpus — the
    // promotion rebuild and the reshard canary both replay it (the
    // rebuildSignatureStore contract: the accepted corpus is the
    // source of truth; here it is a pure function of the plan)
    def bootFrame(t: Int) = spark.range(bootN)
      .select((col("id") + 950000000L + t * bootN).as("doc_id"),
        lit(tenants(t)._1).as("tenant"),
        docText(lit(bootBase(t)) + col("id")).as("text"))
    def freshFrame(c: Int, t: Int) = spark.range(base(c, t), base(c, t) + freshK)
      .select(col("id").as("doc_id"), lit(tenants(t)._1).as("tenant"),
        docText(col("id")).as("text"))
    def crossFrame(c: Int, t: Int) = {
      val src0 = base(c - 1, (t + 1) % nShards)
      spark.range(base(c, t) + 7000000L, base(c, t) + 7000000L + crossK)
        .select(col("id").as("doc_id"), lit(tenants(t)._1).as("tenant"),
          docText(lit(src0) + pmod(col("id"), lit(crossK))).as("text"))
    }
    def acceptedCorpus(t: Int, upTo: Int) =
      (Seq(bootFrame(t)) ++ (0 to upTo).map(c => freshFrame(c, t)) ++
        (1 to upTo).map(c => crossFrame(c, t))).reduce(_ unionByName _)

    // ── bootstrap: the supported fleet pattern — build the layout and
    // finalize _shard_meta BEFORE any concurrent writer starts ──
    val bootCorpus = (0 until nShards).map(bootFrame).reduce(_ unionByName _)
    val (_, wBoot) = timed {
      DocPipeline.reshardSignatureStores(bootCorpus, root, col("tenant"),
        nShards, atomicStore = true, shardTag = "tenant")
    }
    val advBoot = DocPipeline.adviseShardCount(spark, root, nShards)
    require(advBoot.totalDocs == nShards * bootN, advBoot.toString)
    println(f"FLEET boot: ${nShards * bootN}%,d docs into $nShards shards " +
      f"(parallel reshard) in $wBoot%.1f s; advise priced it in one " +
      "manifest pass")

    // ── the in-fleet IVF index (r18): boot + race-long ground truth ──
    val dim = 16; val kCells = 16; val topK = 8; val nRes = 20000
    def vecOf(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)), j =>
        (((pmod(xxhash64(id, j), lit(900L)) + 100L).cast("double") / 1000.0)
          .cast("float")))
    val residents = spark.range(nRes)
      .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding")).cut
    def farBatch(r: Int, n: Int) =
      spark.range(1000000L + r * 100000L, 1000000L + r * 100000L + n)
        .select(col("id").as("vec_id"),
          transform(vecOf(col("id")), x => (-x).cast("float")).as("embedding"))
    val panel = spark.range(48)
      .select((col("id") * 379L).as("probe_id"),
        transform(vecOf(col("id") * 379L), x => (x + 0.01f).cast("float"))
          .as("p_emb")).cut
    val ivfRoot = tmp.resolve("ivf").toString
    Ivf.saveIndexAtomic(residents, "vec_id", "embedding", ivfRoot,
      k = kCells, iters = 2)
    val truth = graft.ext.Similarity.bruteForceTopKJoin(residents, "embedding",
      panel, "probe_id", "p_emb", k = topK, tieBreak = Seq("vec_id")).cut
    val serveBudget = 30000L
    def serveOnce(): Double = {
      val snap = Ivf.indexSnapshot(spark, ivfRoot)
      val got = Ivf.topKJoinBudget(snap.index, "embedding", snap.centroids,
        snap.census, panel, "probe_id", "p_emb", k = topK,
        maxScanRows = serveBudget, tieBreak = Seq("vec_id")).cut
      val shape = got.groupBy("probe_id").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("mn"), count(lit(1)).as("p")).head()
      require(shape.getLong(0) == topK && shape.getLong(1) == 48L,
        s"incomplete serve result: min rows ${shape.getLong(0)}, " +
          s"probes ${shape.getLong(1)} (version ${snap.version})")
      Eval.meanRecallAtK(got, truth, "probe_id", "vec_id", topK)
    }
    val baseline = serveOnce()
    val floor = baseline - 0.2 // retrain may move cell geometry; budget
                               // probing trades recall, never crashes
    require(baseline >= 0.8, f"baseline recall $baseline%.3f too low to race")

    // ── the four concurrent writers, 2 tenants each, ALL SCOPED ──
    type In = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    final case class Writer(id: Int, tenantIdx: Seq[Int], in: In,
                            q: org.apache.spark.sql.streaming.StreamingQuery,
                            accepted: AtomicReference[Set[Long]])
    def startWriter(id: Int, tenantIdx: Seq[Int],
                    outliers: Map[String, String] = Map.empty,
                    rootPath: String = root, shards: Int = nShards): Writer = {
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
      val acc = new AtomicReference[Set[Long]](Set.empty)
      val q = DocPipeline.streamIncrementalSharded(
        in.toDF().toDF("doc_id", "tenant", "text"), rootPath, col("tenant"),
        shards, minWords = 10, atomicStore = true,
        shardTag = "tenant", outlierRoots = outliers,
        tenantScope = tenantIdx.map(tenants(_)._1)) { (df, _) =>
        acc.set(df.select("doc_id").as[Long].collect().toSet)
      }
      Writer(id, tenantIdx, in, q, acc)
    }
    var writers = (0 until nStreams).map(w =>
      startWriter(w, Seq(w * 2, w * 2 + 1)))

    // ── the sustained readers (never pause, whole month) ──
    val done = new AtomicBoolean(false)
    val probeSeq = new AtomicInteger(0)
    @volatile var probeShard = DocPipeline.shardPath(root, tenants(0)._2)
    val dedupReader = new Reader("fleet-dedup-read", done)(() => {
      val n = probeSeq.incrementAndGet()
      // one planted boot re-crawl (must reject) + one fresh (must accept)
      val df = spark.range(1).select(
        lit(800000000L + n).as("doc_id"),
        docText(lit(bootBase(0) + 7L)).as("text"))
        .unionByName(spark.range(1).select(
          lit(810000000L + n).as("doc_id"),
          docText(lit(700000000L + n)).as("text")))
      val store = AppendStore.readOr(spark, probeShard, sys.error("missing"))
      val out = DocPipeline.prepareIncremental(df, store, minWords = 10)
        .select("doc_id").as[Long].collect().toSet
      require(out == Set(810000000L + n),
        s"fleet dedup read torn (writer live on this shard): $out")
    })
    @volatile var lastTotal = 0L
    val adviseReader = new Reader("fleet-advise-read", done)(() => {
      val adv = DocPipeline.adviseShardCount(spark, root, nShards)
      require(adv.totalDocs >= lastTotal,
        s"advise total went BACKWARDS: ${adv.totalDocs} < $lastTotal " +
          "(stores only grow; a grace fold must not double- or under-count)")
      lastTotal = adv.totalDocs
      Thread.sleep(500)
    })
    @volatile var minRecall = 1.0
    val serveReader = new Reader("fleet-ivf-serve", done, tornRead)(() => {
      val r = serveOnce()
      minRecall = math.min(minRecall, r)
      require(r >= floor,
        f"recall $r%.3f dipped below floor $floor%.3f mid-fleet")
    })
    dedupReader.start(); adviseReader.start(); serveReader.start()

    // ── the month ──
    def rowsFor(w: Writer, c: Int): Seq[(Long, String, String)] =
      w.tenantIdx.flatMap { t =>
        val ten = tenants(t)._1
        val fresh = freshFrame(c, t)
          .as[(Long, String, String)].collect().toSeq
        val re = spark.range(base(c, t) + 5000000L, base(c, t) + 5000000L + reK)
          .select(col("id"), lit(ten),
            docText(lit(bootBase(t)) + pmod(xxhash64(col("id")), lit(bootN)))
              .cast("string"))
          .as[(Long, String, String)].collect().toSeq
        val cross = if (c == 0) Nil
          else crossFrame(c, t).as[(Long, String, String)].collect().toSeq
        fresh ++ re ++ cross
      }

    val perTenantAccepted = Array.fill(nShards)(0L)
    var promoted = false
    val monsterRoot = tmp.resolve("monster").toString
    var deleted = Set.empty[Long]
    def storePathOf(t: Int): String =
      if (promoted && t == promotedT) monsterRoot
      else DocPipeline.shardPath(root, tenants(t)._2)
    def feedCycle(c: Int): Seq[(Writer, Seq[(Long, String, String)])] = {
      val batches = writers.map(w => w -> rowsFor(w, c))
      batches.foreach { case (w, rows) => w.in.addData(rows) }
      batches
    }
    def awaitAndAssert(c: Int): Unit = {
      // all four queries drain CONCURRENTLY; these joins just await
      writers.foreach(_.q.processAllAvailable())
      writers.foreach { w =>
        val acc = w.accepted.get()
        w.tenantIdx.foreach { t =>
          val b = base(c, t)
          val fresh = acc.count(id => id >= b && id < b + freshK)
          val reLeak = acc.count(id => id >= b + 5000000L && id < b + 5000000L + reK)
          val crossAcc = acc.count(id => id >= b + 7000000L && id < b + 7000000L + crossK)
          require(fresh == freshK, s"cycle $c tenant $t: $fresh of $freshK fresh")
          require(reLeak == 0, s"cycle $c tenant $t: $reLeak boot re-crawls leaked")
          if (c > 0) require(crossAcc == crossK,
            s"cycle $c tenant $t: $crossAcc of $crossK cross-stream copies " +
              "accepted — the cross-writer independence contract broke")
          perTenantAccepted(t) += freshK + (if (c > 0) crossK else 0L)
          // manifest-priced growth check: zero Spark jobs per cycle —
          // against the tenant's LIVE store (the dedicated root once
          // promoted; its frozen hash shard is asserted separately)
          val rows = AppendStore.manifestRows(spark, storePathOf(t))
          require(rows.contains(bootN + perTenantAccepted(t)),
            s"cycle $c tenant $t: store rows $rows != " +
              s"${bootN + perTenantAccepted(t)}")
        }
      }
      dedupReader.check(); adviseReader.check(); serveReader.check()
    }
    def ivfMaintain(c: Int): Unit = {
      // the in-fleet IVF lifecycle the serve reader races: anti-aligned
      // append, GDPR delete of half the previous batch, compact every
      // other cycle, vacuum at the MEASURED serving cadence (keep=2 —
      // IvfServeGraceProbe: keep=1 tore 9.1% of reads), retrain once
      Ivf.appendToIndexAtomic(farBatch(c, 1500).cut, "embedding", ivfRoot)
      if (c > 0) {
        val dead = spark.range(1000000L + (c - 1) * 100000L,
          1000000L + (c - 1) * 100000L + 1500).filter(col("id") % 2 === 0)
          .select(col("id").as("vec_id"))
        Ivf.deleteFromIndexAtomic(dead.cut, ivfRoot)
        deleted ++= dead.as[Long].collect()
      }
      if (c % 2 == 1) Ivf.compactIndexAtomic(spark, ivfRoot)
      AtomicCommit.vacuum(spark, ivfRoot, keepVersions = 2)
      if (c == 3)
        Ivf.retrainAtomic(spark, ivfRoot, "vec_id", "embedding", k = kCells)
    }
    def runCycle(c: Int): Double = {
      val (_, wall) = timed { feedCycle(c); awaitAndAssert(c) }
      ivfMaintain(c)
      wall
    }

    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 to 4).foreach(c => walls += runCycle(c))

    // ── ROLLING MAINTENANCE: writer 1 (tenants 2,3) pauses; everyone
    // else — 3 writers, 3 readers — keeps running ──
    val victim = writers(1)
    victim.q.stop()
    val (_, wMaint) = timed {
      victim.tenantIdx.foreach { t =>
        val sp = DocPipeline.shardPath(root, tenants(t)._2)
        AppendStore.compact(spark, sp, readerGrace = true)
      }
    }
    writers = writers.updated(1, startWriter(1, victim.tenantIdx))
    println(f"FLEET rolling maintenance after cycle 4: writer 1 stopped, " +
      f"2 shards grace-compacted in $wMaint%.1f s, writer restarted " +
      "(fresh epochs); the other 3 writers and all 3 readers never paused")

    walls += runCycle(5)

    // ── PROMOTION DAY (r18): tenant 4 outgrows the router. ONLY its
    // writer stops; the scoped per-entry pin means the re-pin changes
    // nothing in the other writers' slices, so they run through it ──
    require(promoteAfter == 5)
    val owner = writers(promotedT / 2)
    require(owner.tenantIdx.contains(promotedT))
    owner.q.stop()
    val frozenShardPath = DocPipeline.shardPath(root, tenants(promotedT)._2)
    val readsBeforePromo =
      (dedupReader.reads.get(), adviseReader.reads.get(), serveReader.reads.get())
    val (_, wPromote) = timed {
      DocPipeline.promoteTenants(
        acceptedCorpus(promotedT, upTo = promoteAfter), root, "tenant",
        Map(tenants(promotedT)._1 -> monsterRoot), atomicStore = true)
    }
    promoted = true
    val frozenRows = AppendStore.manifestRows(spark, frozenShardPath)
    require(frozenRows.contains(bootN + perTenantAccepted(promotedT)),
      s"frozen shard baseline: $frozenRows")
    writers = writers.updated(promotedT / 2, startWriter(owner.id,
      owner.tenantIdx, Map(tenants(promotedT)._1 -> monsterRoot)))
    println(f"FLEET promotion day after cycle 5: tenant ${tenants(promotedT)._1} " +
      f"promoted to its own root in $wPromote%.1f s (corpus regenerated + " +
      f"rebuilt, out: entry re-pinned LAST); ONLY writer ${owner.id} " +
      "stopped — the other 3 scoped writers and all 3 readers ran " +
      "straight through the re-pin")

    walls += runCycle(6)
    // the re-pin must not have paused anything: every reader advanced
    require(dedupReader.reads.get() > readsBeforePromo._1 &&
      adviseReader.reads.get() > readsBeforePromo._2 &&
      serveReader.reads.get() > readsBeforePromo._3,
      "a reader stalled across the promotion re-pin")

    (7 until cycles - 1).foreach(c => walls += runCycle(c))

    // ── RESHARD-CANARY DAY (r18), overlapping the final cycle: the
    // side-by-side 16-shard root rebuilds from the regenerated corpus
    // WHILE the four writers drain their last batches; then the READER
    // repoints — the read-replica canary step of a side-by-side
    // migration (writers repoint at their next maintenance window) ──
    val canaryRoot = tmp.resolve("canary").toString
    val canaryShards = 16
    val corpusThroughPrev = (0 until nShards)
      .map(t => acceptedCorpus(t, upTo = cycles - 2)).reduce(_ unionByName _)
    var wCanary = 0.0
    val (_, wallLast) = timed {
      feedCycle(cycles - 1)
      val (_, w) = timed {
        DocPipeline.reshardSignatureStores(corpusThroughPrev, canaryRoot,
          col("tenant"), canaryShards, atomicStore = true, shardTag = "tenant")
      }
      wCanary = w
      val preRepoint = dedupReader.reads.get()
      probeShard = DocPipeline.shardPath(canaryRoot,
        spark.range(1).select(DocPipeline.shardOf(lit(tenants(0)._1),
          canaryShards)).head().getLong(0))
      val repointDeadline = System.nanoTime() + 120L * 1000000000L
      while (dedupReader.reads.get() <= preRepoint &&
          dedupReader.fatal.get() == null &&
          System.nanoTime() < repointDeadline) Thread.sleep(100)
      require(dedupReader.reads.get() > preRepoint,
        "no dedup reads landed after the canary repoint")
      awaitAndAssert(cycles - 1)
    }
    walls += wallLast
    ivfMaintain(cycles - 1)
    println(f"FLEET reshard-canary day: 8->16 side-by-side root rebuilt " +
      f"from the regenerated corpus in $wCanary%.1f s WHILE all four " +
      f"writers drained cycle ${cycles - 1}; the dedup reader repointed " +
      "mid-stream and held its accept/reject contract on the new root")

    // ── MIGRATION-COMPLETION DAY (r18): the canary deferred the
    // writers' repoint to "their next maintenance window" — this is
    // that window. Stop all four writers, CATCH-UP the canary root
    // with the post-snapshot delta (cycle 7's accepts, regenerated —
    // the canary snapshot was through cycle 6), restart every writer
    // on the 16-shard root, and run one FULL cycle there. The
    // migration implicitly DEMOTES the outlier tenant: the 16-shard
    // rebuild re-homed its full history into hash shards, so the new
    // root runs with an empty table (the promoteTenants demotion
    // recipe, executed by the reshard itself). ──
    writers.foreach(_.q.stop())
    val migCycle = cycles // one past the month's last old-root cycle
    val (deltaRows, wCatchup) = timed {
      val delta = (0 until nShards).map(t =>
        freshFrame(cycles - 1, t).unionByName(crossFrame(cycles - 1, t)))
        .reduce(_ unionByName _).cut
      var n = 0L
      (0L until canaryShards.toLong).foreach { s =>
        val part = delta.filter(
          DocPipeline.shardOf(col("tenant"), canaryShards) === s)
        val sigs = DocPipeline.signatures(part, "doc_id", "text").cut
        val c = sigs.count()
        if (c > 0) {
          AppendStore.append(sigs, DocPipeline.shardPath(canaryRoot, s))
          n += c
        }
      }
      n
    }
    require(deltaRows == nShards.toLong * (freshK + crossK),
      s"catch-up delta rows $deltaRows")
    val shard16 = tenants.indices.map(t => t ->
      spark.range(1).select(DocPipeline.shardOf(lit(tenants(t)._1),
        canaryShards)).head().getLong(0)).toMap
    // the migration RE-PARTITIONS the tenant→writer assignment to the
    // NEW route map: fences are per SHARD, so two writers feeding
    // tenants that now co-locate on one 16-shard would fence each
    // other and die loudly (the r16 double-writer contract, working as
    // designed). Writer assignment follows routing: tenants grouped by
    // their new shard, groups packed across the 4 writer seats —
    // disjoint shard ownership by construction.
    val assignment: Seq[Seq[Int]] = {
      val groups = tenants.indices.groupBy(shard16).values.toSeq
        .sortBy(g => (-g.size, g.head))
      val buckets = Array.fill(nStreams)(Vector.empty[Int])
      groups.foreach { g =>
        val i = buckets.zipWithIndex.minBy { case (b, bi) => (b.size, bi) }._2
        buckets(i) = buckets(i) ++ g
      }
      buckets.toSeq.map(_.sorted)
    }
    require(assignment.flatten.sorted == tenants.indices.toList)
    writers = assignment.zipWithIndex.filter(_._1.nonEmpty).map {
      case (ts, w) =>
        startWriter(w, ts, rootPath = canaryRoot, shards = canaryShards)
    }.toIndexedSeq
    // one full cycle on the new root: fresh accepted; boot re-crawls
    // AND post-snapshot (cycle-7) re-crawls ALL rejected — the proof
    // no accepted history was lost across the migration; cross-stream
    // copies accepted EXCEPT ring pairs the denser layout now
    // CO-LOCATES (the reshard changed dedup domains — asserted from
    // the live route map, not assumed)
    val migBatches = writers.map { w =>
      w -> w.tenantIdx.flatMap { t =>
        val ten = tenants(t)._1
        val b = base(migCycle, t)
        val fresh = freshFrame(migCycle, t)
          .as[(Long, String, String)].collect().toSeq
        val reBoot = spark.range(b + 5000000L, b + 5000000L + reK)
          .select(col("id"), lit(ten),
            docText(lit(bootBase(t)) + pmod(xxhash64(col("id")), lit(bootN)))
              .cast("string"))
          .as[(Long, String, String)].collect().toSeq
        val rePost = spark.range(b + 6000000L, b + 6000000L + reK)
          .select(col("id"), lit(ten),
            docText(lit(base(cycles - 1, t)) +
              pmod(xxhash64(col("id")), lit(freshK))).cast("string"))
          .as[(Long, String, String)].collect().toSeq
        val cross = crossFrame(migCycle, t)
          .as[(Long, String, String)].collect().toSeq
        fresh ++ reBoot ++ rePost ++ cross
      }
    }
    val (_, wMig) = timed {
      migBatches.foreach { case (w, rows) => w.in.addData(rows) }
      writers.foreach(_.q.processAllAvailable())
    }
    val migAccepted = Array.fill(nShards)(0L)
    writers.foreach { w =>
      val acc = w.accepted.get()
      w.tenantIdx.foreach { t =>
        val b = base(migCycle, t)
        val fresh = acc.count(id => id >= b && id < b + freshK)
        val reBootLeak = acc.count(id => id >= b + 5000000L && id < b + 5000000L + reK)
        val rePostLeak = acc.count(id => id >= b + 6000000L && id < b + 6000000L + reK)
        val crossAcc = acc.count(id => id >= b + 7000000L && id < b + 7000000L + crossK)
        require(fresh == freshK, s"migration cycle tenant $t: $fresh fresh")
        require(reBootLeak == 0,
          s"migration cycle tenant $t: $reBootLeak BOOT re-crawls leaked " +
            "on the new root — the reshard lost pre-snapshot history")
        require(rePostLeak == 0,
          s"migration cycle tenant $t: $rePostLeak POST-SNAPSHOT re-crawls " +
            "leaked — the catch-up delta is incomplete")
        val coLocated = shard16(t) == shard16((t + 1) % nShards)
        val wantCross = if (coLocated) 0L else crossK
        require(crossAcc == wantCross,
          s"migration cycle tenant $t: cross $crossAcc != $wantCross " +
            s"(ring pair ${if (coLocated) "CO-LOCATED" else "split"} at 16 shards)")
        migAccepted(t) = freshK + crossAcc
      }
    }
    // per-16-shard manifest pricing on the migrated root: rows == the
    // sum over its tenants of boot + month accepts + catch-up + the
    // migration cycle — zero Spark jobs
    (0L until canaryShards.toLong).foreach { s =>
      val want = tenants.indices.filter(t => shard16(t) == s)
        .map(t => bootN + perTenantAccepted(t) + migAccepted(t)).sum
      if (want > 0) {
        val got = AppendStore.manifestRows(spark,
          DocPipeline.shardPath(canaryRoot, s))
        require(got.contains(want), s"migrated shard $s: rows $got != $want")
      }
    }
    dedupReader.check(); adviseReader.check(); serveReader.check()
    println(f"FLEET migration-completion day: catch-up delta " +
      f"$deltaRows%,d rows into the 16-shard root in $wCatchup%.1f s, " +
      f"${writers.size} writer seats re-partitioned to the new route map " +
      f"(fences are per shard: assignment follows routing), and a full " +
      f"cycle ran there in $wMig%.1f s — " +
      f"boot AND post-snapshot re-crawls 0 leaked (no accepted history " +
      f"lost across the migration), cross copies honored the NEW route " +
      f"map (${tenants.indices.count(t => shard16(t) == shard16((t + 1) % nShards))} " +
      "ring pairs co-located at 16 shards now reject), per-shard rows " +
      "manifest-priced exactly; the outlier tenant demoted by the " +
      "rebuild itself")

    // ── month close: stop writers, final audits (old root: frozen at
    // cycle 7's state by the migration) ──
    writers.foreach(_.q.stop())
    done.set(true)
    dedupReader.join(60000); adviseReader.join(60000); serveReader.join(300000)
    dedupReader.check(); adviseReader.check(); serveReader.check()
    require(dedupReader.reads.get() >= 20,
      s"dedup reader only ${dedupReader.reads.get()} reads — not sustained")
    require(serveReader.reads.get() >= 20,
      s"serve reader only ${serveReader.reads.get()} reads — not sustained")
    require(serveReader.retries.get() <= serveReader.reads.get(),
      s"serve retry storm: ${serveReader.retries.get()} torn vs " +
        s"${serveReader.reads.get()} reads at the keep=2 cadence")

    // IVF post-race audit: deletes held through every compact/retrain
    val finalIdx = Ivf.readIndex(spark, ivfRoot)
    require(finalIdx.join(deleted.toSeq.toDF("vec_id"), Seq("vec_id"),
      "left_semi").count() == 0L, "deleted ids served after the race")
    println(f"FLEET ivf serve: ${serveReader.reads.get()} committed-snapshot " +
      f"reads (${serveReader.retries.get()} clean retries) through $cycles " +
      f"cycles of append+delete+compact+vacuum(keep=2)+retrain UNDER the " +
      f"4-writer fleet; recall floor $floor%.3f (baseline $baseline%.3f), " +
      f"min seen $minRecall%.3f; deletes never resurfaced")

    // the promoted tenant's old hash shard FROZE at its baseline
    require(AppendStore.manifestRows(spark, frozenShardPath) == frozenRows,
      "the promoted tenant's old hash shard grew after promotion")
    // exact distinct counts (the manifest checks priced every cycle)
    tenants.indices.foreach { t =>
      val docs = AppendStore.readOr(spark, storePathOf(t),
        sys.error("missing")).select("doc_id").distinct().count()
      require(docs == bootN + perTenantAccepted(t),
        s"tenant $t: store $docs != ${bootN + perTenantAccepted(t)}")
    }
    // cross-shard audit at exact k: the PROMOTION-AWARE planted truth.
    // Tenant t's cycle-c copies of tenant (t+1)'s cycle c-1 texts share
    // fps between shard(t) and shard(t+1) iff the copy landed in
    // shard(t) (t != promoted OR c <= promoteAfter) AND the source
    // landed in shard(t+1) (t+1 != promoted OR c-1 <= promoteAfter).
    val perShardDocs = bootN + perTenantAccepted.max
    val (audit, wAudit) = timed {
      DocPipeline.auditCrossShardDups(spark, root, nShards,
        sampleK = (perShardDocs + 1000000L).toInt)
    }
    def ringTruth(t: Int): Long = (1 until cycles).count { c =>
      (t != promotedT || c <= promoteAfter) &&
        ((t + 1) % nShards != promotedT || c - 1 <= promoteAfter)
    }.toLong * crossK
    val pairTruth: Map[(Long, Long), Long] = tenants.indices.map { t =>
      val (a, b) = (tenants(t)._2, tenants((t + 1) % nShards)._2)
      (math.min(a, b), math.max(a, b)) -> ringTruth(t)
    }.toMap
    audit.pairs.foreach { p =>
      require(p.exact, s"audit must be exact at this k: $p")
      val expected = pairTruth.getOrElse((p.shardA, p.shardB), 0L)
      require(p.estSharedDocs == expected,
        s"pair (${p.shardA},${p.shardB}): ${p.estSharedDocs} != $expected")
    }
    val total = nShards * bootN + perTenantAccepted.sum
    println(f"FLEET audit: exact cross-shard pass over $total%,d stored " +
      f"docs in $wAudit%.1f s — promotion-aware truth on all 8 ring pairs " +
      f"(${tenants.indices.map(ringTruth).mkString("/")}), 0 on all 20 " +
      "others: every cross-stream copy accounted, including the frozen " +
      "pairs at the promotion boundary")
    println(f"FLEET month holds: $cycles cycles x 4 concurrent scoped " +
      f"writers x 2 tenants, ${total}%,d docs stored " +
      f"(${nShards * bootN}%,d boot + ${perTenantAccepted.sum}%,d streamed), " +
      f"${dedupReader.reads.get()} dedup-probe reads, " +
      f"${adviseReader.reads.get()} advise reads, and " +
      f"${serveReader.reads.get()} ANN serve reads through live writers, " +
      "rolling maintenance, a mid-fleet promotion, and a reshard-canary " +
      f"day; cycle walls ${walls.map(w => f"$w%.0f").mkString("/")} s")
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
