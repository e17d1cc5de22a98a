package graft.examples

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.CutOps
import graft.ext.{DocPipeline, Eval, Ivf}
import graft.sources.{AppendStore, AtomicCommit}

/** THE FULL OPERATIONAL SUPERPOSITION (r17: the fleet; r18: ANN serve,
  * rolling promotion, reshard-canary and migration-completion days;
  * r19: a COMPOSITE-KEYED monster tenant lives INSIDE the fleet with
  * its sub-shards as first-class shards, its hot sub-tenant promotes
  * mid-fleet, the r18 monster tenant explicitly DEMOTES back to the
  * hash layout mid-fleet, and the IVF serve reader REPOINTS to a
  * side-by-side migrated index root under load): a 10M-class sharded
  * ops month where four concurrent scoped streaming writers, three
  * sustained reader threads, rolling maintenance, two overlapping
  * rolling promotions, an explicit rolling demotion, an ANN index
  * migration + serve repoint, a side-by-side reshard racing live
  * writer load, and a full IVF lifecycle all run AT THE SAME TIME.
  *
  *   - 8 ring tenants; tenant 6 is COMPOSITE
  *     ([[DocPipeline.compositeKey]](tenant, host), 3 crawl hosts), so
  *     the fleet root has 10 first-class shards = 7 plain tenants + 3
  *     sub-shards, all routed by ONE pinned key expression;
  *   - 4 concurrent `streamIncrementalSharded` writers, 2 tenants
  *     each, atomic stores, ALL SCOPED in route-key space (the
  *     composite writer's scope is its three composite strings);
  *   - per cycle and per tenant: 90k fresh (ALL accepted), 10k exact
  *     boot re-crawls (ALL rejected — the composite tenant's re-crawls
  *     co-route because host derives from the content seed), ~2k
  *     cross-stream ring copies (ALL accepted — independent dedup
  *     domains); the composite tenant ALSO plants 600 cross-HOST
  *     mirrors of its own previous cycle (ALL accepted — the measured
  *     composite-key recall trade, recovered by the close audit);
  *   - days, all rolling (only the named writer stops, every reader
  *     races through): maintenance after c4 (writer 1's shards
  *     grace-compacted); tenant-4 PROMOTION after c5 (writer 2);
  *     HOT-SUB-TENANT promotion after c6 (writer 3 — the composite
  *     host h0 outgrows its sub-shard; the amended table still pins
  *     tenant 4, whose entry is UNCHANGED, so promoteTenants' r19
  *     amend semantics leave its live store untouched while writer 2
  *     runs); tenant-4 DEMOTION after c7 (writer 2 — hash shard
  *     rebuilt from the FULL corpus including the outlier era, table
  *     re-pinned without it while writer 3's promoted host entry rides
  *     through unchanged; outlier-era re-sends then REJECT on the hash
  *     path); IVF SERVE REPOINT after c8 (a side-by-side index root is
  *     rebuilt from committed segments and the live serve reader flips
  *     to it between snapshots — 0 torn reads, floor held, old root
  *     torn down after);
  *   - RESHARD-CANARY DAY overlapping the last cycle: a 20-shard root
  *     rebuilds from the regenerated corpus (re-homing the promoted
  *     host — demotion by rebuild) while the writers drain, the dedup
  *     reader repoints; MIGRATION-COMPLETION DAY: catch-up delta,
  *     writer seats re-partitioned to the new route map (grouping
  *     tenants that share a 20-shard: the composite tenant's three
  *     keys can co-locate with anyone), one full cycle on the new root
  *     with route-map-aware cross/mirror accept/reject asserts;
  *   - end of month: per-store rows manifest-priced every cycle
  *     (per SUB-shard for the composite tenant), distinct-counted at
  *     close; the cross-shard audit at exact k recovers the
  *     SUB-TENANT-AWARE planted truth — a per-pair count map
  *     accumulated as the month runs from where each planted copy and
  *     its original land AT CLOSE (promotion freezes the hot host's
  *     thirds; demotion restores tenant 4's pairs to uniform);
  *     IVF deletes never resurface across the index migration.
  *
  * Run: sbt "runMain graft.examples.FleetMonthDemo [cycles] [freshK]".
  * Defaults (10 cycles, 90k fresh) process ~11M docs — set
  * SPARK_DRIVER_MEM=48g for full scale (the MemoryStream test feed
  * retains the whole month's batches in the single demo JVM; a real
  * deployment feeds from files/Kafka and never holds this); the
  * freshK=9000 smoke twin fits the 8g default. */
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
    val cycles = args.headOption.map(_.toInt).getOrElse(10)
    val freshK = args.lift(1).map(_.toLong).getOrElse(90000L)
    require(cycles >= 10, "the superposition needs >= 10 cycles for its days")
    require(freshK % 3 == 0, "freshK must split exactly across 3 hosts")
    val nTenants = 8; val nStreams = 4
    val compT = 6          // the composite tenant; writer 3 owns 6,7
    val nHosts = 3
    val nShards = 10       // 7 plain tenants + 3 composite sub-shards
    val bootN = 499998L    // divisible by 3: exact per-host boot thirds
    val reK = 10000L; val crossK = 1998L; val mirrorK = 600L
    val promoteAfter = 5   // tenant-4 promotion between c5 and c6 (writer 2)
    val promotedT = 4
    val hotPromoteAfter = 6 // composite host h0 promotion between c6/c7 (writer 3)
    val demoteAfter = 7    // tenant-4 demotion between c7 and c8 (writer 2)
    val repointAfter = 8   // IVF serve repoint between c8/c9 (no writer stops)
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

    // ── route-key space: probe names until 7 plain tenants + 3
    // composite strings cover the 10 shards bijectively (per-key
    // stores make every manifest/audit assert exact) ──
    val sep = 1.toChar.toString // compositeKey's U+0001 separator
    def shardMapOf(keys: Seq[String]): Map[String, Long] =
      keys.toDF("k").select(col("k"), DocPipeline.shardOf(col("k"), nShards).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tenCands = (0 until 512).map(i => s"ten$i")
    val hostCands = (0 until 512).map(i => s"h$i")
    val tenShard = shardMapOf(tenCands)
    val (compName, hosts, plainPicks) = tenCands.iterator.flatMap { cand =>
      val compShard = shardMapOf(hostCands.map(h => s"$cand$sep$h"))
      val byShard = hostCands.groupBy(h => compShard(s"$cand$sep$h"))
      if (byShard.size < nHosts) None
      else {
        val hostShards = byShard.keys.toSeq.sorted.take(nHosts)
        val hs = hostShards.map(s => byShard(s).minBy(_.drop(1).toInt))
        val remaining = ((0L until nShards.toLong).toSet -- hostShards).toSeq.sorted
        val plainByShard = tenCands.filter(_ != cand).groupBy(tenShard)
        if (remaining.forall(plainByShard.contains))
          Some((cand, hs.toIndexedSeq,
            remaining.map(s => plainByShard(s).minBy(_.drop(3).toInt))))
        else None
      }
    }.next()
    // tenant index -> name: compT gets the composite name, the 7 plain
    // names fill the other indices in shard order
    val tenants: IndexedSeq[String] = {
      val plainIdx = (0 until nTenants).filter(_ != compT)
      plainIdx.zip(plainPicks).foldLeft(IndexedSeq.fill(nTenants)("")) {
        case (acc, (i, name)) => acc.updated(i, name)
      }.updated(compT, compName)
    }
    def ck(h: Int): String = s"${tenants(compT)}$sep${hosts(h)}"
    def keysOfT(t: Int): Seq[String] =
      if (t == compT) (0 until nHosts).map(ck) else Seq(tenants(t))
    val allKeys = (0 until nTenants).flatMap(keysOfT)
    val keyShard: Map[String, Long] = shardMapOf(allKeys)
    require(keyShard.values.toSet.size == nShards, s"route map not bijective: $keyShard")
    val routeKey = when(col("tenant") === lit(tenants(compT)),
      DocPipeline.compositeKey(col("tenant"), col("host")))
      .otherwise(col("tenant"))
    val keyTag = "fleet-tenant-host-composite"

    def docText(cid: org.apache.spark.sql.Column) = array_join(
      transform(sequence(lit(1), lit(40)), w =>
        concat(lit("u"), xxhash64(cid, w).cast("string"))), " ")
    def bootBase(t: Int) = 900000000L + t * 1000000L
    def base(c: Int, t: Int) = (c.toLong * nTenants + t) * 10000000L

    val tmp = java.nio.file.Files.createTempDirectory("fleetmonth")
    val root = tmp.resolve("store").toString

    // host is a pure function of the CONTENT seed (a crawl host is an
    // attribute of the document, not of the crawl event), so re-crawls
    // co-route with their originals — the within-host dedup contract
    val hostArr = array(hosts.map(lit): _*)
    def hostOf(seed: org.apache.spark.sql.Column, t: Int) =
      if (t == compT) element_at(hostArr, (pmod(seed, lit(3L)) + 1).cast("int"))
      else lit("-")

    // deterministic regeneration of any tenant's accepted corpus — the
    // promotions, the demotion rebuild, and the reshard canary all
    // replay it (the rebuildSignatureStore contract: the accepted
    // corpus is the source of truth; here it is a pure function of the
    // plan). Mirror seeds use the TAIL of the previous cycle's fresh
    // range so mirror texts and ring-copy texts never overlap (each
    // planted duplicate contributes to exactly one audit pair class).
    def bootFrame(t: Int) = spark.range(bootN)
      .withColumn("_seed", lit(bootBase(t)) + col("id"))
      .select((col("id") + 950000000L + t * bootN).as("doc_id"),
        lit(tenants(t)).as("tenant"), hostOf(col("_seed"), t).as("host"),
        docText(col("_seed")).as("text"))
    def freshFrame(c: Int, t: Int) = spark.range(base(c, t), base(c, t) + freshK)
      .select(col("id").as("doc_id"), lit(tenants(t)).as("tenant"),
        hostOf(col("id"), t).as("host"), docText(col("id")).as("text"))
    def crossFrame(c: Int, t: Int) = {
      val src0 = base(c - 1, (t + 1) % nTenants)
      spark.range(base(c, t) + 7000000L, base(c, t) + 7000000L + crossK)
        .withColumn("_seed", lit(src0) + pmod(col("id"), lit(crossK)))
        .select(col("id").as("doc_id"), lit(tenants(t)).as("tenant"),
          hostOf(col("_seed"), t).as("host"), docText(col("_seed")).as("text"))
    }
    def mirrorFrame(c: Int) = { // compT only: cross-HOST mirrors
      val src0 = base(c - 1, compT) + freshK - mirrorK // tail of prev fresh
      spark.range(base(c, compT) + 8000000L, base(c, compT) + 8000000L + mirrorK)
        .withColumn("_seed", lit(src0) + pmod(col("id"), lit(mirrorK)))
        .select(col("id").as("doc_id"), lit(tenants(compT)).as("tenant"),
          element_at(hostArr,
            ((pmod(col("_seed"), lit(3L)) + 1) % 3 + 1).cast("int")).as("host"),
          docText(col("_seed")).as("text"))
    }
    def acceptedCorpus(t: Int, upTo: Int) =
      (Seq(bootFrame(t)) ++ (0 to upTo).map(c => freshFrame(c, t)) ++
        (1 to upTo).map(c => crossFrame(c, t)) ++
        (if (t == compT) (1 to upTo).map(mirrorFrame) else Nil))
        .reduce(_ unionByName _)
    def withRkey(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rkey", routeKey)

    // ── bootstrap: the supported fleet pattern — build the layout and
    // finalize _shard_meta BEFORE any concurrent writer starts ──
    val bootCorpus = (0 until nTenants).map(bootFrame).reduce(_ unionByName _)
    val (_, wBoot) = timed {
      DocPipeline.reshardSignatureStores(bootCorpus, root, routeKey,
        nShards, atomicStore = true, shardTag = keyTag)
    }
    val advBoot = DocPipeline.adviseShardCount(spark, root, nShards)
    require(advBoot.totalDocs == nTenants * bootN, advBoot.toString)
    println(f"FLEET boot: ${nTenants * bootN}%,d docs into $nShards shards " +
      f"(7 plain tenants + 3 sub-shards of composite tenant " +
      f"'${tenants(compT)}') in $wBoot%.1f s; advise priced it in one " +
      "manifest pass")

    // ── the in-fleet IVF index: boot + race-long ground truth; the
    // root is a VAR — the serve reader repoints mid-fleet (r19) ──
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
    @volatile var ivfRoot = tmp.resolve("ivf").toString
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
    val floor = baseline - 0.2 // retrain/re-train-at-migration may move
                               // cell geometry; budget probing trades
                               // recall, never crashes
    require(baseline >= 0.8, f"baseline recall $baseline%.3f too low to race")

    // ── the four concurrent writers, 2 tenants each, ALL SCOPED in
    // route-key space (the composite writer's scope = its 3 strings) ──
    type In = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String, String)]
    final case class Writer(id: Int, tenantIdx: Seq[Int], in: In,
                            q: org.apache.spark.sql.streaming.StreamingQuery,
                            accepted: AtomicReference[Set[Long]])
    def startWriter(id: Int, tenantIdx: Seq[Int],
                    outliers: Map[String, String] = Map.empty,
                    rootPath: String = root, shards: Int = nShards): Writer = {
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String, String)]
      val acc = new AtomicReference[Set[Long]](Set.empty)
      val q = DocPipeline.streamIncrementalSharded(
        in.toDF().toDF("doc_id", "tenant", "host", "text"), rootPath, routeKey,
        shards, minWords = 10, atomicStore = true,
        shardTag = keyTag, outlierRoots = outliers,
        tenantScope = tenantIdx.flatMap(keysOfT)) { (df, _) =>
        acc.set(df.select("doc_id").as[Long].collect().toSet)
      }
      Writer(id, tenantIdx, in, q, acc)
    }
    var writers = (0 until nStreams).map(w =>
      startWriter(w, Seq(w * 2, w * 2 + 1)))

    // ── the sustained readers (never pause, whole month) ──
    val done = new AtomicBoolean(false)
    val probeSeq = new AtomicInteger(0)
    @volatile var probeShard = DocPipeline.shardPath(root, keyShard(tenants(0)))
    val dedupReader = new Reader("fleet-dedup-read", done)(() => {
      val n = probeSeq.incrementAndGet()
      // one planted boot re-crawl (must reject) + one fresh (must accept)
      val df = spark.range(1).select(
        lit(800000000L + n).as("doc_id"),
        docText(lit(bootBase(0) + 7L)).as("text"))
        .unionByName(spark.range(1).select(
          lit(810000000L + n).as("doc_id"),
          docText(lit(895000000L + n)).as("text")))
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
    var t4Promoted = false; var t4Demoted = false; var hotPromoted = false
    val monsterRoot = tmp.resolve("monster").toString
    val hotRoot = tmp.resolve("hothost").toString
    def storePathOf(t: Int): String =
      if (t == promotedT && t4Promoted && !t4Demoted) monsterRoot
      else DocPipeline.shardPath(root, keyShard(tenants(t)))
    def hostStore(h: Int): String =
      if (h == 0 && hotPromoted) hotRoot
      else DocPipeline.shardPath(root, keyShard(ck(h)))

    type Row4 = (Long, String, String, String)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Row4] =
      df.as[(Long, String, String, String)].collect().toSeq
    def reFrame(c: Int, t: Int) = { // exact boot re-crawls: must reject
      val b = base(c, t)
      spark.range(b + 5000000L, b + 5000000L + reK)
        .withColumn("_seed",
          lit(bootBase(t)) + pmod(xxhash64(col("id")), lit(bootN)))
        .select(col("id").as("doc_id"), lit(tenants(t)).as("tenant"),
          hostOf(col("_seed"), t).as("host"), docText(col("_seed")).as("text"))
    }
    def outlierEraResendFrame(c: Int) = { // t4, post-demotion: must reject
      val t = promotedT; val b = base(c, t)
      spark.range(b + 6000000L, b + 6000000L + reK)
        .withColumn("_seed",
          lit(base(demoteAfter, t)) + pmod(xxhash64(col("id")), lit(freshK)))
        .select(col("id").as("doc_id"), lit(tenants(t)).as("tenant"),
          lit("-").as("host"), docText(col("_seed")).as("text"))
    }
    def rowsFor(w: Writer, c: Int): Seq[Row4] =
      w.tenantIdx.flatMap { t =>
        rowsOf(freshFrame(c, t)) ++ rowsOf(reFrame(c, t)) ++
          (if (c > 0) rowsOf(crossFrame(c, t)) else Nil) ++
          (if (t == compT && c > 0) rowsOf(mirrorFrame(c)) else Nil) ++
          (if (t == promotedT && c == demoteAfter + 1)
            rowsOf(outlierEraResendFrame(c)) else Nil)
      }

    val perTenantAccepted = Array.fill(nTenants)(0L)
    val perHostAccepted = Array.fill(nHosts)(0L)
    var deleted = Set.empty[Long]
    // the SUB-TENANT-AWARE audit truth, accumulated as the month runs:
    // a planted duplicate contributes to pair (A,B) iff its original
    // and its copy both sit in HASH stores of the old root AT CLOSE —
    // which is a pure function of who accepted it and when (the hot
    // host's post-promotion accepts live in its dedicated root; tenant
    // 4's outlier-era accepts are re-homed by the demotion rebuild)
    val pairTruth = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    def locAtClose(t: Int, hostIdx: Int, acceptCycle: Int): Option[Long] =
      if (t == compT) {
        if (hostIdx == 0 && acceptCycle > hotPromoteAfter) None // hotRoot
        else Some(keyShard(ck(hostIdx)))
      } else Some(keyShard(tenants(t))) // t4 re-homed by the demotion rebuild
    def accumulateTruth(c: Int): Unit = if (c > 0) {
      (0 until nTenants).foreach { t =>
        (0 until 3).foreach { r => // seed-residue thirds, crossK/3 each
          val orig = locAtClose((t + 1) % nTenants, r, c - 1)
          val copy = locAtClose(t, r, c)
          for (a <- orig; b <- copy; if a != b)
            pairTruth((math.min(a, b), math.max(a, b))) += crossK / 3
        }
      }
      (0 until 3).foreach { r => // mirrors: src host r -> dst (r+1)%3
        val orig = locAtClose(compT, r, c - 1)
        val copy = locAtClose(compT, (r + 1) % 3, c)
        for (a <- orig; b <- copy; if a != b)
          pairTruth((math.min(a, b), math.max(a, b))) += mirrorK / 3
      }
    }

    def feedCycle(c: Int): Unit =
      writers.foreach(w => w.in.addData(rowsFor(w, c)))
    def awaitAndAssert(c: Int): Unit = {
      // all four queries drain CONCURRENTLY; these joins just await
      writers.foreach(_.q.processAllAvailable())
      writers.foreach { w =>
        val acc = w.accepted.get()
        w.tenantIdx.foreach { t =>
          val b = base(c, t)
          val fresh = acc.count(id => id >= b && id < b + freshK)
          val reLeak = acc.count(id => id >= b + 5000000L && id < b + 5000000L + reK)
          val resendLeak = acc.count(id => id >= b + 6000000L && id < b + 6000000L + reK)
          val crossAcc = acc.count(id => id >= b + 7000000L && id < b + 7000000L + crossK)
          val mirrorAcc = acc.count(id => id >= b + 8000000L && id < b + 8000000L + mirrorK)
          require(fresh == freshK, s"cycle $c tenant $t: $fresh of $freshK fresh")
          require(reLeak == 0, s"cycle $c tenant $t: $reLeak boot re-crawls leaked")
          if (t == promotedT && c == demoteAfter + 1)
            require(resendLeak == 0,
              s"cycle $c: $resendLeak outlier-era re-sends ACCEPTED on the " +
                "hash path — the demotion rebuild lost the dedicated history")
          if (c > 0) {
            require(crossAcc == crossK,
              s"cycle $c tenant $t: $crossAcc of $crossK cross-stream copies " +
                "accepted — the cross-writer independence contract broke")
            if (t == compT) require(mirrorAcc == mirrorK,
              s"cycle $c: $mirrorAcc of $mirrorK cross-host mirrors accepted " +
                "— sub-shards are independent dedup domains BY DESIGN (the " +
                "priced composite trade); a reject here means they are not")
          }
          perTenantAccepted(t) += freshK + (if (c > 0) crossK else 0L) +
            (if (t == compT && c > 0) mirrorK else 0L)
          if (t == compT) {
            (0 until nHosts).foreach { h =>
              perHostAccepted(h) += freshK / 3 +
                (if (c > 0) crossK / 3 + mirrorK / 3 else 0L)
              val rows = AppendStore.manifestRows(spark, hostStore(h))
              require(rows.contains(bootN / 3 + perHostAccepted(h)),
                s"cycle $c host $h: store rows $rows != " +
                  s"${bootN / 3 + perHostAccepted(h)}")
            }
          } else {
            // manifest-priced growth check: zero Spark jobs per cycle
            val rows = AppendStore.manifestRows(spark, storePathOf(t))
            require(rows.contains(bootN + perTenantAccepted(t)),
              s"cycle $c tenant $t: store rows $rows != " +
                s"${bootN + perTenantAccepted(t)}")
          }
        }
      }
      accumulateTruth(c)
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
        AppendStore.compact(spark,
          DocPipeline.shardPath(root, keyShard(tenants(t))), readerGrace = true)
      }
    }
    writers = writers.updated(1, startWriter(1, victim.tenantIdx))
    println(f"FLEET rolling maintenance after cycle 4: writer 1 stopped, " +
      f"2 shards grace-compacted in $wMaint%.1f s, writer restarted " +
      "(fresh epochs); the other 3 writers and all 3 readers never paused")

    walls += runCycle(5)

    // ── T4 PROMOTION DAY after c5: ONLY its writer stops; scoped
    // per-entry pins let the other three run through the re-pin ──
    val owner4 = writers(promotedT / 2)
    require(owner4.tenantIdx.contains(promotedT))
    owner4.q.stop()
    val t4ShardPath = DocPipeline.shardPath(root, keyShard(tenants(promotedT)))
    val readsBeforePromo =
      (dedupReader.reads.get(), adviseReader.reads.get(), serveReader.reads.get())
    val (_, wPromote) = timed {
      DocPipeline.promoteTenants(
        withRkey(acceptedCorpus(promotedT, upTo = promoteAfter)), root, "rkey",
        Map(tenants(promotedT) -> monsterRoot), atomicStore = true)
    }
    t4Promoted = true
    val frozenT4Rows = AppendStore.manifestRows(spark, t4ShardPath)
    require(frozenT4Rows.contains(bootN + perTenantAccepted(promotedT)),
      s"frozen shard baseline: $frozenT4Rows")
    writers = writers.updated(promotedT / 2, startWriter(owner4.id,
      owner4.tenantIdx, Map(tenants(promotedT) -> monsterRoot)))
    println(f"FLEET promotion day after cycle 5: tenant ${tenants(promotedT)} " +
      f"promoted to its own root in $wPromote%.1f s (corpus regenerated + " +
      f"rebuilt, out: entry re-pinned LAST); ONLY writer ${owner4.id} " +
      "stopped — the other 3 scoped writers and all 3 readers ran " +
      "straight through the re-pin")

    walls += runCycle(6)
    require(dedupReader.reads.get() > readsBeforePromo._1 &&
      adviseReader.reads.get() > readsBeforePromo._2 &&
      serveReader.reads.get() > readsBeforePromo._3,
      "a reader stalled across the promotion re-pin")

    // ── HOT-SUB-TENANT PROMOTION DAY after c6 (r19): the composite
    // tenant's host h0 outgrows its sub-shard. ONLY writer 3 stops.
    // The table passed to promoteTenants still carries tenant 4's
    // UNCHANGED entry — the r19 amend semantics must leave its live
    // dedicated store untouched while writer 2 keeps appending to it ──
    val owner6 = writers(compT / 2)
    require(owner6.tenantIdx.contains(compT))
    owner6.q.stop()
    val hotShardPath = DocPipeline.shardPath(root, keyShard(ck(0)))
    val monsterV0 = AtomicCommit.committedVersions(spark, monsterRoot).headOption
    val readsBeforeHot =
      (dedupReader.reads.get(), adviseReader.reads.get(), serveReader.reads.get())
    val (_, wHot) = timed {
      DocPipeline.promoteTenants(
        withRkey(acceptedCorpus(compT, upTo = hotPromoteAfter)), root, "rkey",
        Map(tenants(promotedT) -> monsterRoot, ck(0) -> hotRoot),
        atomicStore = true)
    }
    hotPromoted = true
    // the amend proof: a rebuild of monsterRoot would have folded+swept
    // its version history (append + vacuum keep=1); its FIRST committed
    // version must still be there — writer 2 only ever appends
    require(AtomicCommit.committedVersions(spark, monsterRoot).headOption == monsterV0,
      "promoteTenants rebuilt the UNCHANGED tenant-4 entry during the " +
        "hot-host promotion — amend semantics broke and a live writer's " +
        "store was rewritten under it")
    val frozenHotRows = AppendStore.manifestRows(spark, hotShardPath)
    require(frozenHotRows.contains(bootN / 3 + perHostAccepted(0)),
      s"frozen sub-shard baseline: $frozenHotRows")
    writers = writers.updated(compT / 2, startWriter(owner6.id,
      owner6.tenantIdx, Map(ck(0) -> hotRoot)))
    println(f"FLEET hot-sub-tenant promotion day after cycle 6: composite " +
      f"host '${hosts(0)}' promoted to its own root in $wHot%.1f s via its " +
      f"COMPOSITE route key; tenant-4's unchanged entry rode through " +
      f"untouched (amend semantics, min version intact) while writer 2 " +
      "kept appending; ONLY writer 3 stopped")

    walls += runCycle(7)
    require(dedupReader.reads.get() > readsBeforeHot._1 &&
      adviseReader.reads.get() > readsBeforeHot._2 &&
      serveReader.reads.get() > readsBeforeHot._3,
      "a reader stalled across the hot-host promotion re-pin")

    // ── T4 DEMOTION DAY after c7 (r19): the monster returns to the
    // hash layout. ONLY writer 2 stops; the hash shard is rebuilt from
    // the FULL accepted corpus INCLUDING the outlier era, then the
    // table is re-pinned WITHOUT tenant 4 — the hot host's entry is
    // unchanged, so writer 3 runs straight through ──
    val owner4b = writers(promotedT / 2)
    owner4b.q.stop()
    val monsterRowsAtDemote = AppendStore.manifestRows(spark, monsterRoot)
    val readsBeforeDemote =
      (dedupReader.reads.get(), adviseReader.reads.get(), serveReader.reads.get())
    val (_, wDemote) = timed {
      DocPipeline.rebuildSignatureStore(
        acceptedCorpus(promotedT, upTo = demoteAfter).select("doc_id", "text"),
        t4ShardPath, atomicStore = true)
      DocPipeline.promoteTenants(
        withRkey(acceptedCorpus(compT, upTo = demoteAfter)), root, "rkey",
        Map(ck(0) -> hotRoot), atomicStore = true)
    }
    t4Demoted = true
    require(AppendStore.manifestRows(spark, t4ShardPath)
      .contains(bootN + perTenantAccepted(promotedT)),
      "the demotion rebuild did not re-home the full corpus")
    writers = writers.updated(promotedT / 2,
      startWriter(owner4b.id, owner4b.tenantIdx))
    println(f"FLEET demotion day after cycle 7: tenant ${tenants(promotedT)} " +
      f"returned to the hash layout in $wDemote%.1f s (hash shard rebuilt " +
      f"from the FULL corpus incl. the outlier era, table re-pinned " +
      f"without it; the hot host's entry unchanged — writer 3 never " +
      "paused); ONLY writer 2 stopped; outlier-era re-sends must now " +
      "REJECT on the hash path (asserted next cycle)")

    walls += runCycle(8) // carries the outlier-era re-send reject assert
    require(dedupReader.reads.get() > readsBeforeDemote._1 &&
      adviseReader.reads.get() > readsBeforeDemote._2 &&
      serveReader.reads.get() > readsBeforeDemote._3,
      "a reader stalled across the demotion re-pin")

    // ── IVF SERVE REPOINT after c8 (r19): a side-by-side index root is
    // rebuilt from the old root's committed segments (indexes are
    // DERIVED data — no catch-up pass exists to forget) and the LIVE
    // serve reader flips to it between snapshots; the old root is torn
    // down only after a read that provably STARTED post-flip completed,
    // so the swap costs 0 torn reads ──
    val oldIvf = ivfRoot
    val ivf2 = tmp.resolve("ivf2").toString
    val tornBeforeRepoint = serveReader.retries.get()
    val (_, wIvfMig) = timed {
      Ivf.saveIndexAtomic(Ivf.readIndex(spark, oldIvf).drop("ivf_cell"),
        "vec_id", "embedding", ivf2, k = kCells, iters = 2)
    }
    val readsAtFlip = serveReader.reads.get()
    ivfRoot = ivf2
    val flipDeadline = System.nanoTime() + 300L * 1000000000L
    while (serveReader.reads.get() < readsAtFlip + 2 &&
        serveReader.fatal.get() == null &&
        System.nanoTime() < flipDeadline) Thread.sleep(100)
    serveReader.check()
    require(serveReader.reads.get() >= readsAtFlip + 2,
      "serve reads stalled across the index repoint")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(oldIvf))
    val readsAtTeardown = serveReader.reads.get()
    while (serveReader.reads.get() < readsAtTeardown + 2 &&
        serveReader.fatal.get() == null &&
        System.nanoTime() < flipDeadline) Thread.sleep(100)
    serveReader.check()
    require(serveReader.reads.get() >= readsAtTeardown + 2,
      "serve reads stalled after the old-root teardown")
    require(serveReader.retries.get() == tornBeforeRepoint,
      s"torn serve reads across the index repoint: " +
        s"${serveReader.retries.get() - tornBeforeRepoint}")
    println(f"FLEET ivf serve repoint after cycle 8: side-by-side index " +
      f"root rebuilt from committed segments in $wIvfMig%.1f s, the live " +
      f"serve reader flipped between snapshots and the old root was torn " +
      f"down — 0 torn reads, recall floor held on every read, version " +
      f"numbering restarted (v=${Ivf.indexSnapshot(spark, ivfRoot).version})")

    (repointAfter + 1 until cycles - 1).foreach(c => walls += runCycle(c))

    // ── RESHARD-CANARY DAY, overlapping the final cycle: the
    // side-by-side 20-shard root rebuilds from the regenerated corpus
    // WHILE the four writers drain their last batches; then the READER
    // repoints — the read-replica canary step of a side-by-side
    // migration. The rebuild re-homes the promoted host's full history
    // into hash sub-shards: demotion by rebuild, for the vector of the
    // migration ──
    val canaryRoot = tmp.resolve("canary").toString
    val canaryShards = 20
    val shard20: Map[String, Long] =
      allKeys.toDF("k")
        .select(col("k"), DocPipeline.shardOf(col("k"), canaryShards).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpusThroughPrev = (0 until nTenants)
      .map(t => acceptedCorpus(t, upTo = cycles - 2)).reduce(_ unionByName _)
    var wCanary = 0.0
    val (_, wallLast) = timed {
      feedCycle(cycles - 1)
      val (_, w) = timed {
        DocPipeline.reshardSignatureStores(corpusThroughPrev, canaryRoot,
          routeKey, canaryShards, atomicStore = true, shardTag = keyTag)
      }
      wCanary = w
      val preRepoint = dedupReader.reads.get()
      probeShard = DocPipeline.shardPath(canaryRoot, shard20(tenants(0)))
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
    println(f"FLEET reshard-canary day: 10->20 side-by-side root rebuilt " +
      f"from the regenerated corpus in $wCanary%.1f s WHILE all four " +
      f"writers drained cycle ${cycles - 1}; the dedup reader repointed " +
      "mid-stream and held its accept/reject contract on the new root")

    // ── MIGRATION-COMPLETION DAY: the canary deferred the writers'
    // repoint to "their next maintenance window" — this is that
    // window. Stop all four writers, CATCH-UP the canary root with the
    // post-snapshot delta, re-partition the writer seats to the NEW
    // route map, and run one FULL cycle there. The migration
    // implicitly DEMOTES the hot host: the 20-shard rebuild re-homed
    // its full history into hash sub-shards, so the new root runs with
    // an empty table ──
    writers.foreach(_.q.stop())
    val migCycle = cycles // one past the month's last old-root cycle
    val (deltaRows, wCatchup) = timed {
      val delta = ((0 until nTenants).map(t =>
        freshFrame(cycles - 1, t).unionByName(crossFrame(cycles - 1, t)))
        :+ mirrorFrame(cycles - 1)).reduce(_ unionByName _).cut
      var n = 0L
      (0L until canaryShards.toLong).foreach { s =>
        val part = delta.filter(
          DocPipeline.shardOf(routeKey, canaryShards) === s)
        val sigs = DocPipeline.signatures(part, "doc_id", "text").cut
        val c0 = sigs.count()
        if (c0 > 0) {
          AppendStore.append(sigs, DocPipeline.shardPath(canaryRoot, s))
          n += c0
        }
      }
      n
    }
    require(deltaRows == nTenants.toLong * (freshK + crossK) + mirrorK,
      s"catch-up delta rows $deltaRows")
    // the migration RE-PARTITIONS the tenant->writer assignment to the
    // NEW route map: fences are per SHARD, so two writers feeding
    // tenants that now co-locate on one 20-shard would fence each
    // other and die loudly (the r16 double-writer contract, working as
    // designed). The composite tenant carries THREE keys, any of which
    // can co-locate with anyone — grouping is connected components
    // over "shares a 20-shard", then groups pack across the 4 seats.
    val shardSets: Map[Int, Set[Long]] =
      (0 until nTenants).map(t => t -> keysOfT(t).map(shard20).toSet).toMap
    val assignment: Seq[Seq[Int]] = {
      val parent = Array.tabulate(nTenants)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (a <- 0 until nTenants; b <- a + 1 until nTenants
           if (shardSets(a) intersect shardSets(b)).nonEmpty)
        parent(find(a)) = find(b)
      val groups = (0 until nTenants).groupBy(find).values.toSeq
        .map(_.sorted.toSeq).sortBy(g => (-g.size, g.head))
      val buckets = Array.fill(nStreams)(Vector.empty[Int])
      groups.foreach { g =>
        val i = buckets.zipWithIndex.minBy { case (b, bi) => (b.size, bi) }._2
        buckets(i) = buckets(i) ++ g
      }
      buckets.toSeq.map(_.sorted)
    }
    require(assignment.flatten.sorted == (0 until nTenants).toList)
    writers = assignment.zipWithIndex.filter(_._1.nonEmpty).map {
      case (ts, w) =>
        startWriter(w, ts, rootPath = canaryRoot, shards = canaryShards)
    }.toIndexedSeq
    // one full cycle on the new root: fresh accepted; boot re-crawls
    // AND post-snapshot (cycle-(cycles-1)) re-crawls ALL rejected — no
    // accepted history lost across the migration; cross copies and
    // composite mirrors honor the NEW route map (pairs the denser
    // layout now CO-LOCATES must reject — asserted from the live route
    // map per seed-residue third, not assumed)
    def rePostFrame(t: Int) = {
      val b = base(migCycle, t)
      spark.range(b + 6000000L, b + 6000000L + reK)
        .withColumn("_seed",
          lit(base(cycles - 1, t)) + pmod(xxhash64(col("id")), lit(freshK)))
        .select(col("id").as("doc_id"), lit(tenants(t)).as("tenant"),
          hostOf(col("_seed"), t).as("host"), docText(col("_seed")).as("text"))
    }
    val migBatches = writers.map { w =>
      w -> w.tenantIdx.flatMap { t =>
        rowsOf(freshFrame(migCycle, t)) ++ rowsOf(reFrame(migCycle, t)) ++
          rowsOf(rePostFrame(t)) ++ rowsOf(crossFrame(migCycle, t)) ++
          (if (t == compT) rowsOf(mirrorFrame(migCycle)) else Nil)
      }
    }
    val (_, wMig) = timed {
      migBatches.foreach { case (w, rows) => w.in.addData(rows) }
      writers.foreach(_.q.processAllAvailable())
    }
    val migAccepted = Array.fill(nTenants)(0L)
    val migHostAcc = Array.fill(nHosts)(0L)
    writers.foreach { w =>
      val acc = w.accepted.get()
      w.tenantIdx.foreach { t =>
        val b = base(migCycle, t)
        val fresh = acc.count(id => id >= b && id < b + freshK)
        val reBootLeak = acc.count(id => id >= b + 5000000L && id < b + 5000000L + reK)
        val rePostLeak = acc.count(id => id >= b + 6000000L && id < b + 6000000L + reK)
        val crossAcc = acc.count(id => id >= b + 7000000L && id < b + 7000000L + crossK)
        val mirrorAcc = acc.count(id => id >= b + 8000000L && id < b + 8000000L + mirrorK)
        require(fresh == freshK, s"migration cycle tenant $t: $fresh fresh")
        require(reBootLeak == 0,
          s"migration cycle tenant $t: $reBootLeak BOOT re-crawls leaked " +
            "on the new root — the reshard lost pre-snapshot history")
        require(rePostLeak == 0,
          s"migration cycle tenant $t: $rePostLeak POST-SNAPSHOT re-crawls " +
            "leaked — the catch-up delta is incomplete")
        val wantCross = (0 until 3).map { r =>
          val copyKey = if (t == compT) ck(r) else tenants(t)
          val srcT = (t + 1) % nTenants
          val origKey = if (srcT == compT) ck(r) else tenants(srcT)
          if (shard20(copyKey) == shard20(origKey)) 0L else crossK / 3
        }.sum
        require(crossAcc == wantCross,
          s"migration cycle tenant $t: cross $crossAcc != $wantCross " +
            "(per-third co-location at 20 shards)")
        if (t == compT) {
          val wantMirror = (0 until 3).map { r =>
            if (shard20(ck(r)) == shard20(ck((r + 1) % 3))) 0L
            else mirrorK / 3
          }.sum
          require(mirrorAcc == wantMirror,
            s"migration cycle: mirrors $mirrorAcc != $wantMirror — " +
              "co-located sub-shards must now catch their cross-host " +
              "mirrors (the composite trade shrinks as the layout merges)")
          (0 until 3).foreach { r =>
            migHostAcc(r) += freshK / 3
            val srcT = (t + 1) % nTenants
            val origKey = if (srcT == compT) ck(r) else tenants(srcT)
            if (shard20(ck(r)) != shard20(origKey)) migHostAcc(r) += crossK / 3
            val dst = (r + 1) % 3
            if (shard20(ck(r)) != shard20(ck(dst))) migHostAcc(dst) += mirrorK / 3
          }
        } else require(mirrorAcc == 0, s"stray mirrors for tenant $t")
        migAccepted(t) = fresh + crossAcc + mirrorAcc
      }
    }
    // per-20-shard manifest pricing on the migrated root: rows == the
    // sum over its route KEYS of boot + month accepts + catch-up + the
    // migration cycle — zero Spark jobs
    val keyDocs: Map[String, Long] =
      ((0 until nTenants).filter(_ != compT).map(t =>
        tenants(t) -> (bootN + perTenantAccepted(t) + migAccepted(t))) ++
        (0 until nHosts).map(h =>
          ck(h) -> (bootN / 3 + perHostAccepted(h) + migHostAcc(h)))).toMap
    (0L until canaryShards.toLong).foreach { s =>
      val want = allKeys.filter(k => shard20(k) == s).map(keyDocs).sum
      if (want > 0) {
        val got = AppendStore.manifestRows(spark,
          DocPipeline.shardPath(canaryRoot, s))
        require(got.contains(want), s"migrated shard $s: rows $got != $want")
      }
    }
    dedupReader.check(); adviseReader.check(); serveReader.check()
    println(f"FLEET migration-completion day: catch-up delta " +
      f"$deltaRows%,d rows into the 20-shard root in $wCatchup%.1f s, " +
      f"${writers.size} writer seats re-partitioned to the new route map " +
      f"(fences are per shard: grouping follows routing, composite keys " +
      f"included), and a full cycle ran there in $wMig%.1f s — boot AND " +
      f"post-snapshot re-crawls 0 leaked, cross copies AND cross-host " +
      f"mirrors honored the NEW route map per seed-residue third, " +
      f"per-shard rows manifest-priced exactly; the hot host demoted by " +
      "the rebuild itself")

    // ── month close: stop writers, final audits (old root: frozen at
    // cycle cycles-1's state by the migration) ──
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

    // IVF post-race audit ON THE MIGRATED ROOT: deletes held through
    // every compact/retrain AND the index migration (readIndex resolves
    // tombstones, so a migrated root must never resurrect them)
    val finalIdx = Ivf.readIndex(spark, ivfRoot)
    require(finalIdx.join(deleted.toSeq.toDF("vec_id"), Seq("vec_id"),
      "left_semi").count() == 0L, "deleted ids served after the race")
    println(f"FLEET ivf serve: ${serveReader.reads.get()} committed-snapshot " +
      f"reads (${serveReader.retries.get()} clean retries) through $cycles " +
      f"cycles of append+delete+compact+vacuum(keep=2)+retrain AND a " +
      f"mid-fleet index migration + repoint UNDER the 4-writer fleet; " +
      f"recall floor $floor%.3f (baseline $baseline%.3f), min seen " +
      f"$minRecall%.3f; deletes never resurfaced")

    // abandoned-store freezes: the demoted tenant's dedicated root and
    // the promoted host's old sub-shard must both be exactly where the
    // day that abandoned them left them
    require(AppendStore.manifestRows(spark, monsterRoot) == monsterRowsAtDemote,
      "the demoted tenant's abandoned dedicated root grew after demotion")
    require(AppendStore.manifestRows(spark, hotShardPath) == frozenHotRows,
      "the promoted host's old sub-shard grew after its promotion")
    // exact distinct counts per LIVE store (the manifest checks priced
    // every cycle; this is the close-out ground truth)
    (0 until nTenants).filter(_ != compT).foreach { t =>
      val docs = AppendStore.readOr(spark, storePathOf(t),
        sys.error("missing")).select("doc_id").distinct().count()
      require(docs == bootN + perTenantAccepted(t),
        s"tenant $t: store $docs != ${bootN + perTenantAccepted(t)}")
    }
    (0 until nHosts).foreach { h =>
      val docs = AppendStore.readOr(spark, hostStore(h),
        sys.error("missing")).select("doc_id").distinct().count()
      require(docs == bootN / 3 + perHostAccepted(h),
        s"host $h: store $docs != ${bootN / 3 + perHostAccepted(h)}")
    }
    // cross-shard audit at exact k: the SUB-TENANT-AWARE planted truth,
    // accumulated as the month ran (promotion freezes the hot host's
    // thirds mid-count; the demotion rebuild re-homed tenant 4's
    // outlier era, restoring its pairs to the uniform count)
    val perShardDocsMax = bootN + perTenantAccepted.max
    val (audit, wAudit) = timed {
      DocPipeline.auditCrossShardDups(spark, root, nShards,
        sampleK = (perShardDocsMax + 1000000L).toInt)
    }
    audit.pairs.foreach { p =>
      require(p.exact, s"audit must be exact at this k: $p")
      val expected = pairTruth.getOrElse((p.shardA, p.shardB), 0L)
      require(p.estSharedDocs == expected,
        s"pair (${p.shardA},${p.shardB}): ${p.estSharedDocs} != $expected")
    }
    val totalDocs = nTenants * bootN + perTenantAccepted.sum
    val nonZeroPairs = pairTruth.values.count(_ > 0)
    println(f"FLEET audit: exact cross-shard pass over $totalDocs%,d stored " +
      f"docs in $wAudit%.1f s — sub-tenant-aware truth on $nonZeroPairs " +
      f"ring/mirror pairs (hot-host thirds frozen at promotion, tenant-4 " +
      f"pairs restored to uniform by the demotion rebuild), 0 on all " +
      f"${audit.pairs.size - nonZeroPairs} others: every planted copy " +
      "and every cross-host mirror accounted")
    println(f"FLEET month holds: $cycles cycles x 4 concurrent scoped " +
      f"writers x 2 tenants (one COMPOSITE with 3 sub-shards), " +
      f"$totalDocs%,d docs stored " +
      f"(${nTenants * bootN}%,d boot + ${perTenantAccepted.sum}%,d streamed), " +
      f"${dedupReader.reads.get()} dedup-probe reads, " +
      f"${adviseReader.reads.get()} advise reads, and " +
      f"${serveReader.reads.get()} ANN serve reads through live writers, " +
      "rolling maintenance, TWO overlapping rolling promotions, a rolling " +
      "demotion, an IVF index migration + serve repoint, and a " +
      f"reshard-canary day; cycle walls " +
      f"${walls.map(w => f"$w%.0f").mkString("/")} s")
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
