package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** SHARDED ops composition (§7.11 #7 — the OpsMonthDemo discipline
  * applied to the r16 surface): a multi-cycle deployment of
  * [[DocPipeline.streamIncrementalSharded]] over 4 tenants / 4 atomic
  * per-shard stores, per-cycle invariants asserted the whole way, and
  * the round's operational events dropped INSIDE the composition:
  *
  *   - every cycle, per tenant: 1,200 fresh docs (ALL accepted), 500
  *     exact re-crawls of that tenant's history (ALL reject), 200
  *     near-dups (leak bounded by the banding-puncture model), and
  *     100 CROSS-TENANT copies — exact texts lifted from another
  *     tenant's history, asserted ACCEPTED: the independence contract
  *     as a per-cycle invariant, not a sentence;
  *   - per-shard store growth == that tenant's accepted docs, every
  *     cycle (stores grow with content, not traffic);
  *   - the accepted corpus rides to a side parquet per batch — the
  *     deployment's actual product, and the source of truth every
  *     rebuild below replays (the rebuildSignatureStore contract);
  *   - BLAST DAY after cycle 2: one shard deleted mid-month, rebuilt
  *     from the side corpus (tenant-filtered), stream restarted —
  *     later cycles assert every tenant unaffected;
  *   - MAINTENANCE DAY after cycle 4: every shard compacted and
  *     vacuumed (per-shard stores are full atomic stores);
  *   - CROSS-SHARD DUP AUDIT (r17): the accepted cross-tenant copies
  *     give the audit a KNOWN truth — the exact pass must recover it
  *     per pair, the KMV pass must land within 2x;
  *   - MONSTER DAY (r17): one tenant promoted to its own root via the
  *     outlierRoots routing table, a full cycle's invariants held
  *     through it, the old hash shard frozen;
  *   - RESHARD FINALE: adviseShardCount fires on a tightened budget →
  *     side-by-side reshard into a fresh root at the recommended
  *     count → one more full cycle there, all invariants intact.
  *
  * Run: sbt "runMain graft.examples.ShardOpsDemo [cycles]". */
object ShardOpsDemo {

  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(6)
    require(cycles >= 6, "composition needs >= 6 cycles for its event days")
    val nShards = 4
    val nFresh = 1200; val nRe = 500; val nNear = 200; val nCross = 100
    val spark = SparkSession.builder()
      .appName("shard-ops-demo")
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

    val route = (0 until 64).map(i => s"tenant$i").toDF("k")
      .select(col("k"), DocPipeline.shardOf(col("k"), nShards).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val tenants = route.groupBy(_._2).map(_._2.head).toSeq.sortBy(_._2)
    require(tenants.size == nShards)

    // 40-word unique text per CONTENT id; near-dups share all but the
    // last word (3-shingle J ≈ 35/41 ≈ 0.85 — above tau 0.8; the
    // (8,4) banding-puncture rate is (1−J²)⁴ ≈ 0.5% per plant)
    def wordsOf(cid: Column, n: Int) = transform(sequence(lit(1), lit(n)),
      w => concat(lit("u"), xxhash64(cid, w).cast("string")))
    def docText(cid: Column) = array_join(wordsOf(cid, 40), " ")
    def nearText(cid: Column, salt: Column) = array_join(
      concat(wordsOf(cid, 39), array(concat(lit("n"), salt.cast("string")))), " ")

    def base(c: Int, t: Int): Long = (c.toLong * nShards + t) * 1000000L
    def batchRows(c: Int, t: Int): Seq[(Long, String, String)] = {
      val ten = tenants(t)._1
      val fresh = spark.range(base(c, t), base(c, t) + nFresh)
        .select(col("id"), lit(ten), docText(col("id")).cast("string"))
        .as[(Long, String, String)].collect().toSeq
      if (c == 0) return fresh
      // a fresh content id of an earlier cycle of tenant `srcT`
      def srcOf(id: Column, srcT: Int) =
        lit(base(0, srcT)) +
          pmod(xxhash64(id), lit(c.toLong)) * lit(nShards.toLong * 1000000L) +
          pmod(xxhash64(id, lit(7)), lit(nFresh.toLong))
      val re = spark.range(base(c, t) + 10000L, base(c, t) + 10000L + nRe)
        .select(col("id"), lit(ten), docText(srcOf(col("id"), t)).cast("string"))
        .as[(Long, String, String)].collect().toSeq
      val near = spark.range(base(c, t) + 20000L, base(c, t) + 20000L + nNear)
        .select(col("id"), lit(ten),
          nearText(srcOf(col("id"), t), col("id")).cast("string"))
        .as[(Long, String, String)].collect().toSeq
      // cross sources must be INJECTIVE across the whole composition: a
      // repeated pick would be an exact dup of the earlier accepted
      // copy and reject correctly — breaking the "all cross copies
      // accepted" assertion for the wrong reason. Same-index picks
      // from the PREVIOUS cycle of the source tenant are unique per
      // (cycle, j) and never repeat.
      val crossSrc0 = base(c - 1, (t + 1) % nShards)
      val cross = spark.range(base(c, t) + 30000L, base(c, t) + 30000L + nCross)
        .select(col("id"), lit(ten),
          docText(lit(crossSrc0) + pmod(col("id"), lit(nCross.toLong)))
            .cast("string"))
        .as[(Long, String, String)].collect().toSeq
      fresh ++ re ++ near ++ cross
    }

    val tmp = java.nio.file.Files.createTempDirectory("shardops")
    var root = tmp.resolve("store").toString
    val corpusLog = tmp.resolve("accepted").toString // the side product
    var shards = nShards
    var lastAccepted = Set.empty[Long]
    val perTenantAccepted = Array.fill(nShards)(0L)

    type In = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    var outliers = Map.empty[String, String] // the monster-day routing table
    var monsterIdx: Option[Int] = None
    def startStream(): (In, org.apache.spark.sql.streaming.StreamingQuery) = {
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
      val q = DocPipeline.streamIncrementalSharded(
        in.toDF().toDF("doc_id", "tenant", "text"), root, col("tenant"),
        shards, minWords = 10, atomicStore = true,
        shardTag = "tenant", outlierRoots = outliers) { (df, _) =>
        val slim = df.select(col("doc_id"), col("tenant"), col("text")).cache()
        slim.write.mode("append").parquet(corpusLog)
        lastAccepted = slim.select("doc_id").as[Long].collect().toSet
        slim.unpersist()
      }
      (in, q)
    }

    val leakLog = scala.collection.mutable.ArrayBuffer[Int]()
    def runAndAssert(in: In, q: org.apache.spark.sql.streaming.StreamingQuery,
                     c: Int): Unit = {
      in.addData((0 until nShards).flatMap(t => batchRows(c, t)))
      q.processAllAvailable()
      var cycleLeak = 0
      (0 until nShards).foreach { t =>
        val b = base(c, t)
        val fresh = lastAccepted.count(id => id >= b && id < b + nFresh)
        val reLeak = lastAccepted.count(id => id >= b + 10000L && id < b + 10000L + nRe)
        val nearLeak = lastAccepted.count(id => id >= b + 20000L && id < b + 20000L + nNear)
        val crossAcc = lastAccepted.count(id => id >= b + 30000L && id < b + 30000L + nCross)
        require(fresh == nFresh, s"cycle $c tenant $t: $fresh of $nFresh fresh accepted")
        if (c > 0) {
          require(reLeak == 0, s"cycle $c tenant $t: $reLeak exact re-crawls leaked")
          require(nearLeak <= 8,
            s"cycle $c tenant $t: $nearLeak of $nNear near-dups leaked " +
              "(puncture bound 8 — expected ~1 at the (8,4) miss rate)")
          require(crossAcc == nCross,
            s"cycle $c tenant $t: only $crossAcc of $nCross cross-tenant copies " +
              "accepted — the independence contract broke")
          cycleLeak += nearLeak
          perTenantAccepted(t) += nFresh + nearLeak + nCross
        } else perTenantAccepted(t) += nFresh
        if (shards == nShards) { // pre-reshard roots: shard == tenant
          // a promoted monster's history lives at its dedicated root;
          // everyone else stays at their hash shard
          val path =
            if (monsterIdx.contains(t)) outliers(tenants(t)._1)
            else DocPipeline.shardPath(root, tenants(t)._2)
          val storeDocs = graft.sources.AppendStore.readOr(spark,
              path, sys.error("missing shard"))
            .select("doc_id").distinct().count()
          require(storeDocs == perTenantAccepted(t),
            s"cycle $c tenant $t: store $storeDocs != accepted ${perTenantAccepted(t)}")
        }
      }
      leakLog += cycleLeak
    }

    // ── cycles 0..2 ──
    var (in, q) = startStream()
    (0 to 2).foreach(c => runAndAssert(in, q, c))

    // ── BLAST DAY: tenant 1's shard lost mid-month ──
    q.stop()
    val victim = 1
    val victimPath = DocPipeline.shardPath(root, tenants(victim)._2)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(victimPath))
    val (_, wBlast) = timed {
      DocPipeline.rebuildSignatureStore(
        spark.read.parquet(corpusLog)
          .filter(col("tenant") === tenants(victim)._1)
          .select(col("doc_id"), col("text")), victimPath,
        atomicStore = true)
    }
    println(f"SHARD-OPS blast day: shard lost after cycle 2, rebuilt from " +
      f"the side corpus in $wBlast%.1f s; composition continues")

    // ── cycles 3..4 on a restarted stream ──
    val s2 = startStream(); in = s2._1; q = s2._2
    (3 to 4).foreach(c => runAndAssert(in, q, c))

    // ── MAINTENANCE DAY: per-shard compact + vacuum under the month ──
    q.stop()
    val (_, wMaint) = timed {
      tenants.foreach { case (_, s) =>
        graft.sources.AppendStore.compact(spark, DocPipeline.shardPath(root, s))
        graft.sources.AtomicCommit.vacuum(spark, DocPipeline.shardPath(root, s),
          keepVersions = 1)
      }
    }
    println(f"SHARD-OPS maintenance day: 4 shards compacted+vacuumed in " +
      f"$wMaint%.1f s after cycle 4")
    val s3 = startStream(); in = s3._1; q = s3._2
    (5 until cycles).foreach(c => runAndAssert(in, q, c))
    q.stop()

    // ── CROSS-SHARD DUP AUDIT (r17): price the honest caveat ──
    // The composition's cross-tenant copies are accepted BY CONTRACT —
    // so the shard stores genuinely hold cross-shard duplicate
    // fingerprints, with a KNOWN truth: each cycle c>0 plants nCross
    // copies in tenant t from tenant (t+1)%4's previous cycle, so each
    // adjacent shard pair shares exactly (cycles-1)*nCross fps and the
    // diagonal pairs share none. The audit must measure that without
    // any cross-shard store join.
    val truthPerPair = (cycles - 1).toLong * nCross
    val (exactAudit, wAuditX) = timed {
      DocPipeline.auditCrossShardDups(spark, root, nShards, sampleK = 65536)
    }
    val (estAudit, wAuditE) = timed {
      DocPipeline.auditCrossShardDups(spark, root, nShards, sampleK = 2048)
    }
    def pairKey(p: DocPipeline.ShardPairDups) = (p.shardA, p.shardB)
    val adjacent = tenants.indices.map { t =>
      val (a, b) = (tenants(t)._2, tenants((t + 1) % nShards)._2)
      (math.min(a, b), math.max(a, b))
    }.toSet
    exactAudit.pairs.foreach { p =>
      require(p.exact, s"audit at k=65536 must be exact: $p")
      if (adjacent(pairKey(p)))
        require(p.estSharedDocs == truthPerPair,
          s"adjacent pair truth $truthPerPair, audit says $p")
      else require(p.estSharedDocs == 0L, s"diagonal pair must share 0: $p")
    }
    estAudit.pairs.filter(p => adjacent(pairKey(p))).foreach { p =>
      require(!p.exact && p.estSharedDocs >= truthPerPair / 2 &&
        p.estSharedDocs <= truthPerPair * 2,
        s"KMV estimate off by >2x vs truth $truthPerPair: $p")
    }
    println(f"SHARD-OPS cross-shard audit: exact pass (k=64k) found " +
      f"$truthPerPair%,d shared fps on each adjacent pair and 0 on " +
      f"diagonals in $wAuditX%.1f s; KMV pass (k=2048) estimated " +
      f"${estAudit.pairs.filter(p => adjacent(pairKey(p)))
        .map(_.estSharedDocs).mkString("/")} in $wAuditE%.1f s — " +
      "the sharding caveat is now a number, not a sentence")

    // ── MONSTER DAY (r17, VERDICT r16 #3): one tenant outgrows the
    // hash router. adviseShardCount's honest caveat — a tenant is
    // ATOMIC under the router, so the hot shard is bounded below by
    // its own size no matter the count — gets its operational answer:
    // promote the tenant to its OWN root (the routing table above the
    // router), rebuilt from the accepted corpus so no history is lost.
    val monster = 2
    val monsterKey = tenants(monster)._1
    val monsterShardPath = DocPipeline.shardPath(root, tenants(monster)._2)
    val advM = DocPipeline.adviseShardCount(spark, root, nShards,
      budgetDocs = perTenantAccepted(monster) - 1)
    require(advM.reshard, advM.toString) // fires — but splitting cannot help
    val monsterRoot = tmp.resolve("monster").toString
    val (_, wPromote) = timed {
      DocPipeline.promoteTenants(
        spark.read.parquet(corpusLog).select(col("doc_id"), col("tenant"), col("text")),
        root, "tenant", Map(monsterKey -> monsterRoot), atomicStore = true)
    }
    outliers = Map(monsterKey -> monsterRoot); monsterIdx = Some(monster)
    val frozenShardDocs = graft.sources.AppendStore.readOr(spark,
      monsterShardPath, sys.error("missing")).select("doc_id").distinct().count()
    val s35 = startStream(); in = s35._1; q = s35._2
    runAndAssert(in, q, cycles) // a full cycle through the routing table
    q.stop()
    require(graft.sources.AppendStore.readOr(spark, monsterShardPath,
      sys.error("missing")).select("doc_id").distinct().count() == frozenShardDocs,
      "monster's old hash shard must freeze after promotion")
    println(f"SHARD-OPS monster day: tenant $monsterKey promoted to its own " +
      f"root in $wPromote%.1f s (advise fired at budget ${advM.budgetDocs}%,d; " +
      "the tenant is atomic under the router, so splitting could not have " +
      f"helped); cycle $cycles%d's invariants held through the routing " +
      "table, the old hash shard froze, pre-promotion re-crawls still reject")

    // ── RESHARD FINALE ──
    val adv = DocPipeline.adviseShardCount(spark, root, nShards,
      budgetDocs = perTenantAccepted.max / 2)
    require(adv.reshard && adv.recommendedShards > nShards, adv.toString)
    val newRoot = tmp.resolve("store2").toString
    val (_, wReshard) = timed {
      DocPipeline.reshardSignatureStores(
        spark.read.parquet(corpusLog).select(col("doc_id"), col("tenant"), col("text")),
        newRoot, col("tenant"), adv.recommendedShards,
        atomicStore = true, shardTag = "tenant")
    }
    root = newRoot; shards = adv.recommendedShards
    outliers = Map.empty; monsterIdx = None // the reshard re-homes everyone
    val s4 = startStream(); in = s4._1; q = s4._2
    runAndAssert(in, q, cycles + 1)
    q.stop()
    println(f"SHARD-OPS reshard finale: advise fired (hot shard " +
      f"${adv.maxShardDocs}%,d docs vs budget ${adv.budgetDocs}%,d) -> " +
      f"$nShards -> $shards shards in $wReshard%.1f s; final cycle's " +
      "invariants held at the new count")

    // ── COMPOSITE-KEY DAY (r18, VERDICT r17 #3): the OTHER monster
    // mitigation, measured. An internally-divisible tenant (its crawl
    // has hosts) shards by compositeKey(tenant, host): per-sub-shard
    // scans/blooms are bounded by the sub-shard (the upside), and
    // duplicates that repeat ACROSS hosts — mirrors — land in
    // different sub-shards and are missed (the priced downside). The
    // day plants BOTH classes against the live route map and prices
    // the missed class with the cross-shard audit. ──
    val nSub = 8; val cShards = 4
    val bigTen = "bigtenant"
    def hostIdxOf(id: Column) = pmod(xxhash64(id, lit(11)), lit(nSub.toLong))
    val hostShard = (0 until nSub).map { h =>
      h -> spark.range(1).select(DocPipeline.shardOf(
        DocPipeline.compositeKey(lit(bigTen), lit(s"h$h")), cShards))
        .head().getLong(0)
    }.toMap
    // pigeonhole guarantees a co-located host pair (8 hosts, 4 shards);
    // a split pair exists unless ALL hosts hash to one shard
    val hostPairs = (for (i <- 0 until nSub; j <- 0 until nSub if i != j)
      yield (i, j)).toSeq
    val catchPair = hostPairs.find { case (i, j) => hostShard(i) == hostShard(j) }
      .getOrElse(sys.error("no co-located host pair — impossible at 8 hosts / 4 shards"))
    val missPair = hostPairs.find { case (i, j) => hostShard(i) != hostShard(j) }
      .getOrElse(sys.error("all 8 hosts hashed to one shard — re-seed the host tag"))
    val cBase = 900000000L
    val cRoot = tmp.resolve("composite").toString
    val bootC = spark.range(cBase, cBase + 20000L)
      .select(col("id").as("doc_id"), lit(bigTen).as("tenant"),
        concat(lit("h"), hostIdxOf(col("id")).cast("string")).as("host"),
        docText(col("id")).cast("string").as("text"))
    val (_, wCompBoot) = timed {
      DocPipeline.reshardSignatureStores(bootC, cRoot,
        DocPipeline.compositeKey(col("tenant"), col("host")), cShards,
        atomicStore = true, shardTag = "tenant#host")
    }
    // per-sub-shard bound, the upside: the monster's 20k boot docs
    // spread over the sub-shards instead of one atomic store
    val subShardDocs = (0 until cShards).map(s =>
      graft.sources.AppendStore.readOr(spark,
        DocPipeline.shardPath(cRoot, s), sys.error("missing sub-shard"))
        .count())
    require(subShardDocs.sum == 20000L && subShardDocs.max < 20000L,
      s"sub-shards must split the tenant: $subShardDocs")
    // one streamed cycle of plants against the live route map: fresh
    // (accept), same-host re-crawls (co-route → reject), and mirrors
    // on a co-located AND a split host pair
    val nCatch = 200; val nMiss = 200
    def mirrorRows(idBase: Long, pair: (Int, Int), n: Int) = {
      // src docs crawled on host pair._1, re-crawled under pair._2:
      // exact same TEXT, different sub-key → routes by the route map
      val srcs = spark.range(cBase, cBase + 20000L)
        .filter(hostIdxOf(col("id")) === pair._1.toLong).limit(n)
        .select(col("id"), docText(col("id")).cast("string"))
        .as[(Long, String)].collect()
      require(srcs.length == n, s"only ${srcs.length} boot docs on h${pair._1}")
      srcs.zipWithIndex.map { case ((_, text), k) =>
        (idBase + k, bigTen, s"h${pair._2}", text)
      }.toSeq
    }
    val freshC = spark.range(cBase + 1000000L, cBase + 1000000L + 2000L)
      .select(col("id"), lit(bigTen),
        concat(lit("h"), hostIdxOf(col("id")).cast("string")),
        docText(col("id")).cast("string"))
      .as[(Long, String, String, String)].collect().toSeq
    val reC = spark.range(cBase + 2000000L, cBase + 2000000L + 500L)
      .select(col("id"), lit(bigTen),
        concat(lit("h"), hostIdxOf(pmod(xxhash64(col("id"), lit(3)),
          lit(20000L)) + cBase).cast("string")),
        docText(pmod(xxhash64(col("id"), lit(3)), lit(20000L)) + cBase)
          .cast("string"))
      .as[(Long, String, String, String)].collect().toSeq
    val caughtPlants = mirrorRows(cBase + 3000000L, catchPair, nCatch)
    val missPlants = mirrorRows(cBase + 4000000L, missPair, nMiss)
    val inC = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String, String)]
    var acceptedC = Set.empty[Long]
    val qC = DocPipeline.streamIncrementalSharded(
      inC.toDF().toDF("doc_id", "tenant", "host", "text"), cRoot,
      DocPipeline.compositeKey(col("tenant"), col("host")), cShards,
      minWords = 10, atomicStore = true, shardTag = "tenant#host") { (df, _) =>
      acceptedC = df.select("doc_id").as[Long].collect().toSet
    }
    inC.addData(freshC ++ reC ++ caughtPlants ++ missPlants)
    qC.processAllAvailable(); qC.stop()
    val freshAcc = acceptedC.count(id => id >= cBase + 1000000L && id < cBase + 1100000L)
    val reLeakC = acceptedC.count(id => id >= cBase + 2000000L && id < cBase + 2100000L)
    val caughtAcc = acceptedC.count(id => id >= cBase + 3000000L && id < cBase + 3100000L)
    val missAcc = acceptedC.count(id => id >= cBase + 4000000L && id < cBase + 4100000L)
    require(freshAcc == 2000, s"composite fresh: $freshAcc of 2000")
    require(reLeakC == 0, s"composite same-host re-crawls leaked: $reLeakC")
    require(caughtAcc == 0,
      s"co-located mirrors (h${catchPair._1}->h${catchPair._2}, both shard " +
        s"${hostShard(catchPair._1)}) must ALL reject: $caughtAcc leaked")
    require(missAcc == nMiss,
      s"split mirrors (h${missPair._1} shard ${hostShard(missPair._1)} -> " +
        s"h${missPair._2} shard ${hostShard(missPair._2)}) are the PRICED " +
        s"loss and all pass through: only $missAcc of $nMiss accepted")
    // the audit prices exactly the missed class: the split pair shares
    // the planted fps, every other pair shares 0
    val (auditC, wAuditC) = timed {
      DocPipeline.auditCrossShardDups(spark, cRoot, cShards, sampleK = 65536)
    }
    val missKey = (math.min(hostShard(missPair._1), hostShard(missPair._2)),
      math.max(hostShard(missPair._1), hostShard(missPair._2)))
    auditC.pairs.foreach { p =>
      require(p.exact, s"composite audit must be exact at this k: $p")
      val want = if ((p.shardA, p.shardB) == missKey) nMiss.toLong else 0L
      require(p.estSharedDocs == want,
        s"pair (${p.shardA},${p.shardB}): ${p.estSharedDocs} != $want")
    }
    println(f"SHARD-OPS composite day: tenant '$bigTen' split over $cShards " +
      f"sub-shards by (tenant,host) in $wCompBoot%.1f s (per-sub-shard " +
      f"${subShardDocs.mkString("/")} docs — the scan/bloom bound the " +
      f"outlier root cannot give); within-host re-crawls 0/${reC.size} " +
      f"leaked, co-located mirrors 0/$nCatch leaked, SPLIT-PAIR mirrors " +
      f"$missAcc/$nMiss missed BY DESIGN and the audit recovered them " +
      f"pair-exactly in $wAuditC%.1f s — the composite-key recall trade " +
      "is measured, not documented")
    println(s"SHARD-OPS invariants hold: ${cycles + 2} cycles x 4 tenants, " +
      s"per-cycle near-dup leaks=${leakLog.mkString(",")} " +
      s"(cross-tenant copies accepted ${nCross}x4 EVERY cycle by contract), " +
      s"accepted per tenant=${perTenantAccepted.mkString("/")}")
    spark.stop()
  }
}
