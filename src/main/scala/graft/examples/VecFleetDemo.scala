package graft.examples

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline
import graft.sources.AppendStore

/** VECTOR-FAMILY FLEET (r18, the builder's round-19 candidate (3)
  * pulled forward): the signature fleet has the full superposition;
  * this puts the r18 vector-family parity mechanisms under the same
  * composition load — concurrent SCOPED embedding writers, a racing
  * dup-probe reader, per-shard geometry maintenance, a mid-fleet
  * vector promotion, and the new cross-shard embedding audit closing
  * on a promotion-aware planted truth.
  *
  *   - 4 tenants → 4 shards of ONE root
  *     (`streamEmbeddingDedupSharded`, atomic stores, tenant
  *     routing); TWO concurrent scoped writers, 2 tenants each;
  *   - per cycle per tenant: fresh vectors ALL accepted, exact
  *     re-sends of boot vectors ALL rejected, and CROSS-STREAM copies
  *     (the ring-adjacent tenant's previous-cycle vectors under new
  *     ids) ALL accepted — independent dedup domains across writer
  *     processes, the planted truth the close audit must recover;
  *   - a dup-probe reader thread ([[DocPipeline.embeddingDupProbe]])
  *     hammers ONE live writer's shard the whole run: a planted
  *     near-copy of a boot vector must be found on EVERY read, an
  *     anti-aligned probe must never match;
  *   - REBUCKET DAY after cycle 2: the probed writer stops, BOTH its
  *     shards rebucket bits 6→8, it restarts AT THE NEW GEOMETRY —
  *     per-shard `_emb_meta` autonomy means the other writer keeps
  *     running its shards at bits=6 (geometry is per shard, not per
  *     root), and the probe reader rides through the rebucket of the
  *     very shard it probes (the meta-seqlock contract under a live
  *     fleet);
  *   - PROMOTION DAY after cycle 3: tenant 2 outgrows the router —
  *     ONLY its writer stops, [[DocPipeline.promoteEmbeddingTenants]]
  *     rebuilds its dedicated store from the regenerated accepted
  *     vectors and re-pins its `out:` entry, the writer restarts on
  *     its slice; the other writer and the probe reader run straight
  *     through the re-pin (the scoped per-entry check, vector side);
  *   - close: [[DocPipeline.auditCrossShardEmbDups]] at exact k
  *     recovers the PROMOTION-AWARE truth — the promoted tenant's two
  *     ring pairs freeze at its promotion cycle, the others carry the
  *     full count, diagonals 0; per-store rows stay manifest-priced
  *     (bands × vectors) every cycle.
  *
  * Run: sbt "runMain graft.examples.VecFleetDemo [cycles] [freshK]". */
object VecFleetDemo {

  private final class Reader(name: String, done: AtomicBoolean)(read: () => Unit)
      extends Thread(name) {
    val reads = new AtomicInteger(0)
    val fatal = new AtomicReference[Throwable](null)
    override def run(): Unit =
      while (!done.get() && fatal.get() == null) {
        try { read(); reads.incrementAndGet() }
        catch { case e: Throwable => fatal.set(e) }
      }
    def check(): Unit = if (fatal.get() != null) throw fatal.get()
  }

  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(6)
    val freshK = args.lift(1).map(_.toLong).getOrElse(2000L)
    require(cycles >= 6, "the composition needs >= 6 cycles for its days")
    val nShards = 4; val dim = 16
    val bootN = 10000L; val reK = 500L; val crossK = 200L
    val promoteAfter = 3; val promotedT = 2 // writer 1 owns tenants 2,3
    val spark = SparkSession.builder()
      .appName("vec-fleet-demo")
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

    val route = (0 until 64).map(i => s"vt$i").toDF("k")
      .select(col("k"), DocPipeline.shardOf(col("k"), nShards).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val tenants = route.groupBy(_._2).map(_._2.head).toSeq.sortBy(_._2)
    require(tenants.size == nShards)

    // content-id → vector (hash-quantized; exact copies are exact)
    def vecOf(cid: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)), j =>
        ((pmod(xxhash64(cid, j), lit(10007L)).cast("double") / 10007.0)
          .cast("float")))
    def bootBase(t: Int) = 800000000L + t * 1000000L
    def base(c: Int, t: Int) = (c.toLong * nShards + t) * 1000000L

    val tmp = java.nio.file.Files.createTempDirectory("vecfleet")
    val root = tmp.resolve("store").toString
    val monsterRoot = tmp.resolve("monster").toString

    // deterministic regeneration of a tenant's ACCEPTED vectors (boot
    // + fresh + cross through a cycle) — the promotion rebuild's input
    def bootFrame(t: Int) = spark.range(bootN)
      .select((col("id") + 850000000L + t * bootN).as("vec_id"),
        lit(tenants(t)._1).as("tenant"),
        vecOf(lit(bootBase(t)) + col("id")).as("embedding"))
    def freshFrame(c: Int, t: Int) = spark.range(base(c, t), base(c, t) + freshK)
      .select(col("id").as("vec_id"), lit(tenants(t)._1).as("tenant"),
        vecOf(col("id")).as("embedding"))
    def crossFrame(c: Int, t: Int) = {
      val src0 = base(c - 1, (t + 1) % nShards)
      spark.range(base(c, t) + 700000L, base(c, t) + 700000L + crossK)
        .select(col("id").as("vec_id"), lit(tenants(t)._1).as("tenant"),
          vecOf(lit(src0) + pmod(col("id"), lit(crossK))).as("embedding"))
    }
    def acceptedVecs(t: Int, upTo: Int) =
      (Seq(bootFrame(t)) ++ (0 to upTo).map(c => freshFrame(c, t)) ++
        (1 to upTo).map(c => crossFrame(c, t))).reduce(_ unionByName _)

    // ── writers (scoped; geometry per writer — rebucket day moves
    // writer 0 to bits=8 while writer 1 stays at 6) ──
    type In = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Seq[Float])]
    final case class W(id: Int, tenantIdx: Seq[Int], in: In,
                       q: org.apache.spark.sql.streaming.StreamingQuery,
                       accepted: AtomicReference[Set[Long]])
    def startWriter(id: Int, tenantIdx: Seq[Int], bits: Int,
                    outliers: Map[String, String] = Map.empty): W = {
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Seq[Float])]
      val acc = new AtomicReference[Set[Long]](Set.empty)
      val q = DocPipeline.streamEmbeddingDedupSharded(
        in.toDF().toDF("vec_id", "tenant", "embedding"), root, col("tenant"),
        nShards, dim, bits = bits, bands = 2, tau = 0.999,
        atomicStore = true, shardTag = "tenant", outlierRoots = outliers,
        tenantScope = tenantIdx.map(tenants(_)._1)) { (df, _) =>
        acc.set(df.select("vec_id").as[Long].collect().toSet)
      }
      W(id, tenantIdx, in, q, acc)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Seq[Float])].collect().toSeq

    // bootstrap: writer 0's boot batch creates _shard_meta before
    // writer 1 races it (the supported sequential bootstrap)
    var w0 = startWriter(0, Seq(0, 1), bits = 6)
    w0.in.addData(rows(bootFrame(0)) ++ rows(bootFrame(1)))
    w0.q.processAllAvailable()
    var w1 = startWriter(1, Seq(2, 3), bits = 6)
    w1.in.addData(rows(bootFrame(2)) ++ rows(bootFrame(3)))
    w1.q.processAllAvailable()
    require(w0.accepted.get().size == 2 * bootN && w1.accepted.get().size == 2 * bootN)
    println(f"VEC-FLEET boot: ${4 * bootN}%,d vectors into $nShards shards " +
      "through the two scoped writers")

    // ── the probe reader: a near-copy of tenant 0's boot vector 7
    // must be FOUND on every read; the anti-aligned probe never ──
    val probeShard = DocPipeline.shardPath(root, tenants(0)._2)
    val plantedId = 850000000L + 0 * bootN + 7L // boot vec_id of cid bootBase(0)+7
    val probeVecs = spark.range(1)
      .select(lit(777777L).as("vec_id"),
        transform(vecOf(lit(bootBase(0) + 7L)), x => (x + 0.0001f).cast("float"))
          .as("embedding"))
      .unionByName(spark.range(1).select(lit(888888L).as("vec_id"),
        transform(vecOf(lit(424242L)), x => (-x).cast("float")).as("embedding")))
    import graft.core.Checkpoints.CutOps
    val probeCut = probeVecs.cut
    val done = new AtomicBoolean(false)
    val probeReader = new Reader("vec-dup-probe", done)(() => {
      val got = DocPipeline.embeddingDupProbe(probeCut, probeShard,
        tau = 0.999).select("vec_id", "match_id").as[(Long, Long)]
        .collect().toSet
      require(got.contains((777777L, plantedId)),
        s"planted near-copy MISSED on a live-writer shard: $got")
      require(!got.exists(_._1 == 888888L), s"anti-aligned probe matched: $got")
    })
    probeReader.start()

    // ── the month ──
    val perTenantVecs = Array.fill(nShards)(bootN) // vectors per tenant store
    var promoted = false
    def storePathOf(t: Int): String =
      if (promoted && t == promotedT) monsterRoot
      else DocPipeline.shardPath(root, tenants(t)._2)
    def runCycle(c: Int, writers: Seq[W]): Double = {
      val (_, wall) = timed {
        writers.foreach { w =>
          w.in.addData(w.tenantIdx.flatMap { t =>
            val fresh = rows(freshFrame(c, t))
            val re = rows(spark.range(base(c, t) + 500000L, base(c, t) + 500000L + reK)
              .select(col("id"), lit(tenants(t)._1),
                vecOf(lit(bootBase(t)) + pmod(xxhash64(col("id")), lit(bootN)))))
            val cross = if (c == 0) Nil else rows(crossFrame(c, t))
            fresh ++ re ++ cross
          })
        }
        writers.foreach(_.q.processAllAvailable())
      }
      writers.foreach { w =>
        val acc = w.accepted.get()
        w.tenantIdx.foreach { t =>
          val b = base(c, t)
          val fresh = acc.count(id => id >= b && id < b + freshK)
          val reLeak = acc.count(id => id >= b + 500000L && id < b + 500000L + reK)
          val crossAcc = acc.count(id => id >= b + 700000L && id < b + 700000L + crossK)
          require(fresh == freshK, s"cycle $c tenant $t: $fresh of $freshK fresh")
          require(reLeak == 0, s"cycle $c tenant $t: $reLeak boot re-sends leaked")
          if (c > 0) require(crossAcc == crossK,
            s"cycle $c tenant $t: cross $crossAcc of $crossK — vector " +
              "cross-writer independence broke")
          perTenantVecs(t) += freshK + (if (c > 0) crossK else 0L)
          // banded rows, manifest-priced: bands(2) × vectors
          val got = AppendStore.manifestRows(spark, storePathOf(t))
          require(got.contains(2L * perTenantVecs(t)),
            s"cycle $c tenant $t: store rows $got != ${2L * perTenantVecs(t)}")
        }
      }
      probeReader.check()
      wall
    }

    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 to 2).foreach(c => walls += runCycle(c, Seq(w0, w1)))

    // ── REBUCKET DAY: the probed writer's shards move bits 6→8; the
    // other writer and the probe reader never pause ──
    w0.q.stop()
    val readsBeforeRebucket = probeReader.reads.get()
    val (_, wRebucket) = timed {
      Seq(0, 1).foreach { t =>
        DocPipeline.rebucketEmbeddingStore(spark,
          DocPipeline.shardPath(root, tenants(t)._2), dim,
          bits = 8, bands = 2, atomicStore = true)
      }
    }
    w0 = startWriter(0, Seq(0, 1), bits = 8)
    println(f"VEC-FLEET rebucket day after cycle 2: writer 0's two shards " +
      f"re-keyed 6->8 bits in $wRebucket%.1f s and it restarted at the new " +
      "geometry; writer 1 keeps its shards at 6 bits (geometry is per " +
      "shard) and the probe reader rode through the rebucket of the very " +
      "shard it probes")

    walls += runCycle(3, Seq(w0, w1))
    require(probeReader.reads.get() > readsBeforeRebucket,
      "the probe reader stalled across the rebucket")

    // ── PROMOTION DAY: tenant 2 to its own root; ONLY writer 1 stops ──
    w1.q.stop()
    val frozenShard = DocPipeline.shardPath(root, tenants(promotedT)._2)
    val readsBeforePromo = probeReader.reads.get()
    val (_, wPromote) = timed {
      DocPipeline.promoteEmbeddingTenants(
        acceptedVecs(promotedT, upTo = promoteAfter), root, "tenant",
        Map(tenants(promotedT)._1 -> monsterRoot), dim,
        bits = 6, bands = 2, atomicStore = true)
    }
    promoted = true
    val frozenRows = AppendStore.manifestRows(spark, frozenShard)
    require(frozenRows.contains(2L * perTenantVecs(promotedT)),
      s"frozen shard baseline: $frozenRows")
    w1 = startWriter(1, Seq(2, 3), bits = 6,
      outliers = Map(tenants(promotedT)._1 -> monsterRoot))
    println(f"VEC-FLEET promotion day after cycle 3: tenant " +
      f"${tenants(promotedT)._1} promoted to its own embedding root in " +
      f"$wPromote%.1f s; ONLY writer 1 stopped — writer 0 and the probe " +
      "reader ran straight through the re-pin")

    (4 until cycles).foreach(c => walls += runCycle(c, Seq(w0, w1)))
    require(probeReader.reads.get() > readsBeforePromo,
      "the probe reader stalled across the promotion")

    def auditAgainst(truthOf: Int => Long, label: String): Double = {
      val (audit, wAudit) = timed {
        DocPipeline.auditCrossShardEmbDups(spark, root, nShards,
          sampleK = (perTenantVecs.max + 100000L).toInt)
      }
      val pairTruth: Map[(Long, Long), Long] = tenants.indices.map { t =>
        val (a, b) = (tenants(t)._2, tenants((t + 1) % nShards)._2)
        (math.min(a, b), math.max(a, b)) -> truthOf(t)
      }.toMap
      audit.pairs.foreach { p =>
        require(p.exact, s"audit must be exact at this k: $p")
        val expected = pairTruth.getOrElse((p.shardA, p.shardB), 0L)
        require(p.estSharedDocs == expected,
          s"$label pair (${p.shardA},${p.shardB}): ${p.estSharedDocs} != $expected")
      }
      wAudit
    }
    // AUDIT 1 (mid-fleet, readers live): promotion-aware truth —
    // tenant t's cycle-c copies of tenant t+1's cycle c-1 vectors
    // share a hash between shard(t) and shard(t+1) iff the copy landed
    // in shard(t) (t != promoted or c <= promoteAfter) AND the source
    // landed in shard(t+1) (t+1 != promoted or c-1 <= promoteAfter)
    require(AppendStore.manifestRows(spark, frozenShard) == frozenRows,
      "the promoted tenant's old shard grew after promotion")
    def ringTruth(t: Int): Long = (1 until cycles).count { c =>
      (t != promotedT || c <= promoteAfter) &&
        ((t + 1) % nShards != promotedT || c - 1 <= promoteAfter)
    }.toLong * crossK
    val wAudit1 = auditAgainst(ringTruth, "promotion-aware")
    println(f"VEC-FLEET audit 1: exact cross-shard embedding pass in " +
      f"$wAudit1%.1f s — promotion-aware truth " +
      f"(${tenants.indices.map(ringTruth).mkString("/")}) on the 4 ring " +
      "pairs, 0 on the diagonals; banded storage counted once per vector")

    // ── DEMOTION DAY (r18, candidate (5), vector side): the tenant
    // comes back. ONLY its writer stops; its hash shard rebuilds from
    // the FULL accepted vectors — INCLUDING the outlier-era accepts,
    // which must not be lost on the way back — the table re-pins
    // EMPTY, the writer restarts with no table. Writer 0 and the probe
    // reader run straight through this re-pin too: demotion is as
    // rolling as promotion. ──
    w1.q.stop()
    val readsBeforeDemote = probeReader.reads.get()
    val (_, wDemote) = timed {
      DocPipeline.rebuildEmbeddingStore(
        acceptedVecs(promotedT, upTo = cycles - 1), frozenShard, dim,
        bits = 6, bands = 2, atomicStore = true)
      DocPipeline.promoteEmbeddingTenants(
        acceptedVecs(promotedT, upTo = cycles - 1), root, "tenant",
        Map.empty, dim, bits = 6, bands = 2, atomicStore = true)
    }
    promoted = false
    w1 = startWriter(1, Seq(2, 3), bits = 6)
    walls += runCycle(cycles, Seq(w0, w1)) // a full cycle back on the router
    require(probeReader.reads.get() > readsBeforeDemote,
      "the probe reader stalled across the demotion")
    // outlier-ERA history must have come back with the tenant: exact
    // re-sends of vectors accepted at the dedicated root during the
    // promotion era must ALL reject on the hash path now
    val eraProbe = rows(spark.range(990000000L, 990000000L + reK)
      .select(col("id"), lit(tenants(promotedT)._1),
        vecOf(lit(base(promoteAfter + 1, promotedT)) +
          pmod(xxhash64(col("id")), lit(freshK)))))
    w1.in.addData(eraProbe)
    w1.q.processAllAvailable()
    require(!w1.accepted.get().exists(id => id >= 990000000L && id < 990000000L + reK),
      "outlier-era accepts were LOST on demotion — the rebuild must " +
        "carry the dedicated root's history back to the hash shard")
    println(f"VEC-FLEET demotion day after cycle ${cycles - 1}: tenant " +
      f"${tenants(promotedT)._1} rebuilt back onto its hash shard in " +
      f"$wDemote%.1f s (full history incl. the outlier era), table " +
      "re-pinned empty, writer restarted; writer 0 and the probe reader " +
      f"never paused; $reK outlier-era re-sends all rejected on the hash path")

    // ── close ──
    w0.q.stop(); w1.q.stop()
    done.set(true)
    probeReader.join(60000); probeReader.check()
    require(probeReader.reads.get() >= 20,
      s"probe reader only ${probeReader.reads.get()} reads — not sustained")
    // AUDIT 2: demotion restores the UNIFORM truth — every ring pair
    // carries all cycles' copies (the rebuild re-homed the promoted
    // era's copies and sources), diagonals still 0
    val wAudit2 = auditAgainst(_ => (cycles.toLong) * crossK, "post-demotion")
    val total = perTenantVecs.sum
    println(f"VEC-FLEET audit 2: post-demotion pass in $wAudit2%.1f s — " +
      f"uniform truth ${cycles.toLong * crossK}%,d on every ring pair " +
      "(the demotion rebuild re-homed the outlier era), 0 on the diagonals")
    println(f"VEC-FLEET month holds: ${cycles + 1} cycles x 2 scoped " +
      f"writers x 2 tenants, $total%,d vectors stored, " +
      f"${probeReader.reads.get()} dup-probe reads through a live writer, " +
      "a rebucket of the probed shard, a rolling vector promotion AND a " +
      "rolling demotion; cycle walls " +
      f"${walls.map(w => f"$w%.0f").mkString("/")} s")
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
