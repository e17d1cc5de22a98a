package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** Geometry-migration rehearsal at corpus scale (VERDICT r14 #5) — the
  * store-maintenance valves were spec-verified at fixture size only:
  *
  *   1. SIG-WEIGHT: the r15 capped verification payload, measured — a
  *      100k × 600-token corpus written as an exact signature store vs
  *      the bottom-64 sketch store; the claim is ~10× smaller rows for
  *      long documents (the O(corpus tokens) → O(m) trade).
  *   2. SIG-MIGRATE: 1M-doc signature store rebuilt from the accepted
  *      corpus at a NEW geometry, (8, 4, exact) → (16, 8, m = 64) —
  *      wall, bytes, and POST-MIGRATION REJECTION PARITY on a probe
  *      batch (exact re-crawls must reject identically through the
  *      fp path; near-dups must keep rejecting through the rebuilt
  *      banding; fresh content must keep flowing).
  *   3. EMB-REBUCKET: 1M-vector embedding store re-keyed
  *      (bits 8, bands 2) → (10, 4) in one pass — the occupancy valve
  *      — wall, bytes, and the same parity probe on vector dedup.
  *
  * Run: sbt "runMain graft.examples.StoreMigrationDemo [docs]"
  */
object StoreMigrationDemo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .appName("store-migration-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("storemig")
    def bytesOf(p: String): Long =
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(p))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // scrambled 3M-word vocabulary: natural-vocabulary hash scatter
    // (sequential names would cluster the poly-roll — TextHash caveat)
    def docText(id: org.apache.spark.sql.Column, words: org.apache.spark.sql.Column) =
      array_join(transform(sequence(lit(1), words),
        w => concat(lit("t"), pmod(xxhash64(id, w), lit(3000000L)))), " ")

    // ── 1. SIG-WEIGHT: exact vs bottom-64 store bytes on LONG docs ────
    val longDocs = spark.range(100000L)
      .select(col("id").as("doc_id"), docText(col("id"), lit(600)).as("text"))
      .localCheckpoint()
    val exactPath = tmp.resolve("sig_exact").toString
    val sketchPath = tmp.resolve("sig_sketch").toString
    val (_, wExact) = timed {
      DocPipeline.rebuildSignatureStore(longDocs, exactPath, minhashK = 8, bands = 4)
    }
    val (_, wSketch) = timed {
      DocPipeline.rebuildSignatureStore(longDocs, sketchPath,
        minhashK = 8, bands = 4, maxShingles = 64)
    }
    val (bE, bS) = (bytesOf(exactPath), bytesOf(sketchPath))
    require(bE > bS * 5,
      s"sketch store only ${bE.toDouble / bS}x smaller — cap not landing?")
    println(f"SIG-WEIGHT: 100k docs x 600 tokens — exact ${bE / 1048576.0}%.1f MB " +
      f"(${wExact}%.1f s) vs m=64 sketch ${bS / 1048576.0}%.1f MB (${wSketch}%.1f s): " +
      f"${bE.toDouble / bS}%.1f x smaller")

    // ── 1c. BAND-BYTES: packed 64-bit band keys (bkv=2) vs the retired
    // "b:h1_h2" string rendering (bkv=1, reconstructed here for
    // measurement only) — at-rest parquet bytes of the band_keys
    // column and the exploded candidate-stage shuffle, same 100k
    // long-doc corpus. The string keys are ~25-45 chars of
    // high-cardinality data (dictionary encoding can't fold them);
    // the packed form is 8 B fixed and candidate equi-joins become
    // long joins.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    val sigCols = longDocs
      .withColumn("_whs", graft.ext.TextHash.wordHashes(col("text")))
      .withColumn("_sig", graft.ext.TextHash.minhashSignature(col("_whs"), 8))
    val packedKeys = sigCols.select(col("doc_id"),
      graft.ext.TextHash.bandKeys64(col("_sig"), 4).as("band_keys"))
    val stringKeys = sigCols.select(col("doc_id"),
      array((0 until 4).map { b =>
        concat_ws(":", lit(b), array_join(slice(col("_sig"), b * 2 + 1, 2), "_"))
      }: _*).as("band_keys"))
    val packedPath = tmp.resolve("keys_packed").toString
    val stringPath = tmp.resolve("keys_string").toString
    packedKeys.write.parquet(packedPath)
    stringKeys.write.parquet(stringPath)
    val (kbP, kbS) = (bytesOf(packedPath), bytesOf(stringPath))
    def candShuffle(keys: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val banded = spark.read.parquet(keys match {
        case _ if keys eq packedKeys => packedPath; case _ => stringPath
      }).select(col("doc_id"), explode(col("band_keys")).as("band_key"))
      val before = shuffleBytes.get()
      val (_, w) = timed {
        banded.groupBy(col("band_key")).agg(min(col("doc_id")).as("m"))
          .join(banded, "band_key").filter(col("doc_id") > col("m")).count()
      }
      (shuffleBytes.get() - before, w)
    }
    candShuffle(packedKeys); candShuffle(stringKeys) // JIT/page-cache warm
    val (sbP, wP) = candShuffle(packedKeys)
    val (sbS, wS) = candShuffle(stringKeys)
    // at rest parquet's byte-packed + compressed encodings absorb part
    // of the string overhead (measured ~1.8x, not the raw ~3-5x); the
    // wire is where raw width shows — shuffle rows carry the key bytes
    require(kbS > kbP, s"packed keys not smaller at rest: ${kbS.toDouble / kbP}x")
    require(sbS > sbP * 3 / 2, s"packed candidate shuffle only ${sbS.toDouble / sbP}x smaller")
    println(f"BAND-BYTES: 100k docs — band_keys at rest string ${kbS / 1048576.0}%.1f MB " +
      f"vs packed ${kbP / 1048576.0}%.1f MB (${kbS.toDouble / kbP}%.1f x); candidate-stage " +
      f"shuffle string ${sbS / 1048576.0}%.1f MB ($wS%.1f s) vs packed " +
      f"${sbP / 1048576.0}%.1f MB ($wP%.1f s, ${sbS.toDouble / sbP}%.1f x)")

    // ── 1b. VERIFY-CAP: in-batch stage-5b exchange, exact vs m=64 on
    // long docs + 25k planted near-dups (suffix edits, J ≈ 0.998) —
    // the capped verify must drop the same plants at a fraction of the
    // shuffled candidate payload. Vocabulary here is per-doc-unique
    // (full-hash words) so buckets are pair-private and blocking is
    // decisive — the SHARED-vocab corpus above would instead measure
    // blocking adjacency (intervening bucket-mates between far-apart
    // pair ids), a different axis than verify cost/parity
    def docTextU(id: org.apache.spark.sql.Column, words: Int) =
      array_join(transform(sequence(lit(1), lit(words)),
        w => concat(lit("u"), xxhash64(id, w))), " ")
    val withNears = spark.range(100000L)
      .select(col("id").as("doc_id"), docTextU(col("id"), 600).as("text"))
      .unionByName(
        spark.range(100000L, 125000L).select(col("id").as("doc_id"),
          concat(docTextU(col("id") - 100000L, 600),
            lit(" zz"), (col("id") % 3).cast("string")).as("text")))
      .localCheckpoint()
    val (nExact, wVe) = timed(
      DocPipeline.prepare(withNears, minWords = 10).count())
    val (nCap, wVc) = timed(
      DocPipeline.prepare(withNears, minWords = 10, maxShingles = 64).count())
    require(nExact == nCap,
      s"verify-cap parity broke: exact=$nExact capped=$nCap")
    // a handful of plants may miss every band (banding puncture — a
    // blocking property, identical in both modes; measured 2/25,000)
    require(nExact <= 100010L,
      s"plants leaked past the puncture allowance: $nExact survivors")
    println(f"VERIFY-CAP: 125k long docs (25k planted nears) — in-batch prepare " +
      f"exact $wVe%.1f s vs m=64 $wVc%.1f s; identical survivor sets " +
      f"(${nExact - 100000L} banding-puncture leaks, equal in both modes)")

    // ── 1c. ADJACENCY-LEAK closure: the SHARED-vocab corpus (3M words,
    // each low-hash word in ~20 docs → buckets hold a few docs beyond
    // the true pair) with far-apart pair ids leaks ~2.8% through
    // star∪path (intervening bucket-mates break adjacency, §7.8);
    // all-pairs completion within small buckets closes it at bounded
    // O(b²) ────────────────────────────────────────────────────────────
    val sharedNears = longDocs.unionByName(
      spark.range(100000L, 125000L).select(col("id").as("doc_id"),
        concat(docText(col("id") - 100000L, lit(600)),
          lit(" zz"), (col("id") % 3).cast("string")).as("text")))
      .localCheckpoint()
    // cap choice from the measured bucket anatomy (Scratch probe, one
    // run): every planted pair shares SOME bucket; 23,861 of 25,000
    // have a pair-private one (≤2 members — star/path decisive), 511
    // bottom out at 3–16, 628 at 17–64, none beyond (largest bucket in
    // the corpus: 54). Cap 64 therefore covers every pair at a sum-b²
    // cost bounded by 54² per bucket — negligible next to stage 5b.
    withNears.unpersist(blocking = true) // free section 1b's checkpoint
    val (spLeak, wSp) = timed(
      DocPipeline.prepare(sharedNears, minWords = 10, maxShingles = 64)
        .count() - 100000L)
    val (apLeak, wAp) = timed(
      DocPipeline.prepare(sharedNears, minWords = 10, maxShingles = 64,
        allPairsMaxBucket = 64).count() - 100000L)
    require(apLeak * 20 <= spLeak,
      s"all-pairs completion failed to close the adjacency leak: " +
        s"star∪path=$spLeak allPairs=$apLeak")
    println(f"ADJACENCY-LEAK: shared-vocab 125k docs — star∪path leaks $spLeak%,d " +
      f"of 25,000 plants ($wSp%.1f s); allPairsMaxBucket=64 leaks $apLeak%,d " +
      f"($wAp%.1f s)")

    longDocs.unpersist(blocking = true)
    sharedNears.unpersist(blocking = true)

    // ── 2. SIG-MIGRATE: 1M docs, (8,4,exact) → (16,8,m=64) ───────────
    val corpus = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        docText(col("id"), (pmod(col("id"), lit(20L)) + 40L).cast("int")).as("text"))
      .localCheckpoint()
    val oldSig = tmp.resolve("sig_old").toString
    val newSig = tmp.resolve("sig_new").toString
    val (_, wOld) = timed {
      DocPipeline.rebuildSignatureStore(corpus, oldSig, minhashK = 8, bands = 4)
    }
    val (_, wNew) = timed {
      DocPipeline.rebuildSignatureStore(corpus, newSig,
        minhashK = 16, bands = 8, maxShingles = 64)
    }
    println(f"SIG-MIGRATE: $nDocs docs — old (8,4,exact) ${bytesOf(oldSig) / 1048576.0}%.1f MB " +
      f"in $wOld%.1f s; rebuilt (16,8,m=64) ${bytesOf(newSig) / 1048576.0}%.1f MB in $wNew%.1f s")
    // post-migration rejection parity: 1k exact re-crawls, 1k near-dups
    // (accepted text + suffix), 1k fresh — judged against old and new
    val probeBase = 20000000L
    val reCrawl = spark.range(probeBase, probeBase + 1000L)
      .select(col("id").as("doc_id"),
        docText(pmod(xxhash64(col("id")), lit(nDocs)),
          (pmod(pmod(xxhash64(col("id")), lit(nDocs)), lit(20L)) + 40L).cast("int")).as("text"))
    val nearDup = spark.range(probeBase + 1000L, probeBase + 2000L)
      .select(col("id").as("doc_id"),
        concat(docText(pmod(xxhash64(col("id")), lit(nDocs)),
          (pmod(pmod(xxhash64(col("id")), lit(nDocs)), lit(20L)) + 40L).cast("int")),
          lit(" zz"), (col("id") % 3).cast("string")).as("text"))
    val fresh = spark.range(probeBase + 2000L, probeBase + 3000L)
      .select(col("id").as("doc_id"), docText(col("id") + 5000000L, lit(45)).as("text"))
    val probe = reCrawl.unionByName(nearDup).unionByName(fresh).localCheckpoint()
    def acceptedIds(storePath: String, k: Int, bands: Int, m: Int): Set[Long] = {
      val store = spark.read.parquet(storePath)
      DocPipeline.prepareIncremental(probe, store, minWords = 10,
        minhashK = k, bands = bands, tau = 0.8, maxShingles = m)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val (accOld, wPOld) = timed(acceptedIds(oldSig, 8, 4, 0))
    val (accNew, wPNew) = timed(acceptedIds(newSig, 16, 8, 64))
    def split(s: Set[Long]) = (
      s.count(_ < probeBase + 1000L),          // exact re-crawls accepted (want 0)
      s.count(id => id >= probeBase + 1000L && id < probeBase + 2000L), // near leaks
      s.count(_ >= probeBase + 2000L))          // fresh accepted (want 1000)
    val (exOld, nearOld, frOld) = split(accOld)
    val (exNew, nearNew, frNew) = split(accNew)
    require(exOld == 0 && exNew == 0, s"exact re-crawls leaked: old=$exOld new=$exNew")
    require(frOld == 1000 && frNew == 1000, s"fresh eaten: old=$frOld new=$frNew")
    // the rebuilt geometry has MORE bands at the same rows/band — its
    // near-dup recall must not regress vs the old store
    require(nearNew <= nearOld + 5,
      s"rebuilt store leaks more near-dups: old=$nearOld new=$nearNew")
    println(f"SIG-MIGRATE parity: re-crawls 0/1000 leaked (both), near-dup leaks " +
      s"old=$nearOld/1000 new=$nearNew/1000, fresh 1000/1000 (both); " +
      f"probe wall old=$wPOld%.1f s new=$wPNew%.1f s")

    // ── 3. EMB-REBUCKET: 1M vectors, (bits 8, bands 2) → (10, 4) ─────
    val dim = 16
    def vecOf(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)), i =>
        ((pmod(xxhash64(id, i), lit(2000L)) - 1000L).cast("double") / 1000.0)
          .cast("float"))
    val vecs = spark.range(nDocs)
      .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
    val embStore = tmp.resolve("emb").toString
    val (_, wBuild) = timed {
      DocPipeline.rebuildEmbeddingStore(vecs, embStore, dim, bits = 8, bands = 2)
    }
    val b0 = bytesOf(embStore)
    // the DECISION a rekey answers (r16: adviseEmbeddingMigration —
    // the embedding twin of the signature store's advise): probe the
    // history-join candidate volume for representative fresh traffic
    // at the CURRENT geometry vs a verify budget. Honest boundary,
    // measured here at 1M vectors: candidate volume is the UNION over
    // bands, so more BANDS raises it linearly — bands buy per-band
    // recall, BITS buy occupancy (the vector twin of SvProbe's "more
    // bands ≠ sharper"). The occupancy migration is therefore more
    // bits at FIXED bands; the demo measures all three geometries so
    // the boundary is a number, not a sentence.
    val adviseProbe = spark.range(probeBase + 5000L, probeBase + 5200L)
      .select(col("id").as("vec_id"), vecOf(col("id") + 9000000L).as("embedding"))
    def advise(bits: Int, bands: Int) = DocPipeline.adviseEmbeddingMigration(
      adviseProbe, spark.read.parquet(embStore), dim,
      bits = bits, bands = bands, maxCandidatesPerVec = 5000.0)
    val adv0 = advise(8, 2)
    val (_, wCalm) = timed {
      DocPipeline.rebucketEmbeddingStore(spark, embStore, dim, bits = 14, bands = 2)
    }
    val advCalm = advise(14, 2)
    require(adv0.migrate && !advCalm.migrate,
      s"advise decision wrong: before=$adv0 after=$advCalm")
    require(advCalm.candidatesPerDoc < adv0.candidatesPerDoc / 3,
      s"bits rekey did not suppress occupancy: $adv0 -> $advCalm")
    // now the r15 recall-geometry rehearsal continues unchanged: the
    // (10,4) rekey trades candidate volume back for per-band recall —
    // the probe READS that trade (volume above even the (8,2) level)
    val (_, wRekey) = timed {
      DocPipeline.rebucketEmbeddingStore(spark, embStore, dim, bits = 10, bands = 4)
    }
    val b1 = bytesOf(embStore)
    val advRecall = advise(10, 4)
    println(f"EMB-ADVISE: (8,2) ${adv0.candidatesPerDoc}%.0f cand/vec " +
      f"(5k budget -> migrate) -> bits rekey (14,2) in $wCalm%.1f s -> " +
      f"${advCalm.candidatesPerDoc}%.0f cand/vec (quiet); recall rekey " +
      f"(10,4) -> ${advRecall.candidatesPerDoc}%.0f cand/vec — bands buy " +
      "recall at linear candidate cost, bits buy occupancy")
    // parity probe: re-submitted vectors are exact (cos = 1) dups of
    // history — every one must reject at the NEW geometry; fresh
    // vectors (different seed space) must flow
    val reVecs = spark.range(probeBase, probeBase + 2000L)
      .select(col("id").as("vec_id"), vecOf(pmod(xxhash64(col("id")), lit(nDocs))).as("embedding"))
    val freshVecs = spark.range(probeBase + 2000L, probeBase + 3000L)
      .select(col("id").as("vec_id"),
        vecOf(col("id") + 7000000L).as("embedding"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probeVecs = reVecs.unionByName(freshVecs).as[(Long, Seq[Float])].collect().toSeq
    @volatile var accepted: Set[Long] = Set.empty
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = DocPipeline.streamEmbeddingDedup(
      in.toDF().toDF("vec_id", "embedding"), embStore, dim,
      bits = 10, bands = 4, tau = 0.999) { (df, _) =>
      accepted = df.select("vec_id").collect().map(_.getLong(0)).toSet
    }
    try { in.addData(probeVecs); q.processAllAvailable() } finally q.stop()
    val reLeak = accepted.count(_ < probeBase + 2000L)
    val frAcc = accepted.count(_ >= probeBase + 2000L)
    require(reLeak == 0, s"$reLeak re-submitted vectors leaked past the rebucketed store")
    require(frAcc >= 990, s"rebucketed store ate fresh vectors: $frAcc of 1000")
    println(f"EMB-REBUCKET: $nDocs vectors — build (8,2) ${b0 / 1048576.0}%.1f MB " +
      f"in $wBuild%.1f s; rekey (10,4) ${b1 / 1048576.0}%.1f MB in $wRekey%.1f s; " +
      s"parity: re-submits 0/2000 leaked, fresh $frAcc/1000 accepted")
    // ── 1d. HASH-BYTES: chunk/line-store keys as binary(16) unhex(md5)
    // (r15) vs the retired 32-char hex strings — at-rest parquet bytes
    // and a store-side anti-join pass at 2M stored hashes. md5s are
    // unique, so parquet's dictionary can't fold the hex form; the
    // binary form is both half the raw width and the representation
    // the in-batch operators already shuffle.
    val hashSrc = spark.range(2000000L)
      .select(md5(col("id").cast("string")).as("hs"))
    val hexPath = tmp.resolve("h_hex").toString
    val binPath = tmp.resolve("h_bin").toString
    hashSrc.select(col("hs").as("h")).write.parquet(hexPath)
    hashSrc.select(unhex(col("hs")).as("h")).write.parquet(binPath)
    val (hbHex, hbBin) = (bytesOf(hexPath), bytesOf(binPath))
    def antiWall(path: String, probe: org.apache.spark.sql.DataFrame): Double = {
      val (_, w) = timed {
        probe.join(spark.read.parquet(path), Seq("h"), "left_anti").count()
      }
      w
    }
    val probeHex = spark.range(3000000L, 3030000L)
      .select(md5(col("id").cast("string")).as("h"))
    val probeBin = probeHex.select(unhex(col("h")).as("h"))
    antiWall(hexPath, probeHex); antiWall(binPath, probeBin) // warm
    val wHex = antiWall(hexPath, probeHex)
    val wBin = antiWall(binPath, probeBin)
    require(hbHex > hbBin * 3 / 2,
      s"binary hash keys not smaller at rest: ${hbHex.toDouble / hbBin}x")
    println(f"HASH-BYTES: 2M stored hashes — at rest hex ${hbHex / 1048576.0}%.1f MB " +
      f"vs binary ${hbBin / 1048576.0}%.1f MB (${hbHex.toDouble / hbBin}%.1f x); " +
      f"30k-probe anti-join $wHex%.2f s vs $wBin%.2f s")


    println("STORE-MIGRATION rehearsal passed")
    spark.stop()
  }
}
