package graft

import org.apache.spark.sql.functions._
import graft.ext.{Corpus, Dedup}
import graft.operators.ZOrder

/** Round-4 corpus-shaping surface: stratified sampling, sequence
  * packing, decontamination, Z-order keys, and the pointer-doubling
  * convergence of transitive clustering. Cross-engine arithmetic is
  * separately proven by the DuckDB oracles (q_stratified_sample,
  * q_pack, q_decontaminate, q_rep_quality, q_zorder). */
class CorpusSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map { i =>
      (i.toLong, s"lang${i % 3}", s"src${i % 4}",
        (1 to (5 + i % 7)).map(w => s"w${(i * 31 + w * 7) % 11}").mkString(" "))
    }.toDF("doc_id", "lang", "source", "text")

  test("stratifiedSample keeps ceil(frac·count) hash-first rows per stratum") {
    val d = docs(120)
    val out = Corpus.stratifiedSample(d, Seq("lang", "source"), 0.25, "doc_id")
    val got = out.groupBy("lang", "source").count().as[(String, String, Long)]
      .collect().map { case (l, s, c) => (l, s) -> c }.toMap
    val want = d.groupBy("lang", "source").count().as[(String, String, Long)]
      .collect().map { case (l, s, c) => (l, s) -> math.ceil(c * 0.25).toLong }.toMap
    assert(got === want)
    assert(want.values.forall(_ >= 1)) // every non-empty stratum survives
  }

  test("stratifiedSample is deterministic under input reshuffling") {
    val d = docs(97)
    val a = Corpus.stratifiedSample(d, Seq("lang"), 0.4, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    val b = Corpus.stratifiedSample(d.repartition(13, col("source")), Seq("lang"), 0.4, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("stratifiedSampleSalted: salts=1 ≡ unsalted; counts within ceil bound + salts-1") {
    val d = docs(500)
    val plain = Corpus.stratifiedSample(d, Seq("lang"), 0.2, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    val one = Corpus.stratifiedSampleSalted(d, Seq("lang"), 0.2, "doc_id", salts = 1)
      .select("doc_id").as[Long].collect().sorted
    assert(plain.sameElements(one))
    val salted = Corpus.stratifiedSampleSalted(d, Seq("lang"), 0.2, "doc_id", salts = 8)
    val got = salted.groupBy("lang").count().as[(String, Long)].collect().toMap
    val want = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    want.foreach { case (l, c) =>
      val lo = math.ceil(c * 0.2).toLong
      assert(got(l) >= lo && got(l) <= lo + 7, s"$l: ${got(l)} not in [$lo, ${lo + 7}]")
    }
    // deterministic under reshuffling, like the unsalted form
    val a = salted.select("doc_id").as[Long].collect().sorted
    val b = Corpus.stratifiedSampleSalted(d.repartition(11), Seq("lang"), 0.2, "doc_id", salts = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("matchMixture: proportions within a row of target, binding group saturates") {
    import spark.implicits._
    // counts: a=40, b=12, c=30 → weights 2:1:1 (W=4):
    // T = min(40·4/2, 12·4/1, 30·4/1) = min(80, 48, 120) = 48
    // keep: a=2·48/4=24, b=12 (saturated), c=12
    val df = ((0 until 40).map(i => (i.toLong, "a")) ++
      (100 until 112).map(i => (i.toLong, "b")) ++
      (200 until 230).map(i => (i.toLong, "c")) ++
      (300 until 310).map(i => (i.toLong, "zz"))) // not in weights → dropped
      .toDF("id", "g")
    val kept = Corpus.matchMixture(df, "g", "id", Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(kept === Map("a" -> 24L, "b" -> 12L, "c" -> 12L))
    // weights group with no corpus rows → T = 0 → empty
    assert(Corpus.matchMixture(df, "g", "id",
      Map("a" -> 1L, "missing" -> 1L)).isEmpty)
  }

  test("stratifiedSampleN caps every stratum at n") {
    val out = Corpus.stratifiedSampleN(docs(100), Seq("lang"), 7, "doc_id")
    val counts = out.groupBy("lang").count().as[(String, Long)].collect()
    assert(counts.nonEmpty && counts.forall(_._2 == 7))
  }

  test("packSequences: streaming fill — each doc's bin is where its offset starts") {
    val d = docs(60).withColumn("n_tok", size(split(col("text"), " ")))
    val out = Corpus.packSequences(d, "doc_id", "n_tok", budget = 20, Seq("lang"))
      .select("lang", "doc_id", "n_tok", "bin_id")
      .as[(String, Long, Int, Long)].collect()
      .groupBy(_._1).values
    out.foreach { part =>
      var cum = 0L
      part.sortBy(_._2).foreach { case (_, _, tok, bin) =>
        assert(bin === cum / 20) // offset BEFORE the doc decides the bin
        cum += tok
      }
    }
  }

  test("orderHash: in-range ids keep the plain LCG value; 64-bit ids total") {
    val ids = Seq(0L, 1L, 4999L, 2147483647L,           // oracle range
      Long.MaxValue, Long.MinValue + 1, -12345L,        // would overflow raw
      5951154127274131342L)                             // xxhash64-sized
    val got = ids.toDF("id")
      .select(Corpus.orderHash(col("id")).as("h")).as[Long].collect().toSeq
    def plain(id: Long) = {
      val m = ((id % 2147483648L) + 2147483648L) % 2147483648L
      (((m * 1103515245L + 12345L) % 2147483648L) + 2147483648L) % 2147483648L
    }
    assert(got == ids.map(plain))
    // in-range ids match the twin formula the DuckDB oracles compute
    ids.filter(i => i >= 0 && i < 2147483648L).foreach { i =>
      assert(plain(i) == (i * 1103515245L + 12345L) % 2147483648L)
    }
    assert(got.forall(h => h >= 0 && h < 2147483648L))
  }

  test("materializePacked: stream order, lens, counts; reshuffle-stable") {
    val d = Seq(
      (1L, "ga", Seq("a", "b")), (2L, "ga", Seq("c")),
      (3L, "ga", Seq("d", "e", "f")), (10L, "gb", Seq("x", "y"))
    ).toDF("doc_id", "lang", "toks")
      .withColumn("n_tok", size(col("toks")))
    val binned = Corpus.packSequences(d, "doc_id", "n_tok", budget = 3, Seq("lang"))
    def emit(parts: Int) = Corpus.materializePacked(
      binned.repartition(parts), "doc_id", "toks", "bin_id", Seq("lang"))
      .orderBy(col("lang"), col("bin_id"))
      .select("lang", "bin_id", "doc_ids", "doc_lens", "tokens", "n_docs", "n_tokens")
      .as[(String, Long, Seq[Long], Seq[Long], Seq[String], Long, Long)]
      .collect().toSeq
    val rows = emit(1)
    // ga: docs 1(2)+2(1) fill bin 0 exactly; doc 3 starts bin 1
    assert(rows.map(r => (r._1, r._2)) == Seq(("ga", 0L), ("ga", 1L), ("gb", 0L)))
    val bin0 = rows.head
    assert(bin0._3 == Seq(1L, 2L) && bin0._4 == Seq(2L, 1L))
    assert(bin0._5 == Seq("a", "b", "c") && bin0._6 == 2L && bin0._7 == 3L)
    assert(rows(1)._5 == Seq("d", "e", "f"))
    assert(emit(7) == rows, "partition-layout independent")
  }

  test("packSequencesGreedy: no bin over budget; oversized doc isolated; deterministic") {
    val d = docs(80).withColumn("n_tok", size(split(col("text"), " ")))
      .union(Seq((999L, "lang0", "src0", ("big " * 50).trim))
        .toDF("doc_id", "lang", "source", "text")
        .withColumn("n_tok", size(split(col("text"), " "))))
    val out = Corpus.packSequencesGreedy(d, "doc_id", "n_tok", budget = 20, Seq("lang"))
    val bins = out.groupBy("lang", "bin_id")
      .agg(sum("n_tok").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    bins.foreach { case (l, b, s, n) =>
      assert(s <= 20 || n == 1, s"bin ($l,$b) holds $s tokens across $n docs")
    }
    // the 50-token doc exceeds the budget and sits alone in its bin
    val bigBin = out.filter(col("doc_id") === 999L).select("lang", "bin_id")
      .as[(String, Long)].head()
    assert(bins.find(x => (x._1, x._2) == bigBin).get._4 === 1L)
    // deterministic under input reshuffling
    val a = out.select("doc_id", "bin_id").as[(Long, Long)].collect().sortBy(_._1)
    val b = Corpus.packSequencesGreedy(d.repartition(13), "doc_id", "n_tok", 20, Seq("lang"))
      .select("doc_id", "bin_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("packSequences bins are dense from 0 within each partition") {
    val d = docs(60).withColumn("n_tok", size(split(col("text"), " ")))
    val bins = Corpus.packSequences(d, "doc_id", "n_tok", 20, Seq("lang"))
      .groupBy("lang").agg(min("bin_id").as("lo"), countDistinct("bin_id").as("k"),
        max("bin_id").as("hi"))
      .as[(String, Long, Long, Long)].collect()
    bins.foreach { case (_, lo, k, hi) => assert(lo === 0L && hi === k - 1) }
  }

  test("contaminationScores flags the copied doc, omits unrelated ones") {
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // contains bench
      (2L, "one two three four five six seven eight nine"), // unrelated
      (3L, "gamma delta epsilon zeta eta something else entirely here")) // partial overlap
      .toDF("doc_id", "text")
    val scores = Corpus.contaminationScores(train, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(scores(1L) === 4L) // 8-token bench window slid over 9 tokens: 4 shared 5-grams
    assert(scores(3L) === 1L) // exactly one shared 5-gram
    assert(!scores.contains(2L)) // zero-overlap rows omitted
    val kept = Corpus.decontaminate(train, bench, "doc_id", "text", n = 5, minShared = 2)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 3L)))
  }

  test("bloomDecontaminate never keeps a doc the exact rule drops") {
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "gamma delta epsilon zeta eta something else entirely here"))
      .toDF("doc_id", "text")
    for (minShared <- Seq(1L, 2L)) {
      val exact = Corpus.decontaminate(train, bench, "doc_id", "text",
        n = 5, minShared = minShared).select("doc_id").as[Long].collect().toSet
      val bloom = Corpus.bloomDecontaminate(train, bench, "doc_id", "text",
        n = 5, minShared = minShared).select("doc_id").as[Long].collect().toSet
      // one-sided: bloom may drop extra (fpp), never keep a contaminated doc
      assert(bloom.subsetOf(exact), s"minShared=$minShared: $bloom ⊄ $exact")
      // at this size and fpp the fp probability is negligible → equal
      assert(bloom === exact)
    }
    // larger planted corpus: every exact-contaminated doc is gone
    val big = docs(200)
    val bench2 = big.filter(col("doc_id") <= 5).select(col("doc_id") + 1000, col("text"))
      .toDF("doc_id", "text")
    val exactKept = Corpus.decontaminate(big, bench2, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    val bloomKept = Corpus.bloomDecontaminate(big, bench2, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomKept.subsetOf(exactKept))
    // the scale claim, pinned: the train-side plan has NO exchange at
    // all — the filter broadcast is the only cluster traffic
    val plan = Corpus.bloomDecontaminate(big, bench2, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("transitiveClusters converges on a long path via pointer doubling") {
    // 64-node path 0-1-2-...-63: diameter 63, but pointer doubling needs
    // only O(log n) rounds — maxIter=10 must suffice (2^10 > 63)
    val edges = (0 until 63).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val comp = Dedup.transitiveClusters(edges, "a", "b", maxIter = 10)
      .as[(Long, Long)].collect()
    assert(comp.length === 64 && comp.forall(_._2 == 0L))
  }

  test("transitiveClusters throws instead of returning unconverged labels") {
    val edges = (0 until 63).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.transitiveClusters(edges, "a", "b", maxIter = 2).collect()
    }
  }

  test("weightedSample: w=1 keeps all, w=0 keeps none, partial is layout-stable") {
    val d = docs(200).withColumn("w", (col("doc_id") % 10).cast("double") / 10.0)
    assert(Corpus.weightedSample(d.withColumn("w", lit(1.0)), "w", "doc_id").count() === 200L)
    assert(Corpus.weightedSample(d.withColumn("w", lit(0.0)), "w", "doc_id").count() === 0L)
    val a = Corpus.weightedSample(d, "w", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    val b = Corpus.weightedSample(d.repartition(17), "w", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.length < 200 && a.sameElements(b))
  }

  test("shuffleDeterministic: global hash order, balanced shards") {
    val d = docs(1000)
    val shuffled = Corpus.shuffleDeterministic(d, "doc_id", 8)
    val got = shuffled.select("doc_id").as[Long].collect()
    val want = d.orderBy(Corpus.orderHash(col("doc_id")), col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(got.sameElements(want)) // collect() walks partitions in range order
    assert(!got.take(100).sameElements(want.sorted.take(100))) // decorrelated from id
    val sizes = shuffled.groupBy(spark_partition_id()).count()
      .as[(Int, Long)].collect().map(_._2)
    assert(sizes.length === 8 && sizes.max < sizes.min * 3) // fixed-range balance
  }

  test("shuffleDeterministic: shard membership is reproducible across reruns AND input layouts") {
    // the lineage contract: shard N is always the same docs in the
    // same order — a sampling range partitioner (seeded by rdd id /
    // input layout) would break this; the fixed hash-range partitioner
    // must not
    val d = docs(1000)
    def shardMap(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Long]] =
      Corpus.shuffleDeterministic(df, "doc_id", 8)
        .select(spark_partition_id().as("p"), col("doc_id"))
        .as[(Int, Long)].collect().groupBy(_._1)
        .map { case (p, rs) => p -> rs.map(_._2).toSeq }
    val a = shardMap(d)
    val b = shardMap(d.repartition(13).sortWithinPartitions("doc_id"))
    val c = shardMap(d.orderBy(desc("doc_id")))
    assert(a === b && a === c)
  }

  test("zvalue interleaves bits: known points and monotone locality") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L), (1023L, 0L))
      .toDF("x", "y")
    val z = pts.select(ZOrder.zvalue(col("x"), col("y"), 10).as("z"))
      .as[Long].collect()
    // x bit j → position 2j; y bit j → position 2j+1
    assert(z(0) === 0L)
    assert(z(1) === 1L)
    assert(z(2) === 2L)
    assert(z(3) === 15L)
    assert(z(4) === 6L)
    assert(z(5) === 0x55555L) // 1023 = ten set x-bits at even positions
  }

  test("zvalue masks to `bits` and rejects keys over 63 bits") {
    val v = Seq((1025L, 0L)).toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"), 10).as("z")).as[Long].head()
    assert(v === 1L) // 1025 mod 1024 = 1 → only bit 0 survives
    intercept[IllegalArgumentException] {
      ZOrder.zvalue(Seq(col("x"), col("y")), 32)
    }
  }

  test("layout yields non-overlapping z ranges across partitions (pruning shape)") {
    val d = (0 until 4096).map(i => ((i * 2654435761L) % 512, (i * 40503L) % 512))
      .toDF("x", "y")
    val laid = ZOrder.layout(d, Seq("x", "y"), bits = 9, numPartitions = 8)
    val ranges = laid
      .withColumn("z", ZOrder.zvalue(col("x"), col("y"), 9))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("chunkDocs: stride coverage, overlap carry, short docs, empty docs") {
    val toks = (1 to 100).map(i => s"t$i")
    val d = Seq(
      (1L, toks.mkString(" ")),   // 100 tokens → 4 chunks at (40, 8)
      (2L, "a b c"),              // shorter than one window → 1 chunk
      (3L, "")                    // split("") → [""] → 1 token, 1 chunk
    ).toDF("doc_id", "text")
    val out = Corpus.chunkDocs(d, "doc_id", "text", maxTokens = 40, overlap = 8)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._2) === Seq(0L, 1L, 2L)) // ceil((100-8)/32) = 3 chunks, starts 0/32/64
    // chunk k starts at token k*32: consecutive chunks share exactly 8 tokens
    val c0 = doc1(0)._3.split(" "); val c1 = doc1(1)._3.split(" ")
    assert(c0.length === 40 && c0.takeRight(8).sameElements(c1.take(8)))
    // full coverage: stitching chunks (dropping each overlap) rebuilds the doc
    val rebuilt = doc1.zipWithIndex.flatMap { case ((_, _, c, _), i) =>
      val ts = c.split(" "); if (i == 0) ts else ts.drop(8)
    }
    assert(rebuilt.sameElements(toks))
    assert(out.filter(_._1 == 2L).map(_._3) === Seq("a b c"))
    // the documented contract: empty documents yield NO chunks (the
    // split("") = [""] quirk used to leak a phantom 1-token chunk into
    // packSequences budgets)
    assert(out.count(_._1 == 3L) === 0)
  }

  test("lineDedup: first occurrence wins, blanks always kept, reassembly ordered") {
    val d = Seq(
      (1L, "alpha\nboiler\n\nbeta"),
      (2L, "boiler\ngamma\nalpha"),   // both dup lines cut
      (3L, "\n\n"),                   // blanks only — all kept
      (4L, "boiler")                  // fully deduped → empty text
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.lineDedup(d, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 0L, "alpha\nboiler\n\nbeta"),
      (2L, 3L, 2L, "gamma"),
      (3L, 3L, 0L, "\n\n"),
      (4L, 1L, 1L, "")))
    // partition-layout independent (winner is a struct min, not arrival order)
    val re = graft.ext.Dedup.lineDedup(d.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(re == out)
  }

  test("sentenceDedup: first sentence occurrence wins across docs, space reassembly") {
    val d = Seq(
      (1L, "Alpha one. Boiler plate here! Beta two."),
      (2L, "Boiler plate here! Gamma three. Alpha one."), // both dups cut
      (3L, "Boiler plate here!")                          // fully deduped
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.sentenceDedup(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 0L, "Alpha one. Boiler plate here! Beta two."),
      (2L, 3L, 2L, "Gamma three."),
      (3L, 1L, 1L, "")))
    val re = graft.ext.Dedup.sentenceDedup(d.repartition(5), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(re == out)
  }

  test("lineDedupScoped: boilerplate cut within a host, kept across hosts") {
    val d = Seq(
      (1L, "hA", "nav menu\nalpha"),
      (2L, "hA", "nav menu\nbeta"),   // same host → nav cut
      (3L, "hB", "nav menu\ngamma")   // other host → its own first copy kept
    ).toDF("doc_id", "host", "text")
    val scoped = graft.ext.Dedup.lineDedupScoped(d, "doc_id", "text", Seq("host"))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(scoped == Seq(
      (1L, 2L, 0L, "nav menu\nalpha"),
      (2L, 2L, 1L, "beta"),
      (3L, 2L, 0L, "nav menu\ngamma")))
    // empty scope ≡ corpus-wide lineDedup
    val global = graft.ext.Dedup.lineDedupScoped(d, "doc_id", "text", Nil)
      .orderBy("doc_id").collect().toSeq
    val plain = graft.ext.Dedup.lineDedup(d, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(global == plain)
  }

  test("lineDedup: CRLF line endings dedupe against LF lines") {
    val d = Seq((1L, "alpha\nbeta"), (2L, "alpha\r\ngamma"))
      .toDF("doc_id", "text")
    val out = graft.ext.Dedup.lineDedup(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 0L, "alpha\nbeta"),
      (2L, 2L, 1L, "gamma")))
  }

  test("chunkDedup: corpus-wide first occurrence wins, docs reassemble in order") {
    val d = Seq(
      (1L, "a b c d x y"),     // chunks: "a b", "c d", "x y"
      (2L, "c d a b p q"),     // "c d", "a b" seen in doc 1 → only "p q" survives
      (3L, "a b c d"),         // fully boilerplate → text_kept NULL
      (4L, "p q r s")          // "p q" lost to doc 2, "r s" fresh
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(d, "doc_id", "text", 2)
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getAs[String]("text_kept")), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped"))).toMap
    assert(out(1L) === ((Some("a b c d x y"), 3L, 0L)))
    assert(out(2L) === ((Some("p q"), 1L, 2L)))
    assert(out(3L) === ((None, 0L, 2L)))
    assert(out(4L) === ((Some("r s"), 1L, 1L)))
  }

  test("unpackShards: pack -> materialize -> unpack is the identity") {
    val docs = Seq(
      (1L, "a", Seq("x", "y", "z")),
      (2L, "a", Seq("p", "q")),
      (3L, "a", Seq("r")),
      (4L, "b", Seq("long", "doc", "with", "more", "tokens")),
      (5L, "b", Seq(""))) // empty-token doc survives the trip
      .toDF("doc_id", "lang", "toks")
      .withColumn("n_tok", size(col("toks")))
    val packed = graft.ext.Corpus.materializePacked(
      graft.ext.Corpus.packSequences(docs, "doc_id", "n_tok", 4, Seq("lang")),
      "doc_id", "toks", "bin_id", Seq("lang"))
    val back = graft.ext.Corpus.unpackShards(packed)
      .as[(Long, Seq[String])].collect().toMap
    val want = docs.select("doc_id", "toks").as[(Long, Seq[String])]
      .collect().toMap
    assert(back === want)
  }
}
