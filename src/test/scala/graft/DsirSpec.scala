package graft

import org.apache.spark.sql.functions._
import graft.ext.{Corpus, Dsir, TextHash}

/** DSIR importance resampling (Xie et al. 2023) — feature hashing,
  * fixed-point weight tables, map-only scoring, and the deterministic
  * Gumbel top-k. Cross-engine arithmetic is separately proven by the
  * q_dsir_score / q_dsir_resample oracle rows. */
class DsirSpec extends SparkTestBase {

  import spark.implicits._

  test("buckets: unigrams + bigrams mod m, multiplicity preserved") {
    // "a b a": unigram hashes h(a),h(b),h(a); bigrams (h(a)*31+h(b))%P,
    // (h(b)*31+h(a))%P → 5 buckets, 'a' twice
    val ha = 97L; val hb = 98L
    val exp = Seq(ha, hb, ha, (ha * 31 + hb) % TextHash.P, (hb * 31 + ha) % TextHash.P)
      .map(_ % 7)
    val got = Seq("a b a").toDF("t")
      .select(Dsir.buckets(TextHash.wordHashes(col("t")), 7))
      .head().getSeq[Long](0)
    assert(got === exp)
  }

  test("bucketLp6: add-one smoothed fixed-point log-probs over the full bucket spine") {
    val docs = Seq("a b", "a").toDF("text")
    // features: "a b" → [h(a)%m, h(b)%m, bigram%m]; "a" → [h(a)%m]; N=4
    val m = 7
    val tbl = Dsir.bucketLp6(docs, "text", m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tbl.size === m) // every bucket present, absent ones at the floor
    val ha = 97L % m; val hb = 98L % m; val big = ((97L * 31 + 98) % TextHash.P) % m
    val n = 4.0 + m
    def lp6(c: Long) = math.floor(math.log((c + 1).toDouble / n) * 1e6 + 0.5).toLong
    val counts = Seq(ha, ha, hb, big).groupBy(identity).view.mapValues(_.size.toLong).toMap
    (0L until m).foreach { b =>
      assert(tbl(b) === lp6(counts.getOrElse(b, 0L)), s"bucket $b")
    }
  }

  test("scoreDocs is map-only (no shuffle) and target-like docs outscore raw-like docs") {
    val target = Seq("quantum physics lecture", "physics of quantum fields").toDF("text")
    val raw = (Seq("buy cheap pills now", "cheap pills online buy",
      "click to buy pills") ++ Seq("quantum physics lecture")).toDF("text")
    val w = Dsir.trainWeights(target, raw, "text", 64)
    assert(w.length === 64)
    val scored = Dsir.scoreDocs(
      Seq((1L, "quantum physics lecture"), (2L, "buy cheap pills now"))
        .toDF("doc_id", "text"), "text", w)
    val s = scored.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) > s(2L), s"target-like must outscore spam: $s")
    // literal-state scoring: the plan over a parquet scan has no Exchange
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    Seq((1L, "quantum physics lecture")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val plan = Dsir.scoreDocs(spark.read.parquet(dir), "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoreDocs must be map-only:\n$plan")
  }

  test("resample: deterministic Gumbel top-k, weight-dominated, stable across calls") {
    // target must carry enough mass that its buckets beat the add-one
    // floor (a 2-doc target over m=256 buckets is FLATTER than the
    // smoothing floor — the classic tiny-target artifact), and noise
    // must share a vocabulary so its raw-side mass concentrates
    val target = ((0 until 50).map(_ => "alpha beta gamma")
      ++ (0 until 50).map(_ => "beta gamma delta")).toDF("text")
    val docs = (0 until 200).map { i =>
      if (i % 10 == 0) (i.toLong, "alpha beta gamma delta")
      else (i.toLong, s"spam${i % 8} junk${(i + 1) % 8} filler${(i + 2) % 8} pad${(i + 3) % 8}")
    }.toDF("doc_id", "text")
    val w = Dsir.trainWeights(target, docs, "text", 256)
    val pick = Dsir.resample(docs, "doc_id", "text", w, 20)
    val ids = pick.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size === 20)
    // the 20 target-like docs have weights so far above the noise docs
    // that Gumbel noise (bounded ~±22 on the 1e6 scale vs a >1e6 weight
    // gap) cannot flip the ranking: exactly the multiples of 10 win
    assert(ids === (0 until 200 by 10).map(_.toLong).toSet, s"got $ids")
    // byte-deterministic across plans and calls
    val again = Dsir.resample(docs.repartition(7), "doc_id", "text", w, 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === ids)
    // resample keeps the score column for downstream inspection
    assert(pick.columns.toSeq === Seq("doc_id", "text", "dsir_lw6"))
  }

  test("scoreDocs codegen kernel ≡ HOF spec on mixed docs") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "x"),
      (4L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val w = Array.tabulate(32)(i => (i * 13 % 7).toLong - 3L)
    val kernel = Dsir.scoreDocs(docs, "text", w)
      .select("doc_id", "dsir_lw6").collect().map(r => r.getLong(0) -> r.getLong(1))
    val hof = Dsir.scoreDocsHof(docs, "text", w)
      .select("doc_id", "dsir_lw6").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(kernel.toSeq === hof.toSeq)
  }

  test("resampleAt ≡ resample set-for-set; plan has no driver-merged sorted limit") {
    val target = ((0 until 50).map(_ => "alpha beta gamma")
      ++ (0 until 50).map(_ => "beta gamma delta")).toDF("text")
    val docs = (0 until 200).map { i =>
      if (i % 10 == 0) (i.toLong, "alpha beta gamma delta")
      else (i.toLong, s"spam${i % 8} junk${(i + 1) % 8} filler${(i + 2) % 8} pad${(i + 3) % 8}")
    }.toDF("doc_id", "text")
    val w = Dsir.trainWeights(target, docs, "text", 256)
    for (n <- Seq(1, 20, 37, 199, 200)) {
      val viaLimit = Dsir.resample(docs, "doc_id", "text", w, n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val viaSel = Dsir.resampleAt(docs, "doc_id", "text", w, n.toLong)
      assert(viaSel.select("doc_id").collect().map(_.getLong(0)).toSet
        === viaLimit, s"n=$n")
      // the scale path must not plan TakeOrderedAndProject — that is
      // the n·partitions driver merge resampleAt exists to avoid
      assert(!viaSel.queryExecution.executedPlan.toString
        .contains("TakeOrdered"), s"n=$n planned a sorted limit")
    }
    // budget past the corpus: everything survives, score column intact
    val all = Dsir.resampleAt(docs, "doc_id", "text", w, 1000L)
    assert(all.count() === 200L &&
      all.columns.toSeq === Seq("doc_id", "text", "dsir_lw6"))
  }

  test("gumbel noise arithmetic: exact binary-fraction u, bounded g6") {
    val g6 = (0L until 50L).map { id =>
      val oh = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L
      val u = (oh + 0.5) / 2147483648.0
      math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
    }
    // engine-side values must equal the driver-side reference exactly
    val df = spark.range(50).select(col("id"))
    val got = df.select(
      floor(-log(-log((Corpus.orderHash(col("id")).cast("double") + 0.5)
        / 2147483648.0)) * 1000000.0 + 0.5).cast("long").as("g"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === g6)
    assert(g6.forall(g => g > -4000000L && g < 23000000L))
  }
}
