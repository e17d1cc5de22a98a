package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Graph, Similarity, TextAnalysis, TextHash}

/** Hand-computed goldens for the training-data-pipeline kernels.
  * (Their cross-engine behavior is separately proven by the DuckDB
  * oracle on q_fingerprint, q_minhash_sig, the q_dedup family, and
  * q_similarity_lsh.) */
class ExtSpec extends SparkTestBase {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("dummy").select(c).head().get(0)

  test("charHash: 31-base roll over code points") {
    // "abc": ((97*31+98)*31+99) = 3105*31+99 = 96354
    assert(one(TextHash.charHash(lit("abc"))) === 96354L)
    assert(one(TextHash.charHash(lit(""))) === 0L)
  }

  test("fingerprint: 64-bit wrap-around roll, kernel ≡ driver reference, " +
      "no mod-P truncation (the r14 false-collision repair)") {
    // short strings: same value as an unreduced roll
    assert(one(TextHash.fingerprint(lit("abc"))) === 96354L)
    assert(one(TextHash.fingerprint(lit(""))) === 0L)
    // long strings overflow Long many times over — the kernel must
    // match a driver-side wrapping loop exactly, and must NOT live in
    // the 2^30 mod-P space (fingerprint("…") ≥ P for this input)
    val rnd = new scala.util.Random(11)
    val texts = (1 to 60).map(_ =>
      Seq.fill(5 + rnd.nextInt(40))("w" + rnd.nextInt(1000000)).mkString(" "))
    val got = spark.createDataFrame(texts.map(Tuple1(_))).toDF("t")
      .select(col("t"), TextHash.fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (t, fp) =>
      var acc = 0L
      t.foreach(ch => acc = acc * 31L + ch)
      assert(fp === acc, s"kernel diverged from the wrapping roll on '$t'")
    }
    assert(got.exists { case (_, fp) => fp < 0L || fp >= TextHash.P },
      "every fingerprint landed inside [0, P) — the 64-bit space is not in use")
  }

  test("codegen char/word hashes ≡ HOF spec forms on random word soups") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("the", "cat", "sat", "a", "", "zz", "longerword", "12", "x!y")
    val texts = (1 to 40).map(_ => Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = spark.createDataFrame(texts.map(Tuple1(_))).toDF("t")
    val rows = df.select(
      TextHash.charHash(col("t")).as("ce"),
      TextHash.charHashHof(col("t")).as("ch"),
      TextHash.wordHashes(col("t")).as("we"),
      TextHash.wordHashesHof(col("t")).as("wh")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getSeq[Long](2) === r.getSeq[Long](3))
    }
    // shingles: codegen ≡ HOF spec, incl. the <n-token empty case
    val sh = df.select(
      TextHash.shingleHashes(TextHash.wordHashes(col("t"))).as("se"),
      TextHash.shingleHashesHof(TextHash.wordHashes(col("t"))).as("sh")).collect()
    sh.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("fused minhash signature ≡ per-component HOF spec") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("the", "cat", "sat", "mat", "dog", "ran", "", "q7")
    val texts = (1 to 40).map(_ =>
      Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = texts.toDF("t").withColumn("_whs", TextHash.wordHashes(col("t")))
    df.select(
      TextHash.minhashSignature(col("_whs"), 8).as("cg"),
      TextHash.minhashSignatureHof(col("_whs"), 8).as("hof")).collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    // empty token array → all-P sentinel signature, matching the HOF coalesce
    val e = Seq(Seq.empty[Long]).toDF("w")
      .select(TextHash.minhashSignature(col("w"), 4)).head().getSeq[Long](0)
    assert(e === Seq.fill(4)(TextHash.P))
  }

  test("fused OPH signature ≡ HOF spec; densification offsets; collision rate tracks jaccard") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("the", "cat", "sat", "mat", "dog", "ran", "", "q7",
      "lm", "zz", "pp0", "jk")
    val texts = (1 to 60).map(_ =>
      Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = texts.toDF("t").withColumn("_whs", TextHash.wordHashes(col("t")))
    df.select(
      TextHash.ophSignature(col("_whs"), 8).as("cg"),
      TextHash.ophSignatureHof(col("_whs"), 8).as("hof")).collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    // structural invariants: direct components < P, borrowed components
    // carry the P·distance offset, empty input → all-P sentinel
    val sig = Seq("a b c").toDF("t")
      .select(TextHash.ophSignature(TextHash.wordHashes(col("t")), 8))
      .head().getSeq[Long](0)
    assert(sig.count(_ < TextHash.P) === 3) // 3 distinct tokens, 3 occupied bins
    assert(sig.count(_ >= TextHash.P) === 5) // 5 empty bins all densified
    val e = Seq(Seq.empty[Long]).toDF("w")
      .select(TextHash.ophSignature(col("w"), 4)).head().getSeq[Long](0)
    assert(e === Seq.fill(4)(TextHash.P))
    val nd = spark.sql("SELECT CAST(null AS array<bigint>) AS whs")
      .select(TextHash.ophSignature(col("whs"), 4).as("k"),
        TextHash.ophSignatureHof(col("whs"), 4).as("h")).head()
    assert(nd.isNullAt(0) && nd.isNullAt(1))
    // collision fidelity at k=64: a one-token-in-30 near-dup pair agrees
    // on most components; two unrelated docs agree on almost none
    val w = (1 to 30).map(i => s"w$i").mkString(" ")
    val pair = Seq(
      (1L, w), (2L, w + " extra"),
      (3L, (1 to 30).map(i => s"z$i").mkString(" "))).toDF("id", "t")
      .withColumn("sig", TextHash.ophSignature(TextHash.wordHashes(col("t")), 64))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(pair(1L), pair(2L)) >= 48, "near-dup pair must agree on >= 75% of components")
    assert(agree(pair(1L), pair(3L)) <= 8, "unrelated docs must agree on <= 12% of components")
  }

  test("ophBands: planted near-dup pair shares a band bucket; banding semantics match minhashBands") {
    val w = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, w), (2L, w + " tail"),
      (3L, (1 to 40).map(i => s"oth$i").mkString(" "))).toDF("doc_id", "text")
    val groups = Dedup.ophBands(docs, "doc_id", "text", k = 16, bands = 8)
      .groupBy("band_key").agg(collect_set("doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(groups === Set(1L, 2L), s"pair (1,2) must collide, 3 must not; got $groups")
  }

  test("fused simhash ≡ per-bit aggregate-HOF spec") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("the", "cat", "sat", "mat", "dog", "ran", "far", "x1", "z9")
    val texts = (1 to 40).map(_ =>
      Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")) :+ ""
    val df = texts.toDF("t").withColumn("_whs", TextHash.wordHashes(col("t")))
    df.select(
      TextHash.simhash(col("_whs")).as("cg"),
      TextHash.simhashHof(col("_whs")).as("hof"),
      TextHash.simhash(col("_whs"), 8).as("cg8"),
      TextHash.simhashHof(col("_whs"), 8).as("hof8")).collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("fused langScores ≡ per-profile stopwordCountOf on mixed-language soups") {
    val rnd = new scala.util.Random(31)
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted
    val vocab = TextAnalysis.stopwords.values.flatten.toVector ++ Vector("xx", "yy", "")
    val texts = (1 to 50).map(_ =>
      Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = texts.toDF("t").withColumn("_toks", TextAnalysis.tokens(col("t")))
      .withColumn("_ls", TextAnalysis.langScoresOf(col("_toks")))
    val cols = langs.zipWithIndex.flatMap { case (l, i) =>
      Seq(element_at(col("_ls"), i + 1).as(s"f_$l"),
        TextAnalysis.stopwordCountOf(col("_toks"), TextAnalysis.stopwords(l)).as(s"h_$l"))
    }
    df.select(cols: _*).collect().foreach { r =>
      langs.indices.foreach(i =>
        assert(r.getLong(2 * i) === r.getLong(2 * i + 1), s"profile ${langs(i)} differs"))
    }
  }

  test("topTokenCount: mode multiplicity, empty array, duplicates-only") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "c", "a")), // a ×3
      (2L, Seq("x")), // singleton
      (3L, Seq.empty[String]), // empty → 0
      (4L, Seq("z", "z", "z", "z"))) // all same
      .toDF("id", "toks")
    val got = df.select(col("id"), TextAnalysis.topTokenCountOf(col("toks")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 4))
  }

  test("fused jaccard ≡ HOF spec (incl. duplicates, empty sides, NaN)") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 60).map { _ =>
      def arr = Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toLong)
      (arr, arr)
    } ++ Seq((Seq.empty[Long], Seq.empty[Long]), (Seq(1L, 1L, 1L), Seq.empty[Long]),
      (Seq.empty[Long], Seq(2L)), (Seq(5L, 5L), Seq(5L)))
    val df = pairs.toDF("a", "b")
    df.select(
      TextHash.jaccard(col("a"), col("b")).as("cg"),
      TextHash.jaccardHof(col("a"), col("b")).as("hof")).collect().foreach { r =>
      val (cg, hof) = (r.getDouble(0), r.getDouble(1))
      assert(cg === hof || (cg.isNaN && hof.isNaN), s"$cg vs $hof")
    }
  }

  test("jaccardGte: pairs sitting EXACTLY at tau are kept (division-form early exit)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.ext.JaccardLoops
    // the multiplication-form bound rejected inter/union == tau:
    // tau=.28 with 7/25 → 7.0 < .28*25 = 7.000000000000001
    val a25 = new GenericArrayData((1L to 25L).toArray)
    val b7 = new GenericArrayData((1L to 7L).toArray) // union = 25, inter = 7
    assert(JaccardLoops.jaccardGte(a25, b7, 0.28))
    assert(JaccardLoops.jaccardGte(b7, a25, 0.28))
    assert(!JaccardLoops.jaccardGte(a25, b7, 0.2800000001))
    // and the fused kernel still agrees with the plain division
    assert(JaccardLoops.jaccardGte(a25, b7, 7.0 / 25.0))
  }

  test("topTokenCount skips null elements; minhashSignatureHof is null-in/null-out like the kernel") {
    val df = spark.sql(
      "SELECT array('a', CAST(null AS string), CAST(null AS string), 'a', 'b') AS t")
    val n = df.select(TextAnalysis.topTokenCountOf(col("t")).as("n")).head().getInt(0)
    assert(n === 2) // 'a' twice; the two nulls are not a mode of their own
    val nd = spark.sql("SELECT CAST(null AS array<bigint>) AS whs")
    val r = nd.select(
      TextHash.minhashSignature(col("whs"), 4).as("k"),
      TextHash.minhashSignatureHof(col("whs"), 4).as("h")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("JaccardPredicateRule rewrites >= tau to the early-exit predicate") {
    // parquet-backed input: a LocalRelation would be folded through the
    // filter by ConvertToLocalRelation before the plan can be inspected
    val dir = java.nio.file.Files.createTempDirectory("jacc").toString
    Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 9L)),
      (Seq(1L, 2L), Seq(7L, 8L)), (Seq.empty[Long], Seq.empty[Long]))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val filtered = df.filter(TextHash.jaccard(col("a"), col("b")) >= 0.5)
    val optimized = filtered.queryExecution.optimizedPlan
    assert(optimized.toString.contains("jaccard_gte"),
      s"rule did not fire:\n$optimized")
    // semantics: pair 1 has J=3/5=0.6 ≥ 0.5; pair 2 J=0; pair 3 NaN ≥ τ
    // is TRUE under Spark's double ordering (NaN greatest) — the fused
    // predicate must preserve exactly that
    val kept = filtered.count()
    val spec = df.filter(TextHash.jaccardHof(col("a"), col("b")) >= 0.5).count()
    assert(kept === spec && kept === 2L)
  }

  test("jaccardGte early exit agrees with the full computation on random pairs") {
    val rnd = new scala.util.Random(23)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    (1 to 500).foreach { _ =>
      val a = new GenericArrayData(Array.fill(rnd.nextInt(20))(rnd.nextInt(12).toLong))
      val b = new GenericArrayData(Array.fill(rnd.nextInt(20))(rnd.nextInt(12).toLong))
      val tau = rnd.nextDouble()
      val full = graft.ext.JaccardLoops.jaccard(a, b)
      val expected = full.isNaN || full >= tau
      assert(graft.ext.JaccardLoops.jaccardGte(a, b, tau) === expected)
    }
  }

  test("wordHashes + minhash: min of rehashed token hashes") {
    val whs = TextHash.wordHashes(lit("abc abc"))
    assert(one(whs) === Seq(96354L, 96354L))
    // i=0 rehash: a0 = 2654435761 % P = 654435747, b0 = 40510;
    // (96354*654435747 + 40510) % P = 501565549
    assert(one(TextHash.minhash(whs, 0)) === 501565549L)
    // empty text splits to [""] (hash 0) in Spark AND DuckDB → rehash of 0
    assert(one(TextHash.minhash(TextHash.wordHashes(lit("")), 0)) === 40510L)
  }

  test("simhash of a single word = its low 16 bits") {
    // one token: every bit vote is ±1 by that token's bit → simhash = w mod 2^16
    val w = 96354L
    assert(one(TextHash.simhash(TextHash.wordHashes(lit("abc")))) === (w % 65536))
  }

  test("shingles: n-2 trigrams; jaccard identity/disjoint") {
    val whs = TextHash.wordHashes(lit("a b c d e"))
    assert(one(size(TextHash.shingleHashes(whs))) === 3)
    val sh1 = TextHash.shingleHashes(TextHash.wordHashes(lit("a b c d")))
    val sh2 = TextHash.shingleHashes(TextHash.wordHashes(lit("x y z w")))
    assert(one(TextHash.jaccard(sh1, sh1)) === 1.0)
    assert(one(TextHash.jaccard(sh1, sh2)) === 0.0)
    assert(one(TextHash.jaccard(sh2, TextHash.shingleHashes(TextHash.wordHashes(lit("a b"))))) === 0.0)
  }

  test("dot / cosine") {
    val a = lit(Array(1.0f, 2.0f, 2.0f))
    val b = lit(Array(2.0f, 0.0f, 0.0f))
    assert(one(Similarity.dot(a, b)) === 2.0)
    assertNear(one(Similarity.cosine(a, a)).asInstanceOf[Double], 1.0)
    assertNear(one(Similarity.cosine(a, b)).asInstanceOf[Double], 2.0 / (3.0 * 2.0))
  }

  test("lsh bucket: in range, deterministic, probe-consistent") {
    val vec = lit(Array.tabulate(64)(i => (i % 7 - 3).toFloat))
    val b1 = one(Similarity.lshBucket(vec, dim = 64, bits = 4))
    val b2 = one(Similarity.lshBucket(vec, dim = 64, bits = 4))
    assert(b1 === b2)
    assert(b1.asInstanceOf[Long] >= 0L && b1.asInstanceOf[Long] < 16L)
  }

  test("codegen vector kernels ≡ HOF spec forms (bit-equal doubles)") {
    import graft.functions.{Dist2Expr => _, _}
    // deterministic pseudo-random 64-dim float vectors, incl. negatives
    val df = (0 until 40).map { r =>
      (r.toLong,
        Array.tabulate(64)(i => ((r * 131 + i * 17) % 19 - 9) / 3.0f),
        Array.tabulate(64)(i => ((r * 37 + i * 113) % 23 - 11) / 7.0f))
    }.toDF("id", "va", "vb")
    val cmp = df.select(
      Similarity.dot(col("va"), col("vb")).as("d_cg"),
      Similarity.dotHof(col("va"), col("vb")).as("d_hof"),
      org.apache.spark.sql.graft.bridge.column(graft.functions.Dist2Expr(
        org.apache.spark.sql.graft.bridge.expression(col("va")),
        org.apache.spark.sql.graft.bridge.expression(col("vb")))).as("l2_cg"),
      aggregate(
        zip_with(col("va"), col("vb"),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("l2_hof"),
      Similarity.lshBucket(col("va"), dim = 64, bits = 4).as("b_cg"),
      Similarity.lshBucketHof(col("va"), dim = 64, bits = 4).as("b_hof")).collect()
    cmp.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact, not approximate
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getLong(4) === r.getLong(5))
    }
  }

  test("brute-force vs LSH top-k: LSH results are a subset with same scores") {
    val corpus = (1 to 50).map(i => (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val probe = Seq(Tuple1(Array.tabulate(8)(j => (j % 3 - 1).toFloat))).toDF("p_emb")
    val bf = Similarity.bruteForceTopK(corpus, "embedding", probe, "p_emb", k = 50)
      .select("vec_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(corpus, "embedding", probe, "p_emb", dim = 8, k = 5)
      .select("vec_id", "score").collect()
    assert(lsh.nonEmpty && lsh.length <= 5)
    lsh.foreach { r => assertNear(r.getDouble(1), bf(r.getLong(0))) }
  }

  test("multi-probe LSH: superset of single-probe, recall vs brute force improves") {
    val corpus = (1 to 400).map(i => (i.toLong, Array.tabulate(16)(j => ((i * 13 + j * 7) % 17 - 8).toFloat)))
      .toDF("vec_id", "embedding")
    val probe = Seq(Tuple1(Array.tabulate(16)(j => ((j * 5) % 9 - 4).toFloat))).toDF("p_emb")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val k = 20
    val bf = ids(Similarity.bruteForceTopK(corpus, "embedding", probe, "p_emb", k))
    val single = ids(Similarity.lshTopK(corpus, "embedding", probe, "p_emb", dim = 16, k = k))
    val multi = ids(Similarity.lshTopKMultiProbe(corpus, "embedding", probe, "p_emb", dim = 16, k = k))
    // multi-probe candidates include the single-probe bucket, so at equal
    // k the recalled set can only improve (ties aside: scores identical)
    val rSingle = (bf & single).size
    val rMulti = (bf & multi).size
    assert(rMulti >= rSingle, s"multi=$rMulti single=$rSingle")
    assert(multi.nonEmpty && multi.size <= k)
  }

  test("language id: marker argmax with und fallback") {
    val df = Seq(
      ("the cat and the dog of it", "en"),
      ("der hund und die katze ist", "de"),
      ("le chat et la maison est", "fr"),
      ("xyzzy plugh qwerty", "und")
    ).toDF("text", "expected")
    df.select(TextAnalysis.langId(col("text")).as("pred"), col("expected"))
      .collect().foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("token-materialized forms ≡ single-column forms; plan tokenizes ONCE") {
    val df = Seq(
      "the cat and the dog of it",
      "der hund und die katze ist",
      "xyzzy plugh qwerty",
      "a! b? c.").toDF("text")
    val fused = df
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .select(
        TextAnalysis.langIdOf(col("_toks")).as("lang2"),
        TextAnalysis.qualityScoreOf(col("text"), col("_toks")).as("q2"),
        col("text"))
    val naive = df.select(
      TextAnalysis.langId(col("text")).as("lang1"),
      TextAnalysis.qualityScore(col("text")).as("q1"),
      col("text"))
    val j = fused.join(naive, "text").collect()
    assert(j.length === 4)
    j.foreach { r =>
      assert(r.getAs[String]("lang2") === r.getAs[String]("lang1"))
      assert(r.getAs[Double]("q2") === r.getAs[Double]("q1"))
    }
    // The materialized token column must survive CollapseProject: the
    // optimized plan evaluates split exactly once even though 5+ metric
    // expressions consume it (the inlining trap re-tokenizes per metric).
    // Needs a non-local relation — ConvertToLocalRelation folds Seq.toDF
    // plans entirely, so assert over the parquet-backed documents table.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fusedPq = docs
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .select(
        TextAnalysis.langIdOf(col("_toks")).as("lang2"),
        TextAnalysis.qualityScoreOf(col("text"), col("_toks")).as("q2"))
    val planStr = fusedPq.queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(planStr).length
    assert(splits === 1, s"expected 1 tokenization in plan, got $splits:\n$planStr")
  }

  test("quality metrics: wordCount/avgWordLen/tokenCount") {
    assert(one(TextAnalysis.wordCount(lit("a bb ccc"))) === 3L)
    assertNear(one(TextAnalysis.avgWordLen(lit("a bb ccc"))).asInstanceOf[Double], 2.0)
    // "ab12 cd" → [ab][12][cd] = 3 tokens, space dropped
    assert(one(TextAnalysis.tokenCount(lit("ab12 cd"))) === 3L)
    val q = one(TextAnalysis.qualityScore(lit("the cat and the dog sat on a mat of the house"))).asInstanceOf[Double]
    assert(q > 0.0 && q <= 1.0)
  }

  test("DocPipeline: gate, langid, exact dedup, verified near-dup removal compose") {
    import graft.ext.DocPipeline
    val long = (w: String) => Array.tabulate(40)(i => s"$w$i").mkString(" ") // 40 distinct words
    val base = "the and of " + long("aaa")
    val docs = Seq(
      (1L, base),                               // en, survives
      (2L, base),                               // exact dup of 1 → dropped
      (3L, "short doc"),                        // gated (2 words)
      (4L, "der und ist " + long("bbb")),       // de, distinct content → survives
      (5L, long("zzz")),                        // no markers → und, survives
      (6L, base.split(" ").dropRight(1).mkString(" ") + " changed") // near-dup of 1 → verified drop
    ).toDF("doc_id", "text")
    val out = DocPipeline.prepare(docs, minWords = 10).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids.contains(2L), "exact dup must drop the higher id")
    assert(!ids.contains(3L), "short doc must be gated")
    assert(!ids.contains(6L), "one-word-changed twin must fail Jaccard verify")
    assert(ids === Set(1L, 4L, 5L), s"got $ids")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(byId(1L) === "en" && byId(4L) === "de" && byId(5L) === "und")
  }

  test("DocPipeline repetition gates drop spammy docs, leave clean ones") {
    import graft.ext.DocPipeline
    val distinct40 = Array.tabulate(40)(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, distinct40), // clean: top frac 1/40, dup-bigram 0
      (2L, Array.fill(40)("spam").mkString(" ")), // top frac 1.0, dup-bigram ~1
      (3L, ("buy now " * 20).trim)) // alternating: top frac 0.5, dup-bigram high
      .toDF("doc_id", "text")
    val default = DocPipeline.prepare(docs, minWords = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(default === Set(1L, 2L, 3L)) // gates off by default
    val gated = DocPipeline.prepare(docs, minWords = 10,
      maxTopTokenFrac = 0.3, maxDupBigramFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated === Set(1L), s"got $gated")
    // a single-word doc has ZERO bigrams and trivially satisfies the
    // gate — the NaN (0.0/0) comparison must not silently delete it
    val tiny = Seq((9L, "solo"), (10L, distinct40)).toDF("doc_id", "text")
    val tinyGated = DocPipeline.prepare(tiny, minWords = 1,
      maxDupBigramFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tinyGated === Set(9L, 10L), s"got $tinyGated")
  }

  test("exact dedup keeps deterministic representative") {
    val df = Seq((3L, "a", "x"), (1L, "a", "x"), (2L, "b", "y"))
      .toDF("doc_id", "lang", "source")
    val out = Dedup.exact(df, Seq("lang", "source"), "doc_id")
      .orderBy("lang").collect()
    assert(out.map(_.getLong(2)) === Array(1L, 2L))
  }

  test("minhash bands: one row per (doc, band); dup texts collide on all bands") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val bands = Dedup.minhashBands(df, "doc_id", "text", k = 8, bands = 4)
    assert(bands.count() === 12)
    val groups = Dedup.minhashDupGroups(df, "doc_id", "text", k = 8, bands = 4).collect()
    assert(groups.length === 4) // docs 1,2 identical → all 4 bands collide
    groups.foreach(r => assert(r.getAs[Long]("n_docs") === 2 && r.getAs[Long]("min_doc_id") === 1L))
  }

  test("simhashNearDups ≡ brute-force Hamming pairs; exact dups at distance 0") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val texts = (1L to 40L).map(i =>
      i -> Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = (texts :+ (99L -> texts.head._2)).toDF("doc_id", "text") // planted exact dup
    val rows = Dedup.simhashNearDups(docs, "doc_id", "text", bits = 16, maxHamming = 2)
      .select("doc_id", "dup_of", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    // canonical-key dedup must emit each pair EXACTLY once (a Map
    // compare alone would mask duplicate rows)
    assert(rows.length === rows.distinct.length,
      s"duplicate pair rows: ${rows.groupBy(identity).filter(_._2.length > 1).keys}")
    val got = rows.toMap
    // brute-force truth over all pairs
    val sims = Dedup.withSimhash(docs, "text").select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val truth = (for {
      (ia, sa) <- sims; (ib, sb) <- sims if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 2
    } yield (ib, ia) -> d.toLong).toMap
    assert(got === truth)
    assert(got((99L, 1L)) === 0L) // identical text → distance 0
  }

  test("ngram jaccard on near-identical texts is high, disjoint is zero") {
    val j = one(Dedup.ngramJaccard(lit("a b c d e f g"), lit("a b c d e f h")))
      .asInstanceOf[Double]
    assert(j > 0.4 && j < 1.0)
    assert(one(Dedup.ngramJaccard(lit("a b c d"), lit("w x y z"))) === 0.0)
  }

  test("nbModel/nbScore: smoothed argmax matches hand computation, OOV doc emits nothing") {
    import spark.implicits._
    val train = Seq(("a", "x x y"), ("a", "x z"), ("b", "y y z"))
      .toDF("label", "text")
    val model = TextAnalysis.nbModel(train, "label", "text")
    // dense grid: 2 labels × 3 terms
    assert(model.count() === 6)
    val docs = Seq((1L, "x x"), (2L, "y y"), (3L, "w w")).toDF("doc_id", "text")
    val r = TextAnalysis.nbScore(docs, "doc_id", "text", model)
      .orderBy("doc_id").select("doc_id", "best_label", "score_e6", "n_tok")
      .as[(Long, String, Long, Long)].collect()
    // hand: score_a("x x") = ⌊ln(2/3)e6⌉ + 2⌊ln(4/8)e6⌉ = -405465 - 1386294
    assert(r.toSeq === Seq(
      (1L, "a", -405465L - 2 * 693147L, 2L),
      (2L, "b", -1098612L - 2 * 693147L, 2L)))
  }

  test("canonicalUrl/host: lowercase authority, ports, tracking params, fragments") {
    import spark.implicits._
    val cases = Seq(
      // frag + default port + interleaved tracking
      ("HTTP://WWW.Ex.COM:80/Path/X?utm_source=a&id=7&utm_b=c#frag",
        "http://www.ex.com/Path/X?id=7"),
      // https default port, lone tracking param, bare trailing slash
      ("HTTPS://A.B.com:443/?gclid=z", "https://a.b.com"),
      // non-default port kept; path case preserved
      ("http://h.com:8080/CaseD?x=1", "http://h.com:8080/CaseD?x=1"),
      // tracking at end after real param
      ("http://h.com/p?x=1&fbclid=22", "http://h.com/p?x=1"),
      // scheme-less input passes through un-lowered
      ("Relative/Path?utm_x=1", "Relative/Path"))
    val got = cases.map(_._1).toDF("u")
      .select(graft.ext.Web.canonicalUrl(col("u"))).as[String].collect()
    assert(got.toSeq === cases.map(_._2))
    val hosts = Seq("HTTP://User:p@Ex.COM:80/x", "no-authority", "https://H.io/y")
      .toDF("u").select(graft.ext.Web.host(col("u"))).as[String].collect()
    assert(hosts.toSeq === Seq("ex.com", "", "h.io"))
  }

  test("hostBudget: caps per host, keeps the LCG-ranked winners, stable under growth") {
    import spark.implicits._
    def url(h: Int, id: Long) = s"https://h$h.ex.com/p/$id"
    val docs = (0L until 30L).map(i => (i, url((i % 2).toInt, i))).toDF("doc_id", "url")
    val kept = graft.ext.Web.hostBudget(docs, "url", "doc_id", 5)
    assert(kept.groupBy("host").count().as[(String, Long)].collect().toMap ===
      Map("h0.ex.com" -> 5L, "h1.ex.com" -> 5L))
    // winners = 5 lowest LCG hashes per host (id tie-break)
    def lcg(id: Long) = ((id * 1103515245L + 12345L) % 2147483648L + 2147483648L) % 2147483648L
    val expect = (0L until 30L).groupBy(i => (i % 2))
      .flatMap { case (_, ids) => ids.sortBy(i => (lcg(i), i)).take(5) }.toSet
    assert(kept.select("doc_id").as[Long].collect().toSet === expect)
    // budget under a host below the cap: all rows survive
    val small = Seq((100L, url(9, 100L)), (101L, url(9, 101L))).toDF("doc_id", "url")
    assert(graft.ext.Web.hostBudget(small, "url", "doc_id", 5).count() === 2L)
  }

  test("hostSuffixes + blockByDomain: subdomains blocked, lookalikes kept") {
    import spark.implicits._
    val sufs = Seq("https://a.b.example.com/x").toDF("u")
      .select(graft.ext.Web.hostSuffixes(col("u"))).as[Seq[String]].head()
    assert(sufs === Seq("a.b.example.com", "b.example.com", "example.com", "com"))
    val docs = Seq(
      (1L, "https://example.com/x"),        // exact → blocked
      (2L, "https://a.b.example.com/x"),    // subdomain → blocked
      (3L, "https://notexample.com/x"),     // lookalike → kept
      (4L, "https://EXAMPLE.com/x"),        // case-folded → blocked
      (5L, "https://ok.org/x"),             // clean → kept
      (6L, "no-authority-here")             // hostless → kept
    ).toDF("doc_id", "url")
    val kept = graft.ext.Web.blockByDomain(docs, "url", "doc_id",
      Seq("Example.COM")) // blocklist itself case-folds too
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 5L, 6L))
    intercept[IllegalArgumentException] {
      graft.ext.Web.blockByDomain(docs, "url", "doc_id", Seq.empty)
    }
  }

  test("pageRank: cycle is a fixpoint of the integer recurrence") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val r = Graph.pageRank(e, "s", "t", 4).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 1000000000L), (2L, 1000000000L), (3L, 1000000000L)))
  }

  test("hits: hand-computed chain, max-norm integer rescale") {
    import spark.implicits._
    // 1→3, 2→3, 3→4: after one iteration auth(3)=1e6 (max), auth(4)=5e5,
    // hubs renormalize to 1→1e6, 2→1e6, 3→5e5, 4→0
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val r = Graph.hits(e, "s", "t", 1).orderBy("node")
      .as[(Long, Long, Long)].collect()
    assert(r.toSeq === Seq(
      (1L, 1000000L, 0L), (2L, 1000000L, 0L),
      (3L, 500000L, 1000000L), (4L, 0L, 500000L)))
  }

  test("pageRank: hand-computed star with dangling hub, one iteration") {
    import spark.implicits._
    // 1→2, 3→2; node 2 is dangling → its mass redistributes as
    // share = 1e9 // 3; every floor matches the scaladoc recurrence
    val e = Seq((1L, 2L), (3L, 2L)).toDF("s", "t")
    val r = Graph.pageRank(e, "s", "t", 1).orderBy("node")
      .as[(Long, Long)].collect().toMap
    assert(r(1L) === 433333333L)
    assert(r(2L) === 2133333333L)
    assert(r(3L) === 433333333L)
    // mass conserved up to the documented < N floor decay
    assert(r.values.sum > 3000000000L - 3 && r.values.sum <= 3000000000L)
  }

  test("personalizedPageRank: mass stays on the seed's reachable side") {
    import spark.implicits._
    // two disjoint 2-cycles {1,2} and {3,4}; seed = 1 → component
    // {3,4} holds rank 0 exactly, every iteration
    val e = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("s", "t")
    val r = Graph.personalizedPageRank(e, "s", "t", Seq(1L), 3).orderBy("node")
      .as[(Long, Long)].collect().toMap
    assert(r(3L) === 0L && r(4L) === 0L)
    assert(r(1L) > 0L && r(2L) > 0L)
    // hand-unroll one iteration: r0 = (1e9, 0); no dangling;
    // r1(1) = 1.5e8 + (0*85 div 100) = 1.5e8; r1(2) = 0 + (1e9*85 div 100)
    val r1 = Graph.personalizedPageRank(e, "s", "t", Seq(1L), 1).orderBy("node")
      .as[(Long, Long)].collect().toMap
    assert(r1(1L) === 150000000L)
    assert(r1(2L) === 850000000L)
  }

  test("personalizedPageRank: dangling mass restarts at seeds only") {
    import spark.implicits._
    // 1→2, 2 dangling; seed = 1. r0 = (1e9, 0). iter1: dangling dm = 0
    // (node 2 holds 0); r1(1) = 1.5e8, r1(2) = 8.5e8. iter2: dm = 8.5e8
    // → share to seed 1 only: r2(1) = 1.5e8 + (0 + 8.5e8)*85 div 100,
    // r2(2) = (1.5e8 div 1)*85 div 100
    val e = Seq((1L, 2L)).toDF("s", "t")
    val r = Graph.personalizedPageRank(e, "s", "t", Seq(1L), 2).orderBy("node")
      .as[(Long, Long)].collect().toMap
    assert(r(1L) === 150000000L + 850000000L * 85L / 100L)
    assert(r(2L) === 150000000L * 85L / 100L)
  }

  test("personalizedPageRank: 10k-seed set runs and conserves rank on a cycle") {
    import spark.implicits._
    // a 200-node directed cycle with a 10,000-id seed set (most seeds
    // are NOT graph nodes — only the 100 even ids under 200 match).
    // Guards the isin/InSet seed handling: a seed set this size must
    // neither blow up plan compilation nor change the semantics — on a
    // cycle (no dangling) total rank is conserved every iteration.
    val n = 200
    val e = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("s", "t")
    val seeds = (0 until 10000).map(i => i * 2L) // evens: 100 in-graph
    val r = Graph.personalizedPageRank(e, "s", "t", seeds, 2)
    assert(r.count() === n.toLong)
    val total = r.agg(sum("rk")).head.getLong(0)
    // initial mass = 1e9 per in-graph seed; div-rounding only loses
    // sub-ppm dust per iteration
    assert(total > 99_000_000_000L && total <= 100_000_000_000L, s"total=$total")
    // seeds outside the node set contribute nothing
    assert(r.filter(col("node") >= n).count() === 0)
  }

  test("personalizedPageRank: seeds absent from the edge list change nothing; all-absent fails loudly") {
    import spark.implicits._
    // divisors and sums use S∩V — an out-of-graph seed must not siphon
    // a share of the dangling mass (the old |S| divisor leaked it)
    val e = Seq((1L, 2L)).toDF("s", "t")
    def runSeeds(ss: Seq[Long]) =
      Graph.personalizedPageRank(e, "s", "t", ss, 2).orderBy("node")
        .as[(Long, Long)].collect().toSeq
    assert(runSeeds(Seq(1L, 99L)) === runSeeds(Seq(1L)))
    val err = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(e, "s", "t", Seq(98L, 99L), 1)
    }
    assert(err.getMessage.contains("no seed appears"))
  }

  test("labelPropagation: a node whose only edges are self-loops stays in the output, labeled itself") {
    import spark.implicits._
    // self-loop EDGES are excluded from voting; the NODE must not
    // vanish from the returned labels frame
    val e = Seq((5L, 5L), (1L, 2L)).toDF("s", "t")
    val labels = Graph.labelPropagation(e, "s", "t", rounds = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(labels.map(_._1) === Seq(1L, 2L, 5L))
    assert(labels.find(_._1 == 5L).map(_._2) === Some(5L))
  }

  test("kCore: peel cascade removes the tail pendant chain round by round") {
    import spark.implicits._
    // triangle {1,2,3} (2-core) + chain 3-5-6 hanging off: k=2 peels
    // 6 in round 1, 5 in round 2; triangle survives with degrees 2
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 5L), (5L, 6L)).toDF("s", "t")
    val r = Graph.kCore(e, "s", "t", k = 2, rounds = 3).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // one round is NOT enough for the cascade (5 still present)
    val r1 = Graph.kCore(e, "s", "t", k = 2, rounds = 1)
      .select("node").as[Long].collect().toSet
    assert(r1.contains(5L))
  }

  test("triangles: hand graph, each triangle once, duplicates/loops dropped") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant 5 + self-loop + a
    // reversed duplicate edge; orientation must not double-count
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L), (5L, 5L)).toDF("s", "t")
    val r = Graph.triangles(e, "s", "t").orderBy("a", "b", "c")
      .as[(Long, Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: wedge without closure is not a triangle") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L)).toDF("s", "t")
    assert(Graph.triangles(e, "s", "t").count() === 0L)
  }

  test("bfsDepths: hop distances honor min-hop and the maxHops bound") {
    import spark.implicits._
    // 0→1→2→3→4 chain plus shortcut 0→2: node 2 is hop 1 (not 2),
    // node 4 is beyond maxHops=3 from source 0... but source 9 is an
    // isolated second source at hop 0
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 2L)).toDF("s", "t")
    val r = Graph.bfsDepths(e, "s", "t", Seq(0L, 9L), 2)
      .orderBy("node").as[(Long, Int)].collect()
    assert(r.toSeq === Seq((0L, 0), (1L, 1), (2L, 1), (3L, 2), (9L, 0)))
  }

  test("adamicAdar: star witness — hand-computed cn and e6 weights") {
    import spark.implicits._
    // star: center 0 ~ leaves 1,2,3. Only node 0 has deg ≥ 2, so every
    // candidate pair runs through witness 0 with weight
    // floor(1e6 / ln 3) = 910239; none of the leaf pairs are adjacent.
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "t")
    val r = Graph.adamicAdar(e, "s", "t").orderBy("u", "w")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq(
      (1L, 2L, 1L, 910239L), (1L, 3L, 1L, 910239L), (2L, 3L, 1L, 910239L)))
  }

  test("adamicAdar: K4 predicts nothing (every pair already adjacent)") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "t")
    assert(Graph.adamicAdar(e, "s", "t").count() === 0L)
  }

  test("adamicAdar: degree-1 pendant excluded up front (ln(1) regression)") {
    import spark.implicits._
    // single edge: both endpoints deg 1 → no eligible witness, empty
    // result, and no ANSI divide-by-zero from ln(1)=0 (the round-9 fix)
    val e = Seq((1L, 2L)).toDF("s", "t")
    assert(Graph.adamicAdar(e, "s", "t").count() === 0L)
  }

  test("adamicAdar: hub over maxWitnessDeg is dropped as a witness") {
    import spark.implicits._
    // hub 100 ~ {1..70} (deg 70 > cap 64 → not a witness) plus small
    // witness 200 ~ {1, 2}. Surviving pairs:
    //   (1,2)     via witness 200 only (deg 2): aa = floor(1e6/ln 2) = 1442695
    //   (100,200) via witnesses 1 AND 2 (deg 2 each): cn=2, aa = 2·1442695
    // — the hub's 70·69/2 pair fan-out never materializes.
    val hub = (1L to 70L).map(i => (100L, i))
    val e = (hub ++ Seq((200L, 1L), (200L, 2L))).toDF("s", "t")
    val r = Graph.adamicAdar(e, "s", "t").orderBy("u", "w")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq(
      (1L, 2L, 1L, 1442695L), (100L, 200L, 2L, 2885390L)))
  }

  test("labelPropagation: triangle + pendant converges to min label in 3 rounds") {
    import spark.implicits._
    // triangle {1,2,3} with pendant 4~1. Hand-unrolled with the
    // (count desc, label asc) tie-break:
    //   r1: 1→2 (nbr labels {2,3,4} all tied → min), 2→1, 3→1, 4→1
    //   r2: 1→1, 2→1 (nbr labels {2,1} tied → 1), 3→1, 4→2
    //   r3: everyone → 1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("s", "t")
    val r1 = Graph.labelPropagation(e, "s", "t", 1).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r1.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
    val r2 = Graph.labelPropagation(e, "s", "t", 2).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r2.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L)))
    val r3 = Graph.labelPropagation(e, "s", "t", 3).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r3.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("labelPropagation: bipartite path oscillates deterministically") {
    import spark.implicits._
    // path 1-2-3 (bipartite): synchronous LPA oscillates with period 2 —
    // the documented behavior; each round output is still exact
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "t")
    val r1 = Graph.labelPropagation(e, "s", "t", 1).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r1.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
    val r3 = Graph.labelPropagation(e, "s", "t", 3).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r3.toSeq === r1.toSeq) // period 2: round 3 ≡ round 1
    // rounds = 0 is the identity labeling
    val r0 = Graph.labelPropagation(e, "s", "t", 0).orderBy("node")
      .as[(Long, Long)].collect()
    assert(r0.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("langIdCt: accented and short docs the stopword heuristic misses") {
    import spark.implicits._
    import graft.ext.LangId
    // none of these sentences shares a single token with another
    // language's seed stopwords; several are SHORT — the regime where
    // marker-word counting returns all zeros and C-T rank-order still
    // has hundreds of gram observations
    val docs = Seq(
      ("the weather should improve before the children come home", "en"),
      ("l'été dernier nous étions à l'école près de la forêt", "fr"),
      ("el niño pequeño está en la casa de su abuela", "es"),
      ("über den wolken singen die mädchen wunderschön", "de"),
      ("bonjour à tous mes amis", "fr"),
      ("danke schön für alles", "de"),
      ("buenos días señora", "es"),
      ("good morning everyone", "en")
    ).toDF("text", "want")
    val got = docs.withColumn("pred", LangId.langIdCt(col("text")))
      .select("text", "want", "pred").collect()
    val wrong = got.filter(r => r.getString(1) != r.getString(2))
    assert(wrong.isEmpty, wrong.map(r =>
      s"'${r.getString(0)}' want=${r.getString(1)} got=${r.getString(2)}").mkString("; "))
    // the stopword heuristic CANNOT do this: the accented short docs
    // score zero on every marker list (or collide), C-T separates them
    assert(LangId.profiles.map(_._1) ===
      Seq("de", "el", "en", "es", "fr", "it", "ja", "ko", "nl", "pt", "ru", "zh"))
  }

  test("langIdCt: zh/ja/ko profiles separate held-out CJK sentences; ja vs zh despite shared Han") {
    import spark.implicits._
    import graft.ext.LangId
    val docs = Seq(
      // held-out; zh and ja are unsegmented — the char-n-gram alphabet
      // does all the work, and kana must pull ja away from zh even
      // though both carry Han characters
      ("今天我们去市场买新鲜的面包和一些水果", "zh"),
      ("这本书讲述了我们城市的一个很美的故事", "zh"),
      ("今日は市場へ行って新しいパンと果物を買います", "ja"),
      ("この本は私たちの町のとても美しい物語を語っている", "ja"),
      ("오늘 우리는 시장에 가서 신선한 빵과 과일을 산다", "ko"),
      ("이 책은 우리 도시의 아주 아름다운 이야기를 들려준다", "ko"),
      // Latin and Cyrillic predictions must not shift with 12 profiles
      ("the library opens early tomorrow morning", "en"),
      ("сегодня мы идем на рынок чтобы купить свежий хлеб", "ru")
    ).toDF("text", "want")
    val got = docs.withColumn("pred", LangId.langIdCt(col("text")))
      .select("text", "want", "pred").collect()
    val wrong = got.filter(r => r.getString(1) != r.getString(2))
    assert(wrong.isEmpty, wrong.map(r =>
      s"'${r.getString(0)}' want=${r.getString(1)} got=${r.getString(2)}").mkString("; "))
  }

  test("langIdCt: it/nl/pt stock profiles separate held-out sentences") {
    import spark.implicits._
    import graft.ext.LangId
    // held-out sentences (none appears in the seed corpora), including
    // the Romance-language near-collision zone (it vs es vs pt share
    // many grams — rank order must still separate them)
    val docs = Seq(
      ("oggi andiamo al mercato per comprare del pane fresco e della frutta", "it"),
      ("questo libro racconta una storia molto bella della nostra città", "it"),
      ("vandaag gaan we naar de markt om vers brood en fruit te kopen", "nl"),
      ("dit boek vertelt een heel mooi verhaal over onze stad", "nl"),
      ("hoje vamos ao mercado comprar pão fresco e algumas frutas", "pt"),
      ("este livro conta uma história muito bonita da nossa cidade", "pt"),
      // the original four must STILL classify right with 7 profiles
      ("the library opens early tomorrow morning", "en"),
      ("das konzert beginnt heute abend um acht uhr", "de"),
      ("la bibliothèque ouvre tôt demain matin", "fr"),
      ("la biblioteca abre temprano mañana por la mañana", "es")
    ).toDF("text", "want")
    val got = docs.withColumn("pred", LangId.langIdCt(col("text")))
      .select("text", "want", "pred").collect()
    val wrong = got.filter(r => r.getString(1) != r.getString(2))
    assert(wrong.isEmpty, wrong.map(r =>
      s"'${r.getString(0)}' want=${r.getString(1)} got=${r.getString(2)}").mkString("; "))
  }

  test("langIdCt: ru/el non-Latin profiles separate held-out sentences; Latin set unharmed") {
    import spark.implicits._
    import graft.ext.LangId
    val docs = Seq(
      ("сегодня мы идем на рынок чтобы купить свежий хлеб и фрукты", "ru"),
      ("эта книга рассказывает очень красивую историю нашего города", "ru"),
      ("σήμερα πηγαίνουμε στην αγορά για να αγοράσουμε φρέσκο ψωμί και φρούτα", "el"),
      ("αυτό το βιβλίο λέει μια πολύ όμορφη ιστορία για την πόλη μας", "el"),
      // Latin-script predictions must not shift with 9 profiles loaded
      ("the library opens early tomorrow morning", "en"),
      ("het concert begint vanavond om acht uur", "nl")
    ).toDF("text", "want")
    val got = docs.withColumn("pred", LangId.langIdCt(col("text")))
      .select("text", "want", "pred").collect()
    val wrong = got.filter(r => r.getString(1) != r.getString(2))
    assert(wrong.isEmpty, wrong.map(r =>
      s"'${r.getString(0)}' want=${r.getString(1)} got=${r.getString(2)}").mkString("; "))
  }

  test("langIdCt: null text is 'und'; distances are deterministic under codegen") {
    import spark.implicits._
    import graft.ext.LangId
    val df = Seq(Some("le chat est sur le toit"), None).toDF("text")
    val preds = df.withColumn("p", LangId.langIdCt(col("text")))
      .select("p").collect().map(_.getString(0))
    assert(preds.toSeq === Seq("fr", "und"))
    // interpreted eval (nullSafeEval) ≡ codegen: same distances row
    val d1 = df.filter(col("text").isNotNull)
      .select(LangId.distances(lower(col("text"))).as("d")).head.getSeq[Long](0)
    val d2 = df.filter(col("text").isNotNull).repartition(3)
      .select(LangId.distances(lower(col("text"))).as("d")).head.getSeq[Long](0)
    assert(d1 === d2 && d1.length === LangId.profiles.length)
  }

  test("trainProfiles: distributed training equals the driver-side profileOf") {
    import spark.implicits._
    import graft.ext.LangId
    val df = LangId.seeds.toSeq.flatMap { case (l, ts) => ts.map(t => (l, t)) }
      .toDF("lang", "text")
    val trained = LangId.trainProfiles(df, "lang", "text")
    assert(trained.map(_._1) ===
      Seq("de", "el", "en", "es", "fr", "it", "ja", "ko", "nl", "pt", "ru", "zh"))
    trained.foreach { case (l, prof) =>
      assert(prof === LangId.profileOf(LangId.seeds(l)),
        s"distributed profile for $l diverges from driver-side ranking")
    }
    // profiles round-trip through parquet: language order + rank order
    // exact, and the loaded quantizer classifies identically
    val dir = java.nio.file.Files.createTempDirectory("ct-profiles").toString
    LangId.saveProfiles(spark, trained, dir)
    val loaded = LangId.loadProfiles(spark, dir)
    assert(loaded === trained)
    val texts = Seq(
      "the library opens early tomorrow and the children will be there",
      "die kinder spielen im garten während die eltern das abendessen kochen")
      .toDF("text")
    val a = texts.select(LangId.langIdCt(col("text"), trained).as("p"))
      .collect().map(_.getString(0)).toSeq
    val b = texts.select(LangId.langIdCt(col("text"), loaded).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(a === b && a === Seq("en", "de"))
  }

  test("trainProfiles: a genuinely NEW language (pl) trains, persists and classifies — stock set unharmed") {
    import spark.implicits._
    import graft.ext.LangId
    // Polish training sentences — NOT in LangId.seeds; the production
    // path for any language the stock profiles lack: label a corpus,
    // train, save, classify with the custom profile set
    val plTrain = Seq(
      "szybki brązowy lis skacze nad leniwym psem podczas gdy dzieci patrzą z ogrodu",
      "powiedziała że rano pogoda będzie lepsza i że powinni poczekać",
      "to jest dom który zbudowaliśmy razem zeszłego lata nad rzeką przy starym moście",
      "wielu ludzi uważa że czytanie książek to najlepszy sposób na poznanie świata",
      "nie pozostało nic innego jak czekać na pociąg i mieć nadzieję że się nie spóźni",
      "kot jest na dachu a pies w kuchni z dziećmi",
      "każdego wieczoru rodzina zbiera się przy stole żeby zjeść kolację i porozmawiać o minionym dniu",
      "przyjaciele spóźnili się bo na głównej drodze było dużo samochodów")
    val corpus = (LangId.seeds.toSeq.flatMap { case (l, ts) => ts.map(t => (l, t)) } ++
      plTrain.map(("pl", _))).toDF("lang", "text")
    val trained = LangId.trainProfiles(corpus, "lang", "text")
    assert(trained.map(_._1).contains("pl") && trained.length === 13)
    val dir = java.nio.file.Files.createTempDirectory("ct-pl").toString
    LangId.saveProfiles(spark, trained, dir)
    val profs = LangId.loadProfiles(spark, dir)
    // held-out sentences: pl classifies as pl, and the stock languages
    // keep classifying correctly with 13 profiles loaded
    val docs = Seq(
      ("dzisiaj idziemy na targ żeby kupić świeży chleb i trochę owoców", "pl"),
      ("ta książka opowiada bardzo piękną historię naszego miasta", "pl"),
      ("the library opens early tomorrow morning", "en"),
      ("сегодня мы идем на рынок чтобы купить свежий хлеб", "ru"),
      ("das konzert beginnt heute abend um acht uhr", "de")
    ).toDF("text", "want")
    val got = docs.withColumn("pred", LangId.langIdCt(col("text"), profs))
      .select("text", "want", "pred").collect()
    val wrong = got.filter(r => r.getString(1) != r.getString(2))
    assert(wrong.isEmpty, wrong.map(r =>
      s"'${r.getString(0)}' want=${r.getString(1)} got=${r.getString(2)}").mkString("; "))
  }
}
