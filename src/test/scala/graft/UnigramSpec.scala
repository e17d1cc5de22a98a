package graft

import org.apache.spark.sql.functions._
import graft.ext.{Unigram, UnigramLoops}

/** Differential + property coverage for the unigram-LM (SentencePiece
  * unigram, Kudo 2018) subword kernel: Viterbi must agree with an
  * INDEPENDENT exhaustive-enumeration reference, training must be
  * deterministic and partitioning-independent, and the demo table must
  * keep the exactness invariant the cross-engine oracle relies on. */
class UnigramSpec extends SparkTestBase {

  import spark.implicits._

  /** Exhaustive reference: enumerate EVERY segmentation, take the
    * lexicographic (cost, count) minimum — no DP, no shared state. */
  private def refSeg(w: String, costs: Map[String, Double], maxLen: Int): (Double, Int) =
    if (w.isEmpty) (0.0, 0)
    else {
      val cands = (1 to math.min(maxLen, w.length)).flatMap { k =>
        costs.get(w.take(k))
          .orElse(if (k == 1) Some(UnigramLoops.UnkCost) else None)
          .map { pc =>
            val (c, n) = refSeg(w.drop(k), costs, maxLen)
            (pc + c, n + 1)
          }
      }
      cands.min(Ordering.Tuple2[Double, Int])
    }

  private def refScore(text: String, costs: Map[String, Double], maxLen: Int): (Double, Long) =
    text.split("\\s+").filter(_.nonEmpty).foldLeft((0.0, 0L)) { case ((c, n), w) =>
      val (wc, wn) = refSeg(w, costs, maxLen)
      (c + wc, n + wn)
    }

  private val demoMap = Unigram.demoPieces.toMap
  private val demoMax = Unigram.demoPieces.map(_._1.length).max

  test("Viterbi kernel ≡ exhaustive enumeration on hand-picked words") {
    for (w <- Seq("the", "theta", "data", "dataset", "ingest", "join",
                  "joining", "x", "zzz", "thine", "station", "order")) {
      val got = spark.range(1)
        .select(Unigram.score(lit(w), Unigram.demoPieces).as("s"))
        .select(col("s.cost"), col("s.n_pieces")).head()
      val (c, n) = refSeg(w, demoMap, demoMax)
      assert(got.getDouble(0) == c, s"cost for '$w'")
      assert(got.getLong(1) == n.toLong, s"count for '$w'")
    }
  }

  test("tokens: concatenation restores the word, count matches, cost is the token-cost sum") {
    for (w <- Seq("the", "dataset", "joining", "station", "q8k!")) {
      val toks = spark.range(1)
        .select(Unigram.tokens(lit(w), Unigram.demoPieces).as("t"))
        .head().getSeq[String](0)
      assert(toks.mkString("") === w, s"concat for '$w'")
      val (c, n) = refSeg(w, demoMap, demoMax)
      assert(toks.length === n, s"token count for '$w'")
      val tokCost = toks.map(t => demoMap.getOrElse(t, UnigramLoops.UnkCost)).sum
      assert(tokCost == c, s"token-cost sum for '$w'")
    }
  }

  test("tie-break: equal-cost segmentations resolve to fewer pieces") {
    // 'ab' (3.0) vs 'a'+'b' (2×1.5 = 3.0): same cost, Viterbi must
    // pick the single piece
    val t = Seq("ab" -> 3.0, "a" -> 1.5, "b" -> 1.5)
    val toks = spark.range(1)
      .select(Unigram.tokens(lit("ab"), t).as("t")).head().getSeq[String](0)
    assert(toks === Seq("ab"))
  }

  test("unknown characters fall back to UnkCost single-char pieces") {
    val t = Seq("a" -> 1.0)
    val got = spark.range(1)
      .select(Unigram.score(lit("a#a"), t).as("s"))
      .select(col("s.cost"), col("s.n_pieces")).head()
    assert(got.getDouble(0) == 2.0 + UnigramLoops.UnkCost)
    assert(got.getLong(1) === 3L)
    val toks = spark.range(1)
      .select(Unigram.tokens(lit("a#a"), t).as("t")).head().getSeq[String](0)
    assert(toks === Seq("a", "#", "a"))
  }

  test("whitespace pre-tokenization: multi-word text sums per-word scores; empty text scores zero") {
    val txt = "the data  \t join"
    val got = spark.range(1)
      .select(Unigram.score(lit(txt), Unigram.demoPieces).as("s"),
        Unigram.tokenCount(lit(txt), Unigram.demoPieces).as("n"))
      .select(col("s.cost"), col("s.n_pieces"), col("n")).head()
    val (c, n) = refScore(txt, demoMap, demoMax)
    assert(got.getDouble(0) == c)
    assert(got.getLong(1) === n)
    assert(got.getLong(2) === n)
    val empty = spark.range(1)
      .select(Unigram.score(lit(""), Unigram.demoPieces).as("s"))
      .select(col("s.cost"), col("s.n_pieces")).head()
    assert(empty.getDouble(0) == 0.0 && empty.getLong(1) === 0L)
  }

  test("demo table invariant: every cost (and UnkCost) is an exact multiple of 1/16") {
    (Unigram.demoPieces.map(_._2) :+ UnigramLoops.UnkCost).foreach { c =>
      assert(c * 16 == math.rint(c * 16), s"cost $c is not a multiple of 1/16")
    }
    assert(Unigram.demoPieces.map(_._1).distinct.size === Unigram.demoPieces.size)
  }

  // ── training ───────────────────────────────────────────────────────

  private val corpus = Seq(
    "the data the data stream",
    "data join the stream",
    "join the data set",
    "the the data join stream set"
  ).toDF("text")

  test("train: covers every corpus character, respects vocabSize, learns multi-char pieces") {
    val t = Unigram.train(corpus, "text", vocabSize = 20, maxPieceLen = 4,
      seedSize = 60, emIters = 2)
    assert(t.size <= 20)
    val pieces = t.map(_._1).toSet
    val chars = corpus.collect().flatMap(_.getString(0).replace(" ", "")).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    assert(t.exists(_._1.length > 1), "no multi-char piece learned")
    assert(t.forall(_._2 >= 0.0))
  }

  test("train: deterministic and partitioning-independent") {
    val a = Unigram.train(corpus, "text", vocabSize = 18, seedSize = 50, emIters = 2)
    val b = Unigram.train(corpus.repartition(7), "text", vocabSize = 18,
      seedSize = 50, emIters = 2)
    assert(a === b)
  }

  test("train: trained table scores the corpus no worse than the char-only baseline") {
    val t = Unigram.train(corpus, "text", vocabSize = 25, seedSize = 60, emIters = 2)
    val chars = t.filter(_._1.length == 1)
    def total(tab: Seq[(String, Double)]): Double =
      corpus.select(sum(Unigram.score(col("text"), tab).getField("cost")))
        .head().getDouble(0)
    assert(total(t) <= total(chars) + 1e-9)
  }

  test("savePieces/loadPieces round-trips the exact table") {
    val t = Unigram.train(corpus, "text", vocabSize = 15, seedSize = 40, emIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ug").toString + "/pieces"
    Unigram.savePieces(spark, t, dir)
    val back = Unigram.loadPieces(spark, dir)
    assert(back === t.sortBy { case (p, c) => (c, p) })
    // reloaded table tokenizes identically
    val txt = "the data join stream"
    val t1 = spark.range(1).select(Unigram.tokens(lit(txt), t)).head().getSeq[String](0)
    val t2 = spark.range(1).select(Unigram.tokens(lit(txt), back)).head().getSeq[String](0)
    assert(t1 === t2)
  }

  test("expectedCounts: hand-computed forward-backward on 'ab'") {
    // pieces: p(a)=p(b)=1/4, p(ab)=1/2 → segmentations [ab]: 1/2,
    // [a,b]: 1/16; α₂ = 9/16, E(ab) = 8/9, E(a) = E(b) = 1/9
    val t = Seq("a" -> -math.log(0.25), "b" -> -math.log(0.25),
      "ab" -> -math.log(0.5))
    val rows = spark.createDataset(Seq("ab"))(org.apache.spark.sql.Encoders.STRING)
      .toDF("w")
      .select(explode(Unigram.expCounts(col("w"), t)).as("e"))
      .select(col("e.piece"), col("e.w6")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def w6(e: Double): Long = math.floor(e * 1e6 + 0.5).toLong
    assert(rows("ab") === w6(8.0 / 9.0))
    assert(rows("a") === w6(1.0 / 9.0))
    assert(rows("b") === w6(1.0 / 9.0))
    // expectations of a word sum to (expected segmentation length)·1e6
    // only approximately after flooring; exact per-piece values above
  }

  test("expectedCounts: unsegmentable chars fall back to UnkCost; Viterbi-consistent support") {
    val t = Seq("a" -> 1.0)
    val rows = spark.createDataset(Seq("a#"))(org.apache.spark.sql.Encoders.STRING)
      .toDF("w")
      .select(explode(Unigram.expCounts(col("w"), t)).as("e"))
      .select(col("e.piece"), col("e.w6")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only one segmentation exists → both pieces have expectation 1.0
    assert(rows === Map("a" -> 1000000L, "#" -> 1000000L))
  }

  test("trainEM: deterministic, partitioning-independent, learns multi-char pieces") {
    val a = Unigram.trainEM(corpus, "text", vocabSize = 18, seedSize = 50, emIters = 2)
    val b = Unigram.trainEM(corpus.repartition(7), "text", vocabSize = 18,
      seedSize = 50, emIters = 2)
    assert(a === b)
    assert(a.exists(_._1.length > 1))
    val chars = a.filter(_._1.length == 1)
    def total(tab: Seq[(String, Double)]): Double =
      corpus.select(sum(Unigram.score(col("text"), tab).getField("cost")))
        .head().getDouble(0)
    assert(total(a) <= total(chars) + 1e-9)
  }

  test("byte fallback: uncovered chars emit UTF-8 <0xNN> pieces; covered text unchanged") {
    // 'é' (U+00E9) is absent from the demo table → 2 UTF-8 bytes at
    // ByteCost each; '上' (U+4E0A) → 3 bytes; ascii words segment
    // exactly as without fallback
    val df = Seq("café 上 data").toDF("text")
    val toks = df.select(Unigram.tokens(col("text"), Unigram.demoPieces,
      byteFallback = true).as("t")).head().getSeq[String](0)
    assert(toks === Seq("c", "a", "f", "<0xC3>", "<0xA9>",
      "<0xE4>", "<0xB8>", "<0x8A>", "data"))
    val s = df.select(Unigram.score(col("text"), Unigram.demoPieces,
      byteFallback = true).as("s")).select(col("s.cost"), col("s.n_pieces")).head()
    // c+a+f = 3·4.0, é = 2·6.0, 上 = 3·6.0, data = 2.25
    assert(s.getDouble(0) === 12.0 + 12.0 + 18.0 + 2.25)
    assert(s.getLong(1) === 3L + 2L + 3L + 1L)
    assert(df.select(Unigram.tokenCount(col("text"), Unigram.demoPieces,
      byteFallback = true)).head().getLong(0) === 9L)
    // without fallback: UNK single-char pieces, raw chars retained
    val unk = df.select(Unigram.tokens(col("text"), Unigram.demoPieces).as("t"))
      .head().getSeq[String](0)
    assert(unk === Seq("c", "a", "f", "é", "上", "data"))
  }

  test("byte fallback: astral chars consume as ONE 4-byte pair, never two lone surrogates") {
    // U+1F600 (😀) is a surrogate pair in UTF-16; the pair arm must win
    // (4 bytes, 24.0) — two lone-surrogate k=1 arms would yield '?'
    // mojibake at a CHEAPER 12.0 if not suppressed
    val df = Seq("😀").toDF("text")
    val toks = df.select(Unigram.tokens(col("text"), Unigram.demoPieces,
      byteFallback = true).as("t")).head().getSeq[String](0)
    assert(toks === Seq("<0xF0>", "<0x9F>", "<0x98>", "<0x80>"))
    val s = df.select(Unigram.score(col("text"), Unigram.demoPieces,
      byteFallback = true).as("s")).select(col("s.cost"), col("s.n_pieces")).head()
    assert(s.getDouble(0) === 24.0 && s.getLong(1) === 4L)
  }

  test("byte fallback: total even under a 1-char-only piece table (surrogate k=2 arm stays reachable)") {
    // maxPieceLen = 1 would normally cap the DP at k=1, making the
    // surrogate-pair arm unreachable and totality fail with Infinity —
    // byteFallback must extend the scan to k=2
    val charsOnly: Seq[(String, Double)] = "ab".map(c => c.toString -> 4.0)
    val df = Seq("a😀b").toDF("text")
    val toks = df.select(Unigram.tokens(col("text"), charsOnly,
      byteFallback = true).as("t")).head().getSeq[String](0)
    assert(toks === Seq("a", "<0xF0>", "<0x9F>", "<0x98>", "<0x80>", "b"))
    val s = df.select(Unigram.score(col("text"), charsOnly,
      byteFallback = true).as("s")).select(col("s.cost"), col("s.n_pieces")).head()
    assert(s.getDouble(0) === 4.0 + 24.0 + 4.0 && s.getLong(1) === 6L)
  }

  test("byte fallback: totality — arbitrary unicode scores finite, count = byte count for uncovered text") {
    val weird = "Ωß中🎉ñ"
    val s = Seq(weird).toDF("text")
      .select(Unigram.score(col("text"), Unigram.demoPieces,
        byteFallback = true).as("s"))
      .select(col("s.cost"), col("s.n_pieces")).head()
    val nBytes = weird.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(s.getLong(1) === nBytes.toLong)
    assert(s.getDouble(0) === UnigramLoops.ByteCost * nBytes)
  }

  test("random tables: kernel ≡ exhaustive reference (differential)") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcd"
    for (trial <- 1 to 20) {
      // random piece table over {a..d} substrings, random 1/16 costs
      val pieces = (1 to 8).map { _ =>
        val len = 1 + rng.nextInt(3)
        val p = (1 to len).map(_ => alphabet(rng.nextInt(4))).mkString
        p -> (rng.nextInt(96) + 1) / 16.0
      }.distinctBy(_._1)
      val m = pieces.toMap
      val mx = pieces.map(_._1.length).max
      val w = (1 to (3 + rng.nextInt(6))).map(_ => alphabet(rng.nextInt(4))).mkString
      val got = spark.range(1)
        .select(Unigram.score(lit(w), pieces).as("s"))
        .select(col("s.cost"), col("s.n_pieces")).head()
      val (c, n) = refSeg(w, m, mx)
      assert(got.getDouble(0) == c, s"trial $trial cost for '$w' table $pieces")
      assert(got.getLong(1) == n.toLong, s"trial $trial count for '$w' table $pieces")
    }
  }
}
