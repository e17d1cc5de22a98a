package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.debug._
import graft.ext.{Bpe, BpeLoops, Corpus, TextAnalysis}

/** Differential + property coverage for the BPE subword kernel: the
  * Expression must agree with an INDEPENDENT naive reference
  * implementation (written here, functional style — not the kernel's
  * in-place loop) on arbitrary tables, including rank-NON-monotone
  * ones the oracle can't express. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  /** Naive reference: repeatedly merge the best-ranked pair (all
    * occurrences, leftmost first), recursion + immutable lists. */
  private def refEncode(w: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    def mergeAll(ts: List[String], p: (String, String)): List[String] = ts match {
      case a :: b :: rest if (a, b) == p => (a + b) :: mergeAll(rest, p)
      case a :: rest => a :: mergeAll(rest, p)
      case Nil => Nil
    }
    @annotation.tailrec
    def loop(ts: List[String]): List[String] = {
      val present = ts.zip(ts.drop(1)).filter(rank.contains).sortBy(rank)
      present.headOption match {
        case None => ts
        case Some(best) => loop(mergeAll(ts, best))
      }
    }
    loop(w.toList.map(_.toString))
  }

  private def refTokens(text: String, merges: Seq[(String, String)]): List[String] =
    text.split("\\s+").toList.filter(_.nonEmpty).flatMap(refEncode(_, merges))

  test("kernel ≡ naive reference on hand-picked words (demo table)") {
    for (w <- Seq("the", "data", "join", "database", "thethe", "sort", "stream",
                  "x", "", "er", "ster", "jjoin", "thedata")) {
      val got = BpeLoops.encodeWord(w, BpeLoops.buildRanks(Bpe.demoMerges))
      assert(got.toArray.toList === refEncode(w, Bpe.demoMerges), s"word '$w'")
    }
  }

  test("kernel ≡ naive reference on rank-non-monotone tables") {
    // (aa, b) outranks (a, a): the min-rank loop must fire (a,a) first
    // (only pair present), then REVISIT rank 0 — the case a single
    // in-order replacement pass gets wrong
    val tricky = Seq(("aa", "b"), ("a", "a"), ("b", "b"))
    for (w <- Seq("aab", "aaab", "aaaabb", "abab", "bbaa", "aabaab")) {
      val got = BpeLoops.encodeWord(w, BpeLoops.buildRanks(tricky))
      assert(got.toArray.toList === refEncode(w, tricky), s"word '$w'")
    }
    // same-pair chaining: exhaustive leftmost-first pairing
    val aa = Seq(("a", "a"), ("aa", "aa"))
    assert(BpeLoops.encodeWord("aaaaa", BpeLoops.buildRanks(aa)).toArray.toList
      === refEncode("aaaaa", aa))
  }

  test("kernel ≡ naive reference on pseudo-random words and tables") {
    // deterministic LCG — no RNG state in tests either
    var seed = 12345L
    def next(n: Int): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; (((seed >>> 33) % n).toInt + n) % n }
    val alphabet = "abcd"
    for (trial <- 0 until 50) {
      // random merge table: grow tokens organically so merges chain
      var vocab = alphabet.map(_.toString).toVector
      val merges = (0 until 8).map { _ =>
        val l = vocab(next(vocab.size)); val r = vocab(next(vocab.size))
        vocab = vocab :+ (l + r)
        (l, r)
      }.distinct
      val ranks = BpeLoops.buildRanks(merges)
      for (_ <- 0 until 10) {
        val w = (0 until (1 + next(12))).map(_ => alphabet(next(4))).mkString
        assert(BpeLoops.encodeWord(w, ranks).toArray.toList === refEncode(w, merges),
          s"trial $trial word '$w' merges $merges")
      }
    }
  }

  test("expression: codegen path ≡ interpreted eval ≡ reference; nulls pass through") {
    val texts = Seq("the data join", "  sorted   streams  ", "", "a", null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"),
        Bpe.tokenCount(col("text"), Bpe.demoMerges).as("n"),
        Bpe.tokens(col("text"), Bpe.demoMerges).as("toks"))
    val rows = df.orderBy("id").collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      if (t == null) {
        assert(rows(i).isNullAt(1) && rows(i).isNullAt(2))
      } else {
        val expect = refTokens(t, Bpe.demoMerges)
        assert(rows(i).getLong(1) === expect.length.toLong, s"count of '$t'")
        assert(rows(i).getSeq[String](2).toList === expect, s"tokens of '$t'")
      }
    }
    // whole-stage codegen actually compiled (no silent fallback)
    val s = codegenString(df.queryExecution.executedPlan)
    assert(!s.contains("maxMethodCodeSize:-1"), "bpe codegen subtree failed to compile")
    assert(s.contains("WholeStageCodegen subtrees"))
  }

  test("chunkDocsBudget with unit cost ≡ chunkDocs(overlap = 0)") {
    val docs = Seq(
      (0L, "a b c d e f g"),
      (1L, "one"),
      (2L, "w x y z"),
      (3L, "p q r s t u v w x")).toDF("doc_id", "text")
    val expect = Corpus.chunkDocs(docs, "doc_id", "text", maxTokens = 3)
      .orderBy("doc_id", "chunk_id").collect().map(_.toSeq)
    val got = Corpus.chunkDocsBudget(docs, "doc_id", "text", budget = 3)
      .orderBy("doc_id", "chunk_id").collect().map(_.toSeq)
    assert(got.toSeq === expect.toSeq)
  }

  test("chunkDocsBudget: subword budget respected, words never split, text preserved") {
    val docs = Seq(
      (0L, "the data join sorted stream joins and the sorter"),
      (1L, "supercalifragilistic tiny a"),
      (2L, "datadata datadatadata th")).toDF("doc_id", "text")
    val budget = 5L
    val out = Corpus.chunkDocsBudget(docs, "doc_id", "text", budget,
        w => Bpe.tokenCount(w, Bpe.demoMerges))
      .orderBy("doc_id", "chunk_id").collect()
    // every chunk fits the budget unless it is a single oversized word
    out.foreach { r =>
      val chunk = r.getString(2); val nTok = r.getLong(3)
      assert(nTok <= budget || !chunk.contains(" "),
        s"overfull multi-word chunk '$chunk' ($nTok > $budget)")
      // n_tok is the real subword cost of the chunk text
      assert(nTok === refTokens(chunk, Bpe.demoMerges).length.toLong, s"n_tok of '$chunk'")
    }
    // chunks reassemble the original text, in order
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(
      _.sortBy(_.getLong(1)).map(_.getString(2)).mkString(" ")).toMap
    docs.collect().foreach(r =>
      assert(byDoc(r.getLong(0)) === r.getString(1), s"doc ${r.getLong(0)} reassembly"))
    // greedy: a chunk never ends while the next word would still fit
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val nextWordCost = refEncode(b.getString(2).split(" ").head, Bpe.demoMerges).length
          assert(a.getLong(3) + nextWordCost > budget,
            s"chunk ${a.getLong(1)} of doc ${a.getLong(0)} ended early")
        case _ => ()
      }
    }
  }

  test("unigramLogProb with a BPE tokenizer scores subword units") {
    val docs = Seq((0L, "the the data"), (1L, "the data")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text",
        t => Bpe.tokens(t, Bpe.demoMerges))
      .orderBy("doc_id").collect()
    // subword counts: both docs tokenize to whole-word merges here
    assert(out(0).getLong(1) === 3L)
    assert(out(1).getLong(1) === 2L)
    // 5 tokens total: the×3 (ln 3/5), data×2 (ln 2/5) — doc0 = 2·the + data
    val lnThe = math.floor(math.log(3.0 / 5.0) * 1e6 + 0.5)
    val lnData = math.floor(math.log(2.0 / 5.0) * 1e6 + 0.5)
    assert(out(0).getLong(2) === (2 * lnThe + lnData).toLong)
    assert(out(1).getLong(2) === (lnThe + lnData).toLong)
  }

  test("train: distributed merge learning ≡ literal sequential Sennrich reference") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low lower lower lowest",
      "new new newer newer newer newest widest wide")
    // literal sequential reference (count pairs over the word-frequency
    // vocab, adopt max with (count desc, pair lex asc), replace
    // leftmost-first non-overlapping)
    def applyMerge(syms: Vector[String], p: (String, String)): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
          out += (p._1 + p._2); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def refTrain(k: Int): Seq[(String, String)] = {
      var vocab: Seq[(Vector[String], Long)] = corpus
        .flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).toSeq
        .map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }
      val ms = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (ms.length < k && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        vocab.foreach { case (syms, f) =>
          syms.iterator.zip(syms.iterator.drop(1))
            .foreach(p => pc(p) += f)
        }
        if (pc.isEmpty) done = true
        else {
          val best = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
          ms += best
          vocab = vocab.map { case (s, f) => (applyMerge(s, best), f) }
        }
      }
      ms.toSeq
    }
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ext.Bpe.train(docs, "text", 10)
    assert(got === refTrain(10))
    // trained table feeds the apply expression
    val toks = docs.select(graft.ext.Bpe.tokens(col("text"), got).as("t"))
      .as[Seq[String]].collect()
    assert(toks.forall(_.nonEmpty))
    assert(got.exists { case (l, r) => (l + r) == "low" },
      s"'low' (freq 4 prefix + 2 in lower/lowest) should merge early: $got")
  }

  test("merge table round-trips through parquet with rank order intact") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower lowest new newer newest"))
      .toDF("doc_id", "text")
    val trained = graft.ext.Bpe.train(docs, "text", 8)
    assert(trained.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bpe-merges").toString
    graft.ext.Bpe.saveMerges(spark, trained, dir)
    val loaded = graft.ext.Bpe.loadMerges(spark, dir)
    // the order IS the tokenizer: exact sequence equality, not set
    assert(loaded === trained)
    // a tokenizer built from the loaded table is the same tokenizer
    val a = docs.select(graft.ext.Bpe.tokens(col("text"), trained).as("t"))
      .as[Seq[String]].head()
    val b = docs.select(graft.ext.Bpe.tokens(col("text"), loaded).as("t"))
      .as[Seq[String]].head()
    assert(a === b)
  }

  test("trainLocal ≡ distributed train: identical merges on ties, chains, exhaustion") {
    import spark.implicits._
    val corpora = Seq(
      // the classic Sennrich fixture
      Seq("low low low low lower lower lowest",
          "new new newer newer newer newest widest wide"),
      // pure ties everywhere: tie order (count desc, l asc, r asc) is
      // the only thing separating the candidates
      Seq("ab ab cd cd ef ef", "ba ba dc dc fe fe"),
      // single-letter runs: overlapping-pair counting + non-overlapping
      // replacement is where incremental maintenance usually breaks
      Seq("aaa aaaa aaaaa bbb abab aabb", "aa aa aa bbbb baba"),
      // astral char: code-point symbols survive the driver round-trip
      Seq.fill(4)("𝒳a body text here"))
    corpora.zipWithIndex.foreach { case (corpus, ci) =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (k <- Seq(0, 3, 12, 60)) { // 60 → exhaustion on every fixture
        val dist = Bpe.train(docs, "text", k)
        val local = Bpe.trainLocal(docs, "text", k)
        assert(local === dist, s"corpus #$ci, nMerges=$k")
      }
    }
  }

  test("trainLocal ≡ distributed train on a pseudo-random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val words = Seq.fill(300)(
      (0 until (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val docs = words.grouped(20).map(_.mkString(" ")).zipWithIndex.toSeq
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    assert(Bpe.trainLocal(docs, "text", 20) === Bpe.train(docs, "text", 20))
  }

  test("trainLocal maxVocab envelope aborts; trainAuto routes past the cap") {
    import spark.implicits._
    val docs = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainLocal(docs, "text", 5, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
    // trainAuto with the same tiny cap falls back to the distributed
    // loop and still learns the same table as an uncapped local run
    assert(Bpe.trainAuto(docs, "text", 5, localVocabCap = 3)
      === Bpe.trainLocal(docs, "text", 5))
  }

  test("astral characters tokenize as code points, never lone surrogates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // train on a corpus containing a non-BMP char; the learned merges
    // must APPLY at encode time (UTF-16-seeded pairs never matched the
    // code-point-seeded training keys) and output must re-concatenate
    val astral = "\uD835\uDCB3a" // U+1D4B3 + 'a'
    val corpus = Seq.fill(6)(s"$astral body text here").toDF("text")
    val merges = Bpe.train(corpus, "text", nMerges = 10)
    val toks = corpus.limit(1)
      .select(Bpe.tokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks.mkString === s"$astral body text here".replace(" ", ""))
    assert(toks.forall(t => !t.exists(c =>
      Character.isSurrogate(c) && t.length == 1)), toks.mkString("|"))
    // the astral word merges to a single token (its pair was learnable)
    assert(toks.contains(astral), toks.mkString("|"))
  }
}
