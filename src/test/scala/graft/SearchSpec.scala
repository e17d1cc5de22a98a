package graft

import org.apache.spark.sql.functions._
import graft.ext.Search

/** Ranked-retrieval surface (round 6). Cross-engine arithmetic is
  * separately proven by the DuckDB oracles (q_inverted_index, q_tfidf,
  * q_bm25); these tests pin the library semantics on a corpus small
  * enough to check by hand. */
class SearchSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = Seq(
    (1L, "spark join fast fast"),
    (2L, "spark slow scan"),
    (3L, "join join spark fast"),
    (4L, "table scan only")
  ).toDF("doc_id", "text")

  test("invertedIndex: df counts docs once, postings sorted") {
    val idx = Search.invertedIndex(docs, "doc_id", "text")
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(idx("spark") === ((3L, Seq(1L, 2L, 3L))))
    assert(idx("fast") === ((2L, Seq(1L, 3L)))) // two 'fast' in doc 1 count once
    assert(idx("only") === ((1L, Seq(4L))))
  }

  test("searchAll is conjunctive") {
    val hits = Search.searchAll(docs, "doc_id", "text", Seq("spark", "join"))
      .as[Long].collect().sorted
    assert(hits === Seq(1L, 3L)) // doc 2 has spark but no join
  }

  test("tfidf: tf is the occurrence count, rarer terms score higher at equal tf") {
    val rows = Search.tfidf(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(rows((1L, "fast"))._1 === 2L)   // tf counts occurrences
    assert(rows((1L, "fast"))._2 === 2L)   // df counts documents
    // 'only' (df=1) must outscore 'spark' (df=3) at tf=1 in the same doc set
    assert(rows((4L, "only"))._3 > rows((2L, "spark"))._3)
  }

  test("bm25: a doc matching more query terms outranks a doc matching fewer") {
    val scores = Search.bm25(docs, "doc_id", "text", Seq("spark", "join"))
      .as[(Long, Long)].collect().toMap
    assert(scores(3L) > scores(2L)) // doc 3 has both terms, doc 2 only 'spark'
    assert(!scores.contains(4L))    // no match, no row
  }

  test("bm25 is deterministic under input reshuffling (fixed-point sums)") {
    val a = Search.bm25(docs, "doc_id", "text", Seq("spark", "fast"))
      .as[(Long, Long)].collect().toMap
    val b = Search.bm25(docs.repartition(7, col("text")), "doc_id", "text", Seq("spark", "fast"))
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("containmentPairs finds a quoted passage Jaccard would dilute away") {
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val host = ("filler" +: (1 to 60).map(i => s"w$i")).mkString(" ") + " " + passage
    val corpus = Seq(
      (1L, passage),                                      // the quote
      (2L, host),                                         // contains it verbatim
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))      // unrelated
    ).toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.containmentPairs(corpus, "doc_id", "text",
      n = 3, tau = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val (_, _, cAB, _) = pairs.head
    assert(cAB === 1.0) // every shingle of the quote is in the host
    // while Jaccard on the same pair is diluted far below tau
    val jac = corpus.filter(col("doc_id") === 1L)
      .crossJoin(corpus.filter(col("doc_id") === 2L).select(col("text").as("t2")))
      .select(graft.ext.Dedup.ngramJaccard(col("text"), col("t2")))
      .as[Double].head()
    assert(jac < 0.5)
  }

  test("unigramLogProb: rare-token docs score lower per token than common-token docs") {
    val corpus = Seq(
      (1L, "common common common common"),
      (2L, "common common common common"),
      (3L, "common common common common"),
      (4L, "rareword common common common")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.unigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.values.forall(_._1 === 4L))
    // avg log-prob of the rare-containing doc is strictly lower
    assert(out(4L)._2 < out(1L)._2)
    // identical docs get identical fixed-point sums (determinism)
    assert(out(1L) === out(2L) && out(2L) === out(3L))
  }

  test("bigramLogProb: hand-computed two-doc corpus, fixed-point exact") {
    // corpus: "a b a b" + "a b" → unigrams a:3 b:3 (tot 6);
    // bigrams (a,b):3, (b,a):1; λ=80:
    //   p(b|a) = (80·(3/3) + 20·(3/6))/100 = 0.9
    //   p(a|b) = (80·(1/3) + 20·(3/6))/100 = 11/30
    val corpus = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bigramLogProb(corpus, "doc_id", "text", 80)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def lp6(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    // expected probs follow the operator's exact double op order
    val pBA = (80.0 * (3.0 / 3.0) + 20.0 * (3.0 / 6.0)) / 100.0
    val pAB = (80.0 * (1.0 / 3.0) + 20.0 * (3.0 / 6.0)) / 100.0
    assert(out(1L) === ((3L, 2 * lp6(pBA) + lp6(pAB))))
    assert(out(2L) === ((1L, lp6(pBA))))
  }

  test("bigramLogProbKN: hand-computed corpus; continuation backoff beats raw frequency") {
    // corpus: "a b a b" + "a b" → bigrams (a,b):3, (b,a):1;
    // h(a)=3 n1fw(a)=1; h(b)=1 n1fw(b)=1; nc(a)=nc(b)=1; types=2; D=0.75
    //   p(b|a) = (3−.75)/3 + (.75·1/3)·(1/2) = 0.875
    //   p(a|b) = (1−.75)/1 + (.75·1/1)·(1/2) = 0.625
    val corpus = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bigramLogProbKN(corpus, "doc_id", "text", 75)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def lp6(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val pBA = (3.0 - 0.75) / 3.0 + (0.75 * 1.0 / 3.0) * (1.0 / 2.0)
    val pAB = (1.0 - 0.75) / 1.0 + (0.75 * 1.0 / 1.0) * (1.0 / 2.0)
    assert(out(1L) === ((3L, 2 * lp6(pBA) + lp6(pAB))))
    assert(out(2L) === ((1L, lp6(pBA))))
    // the Kneser-Ney signature: a token frequent behind ONE history
    // ("francisco" after "san") gets LESS backoff mass than an
    // equally-frequent token seen after MANY histories ("thing") —
    // raw-frequency interpolation (JM) cannot make that distinction
    val kn = Seq(
      (1L, "san francisco san francisco san francisco"),
      (2L, "one thing two thing six thing go"))
      .toDF("doc_id", "text")
    val toked = kn.select(col("doc_id"), split(col("text"), " ").as("t"))
    // p(francisco | one) ∝ backoff only — compute via the operator on a
    // probe doc is awkward; assert the continuation counts directly:
    // nc(francisco)=1 (only 'san'), nc(thing)=3 (one/two/six)
    val pairs = toked.select(explode(expr(
      "zip_with(slice(t, 1, greatest(size(t)-1, 0)), slice(t, 2, greatest(size(t)-1, 0)), (a, b) -> struct(a AS prev, b AS cur))")).as("bg"))
      .select(col("bg.prev"), col("bg.cur")).distinct()
    val nc = pairs.groupBy(col("cur")).count().as[(String, Long)].collect().toMap
    assert(nc("francisco") === 1L && nc("thing") === 3L)
  }

  test("sentences: terminator runs attach, fragments kept, whitespace dropped") {
    def sent(s: String): Seq[String] =
      Seq(s).toDF("t")
        .select(graft.ext.TextAnalysis.sentences(col("t"))).head().getSeq[String](0)
    assert(sent("One. Two! Three?") === Seq("One.", "Two!", "Three?"))
    assert(sent("Wait... what?! ok") === Seq("Wait...", "what?!", "ok"))
    assert(sent("no terminator at all") === Seq("no terminator at all"))
    assert(sent("") === Seq.empty)
    assert(sent("a.   .b") === Seq("a.", ".", "b")) // bare terminator run survives as '.'
  }

  test("sentences: abbreviation dots do not terminate (VERDICT r11 #3)") {
    def sent(s: String): Seq[String] =
      Seq(s).toDF("t")
        .select(graft.ext.TextAnalysis.sentences(col("t"))).head().getSeq[String](0)
    assert(sent("Dr. Smith arrived.") === Seq("Dr. Smith arrived."))
    assert(sent("He met Mr. Jones, e.g. at noon. The end") ===
      Seq("He met Mr. Jones, e.g. at noon.", "The end"))
    assert(sent("Costs rose, i.e. doubled. Prof. Lee vs. Ms. Chen agreed.") ===
      Seq("Costs rose, i.e. doubled.", "Prof. Lee vs. Ms. Chen agreed."))
    // documented trade: an abbreviation that ENDS a sentence no longer splits
    assert(sent("Apples, pears, etc. Next point here.") ===
      Seq("Apples, pears, etc. Next point here."))
    // mid-word 'Dr' is not an abbreviation (word boundary respected)
    assert(sent("The cadr. of a list.") === Seq("The cadr.", "of a list."))
    // abbreviations restore verbatim inside a kept trailing fragment
    assert(sent("ask Mrs. Doe") === Seq("ask Mrs. Doe"))
    // the guard is the exact pair e.g./i.e. — the cross-product
    // non-abbreviations "i.g." and "e.e." are NOT guarded, so their
    // dots terminate like any other (ADVICE r12)
    assert(sent("wrote i.g. then left. Done") ===
      Seq("wrote i.", "g.", "then left.", "Done"))
    assert(sent("sang e.e. cummings. Done") ===
      Seq("sang e.", "e.", "cummings.", "Done"))
  }

  test("scriptProfile: per-script codepoint counts, dominant label, ties and none") {
    val docs = Seq(
      (1L, "hello world"),                   // latin only
      (2L, "Привет мир"),                    // cyrillic only
      (3L, "ab Привет"),                     // cyrillic 6 > latin 2
      (4L, "日本語 と ひらがな カタカナ"),      // han 3, hiragana 5(と+4), katakana 4
      (5L, "123 !!!"),                       // no script chars at all
      (6L, "abcd Прив")                      // tie 4-4 → fixed order: latin
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .select("doc_id", "n_latin", "n_cyrillic", "n_han", "n_hiragana", "script")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._6 === "latin" && out(1L)._2 === 10L)
    assert(out(2L)._6 === "cyrillic" && out(2L)._3 === 9L)
    assert(out(3L)._6 === "cyrillic")
    assert(out(4L)._6 === "hiragana" && out(4L)._4 === 3L && out(4L)._5 === 5L)
    assert(out(5L)._6 === "none")
    assert(out(6L)._6 === "latin") // equal counts resolve by fixed order
  }

  test("lexicalStats: hand-computed diversity cells; empty and uniform docs") {
    val corpus = Seq(
      (1L, "a b a c"),        // n=4, types {a:2,b:1,c:1}, hapax=2
      (2L, "x x x x"),        // uniform: 1 type, 0 hapax, entropy 0
      (3L, "")                // split('') = [''] → 1 token, 1 type
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.lexicalStats(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    def h6(c: Double): Long = math.floor((0.0 - c * math.log(c)) * 1e6 + 0.5).toLong
    assert(out(1L) === ((1L, 4L, 3L, 2L, 3.0 / 4.0, h6(0.5) + 2 * h6(0.25))))
    assert(out(2L) === ((2L, 4L, 1L, 0L, 0.25, 0L)))
    assert(out(3L) === ((3L, 1L, 1L, 1L, 1.0, 0L)))
  }

  test("gopherRules: each gate trips independently, integer cells exact") {
    val corpus = Seq(
      (1L, "the quick brown fox and the lazy dog trot"),   // clean → kept
      (2L, "the and word # # # # # # # # # #"),            // hash ratio
      (3L, "the and"),                                     // too few words
      (4L, "alpha beta gamma delta epsilon zeta"),         // no stopwords
      (5L, "the and 111 222 333 444 555 666 777 888"),     // alpha fraction
      (6L, "the and go on up it is at we so do no")        // mean word len < 3
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.gopherRules(corpus, "doc_id", "text",
        minWords = 5L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._8 === true)
    assert(out(2L)._8 === false && out(2L)._4 === 10L) // n_hash
    assert(out(3L)._8 === false && out(3L)._2 === 2L)  // n_words
    assert(out(4L)._8 === false && out(4L)._7 === 0L)  // n_stop
    assert(out(5L)._8 === false && out(5L)._6 === 2L)  // n_alpha_words
    assert(out(6L)._8 === false)                       // 3·n_words > n_chars
    // ellipsis gate: 18 of them on a 10-word base → 10·18 ≥ 3·28
    val dots = Seq((7L, "the quick brown fox and the lazy dog trot here" +
      (" ..." * 18))).toDF("doc_id", "text")
    val d7 = graft.ext.TextAnalysis.gopherRules(dots, "doc_id", "text",
        minWords = 5L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(d7._5 === 18L && d7._8 === false)
    // Gopher A1.1 counts DISTINCT required stopwords: one stopword
    // repeated twice is still n_stop = 1 and must NOT pass the gate
    val stuffed = Seq(
      (8L, "the the quick brown fox jumps lazy dog trot here"),
      (9L, "the and quick brown fox jumps lazy dog trot here")
    ).toDF("doc_id", "text")
    val s89 = graft.ext.TextAnalysis.gopherRules(stuffed, "doc_id", "text",
        minWords = 5L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(s89(8L)._7 === 1L && s89(8L)._8 === false)
    assert(s89(9L)._7 === 2L && s89(9L)._8 === true)
  }

  test("repetitionSignals: hand-computed cells for units, top n-grams, dup n-grams") {
    val corpus = Seq(
      (1L, "a b\nc d\na b\nx"),                      // dup line "a b"
      (2L, "a b c d e a b c d e a b c d e"),         // period-5 repetition
      (3L, ""),                                      // empty text
      (4L, "x\n\nx")                                 // empty unit dropped
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.repetitionSignals(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def cell(id: Long, name: String): Long =
      out(id).getAs[Long](name)
    // doc 1: units [a b, c d, a b, x]; "a b" ×2 → one dup occurrence
    assert(cell(1L, "n_units") === 4L && cell(1L, "dup_units") === 1L)
    assert(cell(1L, "unit_chars") === 10L && cell(1L, "dup_unit_chars") === 3L)
    assert(cell(1L, "n_chars") === 13L)
    // doc 1 tokens split on ' ' keep newlines inside: [a, b\nc, d\na, b\nx]
    // → all 2-grams distinct; top2_chars = longest of the tf=1 grams (7)
    assert(cell(1L, "top2_cnt") === 1L && cell(1L, "top2_chars") === 7L)
    assert(cell(1L, "dup5_chars") === 0L) // only 4 tokens, no 5-gram
    // doc 2: "a b c d e" ×3 → top2/3/4 cnt 3 with char masses 9/15/21;
    // dup5 = 3·9 + 4·(2·9) = 99; dup10: the pos-0 10-gram repeats at
    // pos 5 (2·19 = 38), the rest are singles
    assert(cell(2L, "n_chars") === 29L && cell(2L, "n_units") === 1L)
    assert(cell(2L, "top2_cnt") === 3L && cell(2L, "top2_chars") === 9L)
    assert(cell(2L, "top3_cnt") === 3L && cell(2L, "top3_chars") === 15L)
    assert(cell(2L, "top4_cnt") === 3L && cell(2L, "top4_chars") === 21L)
    assert(cell(2L, "dup5_chars") === 99L)
    assert(cell(2L, "dup10_chars") === 38L)
    // doc 3: all-zero row, not a null/missing row
    assert(cell(3L, "n_chars") === 0L && cell(3L, "n_units") === 0L &&
      cell(3L, "top2_cnt") === 0L && cell(3L, "dup5_chars") === 0L)
    // doc 4: consecutive separators yield an empty unit — dropped, so
    // the two "x" lines still register as a duplicate
    assert(cell(4L, "n_units") === 2L && cell(4L, "dup_units") === 1L)
  }

  test("repetitionSignals kernel ≡ HOF spec, including unicode chars and empty tokens") {
    // multi-space text yields EMPTY tokens (split semantics); CJK and
    // astral chars pin numChars ≡ length(); n=1 exercises the
    // degenerate gram width
    val corpus = Seq(
      (1L, "a b\nc d\na b\nx"),
      (2L, "a b c d e a b c d e a b c d e"),
      (3L, ""),
      (4L, "x  y  x  y"),
      (5L, "你好 世界 你好 世界 你好 𝔘𝔫𝔦"),
      (6L, "p q p q p q r\np q p q p q r")
    ).toDF("doc_id", "text")
    val ns = Seq(1, 2, 3, 5)
    val fast = graft.ext.TextAnalysis.repetitionSignals(
      corpus, "doc_id", "text", topNs = ns, dupNs = ns)
    val spec = graft.ext.TextAnalysis.repetitionSignalsHof(
      corpus, "doc_id", "text", topNs = ns, dupNs = ns)
    assert(fast.columns.toSeq === spec.columns.toSeq)
    val f = fast.orderBy("doc_id").collect().map(_.toSeq)
    val h = spec.orderBy("doc_id").collect().map(_.toSeq)
    assert(f.toSeq === h.toSeq)
  }

  test("c4CleanLines: line predicate + page gates, hand document") {
    val text = "This is a good sentence.\nshort.\nno terminal punctuation here\n" +
      "Please enable JavaScript to continue.\nAnother keeper line!\n" +
      "Quote ends well they said \""
    val corpus = Seq((1L, text), (2L, "Fine line stays here.\nsee { code }"),
      (3L, "Lorem Ipsum dolor sit amet.")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.c4CleanLines(corpus, "doc_id", "text")
      .as[(Long, Long, Long, String, Boolean)].collect().map(r => r._1 -> r).toMap
    // doc 1: 6 lines; kept = good sentence, keeper line, quote line
    assert(out(1L)._2 === 6L && out(1L)._3 === 3L)
    assert(out(1L)._4 === "This is a good sentence.\nAnother keeper line!\n" +
      "Quote ends well they said \"")
    assert(out(1L)._5 === true)
    // doc 2: brace kills the page even though a line survives
    assert(out(2L)._3 === 1L && out(2L)._5 === false)
    // doc 3: lorem ipsum page gate (case-insensitive)
    assert(out(3L)._5 === false)
  }

  test("bigramLogProb: single-token and empty docs drop; repeated bigrams count") {
    val corpus = Seq((1L, "x x x"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bigramLogProb(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet === Set(1L)) // docs 2 and 3 have no bigrams
    assert(out(1L)._1 === 2L)
  }

  test("repeatedShingleStats flags a planted cross-doc boilerplate span only") {
    val boiler = "terms of service apply to all users"
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon $boiler"),
      (2L, s"one two three four five six $boiler"),
      (3L, "completely unrelated text with enough tokens here"),
      (4L, "tiny doc") // < 5 tokens: (0, 0) row, not dropped
    ).toDF("doc_id", "text")
    val out = graft.ext.Dedup.repeatedShingleStats(corpus, "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(4L) === ((0L, 0L)))
    assert(out(3L)._2 === 0L)              // unique doc: nothing repeated
    assert(out(1L)._2 === 3L)              // the 7-token planted span = 3 shared 5-grams
    assert(out(2L)._2 === 3L)
    assert(out(1L)._1 > out(1L)._2)        // its unique prefix shingles stay unrepeated
  }

  test("phraseSearch: consecutive positions only, repeated-term phrases exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c"),     // "a b" twice
      (2L, "a c b"),           // both terms, never adjacent
      (3L, "b a"),             // reversed — no match
      (4L, "x a b y a b a b") // three occurrences
    ).toDF("doc_id", "text")
    val r = graft.ext.Search.phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(r.toSeq === Seq((1L, 2L), (4L, 3L)))
    // duplicate term in the phrase: "the cat the" needs BOTH 'the' offsets
    val docs2 = Seq(
      (1L, "the cat the dog"),   // match at 0
      (2L, "the cat cat the"),   // 'the cat' then gap — no
      (3L, "cat the cat the cat")// match at 1
    ).toDF("doc_id", "text")
    val r2 = graft.ext.Search.phraseSearch(docs2, "doc_id", "text",
        Seq("the", "cat", "the"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(r2.toSeq === Seq((1L, 1L), (3L, 1L)))
  }
}
