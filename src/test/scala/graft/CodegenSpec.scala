package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.debug._
import graft.ext.TextHash
import graft.operators.{Filters, Stats}

/** Guards against SILENT codegen fallback: Janino failures in custom
  * expressions don't fail queries (Spark falls back to interpreted eval
  * and only logs), so a template typo costs 10-100× quietly — exactly
  * what happened with MaskGt's '||' continuation line. These tests
  * assert every whole-stage subtree of plans using our expressions
  * actually compiled (maxMethodCodeSize == -1 marks a failed subtree). */
class CodegenSpec extends SparkTestBase {

  import spark.implicits._

  private def assertCompiles(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val s = codegenString(df.queryExecution.executedPlan)
    assert(!s.contains("maxMethodCodeSize:-1"),
      s"$what: a whole-stage subtree failed to compile\n" + s.linesIterator.take(8).mkString("\n"))
    assert(s.contains("WholeStageCodegen subtrees"), s"$what: no codegen at all?")
  }

  test("gt_stats + mask_gt + filter pipeline compiles") {
    val df = Filters.maskByDepth(GoldenFixture.df(spark), 5)
      .filter(Filters.byCallRate(0.5) && Filters.byMaf(max = 0.95))
    assertCompiles(df, "mask+filter")
  }

  test("variantStats plan compiles") {
    assertCompiles(Stats.variantStats(GoldenFixture.df(spark)), "variantStats")
  }

  test("vector expressions compile") {
    val df = Seq((1L, Array(1.0f, 2.0f), Array(0.5f, 0.25f)))
      .toDF("id", "va", "vb")
      .select(
        graft.ext.Similarity.dot(col("va"), col("vb")).as("d"),
        graft.ext.Similarity.lshBucket(col("va"), dim = 2, bits = 4).as("b"))
    assertCompiles(df, "vector-kernels")
  }

  test("text hash expressions compile") {
    val docs = Seq((1L, "the cat sat"), (2L, "a b c d e")).toDF("doc_id", "text")
    val df = docs
      .withColumn("whs", TextHash.wordHashes(col("text")))
      .select(
        col("doc_id"),
        TextHash.fingerprint(col("text")).as("fp"),
        TextHash.shingleHashes(col("whs")).as("sh"),
        TextHash.bandKeys64(
          TextHash.minhashSignature(col("whs"), 8), 4).as("bk"))
    assertCompiles(df, "text-hash")
  }

  test("round-4 fused kernels compile (jaccard, lang scores, simhash, minhash, mode)") {
    import graft.ext.TextAnalysis
    val docs = Seq((1L, "the cat sat the"), (2L, "der und ist x")).toDF("doc_id", "text")
    val df = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("whs", TextHash.wordHashes(col("text")))
      .select(
        col("doc_id"),
        TextHash.jaccard(col("whs"), col("whs")).as("j"),
        TextAnalysis.langScoresOf(col("toks")).as("ls"),
        TextHash.simhash(col("whs")).as("sim"),
        TextHash.minhashSignature(col("whs"), 8).as("sig"),
        TextAnalysis.topTokenCountOf(col("toks")).as("topc"))
    assertCompiles(df, "round-4-kernels")
    // the early-exit predicate form (rule-rewritten) must also compile
    val pred = docs
      .withColumn("whs", TextHash.wordHashes(col("text")))
      .filter(TextHash.jaccard(col("whs"), col("whs")) >= 0.5)
    assertCompiles(pred, "jaccard-gte")
  }

  test("centered_dosages kernel compiles") {
    val gt = Seq(
      (1L, Seq(Seq(0, 1), Seq(1, 1), Seq(-1, -1))),
      (2L, Seq(Seq(0, 0), Seq(0, 1), Seq(1, 0)))).toDF("vid", "gt")
    assertCompiles(graft.operators.Kinship.centeredDosages(gt, "gt"),
      "centered-dosages")
  }

  test("term_freqs kernel compiles and matches its HOF twin bit-for-bit") {
    val docs = Seq((1L, "the cat sat the cat the"), (2L, "a"), (3L, ""),
      (4L, "x y x y x z")).toDF("doc_id", "text")
    val toked = docs.withColumn("toks", split(col("text"), " "))
    assertCompiles(toked.select(graft.ext.Search.termFreqs(col("toks")).as("tf")),
      "term-freqs")
    val fused = toked.select(col("doc_id"),
        graft.ext.Search.termFreqs(col("toks")).as("tf"))
      .as[(Long, Seq[(String, Long)])].collect().toMap
    val hof = toked.select(col("doc_id"),
        graft.ext.Search.termFreqsHof(col("toks")).as("tf"))
      .as[(Long, Seq[(String, Long)])].collect().toMap
    assert(fused === hof) // values AND first-occurrence order
    assert(fused(1L) === Seq(("the", 3L), ("cat", 2L), ("sat", 1L)))
    // null-token edge: HOF emits (null, 0) once; the kernel must agree
    val withNull = Seq(Tuple1(Seq("a", null, "a", null, "b"))).toDF("toks")
    val f2 = withNull.select(graft.ext.Search.termFreqs(col("toks")).as("tf"))
      .as[Seq[(Option[String], Long)]].head()
    val h2 = withNull.select(graft.ext.Search.termFreqsHof(col("toks")).as("tf"))
      .as[Seq[(Option[String], Long)]].head()
    assert(f2 === h2)
    assert(f2 === Seq((Some("a"), 2L), (None, 0L), (Some("b"), 1L)))
  }

  test("Cavnar-Trenkle kernels compile (distances array + one-shot lang id)") {
    import graft.ext.LangId
    val docs = Seq((1L, "the cat sat on the old bridge"),
      (2L, "der hund wartet in der küche")).toDF("doc_id", "text")
    assertCompiles(docs.select(LangId.distances(lower(col("text"))).as("d")),
      "ct-lang-dists")
    val oneShot = docs.select(col("doc_id"),
      org.apache.spark.sql.graft.bridge.column(
        graft.ext.CtLangIdExpr(
          org.apache.spark.sql.graft.bridge.expression(col("text")),
          LangId.profiles.toIndexedSeq, LangId.NMax, LangId.TopK)).as("p"))
    assertCompiles(oneShot, "ct-lang-id")
    // the one-shot kernel agrees with the Column-API composition
    val composed = docs.select(col("doc_id"), LangId.langIdCt(col("text")).as("p"))
    assert(oneShot.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      composed.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("round-11 late-wave kernels compile (unigram, phrase, bpe, robots)") {
    val docs = Seq((1L, "the data join table scan"),
      (2L, "sort merge order by")).toDF("doc_id", "text")
    val phrases = Seq("the", "table scan", "order")
    val df = docs.select(
      col("doc_id"),
      graft.ext.Unigram.score(col("text"), graft.ext.Unigram.demoPieces).as("us"),
      graft.ext.Unigram.tokenCount(col("text"), graft.ext.Unigram.demoPieces).as("uc"),
      graft.ext.PhraseMatch.counts(col("text"), phrases).as("pc"),
      graft.ext.PhraseMatch.containsAny(col("text"), phrases).as("pa"),
      graft.ext.Bpe.tokenCount(col("text"), graft.ext.Bpe.demoMerges).as("bc"))
    assertCompiles(df, "late-wave-kernels")
    val robots = Seq(("h.com", "User-agent: *\nDisallow: /x/\n"))
      .toDF("host", "body")
    val rdf = robots.select(
      graft.ext.Robots.rulesFor(col("body"), "*").as("r"))
      .select(graft.ext.Robots.allowedBy(col("r"), lit("/x/page")).as("a"))
    assertCompiles(rdf, "robots-kernels")
    assert(rdf.head().getBoolean(0) === false)
  }
}
