package graft

import org.apache.spark.sql.functions._
import graft.ext.TextHash

/** The SQL surface of the custom kernels (GraftExtensions
  * injectFunction): spark.sql users must get the SAME codegen
  * expressions the Scala API builds — each test cross-checks the SQL
  * name against its Column-API twin. */
class SqlFunctionsSpec extends SparkTestBase {

  import spark.implicits._

  test("text kernels by SQL name ≡ Column API") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    df.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT char_hash(text) AS ch, word_hashes(text) AS wh,
        |  shingle_hashes(word_hashes(text), 3) AS sh,
        |  minhash_sig(word_hashes(text), 4) AS mh,
        |  oph_sig(word_hashes(text), 8) AS oph,
        |  simhash(word_hashes(text), 16) AS sim,
        |  char_hash64(text) AS fp
        |FROM sqlfn_docs""".stripMargin).head()
    val viaApi = df.select(
      TextHash.charHash(col("text")).as("ch"),
      TextHash.wordHashes(col("text")).as("wh"),
      TextHash.shingleHashes(TextHash.wordHashes(col("text")), 3).as("sh"),
      TextHash.minhashSignature(TextHash.wordHashes(col("text")), 4).as("mh"),
      TextHash.ophSignature(TextHash.wordHashes(col("text")), 8).as("oph"),
      TextHash.simhash(TextHash.wordHashes(col("text")), 16).as("sim"),
      TextHash.fingerprint(col("text")).as("fp")).head()
    assert(viaSql === viaApi)
  }

  test("jaccard_sim in SQL; >= literal threshold fires the fused rewrite") {
    val j = spark.sql(
      "SELECT jaccard_sim(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j").head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
    // a FILE source, not a local relation: ConvertToLocalRelation would
    // otherwise evaluate the projection at plan time and hide whether
    // the rewrite fired
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5)
      .createOrReplaceTempView("sqlfn_docs2")
    val pred = spark.sql(
      """SELECT jaccard_sim(shingle_hashes(word_hashes(text), 3),
        |                   shingle_hashes(word_hashes(text), 3)) >= 0.5 AS hit
        |FROM sqlfn_docs2""".stripMargin)
    assert(pred.queryExecution.executedPlan.toString.toLowerCase.contains("jaccard_gte"),
      "optimizer rule did not rewrite the SQL-authored predicate")
    assert(pred.collect().forall(_.getBoolean(0))) // self-similarity = 1
  }

  test("aggregates by SQL name: heavy_hitters and gramian") {
    Seq("a", "a", "a", "b", "c").toDF("w").createOrReplaceTempView("sqlfn_words")
    val hh = spark.sql("SELECT heavy_hitters(w, 3) AS top FROM sqlfn_words")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(hh.head.getString(0) === "a")
    Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v").createOrReplaceTempView("sqlfn_vecs")
    val g = spark.sql("SELECT gramian(v) AS g FROM sqlfn_vecs").head().getSeq[Double](0)
    assert(g === Seq(10.0, 14.0, 20.0)) // [1+9, 2+12, 4+16]
  }

  test("vec_dotq and bpe kernels by SQL name ≡ Column API") {
    val dq = spark.sql(
      "SELECT vec_dotq(array(CAST(1 AS TINYINT), CAST(-2 AS TINYINT)), array(3L, 4L)) AS d")
      .head().getLong(0)
    assert(dq === 1L * 3 - 2 * 4)
    Seq((1L, "the data join th")).toDF("id", "text")
      .createOrReplaceTempView("sqlfn_bpe")
    val merges = graft.ext.Bpe.demoMerges.map { case (l, r) => s"'$l $r'" }.mkString(", ")
    val viaSql = spark.sql(
      s"""SELECT bpe_count(text, array($merges)) AS n,
         |  bpe_tokens(text, array($merges)) AS toks
         |FROM sqlfn_bpe""".stripMargin).head()
    val viaApi = spark.table("sqlfn_bpe").select(
      graft.ext.Bpe.tokenCount(col("text"), graft.ext.Bpe.demoMerges).as("n"),
      graft.ext.Bpe.tokens(col("text"), graft.ext.Bpe.demoMerges).as("toks")).head()
    assert(viaSql === viaApi)
    assert(viaSql.getLong(0) === 4L) // the, data, join, th — all fully merged
  }

  test("term_freqs by SQL name ≡ Column API") {
    Seq((1L, "b a b c b a")).toDF("id", "text")
      .createOrReplaceTempView("sqlfn_tf")
    val viaSql = spark.sql(
      "SELECT term_freqs(split(text, ' ')) AS tf FROM sqlfn_tf").head()
    val viaApi = spark.table("sqlfn_tf")
      .select(graft.ext.Search.termFreqs(split(col("text"), " ")).as("tf")).head()
    assert(viaSql === viaApi)
    assert(viaSql.getSeq[org.apache.spark.sql.Row](0).map(r =>
      (r.getString(0), r.getLong(1))) === Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("gt_stats by SQL name on a genotype array") {
    Seq((1L, Seq(Seq(0, 1), Seq(1, 1), Seq(-1, -1)))).toDF("vid", "gt")
      .createOrReplaceTempView("sqlfn_gt")
    val r = spark.sql("SELECT gt_stats(gt, 2) AS s FROM sqlfn_gt")
      .select("s.*").head()
    // 2 called samples of 3; alleles: one 0, three 1
    assert(r.getAs[Long]("n_called") === 2L)
    assert(r.getAs[Seq[Long]]("counts") === Seq(1L, 3L))
  }

  test("ct_lang_id / ct_lang_dists by SQL name ≡ Column API") {
    Seq((1L, "the quick brown fox waits for the morning train"),
      (2L, "der schnelle braune fuchs wartet auf den zug am morgen"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
      .createOrReplaceTempView("sqlfn_lang")
    val viaSql = spark.sql(
      "SELECT id, ct_lang_id(text) AS p, ct_lang_dists(text) AS d " +
        "FROM sqlfn_lang ORDER BY id").collect()
    val viaApi = spark.table("sqlfn_lang")
      .select(col("id"), graft.ext.LangId.langIdCt(col("text")).as("p"),
        graft.ext.LangId.distances(lower(col("text"))).as("d"))
      .orderBy("id").collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      assert(s.getString(1) === a.getString(1))
      assert(s.getSeq[Long](2) === a.getSeq[Long](2))
    }
    assert(viaSql(0).getString(1) === "en")
    assert(viaSql(1).getString(1) === "de")
    assert(viaSql(2).getString(1) === "und")
    assert(viaSql(0).getSeq[Long](2).length === graft.ext.LangId.profiles.length)
  }

  test("strip_accents by SQL name ≡ Column API, null-safe") {
    Seq((1L, "Crème Brûlée"), (2L, "ascii"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t").createOrReplaceTempView("sqlfn_norm")
    val viaSql = spark.sql(
      "SELECT id, strip_accents(t) AS s FROM sqlfn_norm ORDER BY id")
      .collect().map(r => Option(r.getString(1))).toSeq
    val viaApi = spark.table("sqlfn_norm")
      .select(graft.ext.TextNorm.stripAccents(col("t")).as("s"))
      .orderBy(col("s").asc_nulls_last).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(viaSql == Seq(Some("Creme Brulee"), Some("ascii"), None))
    assert(viaApi.toSet == viaSql.toSet)
  }

  test("unigram kernels by SQL name ≡ Column API") {
    Seq((1L, "the data join")).toDF("id", "text")
      .createOrReplaceTempView("sqlfn_ug")
    val pieces = graft.ext.Unigram.demoPieces
    val piecesSql = pieces.map { case (p, c) => s"'$p $c'" }.mkString(", ")
    val viaSql = spark.sql(
      s"""SELECT unigram_count(text, array($piecesSql)) AS n,
         |  unigram_tokens(text, array($piecesSql)) AS toks,
         |  unigram_score(text, array($piecesSql)) AS sc
         |FROM sqlfn_ug""".stripMargin).head()
    val viaApi = spark.table("sqlfn_ug").select(
      graft.ext.Unigram.tokenCount(col("text"), pieces).as("n"),
      graft.ext.Unigram.tokens(col("text"), pieces).as("toks"),
      graft.ext.Unigram.score(col("text"), pieces).as("sc")).head()
    assert(viaSql === viaApi)
    assert(viaSql.getSeq[String](1) === Seq("the", "data", "join"))
  }

  test("phrase kernels by SQL name ≡ Column API (multi-word phrases survive)") {
    Seq((1L, "the table scan beats the index scan")).toDF("id", "text")
      .createOrReplaceTempView("sqlfn_ph")
    val phrases = Seq("the", "table scan", "scan")
    val phSql = phrases.map(p => s"'$p'").mkString(", ")
    val viaSql = spark.sql(
      s"""SELECT phrase_counts(text, array($phSql)) AS c,
         |  phrase_any(text, array($phSql)) AS a,
         |  phrase_total(text, array($phSql)) AS t
         |FROM sqlfn_ph""".stripMargin).head()
    val viaApi = spark.table("sqlfn_ph").select(
      graft.ext.PhraseMatch.counts(col("text"), phrases).as("c"),
      graft.ext.PhraseMatch.containsAny(col("text"), phrases).as("a"),
      graft.ext.PhraseMatch.totalCount(col("text"), phrases).as("t")).head()
    assert(viaSql === viaApi)
    assert(viaSql.getSeq[Long](0) === Seq(2L, 1L, 2L))
    assert(viaSql.getBoolean(1) && viaSql.getLong(2) === 5L)
  }
}
