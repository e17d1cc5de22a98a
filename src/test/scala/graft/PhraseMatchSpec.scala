package graft

import org.apache.spark.sql.functions._
import graft.ext.{AcLoops, PhraseMatch}

/** Differential coverage for the Aho-Corasick blocklist kernel: the
  * automaton must agree with an INDEPENDENT brute-force sliding-window
  * reference on every occurrence — overlapping, self-overlapping, and
  * nested-phrase cases included. */
class PhraseMatchSpec extends SparkTestBase {

  import spark.implicits._

  /** Brute force: count every start position where the phrase matches
    * (overlapping included) — indexOf walk, no automaton. */
  private def refCount(text: String, p: String): Long = {
    var n = 0L
    var i = text.indexOf(p)
    while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) }
    n
  }

  private def kernelCounts(text: String, phrases: Seq[String]): Seq[Long] = {
    val ac = AcLoops.build(phrases)
    AcLoops.counts(text, ac).toLongArray().toSeq
  }

  test("kernel ≡ brute force on hand cases incl. overlap and nesting") {
    val cases = Seq(
      ("the theme of the day", Seq("the", "theme", "he")),
      ("ababa", Seq("aba", "ab", "ba")),        // self-overlapping matches
      ("aaaa", Seq("a", "aa", "aaa")),          // nested + overlapping
      ("no hits here", Seq("xyz", "qqq")),
      ("", Seq("a")),
      ("of the people for the people", Seq("of the", "the people", "people")))
    for ((text, phrases) <- cases) {
      val got = kernelCounts(text, phrases)
      val want = phrases.map(refCount(text, _))
      assert(got === want, s"text='$text' phrases=$phrases")
    }
  }

  test("kernel ≡ brute force on random dictionaries (differential)") {
    val rng = new scala.util.Random(7)
    val alpha = "abc"
    for (trial <- 1 to 30) {
      val phrases = (1 to 1 + rng.nextInt(6)).map { _ =>
        (1 to 1 + rng.nextInt(4)).map(_ => alpha(rng.nextInt(3))).mkString
      }.distinct
      val text = (1 to rng.nextInt(40)).map(_ => alpha(rng.nextInt(3))).mkString
      val got = kernelCounts(text, phrases)
      val want = phrases.map(refCount(text, _))
      assert(got === want, s"trial $trial text='$text' phrases=$phrases")
      val ac = AcLoops.build(phrases)
      assert(AcLoops.containsAny(text, ac) === want.exists(_ > 0))
      assert(AcLoops.totalCount(text, ac) === want.sum)
    }
  }

  test("column API: counts/totalCount/containsAny agree through codegen") {
    val phrases = Seq("the", "data", "of the")
    val df = Seq("the data of the house", "nothing relevant", "data data data")
      .toDF("text")
    val rows = df.select(
      PhraseMatch.counts(col("text"), phrases).as("c"),
      PhraseMatch.totalCount(col("text"), phrases).as("t"),
      PhraseMatch.containsAny(col("text"), phrases).as("a")).collect()
    for (r <- rows) {
      val c = r.getSeq[Long](0)
      assert(c.sum === r.getLong(1))
      assert(c.exists(_ > 0) === r.getBoolean(2))
    }
    assert(rows(0).getSeq[Long](0) === Seq(2L, 1L, 1L))
    assert(rows(1).getSeq[Long](0) === Seq(0L, 0L, 0L))
    assert(rows(2).getSeq[Long](0) === Seq(0L, 3L, 0L))
  }

  test("blockByPhrases: drops matching docs, keeps null text") {
    val df = Seq(
      (1L, "totally fine prose"),
      (2L, "contains the banned phrase here"),
      (3L, null.asInstanceOf[String]),
      (4L, "banned")).toDF("doc_id", "text")
    val kept = PhraseMatch.blockByPhrases(df, "text", Seq("banned phrase", "banned"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L))
  }

  test("dictionary scale smoke: 5k phrases, one pass, counts correct on planted hits") {
    val phrases = (1 to 5000).map(i => s"phrase$i xx$i")
    val text = s"prefix ${phrases(1234)} middle ${phrases(4999)} ${phrases(1234)} end"
    val ac = AcLoops.build(phrases)
    val c = AcLoops.counts(text, ac).toLongArray()
    assert(c(1234) === 2L && c(4999) === 1L)
    assert(c.sum === 3L)
  }
}
