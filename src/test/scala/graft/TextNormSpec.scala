package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextNorm, TextNormLoops}
import org.apache.spark.unsafe.types.UTF8String

/** CCNet-style dedup normalization (TextNorm). */
class TextNormSpec extends SparkTestBase {
  import spark.implicits._

  private def strip(s: String): String =
    TextNormLoops.stripAccents(UTF8String.fromString(s)).toString

  test("stripAccents kernel: Latin accents fold, non-Latin passes through") {
    assert(strip("café") == "cafe")
    assert(strip("Müller señor Škoda") == "Muller senor Skoda")
    assert(strip("naïve coördinate") == "naive coordinate")
    assert(strip("日本語 текст") == "日本語 текст") // no combining marks
    assert(strip("") == "")
  }

  test("stripAccents ASCII fast path returns the input unchanged") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(TextNormLoops.stripAccents(in) eq in)
  }

  test("stripAccents column: codegen path agrees with the kernel, null-safe") {
    val df = Seq(Some("Crème Brûlée"), Some("ascii"), None).toDF("t")
      .select(TextNorm.stripAccents(col("t")).as("s"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("Creme Brulee"), Some("ascii"), None))
  }

  test("normalizeForDedup: full chain hand cases") {
    val cases = Seq(
      "Héllo,  World 42!" -> "hello world 00",
      "  A—B…C  " -> "a b c",
      "v2.0 ≠ V3.1" -> "v0 0 v0 0",
      "UPPER lower" -> "upper lower",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(TextNorm.normalizeForDedup(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("normalized key collapses trivial variants under exact dedup") {
    val docs = Seq(
      (1L, "The quick brown fox!"),
      (2L, "the Quick  Brown FOX"),   // same after normalization
      (3L, "Thé qüick brown fox."),   // accents fold too
      (4L, "a different document")
    ).toDF("doc_id", "text")
      .withColumn("k", TextNorm.normalizeForDedup(col("text")))
    val kept = Dedup.exact(docs, Seq("k"), "doc_id")
      .select("first_doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"got $kept")
  }

  test("stripHtml: elements dropped, structure to newlines, entities decoded") {
    def strip(s: String): String =
      Seq(s).toDF("t").select(TextNorm.stripHtml(col("t"))).head().getString(0)
    assert(strip("<p>Hello <b>world</b></p>") === "Hello world")
    // script/style content is NOT prose — dropped wholesale, any case
    assert(strip("a<SCRIPT src='x'>var y = '<p>no</p>';</script>b") === "a b")
    assert(strip("a<style>p { c: red }</style>b") === "a b")
    assert(strip("a<!-- hidden <p>x</p> -->b") === "a b")
    // block tags become line structure; inline tags vanish
    assert(strip("<h1>Title</h1><p>One</p><p>Two <i>it</i></p>") ===
      "Title\nOne\nTwo it")
    // entity decode order: &amp; LAST, so double escapes stay escaped
    assert(strip("x &lt;tag&gt; &quot;q&quot; &amp;amp; &nbsp;y") ===
      "x <tag> \"q\" &amp; y")
    // whitespace folding + trim
    assert(strip("  <div>  a   b  </div>  <br>  <br> c ") === "a b\nc")
  }
}
