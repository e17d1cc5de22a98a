package graft

import org.apache.spark.sql.functions._
import graft.ext.{Robots, RobotsLoops}

/** RFC 9309 semantics coverage for the robots.txt gate: group
  * selection, longest-match with Allow tie-wins, `*`/`$` patterns,
  * and the frame-level host join. */
class RobotsSpec extends SparkTestBase {

  import spark.implicits._

  private val body =
    """# example robots.txt
      |User-agent: crawler-x
      |Disallow: /private/
      |Allow: /private/ok
      |
      |User-agent: *
      |Disallow: /tmp/
      |Disallow: /*.pdf$
      |Allow: /tmp/keep
      |""".stripMargin

  private def allowed(b: String, agent: String, path: String): Boolean =
    RobotsLoops.decide(RobotsLoops.selectRules(b, agent), path)

  test("group selection: specific agent beats *, case-insensitive, substring token") {
    assert(RobotsLoops.selectRules(body, "Crawler-X/2.0").toSeq ===
      Seq((false, "/private/"), (true, "/private/ok")))
    assert(RobotsLoops.selectRules(body, "other-bot").toSeq ===
      Seq((false, "/tmp/"), (false, "/*.pdf$"), (true, "/tmp/keep")))
  }

  test("longest-match decision; Allow wins ties; default allow") {
    assert(allowed(body, "crawler-x", "/public/page") === true)   // no rule matches
    assert(allowed(body, "crawler-x", "/private/doc") === false)
    assert(allowed(body, "crawler-x", "/private/ok/doc") === true) // longer Allow
    assert(allowed(body, "other", "/tmp/junk") === false)
    assert(allowed(body, "other", "/tmp/keep/this") === true)
    // equal-length Allow and Disallow → Allow wins
    val tie = "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    assert(allowed(tie, "any", "/a/x") === true)
  }

  test("wildcard runs and end anchors") {
    assert(allowed(body, "other", "/docs/report.pdf") === false)   // /*.pdf$
    assert(allowed(body, "other", "/docs/report.pdfx") === true)   // anchor blocks
    val pat = "User-agent: *\nDisallow: /a/*/deep\n"
    assert(allowed(pat, "x", "/a/b/deep/file") === false)
    assert(allowed(pat, "x", "/a/deep") === true)                  // '*' needs a segment? no — matches empty
  }

  test("star matches empty; multiple user-agent lines share a group; empty Disallow allows all") {
    val pat = "User-agent: *\nDisallow: /a*b\n"
    assert(RobotsLoops.patMatches("/a*b", "/ab") === true)         // '*' matches empty run
    assert(allowed(pat, "x", "/ab/c") === false)
    val multi = "User-agent: bot-a\nUser-agent: bot-b\nDisallow: /x/\n"
    assert(allowed(multi, "bot-b/1.0", "/x/1") === false)
    assert(allowed(multi, "bot-c", "/x/1") === true)               // no group → allow
    assert(allowed("User-agent: *\nDisallow:\n", "any", "/every/where") === true)
  }

  test("gateUrls: per-host rules broadcast-joined; absent robots allows") {
    val robots = Seq(
      ("a.example.com", body),
      ("b.example.com", "User-agent: *\nDisallow: /\n")).toDF("host", "body")
    val urls = Seq(
      (1L, "https://a.example.com/tmp/junk"),
      (2L, "https://a.example.com/tmp/keep/x"),
      (3L, "https://b.example.com/anything"),
      (4L, "https://c.example.com/no/robots"),
      (5L, "https://a.example.com")).toDF("id", "url")
    val out = Robots.gateUrls(urls, "url", robots, "host", "body")
      .select("id", "crawl_allowed").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false, 4L -> true, 5L -> true))
  }

  test("urlPath: scheme/authority stripped, root default, query kept") {
    val got = Seq(
      "https://h.com/a/b?q=1", "http://h.com", "h.com/x", "https://h.com/")
      .toDF("u").select(Robots.urlPath(col("u"))).as[String].collect().toSeq
    assert(got === Seq("/a/b?q=1", "/", "/x", "/"))
  }
}
