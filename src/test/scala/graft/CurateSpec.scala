package graft

import org.apache.spark.sql.functions._
import graft.ext.{Curate, Dedup}

/** The one-call curation facade: each configured stage must observably
  * act on a planted fixture, and the default config must reduce to the
  * bare DocPipeline.prepare result. */
class CurateSpec extends SparkTestBase {

  import spark.implicits._

  private def filler(tag: String) =
    Array.tabulate(40)(i => s"$tag${i}x").mkString(" ")

  test("default config ≡ DocPipeline.prepare") {
    val docs = Seq(
      (1L, filler("a")), (2L, filler("b")), (3L, filler("a"))).toDF("doc_id", "text")
    val a = Curate.run(docs, Curate.Config(minWords = 10))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = graft.ext.DocPipeline.prepare(docs, minWords = 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
    assert(a === Seq(1L, 2L)) // exact dup 3 collapsed into 1
  }

  test("every stage acts: html, domains, robots, sentence dedup, phrases, decontamination") {
    val base = (1L to 8L).map { i =>
      val url = s"https://h${i % 2}.example/p/$i"
      (i, url, s"<p>${filler(s"d$i")}</p>")
    }.toDF("doc_id", "url", "html")
      .withColumn("text", col("html"))
    val robots = Seq(("h0.example", "User-agent: *\nDisallow: /p/4\n"))
      .toDF("host", "body")
    val bench = Seq((99L, filler("d7"))).toDF("doc_id", "text")
    val cfg = Curate.Config(
      htmlInput = true,
      urlCol = Some("url"),
      blockedDomains = Seq("h1.example"),      // drops odd ids (1,3,5,7)
      robots = Some(robots),                   // drops id 4 (/p/4 on h0)
      sentenceDedup = true,                    // no-op here (all distinct)
      blockPhrases = Seq("d610x d611x"),       // two adjacent tokens of doc 6
      minWords = 10,
      benchmark = Some(bench))                 // would drop 7 — already domain-blocked
    val kept = Curate.run(base, cfg).select("doc_id").as[Long].collect().sorted
    // survivors: even ids minus robots-blocked 4 minus phrase-blocked 6
    assert(kept.toSeq === Seq(2L, 8L))
    // html actually stripped: surviving text carries no markup
    val texts = Curate.run(base, cfg).select("text").as[String].collect()
    assert(texts.forall(t => !t.contains("<p>") && !t.contains("</p>")))
  }

  test("dsirTarget stage: selection keeps the target-like survivors, budget honored") {
    // 10 on-topic docs + 30 off-topic docs. Each doc is 2/3 UNIQUE
    // filler (so the funnel's near-dup stage keeps them all — a
    // shared-vocab fixture collapses to one survivor per class) and
    // 1/3 class vocabulary (concentrated: topical "scienceN" vs junk
    // "junkN"); target = pure topical prose. DSIR must pick exactly
    // the on-topic docs for a budget of 10.
    def mixed(i: Long, cls: Int => String) =
      (1 to 30).map(j =>
        if (j % 3 == 0) cls((i.toInt * 7 + j) % 12) else s"u${i}x$j").mkString(" ")
    val docs = ((1L to 10L).map(i => (i, mixed(i, n => s"science$n"))) ++
      (11L to 40L).map(i => (i, mixed(i, n => s"junk${n % 9}"))))
      .toDF("doc_id", "text")
    val target = (100L to 140L).map(i =>
      (1 to 30).map(j => s"science${(i * 7 + j) % 12}").mkString(" ")).toDF("text")
    val out = Curate.run(docs, Curate.Config(minWords = 10,
      dsirTarget = Some(target), dsirKeep = 10, dsirBuckets = 512))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept === (1L to 10L).toSet, s"got $kept")
    // importance log-weight rides along for inspection
    assert(out.columns.contains("dsir_lw6"))
    // config guard: target without a budget is an error
    assertThrows[IllegalArgumentException] {
      Curate.run(docs, Curate.Config(minWords = 10, dsirTarget = Some(target)))
    }
  }

  test("htmlInput preserves stripHtml's line structure for lineDedup: nav boilerplate cut per line, docs survive") {
    // the regression: folding stripHtml's newlines to spaces BEFORE
    // lineDedup left one line per doc, degenerating the configured
    // line-level boilerplate removal to whole-document dedup — the
    // repeated nav banner would have survived inside every page
    val nav = "Home About Products Contact Login Cookie notice accepted here"
    val docs = (1L to 3L).map { i =>
      (i, s"<div>$nav</div><p>${filler(s"u$i")}</p>")
    }.toDF("doc_id", "text")
    val out = Curate.run(docs,
        Curate.Config(htmlInput = true, lineDedup = true, minWords = 10))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L), s"all pages distinct: ${out.keySet}")
    // first holder keeps the banner, every later page drops ONLY it
    assert(out(1L).contains("Cookie notice"))
    assert(!out(2L).contains("Cookie notice") && out(2L).contains("u21x"))
    assert(!out(3L).contains("Cookie notice") && out(3L).contains("u31x"))
    // and the gates downstream saw flattened prose (no newlines leak)
    assert(out.values.forall(t => !t.contains("\n")))
  }

  test("sentence dedup stage feeds the pipeline: boilerplate cut before near-dup") {
    val boiler = "This site uses cookies and trackers everywhere always."
    val docs = Seq(
      (1L, s"${filler("p")}. $boiler"),
      (2L, s"${filler("q")}. $boiler"),
      (3L, s"${filler("r")}. $boiler")).toDF("doc_id", "text")
    val out = Curate.run(docs,
      Curate.Config(sentenceDedup = true, minWords = 10))
    val texts = out.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(texts.keySet === Set(1L, 2L, 3L))
    assert(texts(1L).contains("cookies"))           // first holder keeps it
    assert(!texts(2L).contains("cookies") && !texts(3L).contains("cookies"))
    // parity with calling the operator directly then preparing
    val manual = graft.ext.DocPipeline.prepare(
      docs.drop("text").join(
        Dedup.sentenceDedup(docs, "doc_id", "text")
          .select(col("doc_id"), coalesce(col("text_kept"), lit("")).as("text")),
        Seq("doc_id")),
      minWords = 10)
    assert(out.select("doc_id", "text").collect().toSet ===
      manual.select("doc_id", "text").collect().toSet)
  }

  test("banding df-guard is ON by default at the facade and wires through " +
      "to DocPipeline (boilerplate-saturated plants recovered)") {
    // the facade is the web-corpus entry point: its default must be a
    // finite cap (uncapped is the explicit opt-out)
    assert(Curate.Config().maxSignatureDf === 100000L)
    // NearDupSpec's saturation fixture at facade level: a 40-token
    // footer on every doc hubs the banding; a finite cap (here scaled
    // to the fixture's 30 docs) restores every planted pair
    val footer = (1 to 40).map(i => s"footer$i").mkString(" ")
    def uniq(d: Int) = (1 to 12).map(j => s"u${d}x$j").mkString(" ")
    val docs = ((0 until 30).map { d =>
      val body = if (d % 3 == 1) uniq(d - 1) + " zz" else uniq(d)
      (d.toLong, s"$body $footer")
    }).toDF("doc_id", "text")
    val plants = (0 until 30).filter(_ % 3 == 1).map(_.toLong).toSet
    val kept = Curate.run(docs,
        Curate.Config(minWords = 10, tau = 0.7, maxSignatureDf = 20L))
      .select("doc_id").as[Long].collect().toSet
    assert(plants.forall(p => !kept.contains(p)))
    assert(kept.size === 20)
  }

  test("sentence dedup upstream of near-dup CONSUMES shared content: the " +
      "near-dup survives as its unique residual (10M-rehearsal ordering finding)") {
    // template (10) and near-dup (11) share three 8-token sentences;
    // the near-dup's last sentence differs by one token. Without
    // sentence dedup the near-dup stage drops doc 11 (shingle jaccard
    // ≥ τ); with sentence dedup ON, the shared sentences are CUT from
    // doc 11 first, near-dup sees only the unique remnant, and doc 11
    // correctly survives — span-level removal has already done the
    // deduplication. Both outcomes are designed; the order chooses
    // between document-level and span-level dedup semantics.
    def sent(tag: String, n: Int) =
      (1 to 8).map(j => s"${tag}$j").mkString(" ") + "."
    val shared = (1 to 3).map(k => sent(s"s${k}x", 8)).mkString(" ")
    val docs = Seq(
      (10L, s"$shared ${sent("tailA", 8)}"),
      (11L, s"$shared ${sent("tailA", 8).replace("tailA8", "zz")}"),
      (20L, (1 to 32).map(j => s"u$j").mkString(" "))).toDF("doc_id", "text")
    val noSent = Curate.run(docs,
        Curate.Config(minWords = 5, tau = 0.6))
      .select("doc_id").as[Long].collect().toSet
    assert(noSent === Set(10L, 20L), s"near-dup must drop 11: $noSent")
    val withSent = Curate.run(docs,
        Curate.Config(minWords = 5, tau = 0.6, sentenceDedup = true))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(withSent.keySet === Set(10L, 11L, 20L))
    // doc 11 kept exactly its unique residual sentence
    assert(!withSent(11L).contains("s1x1") && withSent(11L).contains("zz"))
  }

  test("DSIR stage materializes the survivor pool once (no funnel re-execution)") {
    // three references (train raw side, slim key checkpoint, final
    // emit) must read the checkpointed pool: assert the returned
    // plan's scan is a checkpoint RDD scan, not the full funnel
    val docs = (1L to 60L).map(i =>
      (i, (1 to 20).map(j => s"d${i}w$j").mkString(" ") +
        (if (i % 3 == 0) " science physics theory" else " junk spam noise")))
      .toDF("doc_id", "text")
    val target = Seq((1L, "science physics theory experiment method"))
      .toDF("doc_id", "text")
    val out = Curate.run(docs, Curate.Config(minWords = 5,
      dsirTarget = Some(target), dsirKeep = 10))
    assert(out.count() === 10L)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"DSIR emit must scan the checkpointed pool, got:\n$plan")
  }

  test("all-hot docs (empty capped signature) never form a hub bucket and " +
      "survive near-dup; true plants still collapse") {
    // five docs that are PURE footer (every token hot under the cap)
    // plus a planted near-dup pair with cold unique tokens. The all-hot
    // docs must drop out of banding (no shared sentinel bucket, no
    // star candidates against them) yet survive the funnel; each pure
    // copy is a distinct ROTATION of the footer so the exact `_fp`
    // pass keeps all five while their token (and hence capped
    // signature) sets are identical-and-all-hot.
    val toks = (1 to 40).map(i => s"footer$i")
    val footer = toks.mkString(" ")
    val pure = (100L to 104L).map { i =>
      val r = (i - 99).toInt
      (i, (toks.drop(r) ++ toks.take(r)).mkString(" "))
    }
    val pair = Seq(
      (1L, (1 to 12).map(j => s"ux$j").mkString(" ") + s" $footer"),
      (2L, (1 to 12).map(j => s"ux$j").mkString(" ") + s" zz $footer"))
    val docs = (pair ++ pure).toDF("doc_id", "text")
    val kept = graft.ext.DocPipeline.prepare(docs, minWords = 10,
        minhashK = 8, bands = 4, tau = 0.7, maxSignatureDf = 6L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 100L, 101L, 102L, 103L, 104L))
  }
}
