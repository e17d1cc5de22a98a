package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-hygiene URL operators — the normalization layer every
  * web-corpus pipeline runs before URL-level dedup and per-host
  * aggregation (the CCNet/C4 lineage dedups by normalized URL; host
  * statistics drive crawl budgets and blocklists).
  *
  * All patterns follow the [[TextAnalysis.redactPii]] determinism
  * convention: RE2-safe (no backreferences or lookaround IN PATTERNS —
  * replacement syntax is authored per engine), so the same rules run
  * identically under Spark's Java regex and RE2-family engines, and
  * every operator is a codegen'd map-only expression chain — zero
  * shuffle at any corpus size. */
object Web {

  private val tracking = "(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid)"

  /** Canonical URL form:
    *  1. fragment stripped (`#…`);
    *  2. scheme + authority lowercased (path/query case preserved —
    *     paths are case-sensitive, hosts are not; scheme-less inputs
    *     pass through un-lowered);
    *  3. default ports dropped (`http://…:80`, `https://…:443`);
    *  4. tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *     `msclkid`) with separator repair — query param ORDER is
    *     preserved, not sorted (reordering can change semantics for
    *     pathological endpoints; sort-normalization is a caller
    *     opt-in);
    *  5. a bare trailing slash on a path-less URL dropped
    *     (`http://a.com/` → `http://a.com`). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val auth = "^[^/?#]*//[^/?#]*"
    val lowered = concat(lower(regexp_extract(noFrag, auth, 0)),
      regexp_replace(noFrag, auth, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/?#:]+):80([/?#]|$)", "$1$2"),
      "^(https://[^/?#:]+):443([/?#]|$)", "$1$2")
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noPort, "&" + tracking + "=[^&#]*", ""),
        "\\?" + tracking + "=[^&#]*&", "?"),
      "\\?" + tracking + "=[^&#]*$", "")
    regexp_replace(noTrack, "^(https?://[^/?#]+)/$", "$1")
  }

  /** Registered host of a URL (lowercased; userinfo and port
    * excluded) — the per-host aggregation key. Empty string when the
    * input has no `//authority` part. */
  def host(url: Column): Column =
    regexp_extract(lower(url), "//(?:[^/?#@]*@)?([^/?#:]+)", 1)

  /** Per-host crawl budget: keep at most `maxPerHost` documents per
    * [[host]] — the anti-monoculture cap every web-corpus recipe
    * applies so that a single mega-site (or a crawler trap generating
    * unbounded URLs under one domain) can't dominate the training mix
    * (C4 and its descendants cap per-domain contribution; Penedo 2023
    * "The RefinedWeb dataset" §3 documents the same per-domain limit).
    *
    * Selection within a host is a deterministic uniform sample, not
    * head-of-crawl order: rows rank by the [[Corpus]] LCG hash of
    * `idCol` (id tie-break), so the kept set is a stable function of
    * the corpus content — growing the crawl or reshuffling partitions
    * never flips which rows survive except where new ids genuinely
    * displace old ranks.
    *
    * Scale shape: ONE host-keyed exchange. The rank filter is
    * `row_number() <= k` over (host | hash, id), which Spark plans as
    * WindowGroupLimit — each map task pre-prunes to its local top-k
    * per host BEFORE the shuffle, so a 10⁸-page host contributes k
    * rows per upstream partition to the exchange, not 10⁸ (the skew
    * this operator exists to police is exactly the skew the partial
    * limit absorbs). Docs with no parseable host ('' key) compete
    * under one budget like any other host; filter upstream if they
    * should be dropped instead. */
  def hostBudget(docs: org.apache.spark.sql.DataFrame, urlCol: String,
                 idCol: String, maxPerHost: Int): org.apache.spark.sql.DataFrame = {
    require(maxPerHost >= 1, s"maxPerHost must be >= 1, got $maxPerHost")
    import org.apache.spark.sql.expressions.Window
    val rk = graft.ext.Corpus.orderHash(col(idCol).cast("long"))
    docs.withColumn("host", host(col(urlCol)))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("host")).orderBy(rk, col(idCol))))
      .filter(col("_rn") <= maxPerHost)
      .drop("_rn")
  }

  /** Every domain suffix of the URL's [[host]], most-specific first
    * ("a.b.c" → ["a.b.c", "b.c", "c"]) — the blocklist match keys. */
  def hostSuffixes(url: Column): Column = {
    val labels = split(host(url), "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + lit(1)), "."))
  }

  /** Domain blocklist filter (crawl hygiene): drop rows whose URL host
    * IS a blocked domain or is a SUBDOMAIN of one ("example.com" blocks
    * "a.b.example.com" but not "notexample.com"). The standard list-
    * based gate web-corpus recipes apply before content filters (C4
    * used a public bad-words/domain list; RefinedWeb §3.2 a curated
    * blocklist of ~4.6M domains).
    *
    * Scale shape: suffix keys are generated MAP-SIDE (bounded by the
    * host's label count), then one equi semi join against the
    * blocklist marks hit ids and one id-keyed anti join removes them —
    * equi-joins only, so a 10⁶-domain blocklist works as a plain
    * shuffle join; wrap small lists in `broadcast()` (the Seq overload
    * does). Rows with no parseable host are kept. */
  def blockByDomain(docs: org.apache.spark.sql.DataFrame, urlCol: String,
                    idCol: String, blocklist: org.apache.spark.sql.DataFrame,
                    domainCol: String): org.apache.spark.sql.DataFrame = {
    val keys = blocklist.select(lower(col(domainCol)).as("_suf")).distinct()
    val hit = docs
      .select(col(idCol), explode(hostSuffixes(col(urlCol))).as("_suf"))
      .join(keys, Seq("_suf"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(hit, Seq(idCol), "left_anti")
  }

  /** [[blockByDomain]] with an in-memory blocklist (broadcast). */
  def blockByDomain(docs: org.apache.spark.sql.DataFrame, urlCol: String,
                    idCol: String,
                    blocked: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to filter")
    val spark = docs.sparkSession
    import spark.implicits._
    blockByDomain(docs, urlCol, idCol,
      org.apache.spark.sql.functions.broadcast(blocked.toDF("domain")),
      "domain")
  }
}
