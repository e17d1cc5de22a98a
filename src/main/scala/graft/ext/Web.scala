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
}
