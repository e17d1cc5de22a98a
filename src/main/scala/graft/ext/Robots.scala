package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the crawl-compliance gate of a web-corpus pipeline, next to the
  * domain blocklist ([[Web.blockByDomain]]) and host budgets
  * ([[Web.hostBudget]]): which of a host's URLs may a given
  * user-agent fetch?
  *
  * Semantics implemented (RFC 9309 §2):
  *   - groups = consecutive `User-agent:` lines followed by rules;
  *     the group whose agent token matches MOST SPECIFICALLY wins
  *     (longest case-insensitive token; `*` is the fallback group);
  *   - within the chosen group, the rule with the LONGEST pattern
  *     that matches the URL path decides; `Allow` wins length ties;
  *   - patterns support `*` (any char run) and `$` (end anchor);
  *     matching is case-sensitive on paths, directives are
  *     case-insensitive, `#` starts a comment;
  *   - no matching rule (or no matching group, or empty/absent
  *     robots.txt) → allowed, per the RFC default.
  *
  * Scale shape: robots bodies are PER-HOST (a frame orders of
  * magnitude smaller than the URL frame). [[rulesFor]] parses each
  * body ONCE into a compact rules array (map-only codegen kernel);
  * the URL frame then equi-joins the host key — the parsed rules
  * frame broadcasts — and [[allowedBy]] evaluates longest-match
  * per row. Bodies never join the URL frame; parsing never repeats
  * per URL. */
object RobotsLoops {

  /** Parse a robots.txt body and select the rule group for `agent`
    * (RFC §2.2.1 most-specific-agent): returns (allow, pattern)
    * pairs; empty when no group applies. */
  def selectRules(body: String, agent: String): Array[(Boolean, String)] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // group under construction / best selection state
    var bestLen = -1        // matched agent-token length; '*' scores 0
    var best: List[(Boolean, String)] = Nil
    var curAgents: List[String] = Nil
    var curRules: List[(Boolean, String)] = Nil
    var inRules = false
    def closeGroup(): Unit = {
      if (curAgents.nonEmpty) {
        // best token of THIS group for our agent
        var groupLen = -1
        curAgents.foreach { a =>
          if (a == "*") { if (groupLen < 0) groupLen = 0 }
          else if (agentLc.contains(a) && a.length > groupLen) groupLen = a.length
        }
        if (groupLen > bestLen) { bestLen = groupLen; best = curRules.reverse }
      }
      curAgents = Nil; curRules = Nil; inRules = false
    }
    body.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) closeGroup()
            curAgents = value.toLowerCase(java.util.Locale.ROOT) :: curAgents
          case "allow" if curAgents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) curRules = (true, value) :: curRules
          case "disallow" if curAgents.nonEmpty =>
            inRules = true
            // empty Disallow = "allow all": no rule to add (RFC §2.2.2)
            if (value.nonEmpty) curRules = (false, value) :: curRules
          case _ => () // sitemap, crawl-delay, unknown keys: ignored
        }
      }
    }
    closeGroup()
    best.toArray
  }

  /** Does `pattern` (with `*` runs and an optional trailing `$`
    * anchor) match a PREFIX of `path`? RFC §2.2.3. */
  def patMatches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    // greedy-with-backtracking star match over a prefix (or the whole
    // path when anchored) — patterns are short, paths bounded
    def m(pi: Int, si: Int): Boolean = {
      var p = pi; var s = si
      while (p < pat.length) {
        if (pat.charAt(p) == '*') {
          var k = s
          while (k <= path.length) { if (m(p + 1, k)) return true; k += 1 }
          return false
        }
        if (s >= path.length || path.charAt(s) != pat.charAt(p)) return false
        p += 1; s += 1
      }
      !anchored || s == path.length
    }
    m(0, 0)
  }

  /** Longest-match decision over a selected rule set (RFC §2.2.2):
    * longest matching pattern wins, Allow wins length ties, no match
    * → allowed. */
  def decide(rules: Array[(Boolean, String)], path: String): Boolean = {
    var bestLen = -1
    var allow = true
    rules.foreach { case (a, pat) =>
      if (patMatches(pat, path)) {
        if (pat.length > bestLen) { bestLen = pat.length; allow = a }
        else if (pat.length == bestLen && a) allow = true // Allow wins ties
      }
    }
    allow
  }

  // catalyst adapters
  def rules(body: String, agent: String): GenericArrayData =
    new GenericArrayData(selectRules(body, agent).map { case (a, p) =>
      InternalRow(a, UTF8String.fromString(p))
    }.toArray[Any])

  def allowed(rulesArr: ArrayData, path: String): Boolean = {
    val n = rulesArr.numElements()
    val rs = new Array[(Boolean, String)](n)
    var i = 0
    while (i < n) {
      val r = rulesArr.getStruct(i, 2)
      rs(i) = (r.getBoolean(0), r.getUTF8String(1).toString)
      i += 1
    }
    decide(rs, path)
  }
}

/** array<struct<allow,pat>>: the rule group `agent` selects from a
  * robots.txt body (null body → empty rules = allow everything). */
case class RobotsRulesExpr(child: Expression, agent: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pat", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "robots_rules"

  protected override def nullSafeEval(v: Any): Any =
    RobotsLoops.rules(v.asInstanceOf[UTF8String].toString, agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ag = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.ext.RobotsLoops.rules($c.toString(), $ag)")
  }

  override protected def withNewChildInternal(newChild: Expression): RobotsRulesExpr =
    copy(child = newChild)
}

/** boolean: longest-match decision of a parsed rule array on a path. */
case class RobotsAllowExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(StructType(Seq(
      StructField("allow", BooleanType, nullable = false),
      StructField("pat", StringType, nullable = false))), containsNull = false),
    StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"

  protected override def nullSafeEval(r: Any, p: Any): Any =
    RobotsLoops.allowed(r.asInstanceOf[ArrayData], p.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, p) => s"graft.ext.RobotsLoops.allowed($r, $p.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RobotsAllowExpr =
    copy(left = newLeft, right = newRight)
}

object Robots {
  import org.apache.spark.sql.functions._

  /** Rules column: the group `agent` selects from a robots body. */
  def rulesFor(body: Column, agent: String): Column =
    bridge.column(RobotsRulesExpr(bridge.expression(body), agent))

  /** Decision column over a parsed rules array and a URL path. */
  def allowedBy(rules: Column, path: Column): Column =
    bridge.column(RobotsAllowExpr(bridge.expression(rules), bridge.expression(path)))

  /** URL path (+ query) of a full URL — the robots matching unit:
    * everything from the first `/` after the authority; absent path →
    * "/" (RFC: the root is what rules match against). */
  def urlPath(url: Column): Column = {
    val noScheme = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val path = regexp_replace(noScheme, "^[^/]*", "")
    when(path === "", lit("/")).otherwise(path)
  }

  /** Gate a URL frame against per-host robots bodies: parse each body
    * once ([[rulesFor]], map-only on the SMALL robots frame), broadcast
    * the parsed rules, equi-join on the host key, decide longest-match
    * per URL. Hosts with no robots row are fully allowed (RFC default
    * for an absent file). Appends `crawl_allowed`. */
  def gateUrls(urls: DataFrame, urlCol: String,
               robots: DataFrame, hostCol: String, bodyCol: String,
               agent: String = "*"): DataFrame = {
    val parsed = robots.select(col(hostCol).as("_rb_host"),
      rulesFor(col(bodyCol), agent).as("_rb_rules"))
    urls
      .join(broadcast(parsed), Web.host(col(urlCol)) === col("_rb_host"), "left")
      .withColumn("crawl_allowed",
        when(col("_rb_rules").isNull, lit(true))
          .otherwise(allowedBy(col("_rb_rules"), urlPath(col(urlCol)))))
      .drop("_rb_host", "_rb_rules")
  }
}
