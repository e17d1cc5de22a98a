package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CCNet-style text normalization before fingerprinting (Wenzek et al.
  * 2019 §3.1 — dedup is computed on lowercased, accent-less,
  * digit-folded text so trivial variants collide): lowercase →
  * accent strip → digits→0 → punctuation→space → whitespace fold.
  *
  * Accent stripping is the one step Spark has no built-in for; it is a
  * codegen [[StripAccentsExpr]] over the JDK's `java.text.Normalizer`
  * (NFD decomposition, combining marks dropped) — map-only, stays in
  * whole-stage codegen like the TextHash kernels. Every other step is
  * a stock function, so the whole chain is one projection: normalize
  * feeds [[Dedup.exact]] / MinHash / SimHash without an extra pass. */
object TextNormLoops {
  /** NFD-decompose then drop combining marks (Unicode category Mn).
    * ASCII fast path: no allocation, no Normalizer call. */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return s
    val decomposed =
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var j = 0
    while (j < decomposed.length) {
      val c = decomposed.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** strip_accents(text): é→e, ü→u, ñ→n; non-Latin letters pass through
  * unchanged. Mirrors DuckDB's `strip_accents` on Latin-script input
  * (both are NFD-based mark removal). */
case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  protected override def nullSafeEval(v: Any): Any =
    TextNormLoops.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextNormLoops.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object TextNorm {
  import org.apache.spark.sql.graft.bridge

  def stripAccents(c: Column): Column =
    bridge.column(StripAccentsExpr(bridge.expression(c)))

  /** Full dedup-normalization chain. Steps, in order (each mirrored by
    * the DuckDB twin in q_text_normalize):
    *   1. `lower` (locale-independent),
    *   2. accent strip,
    *   3. every digit → `0` (numbers collide: "v2" ≡ "v3"),
    *   4. every run outside [a-z0 ] → one space (punctuation folds),
    *   5. space runs folded, ends trimmed.
    * Map-only; compose as
    * `Dedup.exact(df.withColumn("k", TextNorm.normalizeForDedup(col("text"))), Seq("k"), id)`. */
  def normalizeForDedup(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(stripAccents(lower(c)), "[0-9]", "0"),
        "[^a-z0 ]+", " "),
      " +", " "))

  /** Markup → prose: the first step of every web-corpus pipeline.
    * Composed ENTIRELY from codegen built-ins (regexp_replace /
    * replace — the "functions, not UDFs" rule), with every pattern
    * RE2-safe (character classes, `(?s)`, non-greedy runs — no
    * lookaround), so the DuckDB twin replays it verbatim. Steps:
    *   1. drop `<script>`/`<style>` ELEMENTS wholesale (their text is
    *      code, not prose; case-insensitive, attribute-tolerant);
    *   2. drop comments `<!-- … -->`;
    *   3. block-level closers/openers (`</p> <br> <div …` etc.) →
    *      newline, so paragraph structure survives for line-level
    *      gates ([[TextAnalysis.c4CleanLines]]);
    *   4. every remaining tag → empty;
    *   5. decode the common entities (&amp; last — it un-escapes the
    *      escapes);
    *   6. fold space/tab runs, trim line ends, fold blank-line runs.
    * Map-only, one projection. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val entities = Seq(
      ("&nbsp;", " "), ("&quot;", "\""), ("&#39;", "'"),
      ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"))
      .foldLeft(noTags) { case (col0, (e, ch)) => replace(col0, lit(e), lit(ch)) }
    val spaces = regexp_replace(entities, "[ \\t]+", " ")
    val trimmedLines = regexp_replace(spaces, " ?\\n ?", "\n")
    // trim() strips spaces only — ends may hold newlines from step 3
    regexp_replace(
      regexp_replace(trimmedLines, "\\n{2,}", "\n"), "^\\s+|\\s+$", "")
  }
}
