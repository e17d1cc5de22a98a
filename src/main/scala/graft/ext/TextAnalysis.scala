package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language ID, quality
  * scoring, token counting, fingerprinting. All map-side Column kernels
  * (no UDFs, no shuffle); aggregation is whatever the caller groups by.
  */
object TextAnalysis {

  /** Marker stopword lists for the n-gram-free language-ID heuristic.
    * Deliberately tiny + deterministic: production swaps in real
    * frequency profiles; the operator shape (token-membership scoring +
    * argmax) is what matters. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "en"))

  private def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens belonging to `list`. */
  def stopwordCount(text: Column, list: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(list: _*))).cast("long")

  /** Language-ID heuristic: argmax of per-language marker counts,
    * lexicographically-first language on ties, 'und' (undetermined) when
    * every score is 0. */
  def langId(text: Column, profiles: Map[String, Seq[String]] = stopwords): Column = {
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, list) =>
      (lang, stopwordCount(text, list))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), els) =>
      when(score === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  def wordCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Mean token length (separator-free chars / tokens). */
  def avgWordLen(text: Column): Column =
    (length(text) - (wordCount(text) - 1)).cast("double") / wordCount(text).cast("double")

  /** Fraction of characters outside [a-z0-9 ] — punctuation/symbol load. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") /
      length(text).cast("double")

  /** Fraction of tokens that are (any-language) stopwords — the classic
    * fluency signal (natural text ≈ 0.3-0.6; keyword spam ≈ 0). */
  def stopwordRatio(text: Column, profiles: Map[String, Seq[String]] = stopwords): Column = {
    val all = profiles.values.flatten.toSeq.distinct
    stopwordCount(text, all).cast("double") / wordCount(text).cast("double")
  }

  /** Composite quality score in [0,1]: length sweet-spot × (1 − punct
    * excess) × stopword presence. Heuristic, monotone, deterministic. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(wordCount(text).cast("double") / 20.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * punctScore * stopScore, 4)
  }

  /** BPE-ish token count: alpha runs, digit runs, and single symbols —
    * the standard pre-tokenizer split, counted without a vocab. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Whole-document rolling-hash fingerprint (see TextHash). */
  def fingerprint(text: Column): Column = TextHash.fingerprint(text)
}
