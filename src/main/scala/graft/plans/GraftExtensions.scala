package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.ext.{CharHash64Expr, CharHashExpr, JaccardExpr, JaccardGteExpr, MinHashSigExpr, OphSigExpr, ShingleHashesExpr, SimHashExpr, WordHashesExpr}
import graft.functions.{DotExpr, GramianAgg, GtStats, HeavyHittersAgg}

/** Catalyst citizenship: the engine's optimizer rules, injected through
  * the standard `SparkSessionExtensions` hook —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * The library works without registration (every operator is built from
  * expressions that stand alone); the rules are pure-win rewrites that
  * fire on predicate SHAPES users write, which no single expression
  * constructor can see. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => JaccardPredicateRule)
    GraftExtensions.sqlFunctions.foreach(ext.injectFunction)
  }
}

/** SQL names for the engine's custom expressions — `spark.sql` users
  * get the same codegen kernels the Scala API builds, with no
  * wrapping UDF layer (so pushdown, codegen and the optimizer rule
  * above all still apply to SQL-authored queries):
  *
  * {{{ SELECT doc_id FROM d a JOIN d b
  *     WHERE jaccard_sim(shingle_hashes(word_hashes(a.text), 3),
  *                       shingle_hashes(word_hashes(b.text), 3)) >= 0.8 }}}
  *
  * Static-parameter kernels (shingle n, minhash k, simhash bits,
  * heavy-hitter k) take an integer LITERAL — they compile the constant
  * into generated code, which is the point of their design. */
object GraftExtensions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.GraftExtensions", name, usage),
      builder)

  private[graft] val sqlFunctions = Seq(
    fn("char_hash", "char_hash(str) - rolling character hash mod P (word-hash arithmetic)") {
      a => CharHashExpr(a.head)
    },
    fn("char_hash64", "char_hash64(str) - 64-bit rolling character hash (document fingerprint key)") {
      a => CharHash64Expr(a.head)
    },
    fn("word_hashes", "word_hashes(str) - array of per-word rolling hashes") {
      a => WordHashesExpr(a.head)
    },
    fn("shingle_hashes", "shingle_hashes(word_hashes, n) - word n-gram shingle hashes") {
      a => ShingleHashesExpr(a.head, intLit(a(1), "shingle_hashes"))
    },
    fn("minhash_sig", "minhash_sig(word_hashes, k) - k-permutation MinHash signature") {
      a => MinHashSigExpr(a.head, intLit(a(1), "minhash_sig"))
    },
    fn("oph_sig", "oph_sig(word_hashes, k) - one-permutation densified " +
      "MinHash signature (O(tokens+k))") {
      a => OphSigExpr(a.head, intLit(a(1), "oph_sig"))
    },
    fn("simhash", "simhash(word_hashes, bits) - SimHash of the hash multiset") {
      a => SimHashExpr(a.head, intLit(a(1), "simhash"))
    },
    fn("jaccard_sim", "jaccard_sim(arr_a, arr_b) - exact set Jaccard " +
      "(>= literal threshold rewrites to the early-exit kernel)") {
      a => JaccardExpr(a.head, a(1))
    },
    fn("vec_dot", "vec_dot(arr_a, arr_b) - float-vector dot product") {
      a => DotExpr(a.head, a(1))
    },
    fn("gt_stats", "gt_stats(gt, n_alleles) - one-pass genotype stats struct") {
      a => GtStats(a.head, a(1))
    },
    fn("heavy_hitters", "heavy_hitters(col, k) - Misra-Gries top items (aggregate)") {
      a => HeavyHittersAgg(a.head, intLit(a(1), "heavy_hitters"))
    },
    fn("gramian", "gramian(vec) - packed upper-triangular sum of v*v' (aggregate)") {
      a => GramianAgg(a.head)
    },
    fn("vec_dotq", "vec_dotq(int_arr_a, int_arr_b) - exact integer dot " +
      "(quantized-code scoring; any integral widths)") {
      a => graft.functions.DotQExpr(a.head, a(1))
    },
    fn("bpe_count", "bpe_count(str, merges) - BPE subword count; merges is a " +
      "foldable array of 'left right' pair strings in rank order") {
      a => graft.ext.BpeCountExpr(a.head, mergesLit(a(1), "bpe_count"))
    },
    fn("bpe_tokens", "bpe_tokens(str, merges) - BPE subword tokens; merges as in bpe_count") {
      a => graft.ext.BpeTokensExpr(a.head, mergesLit(a(1), "bpe_tokens"))
    },
    fn("term_freqs", "term_freqs(tokens) - (term, tf) pairs in one pass, " +
      "first-occurrence order") {
      a => graft.ext.TermFreqsExpr(a.head)
    },
    fn("ct_lang_dists", "ct_lang_dists(str) - Cavnar-Trenkle out-of-place " +
      "distances to the stock profiles (array slots in lang-sorted order; " +
      "the kernel lowercases internally)") {
      a => graft.ext.CtLangDistExpr(a.head,
        graft.ext.LangId.profiles.toIndexedSeq,
        graft.ext.LangId.NMax, graft.ext.LangId.TopK)
    },
    fn("ct_lang_id", "ct_lang_id(str) - Cavnar-Trenkle language ID over the " +
      "stock profiles ('und' for null)") {
      a => org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
        graft.ext.CtLangIdExpr(a.head,
          graft.ext.LangId.profiles.toIndexedSeq,
          graft.ext.LangId.NMax, graft.ext.LangId.TopK),
        Literal.create("und", org.apache.spark.sql.types.StringType)))
    },
    fn("strip_accents", "strip_accents(str) - NFD-decompose and drop " +
      "combining marks (é→e); DuckDB-compatible name") {
      a => graft.ext.StripAccentsExpr(a.head)
    },
    fn("unigram_count", "unigram_count(str, pieces) - unigram-LM subword count; " +
      "pieces is a foldable array of 'piece cost' strings") {
      a => graft.ext.UnigramCountExpr(a.head, piecesLit(a(1), "unigram_count"))
    },
    fn("unigram_tokens", "unigram_tokens(str, pieces) - Viterbi subword tokens; " +
      "pieces as in unigram_count") {
      a => graft.ext.UnigramTokensExpr(a.head, piecesLit(a(1), "unigram_tokens"))
    },
    fn("unigram_score", "unigram_score(str, pieces) - struct(cost, n_pieces) " +
      "total Viterbi cost; pieces as in unigram_count") {
      a => graft.ext.UnigramScoreExpr(a.head, piecesLit(a(1), "unigram_score"))
    },
    fn("phrase_counts", "phrase_counts(str, phrases) - per-phrase Aho-Corasick " +
      "occurrence counts; phrases is a foldable array<string>") {
      a => graft.ext.PhraseCountsExpr(a.head, stringsLit(a(1), "phrase_counts"))
    },
    fn("phrase_any", "phrase_any(str, phrases) - true if any phrase occurs " +
      "(early-exit scan); phrases as in phrase_counts") {
      a => graft.ext.PhraseAnyExpr(a.head, stringsLit(a(1), "phrase_any"))
    },
    fn("phrase_total", "phrase_total(str, phrases) - total occurrences across " +
      "the dictionary; phrases as in phrase_counts") {
      a => graft.ext.PhraseTotalExpr(a.head, stringsLit(a(1), "phrase_total"))
    })

  /** Foldable `array<string>` → plain string list (phrase dictionaries —
    * elements used verbatim, spaces included). */
  private def stringsLit(e: Expression, fnName: String): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    require(e.foldable && (e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }), s"$fnName: phrases must be a foldable array<string>, got $e")
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** Foldable `array<string>` of "piece cost" entries → the unigram
    * piece table; cost is parsed after the LAST space, so pieces
    * containing spaces stay expressible. */
  private def piecesLit(e: Expression, fnName: String): Seq[(String, Double)] =
    stringsLit(e, fnName).map { s =>
      val sp = s.lastIndexOf(' ')
      require(sp > 0 && sp < s.length - 1,
        s"$fnName: piece entry '$s' must be 'piece cost'")
      (s.substring(0, sp), s.substring(sp + 1).toDouble)
    }

  /** Foldable `array<string>` of "left right" pairs → the merge table.
    * Evaluated at resolution time (the table compiles into the plan,
    * like every static-parameter kernel above). */
  private def mergesLit(e: Expression, fnName: String): Seq[(String, String)] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    require(e.foldable && (e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }), s"$fnName: merges must be a foldable array<string>, got $e")
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map { i =>
      val s = arr.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1,
        s"$fnName: merge entry '$s' must be 'left right'")
      (s.substring(0, sp), s.substring(sp + 1))
    }
  }
}

/** Rewrites `jaccard_sim(a, b) >= τ` (τ a non-NaN double literal) into
  * the fused early-exit predicate [[graft.ext.JaccardGteExpr]]: once the
  * optimistic bound (inter + remaining)/union-so-far falls below τ, the
  * pair is rejected without finishing the probe pass. On band-collision
  * candidate verification — where most pairs share one stopword minhash
  * and nothing else — most evaluations exit within a few elements.
  *
  * Semantics are EXACTLY the comparison it replaces, including Spark's
  * NaN ordering (union=0 → NaN ≥ τ → true), so the rewrite is safe for
  * any input; NaN thresholds are left alone (τ=NaN means "only NaN
  * passes" under Spark ordering — a shape not worth a fused kernel). */
object JaccardPredicateRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(j: JaccardExpr, Literal(t: Double, DoubleType)) if !t.isNaN =>
      JaccardGteExpr(j.left, j.right, t)
    case LessThanOrEqual(Literal(t: Double, DoubleType), j: JaccardExpr) if !t.isNaN =>
      JaccardGteExpr(j.left, j.right, t)
  }
}
