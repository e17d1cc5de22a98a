package graft.ext

import graft.core.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword tokenization (the SentencePiece unigram model of
  * Kudo 2018, "Subword Regularization", arXiv:1804.10959) — the second
  * of the two public subword families ([[Bpe]] is the merge-based one).
  * A tokenizer here is a PIECE TABLE: (piece → cost) with cost =
  * −ln p(piece); tokenizing a word is Viterbi — the segmentation
  * minimizing total cost, ties broken toward FEWER pieces, remaining
  * ties toward shorter first piece (the ascending-k DP scan order) —
  * fully deterministic for a fixed table.
  *
  * Scale shape mirrors [[Bpe]]: the piece table rides the expressions
  * as literal reference state (one broadcast per stage via the task
  * binary), the Viterbi DP is row-local O(|word|·maxPieceLen) with a
  * HashMap probe per cell, and both expressions stay inside
  * whole-stage codegen (`doGenCode` calls the static kernel). Training
  * pre-aggregates the corpus ONCE into the (word, freq) vocabulary —
  * corpus-size-independent state, the classic trick — then every
  * hard-EM round is one piece-keyed partial+final sum over the vocab
  * with a bounded (≤ seed size) driver collect, the [[Bpe.train]] /
  * [[Ivf.train]] convention.
  */
object UnigramLoops {

  /** Characters a piece table can't cover fall back to one
    * single-character piece at this cost — segmentation never fails. */
  val UnkCost: Double = 8.0

  /** Per-byte cost of the byte-fallback pieces (the SentencePiece
    * `--byte_fallback` semantics): with fallback enabled, an uncovered
    * character is consumed as its UTF-8 bytes, each emitted as a
    * `<0xNN>` piece at this cost — scoring is total on ANY input and
    * nothing collapses to a flat UNK. Exact binary fraction (6.0) so
    * cross-engine double sums stay bit-identical; deliberately above
    * real piece costs (≈2–4) and calibrated so an unknown ASCII char
    * (1 byte, 6.0) undercuts the UNK arm while multi-byte scripts pay
    * proportionally — the paper's intent that fallback be a floor, not
    * a competitor. */
  val ByteCost: Double = 6.0

  /** UTF-8 bytes of `s` as `<0xNN>` piece strings. */
  def byteTokens(s: String): Array[String] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"<0x${b & 0xff}%02X>")

  def buildCosts(pieces: Seq[(String, Double)]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, c) =>
      require(p.nonEmpty, "empty piece")
      require(c >= 0.0 && !c.isNaN, s"piece '$p' has invalid cost $c (must be >= 0)")
      m.put(p, c)
    }
    m
  }

  def maxPieceLen(costs: java.util.HashMap[String, java.lang.Double]): Int = {
    var m = 1
    val it = costs.keySet().iterator()
    while (it.hasNext) m = math.max(m, it.next().length)
    m
  }

  /** Viterbi DP over one word. Writes the best segmentation's pieces
    * into `out` (when non-null) and returns cost*2^20 + count packed…
    * no — returns the (cost, count) pair via the two-element buffer to
    * keep one DP implementation for all three expressions. */
  private def viterbi(w: String, costs: java.util.HashMap[String, java.lang.Double],
                      maxLen: Int, out: java.util.ArrayList[UTF8String],
                      cc: Array[Double], byteFallback: Boolean = false): Unit = {
    val n = w.length
    // cost[i], count[i], back[i] = best split for prefix of length i;
    // ascending-k scan + strict-less update = deterministic tie-break
    // (fewest pieces, then shortest first piece at each boundary)
    val cost = new Array[Double](n + 1)
    val cnt = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestC = Double.PositiveInfinity
      var bestN = Int.MaxValue
      var bestK = 1
      var k = 1
      // byteFallback keeps k=2 reachable even for a 1-char-only piece
      // table — otherwise a surrogate pair (whose lone-half k=1 arms
      // are suppressed) would have NO arm and totality would break
      val kMax = math.min(if (byteFallback) math.max(maxLen, 2) else maxLen, i)
      while (k <= kMax) {
        val piece = w.substring(i - k, i)
        val pc0 = costs.get(piece)
        var pc: Double = Double.NaN
        var inc = 1
        if (pc0 != null) pc = pc0.doubleValue()
        else if (k == 1) {
          if (byteFallback) {
            // a surrogate half inside a pair must not be consumed alone
            // (the pair's 4-byte k=2 arm below is its only fallback) —
            // otherwise two lone-'?' arms would undercut the real char
            val ch = w.charAt(i - 1)
            val pairedLow = Character.isLowSurrogate(ch) && i >= 2 &&
              Character.isHighSurrogate(w.charAt(i - 2))
            val pairedHigh = Character.isHighSurrogate(ch) && i < n &&
              Character.isLowSurrogate(w.charAt(i))
            if (!pairedLow && !pairedHigh) {
              val nb = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
              pc = ByteCost * nb; inc = nb
            }
          } else pc = UnkCost
        } else if (k == 2 && byteFallback &&
                   Character.isHighSurrogate(w.charAt(i - 2)) &&
                   Character.isLowSurrogate(w.charAt(i - 1))) {
          pc = ByteCost * 4; inc = 4
        }
        if (!pc.isNaN) {
          val c = cost(i - k) + pc
          val m = cnt(i - k) + inc
          if (c < bestC || (c == bestC && m < bestN)) { bestC = c; bestN = m; bestK = k }
        }
        k += 1
      }
      cost(i) = bestC; cnt(i) = bestN; back(i) = bestK
      i += 1
    }
    cc(0) = cost(n); cc(1) = cnt(n).toDouble
    if (out != null && n > 0) {
      // backtrack (collect boundaries right-to-left, emit left-to-right)
      val ks = new java.util.ArrayList[Integer]()
      var j = n
      while (j > 0) { ks.add(back(j)); j -= back(j) }
      var idx = ks.size - 1
      var s = 0
      while (idx >= 0) {
        val k = ks.get(idx)
        val piece = w.substring(s, s + k)
        if (byteFallback && !costs.containsKey(piece)) {
          val bs = byteTokens(piece)
          var b = 0
          while (b < bs.length) { out.add(UTF8String.fromString(bs(b))); b += 1 }
        } else out.add(UTF8String.fromString(piece))
        s += k
        idx -= 1
      }
    }
  }

  /** Forward-backward EXPECTED piece counts over one word — the exact
    * E-step of Kudo 2018 (vs [[viterbi]]'s hard assignment): with
    * p(piece) = e^(−cost), α[i] = Σ_k α[i−k]·p(w[i−k..i]) sums every
    * segmentation of the prefix, β mirrors it for suffixes, and the
    * expected number of times a piece occurrence (i−k, i) is used is
    * α[i−k]·p·β[i]/α[n]. Each expectation is FLOOR-PINNED to integer
    * millionths per (word, occurrence-position) — corpus aggregation
    * then sums freq-weighted INTEGERS, so distributed training stays
    * partitioning-independent (the lp_e6 discipline applied to EM).
    * Fixed iteration order makes the doubles per-row deterministic;
    * 12-char words with costs ≤ 8 keep α ≥ e⁻⁹⁶ — no underflow. */
  def expectedCounts(w: String, costs: java.util.HashMap[String, java.lang.Double],
                     maxLen: Int,
                     out: java.util.LinkedHashMap[String, java.lang.Long]): Unit = {
    val n = w.length
    if (n == 0) return
    def pieceP(i: Int, k: Int): Double = {
      val s = w.substring(i - k, i)
      val c = costs.get(s)
      if (c != null) math.exp(-c.doubleValue())
      else if (k == 1) math.exp(-UnkCost)
      else 0.0
    }
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0; beta(n) = 1.0
    var i = 1
    while (i <= n) {
      var s = 0.0
      var k = 1
      val kMax = math.min(maxLen, i)
      while (k <= kMax) { s += alpha(i - k) * pieceP(i, k); k += 1 }
      alpha(i) = s
      i += 1
    }
    i = n - 1
    while (i >= 0) {
      var s = 0.0
      var k = 1
      val kMax = math.min(maxLen, n - i)
      while (k <= kMax) {
        // piece spanning (i, i+k): pieceP indexes by END position
        s += pieceP(i + k, k) * beta(i + k)
        k += 1
      }
      beta(i) = s
      i -= 1
    }
    val z = alpha(n)
    if (z <= 0.0) return // unsegmentable (cannot happen with chars+unk)
    i = 1
    while (i <= n) {
      var k = 1
      val kMax = math.min(maxLen, i)
      while (k <= kMax) {
        val p = pieceP(i, k)
        if (p > 0.0) {
          val e = alpha(i - k) * p * beta(i) / z
          val w6 = math.floor(e * 1000000.0 + 0.5).toLong
          if (w6 > 0) {
            val piece = w.substring(i - k, i)
            val prev = out.get(piece)
            out.put(piece, if (prev == null) w6 else prev.longValue() + w6)
          }
        }
        k += 1
      }
      i += 1
    }
  }

  private def eachWord(text: String)(f: String => Unit): Unit = {
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) f(text.substring(start, i))
    }
  }

  /** (total Viterbi cost, total piece count) of a whitespace
    * pre-tokenized text — the corpus-scoring / budget kernel. */
  def score(text: String, costs: java.util.HashMap[String, java.lang.Double],
            maxLen: Int, byteFallback: Boolean): InternalRow = {
    val cc = new Array[Double](2)
    var totC = 0.0
    var totN = 0L
    eachWord(text) { w =>
      viterbi(w, costs, maxLen, null, cc, byteFallback)
      totC += cc(0); totN += cc(1).toLong
    }
    InternalRow(totC, totN)
  }

  /** All Viterbi pieces of a text, document order. */
  def tokens(text: String, costs: java.util.HashMap[String, java.lang.Double],
             maxLen: Int, byteFallback: Boolean): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val cc = new Array[Double](2)
    eachWord(text)(w => viterbi(w, costs, maxLen, out, cc, byteFallback))
    new GenericArrayData(out.toArray)
  }

  /** Piece count only (LongType — summable into token budgets). */
  def countTokens(text: String, costs: java.util.HashMap[String, java.lang.Double],
                  maxLen: Int, byteFallback: Boolean): Long = {
    val cc = new Array[Double](2)
    var n = 0L
    eachWord(text) { w => viterbi(w, costs, maxLen, null, cc, byteFallback); n += cc(1).toLong }
    n
  }
}

/** array<struct<piece, w6>>: forward-backward expected piece counts of
  * ONE WORD in integer millionths ([[UnigramLoops.expectedCounts]]) —
  * the full-EM E-step kernel. Input is a single word (the trainer's
  * vocabulary rows), not whitespace text. */
case class UnigramExpCountsExpr(child: Expression, pieces: Seq[(String, Double)])
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("w6", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "unigram_exp_counts"

  @transient private lazy val costs = UnigramLoops.buildCosts(pieces)
  @transient private lazy val maxLen = UnigramLoops.maxPieceLen(costs)

  protected override def nullSafeEval(v: Any): Any = {
    val out = new java.util.LinkedHashMap[String, java.lang.Long]()
    UnigramLoops.expectedCounts(
      v.asInstanceOf[UTF8String].toString, costs, maxLen, out)
    val arr = new Array[Any](out.size)
    val it = out.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramExpCountsExpr =
    copy(child = newChild)
}

/** struct<cost:double, n_pieces:bigint> — total Viterbi cost and piece
  * count of a string under a fixed unigram piece table. */
case class UnigramScoreExpr(child: Expression, pieces: Seq[(String, Double)],
                            byteFallback: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("cost", DoubleType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))
  override def prettyName: String = "unigram_score"

  @transient private lazy val costs = UnigramLoops.buildCosts(pieces)
  @transient private lazy val maxLen = UnigramLoops.maxPieceLen(costs)

  protected override def nullSafeEval(v: Any): Any =
    UnigramLoops.score(v.asInstanceOf[UTF8String].toString, costs, maxLen, byteFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugCosts", costs, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.ext.UnigramLoops.score($c.toString(), $ref, $maxLen, $byteFallback)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramScoreExpr =
    copy(child = newChild)
}

/** All Viterbi pieces of a string under a fixed unigram piece table. */
case class UnigramTokensExpr(child: Expression, pieces: Seq[(String, Double)],
                             byteFallback: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_tokens"

  @transient private lazy val costs = UnigramLoops.buildCosts(pieces)
  @transient private lazy val maxLen = UnigramLoops.maxPieceLen(costs)

  protected override def nullSafeEval(v: Any): Any =
    UnigramLoops.tokens(v.asInstanceOf[UTF8String].toString, costs, maxLen, byteFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugCosts", costs, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.ext.UnigramLoops.tokens($c.toString(), $ref, $maxLen, $byteFallback)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokensExpr =
    copy(child = newChild)
}

/** Piece count of a string under a fixed unigram piece table. */
case class UnigramCountExpr(child: Expression, pieces: Seq[(String, Double)],
                            byteFallback: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "unigram_count"

  @transient private lazy val costs = UnigramLoops.buildCosts(pieces)
  @transient private lazy val maxLen = UnigramLoops.maxPieceLen(costs)

  protected override def nullSafeEval(v: Any): Any =
    UnigramLoops.countTokens(v.asInstanceOf[UTF8String].toString, costs, maxLen, byteFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugCosts", costs, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.ext.UnigramLoops.countTokens($c.toString(), $ref, $maxLen, $byteFallback)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramCountExpr =
    copy(child = newChild)
}

object Unigram {
  import org.apache.spark.sql.functions._

  /** Viterbi pieces (array<string>, document order). `byteFallback`
    * replaces the flat UNK arm with SentencePiece's --byte_fallback
    * semantics: uncovered characters emit their UTF-8 bytes as <0xNN>
    * pieces at [[UnigramLoops.ByteCost]] each, so tokenization is
    * total on any input byte sequence. */
  def tokens(text: Column, pieces: Seq[(String, Double)],
             byteFallback: Boolean = false): Column =
    bridge.column(UnigramTokensExpr(bridge.expression(text), pieces, byteFallback))

  /** Piece count (LongType — summable into budgets). */
  def tokenCount(text: Column, pieces: Seq[(String, Double)],
                 byteFallback: Boolean = false): Column =
    bridge.column(UnigramCountExpr(bridge.expression(text), pieces, byteFallback))

  /** struct<cost, n_pieces> — total −ln p and piece count; `cost`
    * divided by `n_pieces` is the per-piece negative log-likelihood, a
    * perplexity-style quality signal under the trained tokenizer. */
  def score(text: Column, pieces: Seq[(String, Double)],
            byteFallback: Boolean = false): Column =
    bridge.column(UnigramScoreExpr(bridge.expression(text), pieces, byteFallback))

  /** Trains a unigram piece table by hard (Viterbi) EM — the public
    * SentencePiece recipe (Kudo 2018 §3.2) with the E-step's
    * forward-backward expectations replaced by Viterbi-best counts
    * (the documented hard-EM approximation; deterministic, and exact
    * integer count sums make training partitioning-independent):
    *
    *   1. corpus → (word, freq) vocabulary (the ONE corpus pass);
    *   2. seed = the `seedSize` highest-frequency substrings of length
    *      ≤ `maxPieceLen` (ties: lexicographic) ∪ all single
    *      characters (coverage guarantee), cost = −ln(count/total);
    *   3. `emIters`× : segment every vocab word under the current
    *      table (freq-weighted piece counts; one piece-keyed sum over
    *      the vocab), re-cost pieces as −ln(count/total) with
    *      add-half smoothing on single characters (never dropped);
    *   4. prune the lowest-count multi-char pieces by `pruneFrac` per
    *      round (re-running one EM pass after each) until ≤
    *      `vocabSize` pieces remain, then one final EM pass.
    *
    * Returns (piece, cost) sorted by (cost asc, piece asc). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 4, seedSize: Int = 2000,
            emIters: Int = 2, pruneFrac: Double = 0.25): Seq[(String, Double)] =
    trainLoop(docs, textCol, vocabSize, maxPieceLen, seedSize, emIters,
      pruneFrac, fullEM = false)

  /** [[train]] with the EXACT E-step — forward-backward expected counts
    * over every segmentation (Kudo 2018's EM proper) instead of
    * Viterbi-best hard counts. Expectations are floor-pinned to integer
    * millionths per (word, occurrence) before the freq-weighted corpus
    * sum ([[UnigramLoops.expectedCounts]]), so full-EM training is as
    * partitioning-independent as the hard variant. Soft counts let
    * plausible-but-not-best pieces retain mass through early rounds —
    * the reason SentencePiece ships EM rather than hard-EM. */
  def trainEM(docs: DataFrame, textCol: String, vocabSize: Int,
              maxPieceLen: Int = 4, seedSize: Int = 2000,
              emIters: Int = 2, pruneFrac: Double = 0.25): Seq[(String, Double)] =
    trainLoop(docs, textCol, vocabSize, maxPieceLen, seedSize, emIters,
      pruneFrac, fullEM = true)

  /** Per-word expected piece counts (integer millionths) — the full-EM
    * E-step column; input is ONE word, not whitespace text. */
  def expCounts(word: Column, pieces: Seq[(String, Double)]): Column =
    bridge.column(UnigramExpCountsExpr(bridge.expression(word), pieces))

  private def trainLoop(docs: DataFrame, textCol: String, vocabSize: Int,
                        maxPieceLen: Int, seedSize: Int,
                        emIters: Int, pruneFrac: Double,
                        fullEM: Boolean): Seq[(String, Double)] = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize must be >= 1")
    require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen must be >= 1")
    require(seedSize >= vocabSize, s"seedSize=$seedSize must be >= vocabSize=$vocabSize")
    require(pruneFrac > 0 && pruneFrac < 1, s"pruneFrac=$pruneFrac must be in (0,1)")
    val words = docs
      .select(explode(split(col(textCol), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy(col("_w")).agg(count(lit(1)).as("_f"))
      .cut
    // seed candidates: every substring of length 1..maxPieceLen,
    // freq-weighted — one explode over the vocab, piece-keyed sum
    val subs = words.select(col("_f"), explode(flatten(transform(
        sequence(lit(1), length(col("_w"))),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("_w")) - i + 1)),
          l => substring(col("_w"), i, l)).cast("array<string>")))).as("_p"))
      .groupBy(col("_p")).agg(sum(col("_f")).as("_c"))
    val chars = subs.filter(length(col("_p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multis = subs.filter(length(col("_p")) > 1)
      .orderBy(desc("_c"), asc("_p")).limit(math.max(0, seedSize - chars.length))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def toCosts(counts: Seq[(String, Long)]): Seq[(String, Double)] = {
      val total = counts.map(_._2).sum.toDouble
      counts.map { case (p, c) => (p, -math.log(c / total)) }
    }
    var table = toCosts((chars ++ multis).toSeq)
    val charSet = chars.map(_._1).toSet
    // one EM pass: freq-weighted piece counts over the vocab — hard
    // (Viterbi tokens, integer counts) or full (forward-backward
    // expectations, integer millionths); single chars kept alive with
    // add-half smoothing in the matching unit
    var emCounts: Map[String, Double] = Map.empty
    def emPass(t: Seq[(String, Double)]): Seq[(String, Double)] = {
      val (used, half) =
        if (fullEM) {
          val u = words
            .select(col("_f"), explode(expCounts(col("_w"), t)).as("_e"))
            .groupBy(col("_e.piece").as("_p"))
            .agg(sum(col("_e.w6") * col("_f")).as("_c"))
            .collect().map(r => (r.getString(0), r.getLong(1))).toMap
          (u, 1000000L) // half a count in the e6 unit, doubled below
        } else {
          val u = words
            .select(col("_f"), explode(tokens(col("_w"), t)).as("_p"))
            .groupBy(col("_p")).agg(sum(col("_f")).as("_c"))
            .collect().map(r => (r.getString(0), r.getLong(1))).toMap
          (u, 1L) // add-half at integer-count granularity → use +1/2 via doubling
        }
      // work in doubled units so the half-smoothing stays integral
      val total = 2.0 * used.values.sum.toDouble + half.toDouble * charSet.size
      val kept = t.flatMap { case (p, _) =>
        val c = 2.0 * used.getOrElse(p, 0L).toDouble +
          (if (p.length == 1) half.toDouble else 0.0)
        if (c > 0) Some((p, -math.log(c / total), c)) else None
      }
      emCounts = kept.map(k => (k._1, k._3)).toMap
      kept.map(k => (k._1, k._2))
    }
    var iter = 0
    while (iter < emIters) { table = emPass(table); iter += 1 }
    // prune lowest-count multi-char pieces until the budget holds
    // (single chars are never pruned — the alphabet can exceed a tiny
    // vocabSize, in which case the alphabet IS the table)
    while (table.length > vocabSize && table.exists(_._1.length > 1)) {
      val multisNow = table.filter(_._1.length > 1)
      val nDrop = math.max(1, math.min(
        (multisNow.length * pruneFrac).toInt, table.length - vocabSize))
      val drop = multisNow
        .sortBy { case (p, _) => (emCounts.getOrElse(p, 0.0), p) }
        .take(nDrop).map(_._1).toSet
      table = emPass(table.filterNot(t => drop.contains(t._1)))
    }
    table.sortBy { case (p, c) => (c, p) }
  }

  /** Persist a trained piece table as parquet (piece, cost) — train
    * once, tokenize in every later job ([[Bpe.saveMerges]] twin). */
  def savePieces(spark: org.apache.spark.sql.SparkSession,
                 pieces: Seq[(String, Double)], path: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "cost").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a piece table written by [[savePieces]]. Order within the
    * table is immaterial (Viterbi consults it as a map) — restored
    * sorted (cost asc, piece asc) for determinism of any downstream
    * driver-side iteration. */
  def loadPieces(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, Double)] =
    spark.read.parquet(path).select("piece", "cost")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (p, c) => (c, p) }.toSeq

  /** Demo piece table for the cross-engine oracle row: costs are exact
    * multiples of 1/16 (so ≤ a few hundred double additions stay
    * bit-exact and the DuckDB twin's integer-scaled DP compares
    * identically), pieces drawn from the synthetic corpus vocabulary.
    * The UNK single-char fallback cost (8.0) is likewise exact. */
  val demoPieces: Seq[(String, Double)] = Seq(
    "the" -> 2.5, "th" -> 3.0, "he" -> 3.25, "in" -> 3.0, "ing" -> 2.75,
    "er" -> 3.25, "at" -> 3.25, "ion" -> 2.75, "re" -> 3.25, "on" -> 3.25,
    "an" -> 3.25, "en" -> 3.25, "es" -> 3.25, "st" -> 3.25, "or" -> 3.5,
    "data" -> 2.25, "join" -> 2.25, "set" -> 2.75, "ta" -> 3.5
  ) ++ "abcdefghijklmnopqrstuvwxyz".map(c => c.toString -> 4.0)
}
