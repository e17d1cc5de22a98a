package graft.ext

import graft.core.Checkpoints.CutOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding (BPE) subword tokenization as a
  * codegen Expression — the missing token-budget primitive (VERDICT r6
  * #2): every downstream budget (chunking, packing, LM scoring, BM25
  * length norm) can now count SUBWORDS against a fixed merge table
  * instead of whitespace words.
  *
  * Algorithm (the public BPE of Sennrich et al. 2016, as implemented by
  * GPT-2's encoder): pre-tokenize on whitespace runs, split each word
  * into single characters, then repeatedly merge the adjacent pair with
  * the LOWEST rank in the merge table (all its occurrences, leftmost
  * first) until no adjacent pair is ranked. Fully deterministic for a
  * fixed table — no RNG, no tie ambiguity (rank is the tiebreak;
  * distinct pairs never share a rank).
  *
  * Scale shape: the merge table rides the expression (one broadcast per
  * stage via the task binary — same mechanism as literal arrays), the
  * merge loop is row-local, and both expressions stay inside
  * whole-stage codegen (`doGenCode` calls the static kernel — the
  * TextHashExprs pattern). Real vocabularies (50k merges) are a
  * HashMap probe per adjacent pair; the loop is O(word·merges-applied),
  * the standard single-node cost.
  */
object BpeLoops {

  /** Rank map key: left + ' ' + right — unambiguous because tokens
    * come from whitespace-split words, so neither half can contain a
    * space. */
  def key(left: String, right: String): String = left + " " + right

  def buildRanks(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.nonEmpty && r.nonEmpty, s"empty merge component at rank $i")
      val prev = m.put(key(l, r), Integer.valueOf(i))
      require(prev == null, s"duplicate merge pair ($l, $r)")
    }
    m
  }

  /** Greedy min-rank BPE over one word's characters. */
  def encodeWord(w: String, ranks: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    val toks = new java.util.ArrayList[String](w.length)
    // seed by CODE POINTS, not UTF-16 units: train's Spark split("")
    // emits per-code-point symbols (SPARK-40194), so a charAt seed
    // would split astral chars into lone surrogates whose pair keys
    // never match any learned merge (and whose output bytes mangle)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      toks.add(w.substring(i, i + n))
      i += n
    }
    var done = toks.size < 2
    while (!done) {
      // find the lowest-ranked adjacent pair present
      var best = Integer.MAX_VALUE
      var bl: String = null
      var br: String = null
      var j = 0
      while (j < toks.size - 1) {
        val r = ranks.get(key(toks.get(j), toks.get(j + 1)))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); bl = toks.get(j); br = toks.get(j + 1)
        }
        j += 1
      }
      if (bl == null) done = true
      else {
        // merge ALL its occurrences, leftmost first (in place: read
        // index walks ahead of write index)
        val merged = bl + br
        var rd = 0
        var wr = 0
        while (rd < toks.size) {
          if (rd < toks.size - 1 && toks.get(rd) == bl && toks.get(rd + 1) == br) {
            toks.set(wr, merged); rd += 2
          } else {
            toks.set(wr, toks.get(rd)); rd += 1
          }
          wr += 1
        }
        while (toks.size > wr) toks.remove(toks.size - 1)
        done = toks.size < 2
      }
    }
    toks
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

  /** Total subword count of a whitespace-pre-tokenized text. */
  def countTokens(text: String, ranks: java.util.HashMap[String, Integer]): Long = {
    var n = 0L
    eachWord(text)(w => n += encodeWord(w, ranks).size)
    n
  }

  /** All subword tokens of a text, in order, as catalyst array data. */
  def tokens(text: String, ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    eachWord(text) { w =>
      val ts = encodeWord(w, ranks)
      var i = 0
      while (i < ts.size) { out.add(UTF8String.fromString(ts.get(i))); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Subword count of a string under a fixed BPE merge table. */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  @transient private lazy val ranks = BpeLoops.buildRanks(merges)

  protected override def nullSafeEval(v: Any): Any =
    BpeLoops.countTokens(v.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.ext.BpeLoops.countTokens($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** All subword tokens of a string under a fixed BPE merge table, in
  * document order (word boundaries not marked — words never merge
  * across whitespace by construction). */
case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val ranks = BpeLoops.buildRanks(merges)

  protected override def nullSafeEval(v: Any): Any =
    BpeLoops.tokens(v.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.ext.BpeLoops.tokens($c.toString(), $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}

object Bpe {

  /** Learns a BPE merge table from a corpus — the TRAINING half of the
    * primitive (Sennrich 2016 §3.2's algorithm, distributed): start
    * from per-word character sequences, and `nMerges` times (a) count
    * adjacent symbol pairs across the vocabulary weighted by word
    * frequency, (b) adopt the most frequent pair (ties: lexicographic
    * (left, right) — total order, engine- and partitioning-stable),
    * (c) replace all its occurrences leftmost-first-non-overlapping.
    * Returns the ranked merge list, directly feedable to [[tokens]] /
    * [[tokenCount]] (differential parity pinned in BpeSpec).
    *
    * Scale shape: the corpus is touched ONCE (whitespace-word count —
    * the classic pre-aggregation: training state is the (word, freq)
    * VOCABULARY, corpus-size-independent); each merge round is one
    * pair-keyed partial+final sum over the vocab plus a map-only fold
    * rewriting symbol arrays, [[graft.core.Checkpoints.cut]] per round. The argmax
    * is a 1-row driver action per round (the [[Ivf]] k-means training
    * convention). 50k-merge production runs batch fine — each round's
    * shuffle is |vocab| rows of a few dozen bytes. */
  /** The shared training pre-aggregation: (word → character symbols,
    * frequency). ONE corpus pass; the result is corpus-size-independent
    * training state (bounded by vocabulary size). */
  private def wordVocab(docs: org.apache.spark.sql.DataFrame,
                        textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .select(explode(split(col(textCol), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy(col("_w")).agg(count(lit(1)).as("_f"))
      .select(split(col("_w"), "").as("_syms"), col("_f"))
  }

  def train(docs: org.apache.spark.sql.DataFrame, textCol: String,
            nMerges: Int): Seq[(String, String)] =
    trainVocab(wordVocab(docs, textCol).cut, nMerges)

  /** The distributed merge loop over an already-materialized (cut)
    * vocabulary frame — [[train]]'s core, shared with [[trainAuto]] so
    * the auto path's sizing probe and its chosen engine read ONE
    * corpus pre-aggregation instead of re-running it. */
  private def trainVocab(vocabIn: org.apache.spark.sql.DataFrame,
                         nMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    require(nMerges >= 0, s"nMerges=$nMerges must be >= 0")
    var vocab = vocabIn
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < nMerges && !exhausted) {
      val top = vocab.filter(size(col("_syms")) >= 2)
        .select(col("_f"), explode(transform(
          sequence(lit(0), size(col("_syms")) - 2),
          i => struct(element_at(col("_syms"), i + 1).as("l"),
            element_at(col("_syms"), i + 2).as("r")))).as("_p"))
        .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
        .agg(sum(col("_f")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        // leftmost-first non-overlapping replacement as a fold: merge
        // when the accumulated tail is `l` and the next symbol is `r`
        // (a just-merged token never re-matches as `l` unless it IS
        // `l+r = l`, impossible for non-empty r)
        vocab = vocab.withColumn("_syms",
          aggregate(col("_syms"),
            array().cast("array<string>"),
            (acc, s) => when(
              size(acc) > 0 && element_at(acc, -1) === l && s === r,
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(element_at(acc, -1), s))))
              .otherwise(concat(acc, array(s)))))
          .cut
      }
    }
    merges.toSeq
  }

  /** [[train]]'s merge loop run DRIVER-SIDE over the collected
    * vocabulary, with incrementally maintained pair counts — identical
    * merges (BpeSpec pins the differential), orders of magnitude
    * faster when the vocabulary fits one machine, which it essentially
    * always does: the training state after [[wordVocab]]'s corpus pass
    * is the (word, freq) table, and even web-scale corpora hold a few
    * million distinct whitespace words. The distributed loop pays one
    * Spark round PER MERGE (a 50k-merge run is 50k scheduler
    * round-trips on state that never leaves a few MB); here each merge
    * touches only the words actually containing the chosen pair (an
    * inverted pair→words index), with a lazily-invalidated heap for
    * the argmax — the classic single-node BPE trainer (Sennrich 2016
    * §3.2) bolted onto the same distributed pre-aggregation.
    *
    * Parity notes, both pinned by spec: (a) ties break exactly like
    * the distributed `orderBy(desc(c), asc(l), asc(r))` — counts desc,
    * then UTF8 BYTE order on left/right ([[UTF8String.compareTo]], the
    * comparison Spark's string sort uses — NOT Java's UTF-16
    * `String.compareTo`, which disagrees beyond the BMP); (b) the
    * symbol arrays come from the SAME Spark expression ([[wordVocab]]),
    * so splitting semantics cannot drift between the twins.
    *
    * `maxVocab` bounds the driver envelope (the [[Ivf.train]]
    * centroid-collect convention): the collect aborts past the cap
    * rather than silently materializing an unbounded frame — fall back
    * to [[train]] (or let [[trainAuto]] choose) for vocabularies that
    * genuinely exceed one machine. */
  def trainLocal(docs: org.apache.spark.sql.DataFrame, textCol: String,
                 nMerges: Int, maxVocab: Int = 5000000): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges=$nMerges must be >= 0")
    require(maxVocab >= 1, s"maxVocab=$maxVocab must be >= 1")
    val probe = wordVocab(docs, textCol).limit(maxVocab + 1).collect()
    require(probe.length <= maxVocab,
      s"trainLocal: vocabulary exceeds maxVocab=$maxVocab distinct words — " +
        "raise the cap or use the distributed train/trainAuto")
    trainFromVocab(
      probe.map(r => (r.getSeq[String](0).toArray, r.getLong(1))), nMerges)
  }

  /** One training entry point that picks the engine by measured
    * vocabulary size: driver-side incremental ([[trainFromVocab]])
    * when the distinct-word count fits `localVocabCap`, distributed
    * rounds ([[trainVocab]]) past it. The pre-aggregation both engines
    * need runs ONCE — cut, probed for size, then fed to whichever
    * engine wins (the probe rows ARE the local engine's input; the
    * distributed loop reads the same checkpointed frame). */
  def trainAuto(docs: org.apache.spark.sql.DataFrame, textCol: String,
                nMerges: Int, localVocabCap: Int = 5000000): Seq[(String, String)] = {
    require(localVocabCap >= 1, s"localVocabCap=$localVocabCap must be >= 1")
    val vocab = wordVocab(docs, textCol).cut
    val probe = vocab.limit(localVocabCap + 1).collect()
    if (probe.length <= localVocabCap)
      trainFromVocab(
        probe.map(r => (r.getSeq[String](0).toArray, r.getLong(1))), nMerges)
    else trainVocab(vocab, nMerges)
  }

  /** The incremental merge loop over an in-memory vocabulary —
    * [[trainLocal]]'s core, separated for direct spec access. */
  private[ext] def trainFromVocab(vocab: Array[(Array[String], Long)],
                                  nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words = vocab.map(_._1.clone())
    val freqs = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val holders = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def scanPairs(syms: Array[String])(f: ((String, String)) => Unit): Unit = {
      var i = 0
      while (i < syms.length - 1) { f((syms(i), syms(i + 1))); i += 1 }
    }
    // heap entries are (count-at-push, pair) — lazily invalidated: an
    // entry is live iff the pair's CURRENT count equals its stamp, and
    // every count change pushes a fresh entry, so the first live pop is
    // the true argmax under the distributed tie order
    final case class Cand(c: Long, l: String, r: String,
                          ul: UTF8String, ur: UTF8String)
    val heap = new java.util.PriorityQueue[Cand](64,
      new java.util.Comparator[Cand] {
        override def compare(a: Cand, b: Cand): Int = {
          if (a.c != b.c) return if (a.c > b.c) -1 else 1
          val cl = a.ul.compareTo(b.ul)
          if (cl != 0) cl else a.ur.compareTo(b.ur)
        }
      })
    def push(p: (String, String), c: Long): Unit =
      heap.add(Cand(c, p._1, p._2,
        UTF8String.fromString(p._1), UTF8String.fromString(p._2)))

    var w = 0
    while (w < words.length) {
      val fw = freqs(w); val idx = w
      scanPairs(words(w)) { p =>
        counts.update(p, counts.getOrElse(p, 0L) + fw)
        holders.getOrElseUpdate(p, mutable.BitSet.empty) += idx
      }
      w += 1
    }
    counts.foreach { case (p, c) => push(p, c) }

    def rewrite(syms: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2 // leftmost-first non-overlapping
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < nMerges && !heap.isEmpty) {
      val top = heap.poll()
      val pair = (top.l, top.r)
      if (counts.getOrElse(pair, 0L) == top.c) { // live entry
        merges += pair
        val affected = holders.getOrElse(pair, mutable.BitSet.empty).toArray
        val changed = mutable.HashSet.empty[(String, String)]
        affected.foreach { wi =>
          val fw = freqs(wi)
          scanPairs(words(wi)) { p =>
            val nc = counts(p) - fw
            if (nc == 0L) counts.remove(p) else counts.update(p, nc)
            holders(p) -= wi
            changed += p
          }
          words(wi) = rewrite(words(wi), top.l, top.r)
          scanPairs(words(wi)) { p =>
            counts.update(p, counts.getOrElse(p, 0L) + fw)
            holders.getOrElseUpdate(p, mutable.BitSet.empty) += wi
            changed += p
          }
        }
        changed.foreach { p => counts.get(p).foreach(push(p, _)) }
      }
    }
    merges.toSeq
  }

  /** Persist a trained merge table as rank-ordered parquet — train
    * once, tokenize in every later job. Columns (rank, left, right);
    * rank is the merge priority [[loadMerges]] restores. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table written by [[saveMerges]], rank order restored
    * (the order IS the tokenizer — a shuffled table is a different
    * tokenizer). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select("rank", "left", "right")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Subword count under `merges` (LongType — summable into budgets). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeCountExpr(bridge.expression(text), merges))

  /** Subword tokens under `merges` (array<string>, document order). */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    bridge.column(BpeTokensExpr(bridge.expression(text), merges))

  /** Demo merge table over the synthetic corpus vocabulary.
    *
    * Deliberately RANK-MONOTONE: every merge's output is only ever a
    * component of LATER-ranked merges, and merges never create new
    * adjacencies of earlier pairs (new pairs always involve the merged
    * token). Under that restriction one in-rank-order exhaustive
    * replacement pass is provably identical to the min-rank loop —
    * which is what lets the DuckDB oracle replicate this table as a
    * chain of `replace()` calls over a `|c|`-delimited character
    * encoding (delimiters owned per token, so adjacent matches never
    * share characters and left-to-right non-overlapping replacement ==
    * leftmost-first BPE merging). The general Expression handles
    * arbitrary tables; the oracle pins this safe one cross-engine. */
  val demoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"),                      // the
    ("d", "a"), ("da", "t"), ("dat", "a"),        // data
    ("j", "o"), ("jo", "i"), ("joi", "n"),        // join
    ("e", "r"), ("o", "r"), ("s", "t"))           // common tails
}
