package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over a document corpus: inverted index, TF-IDF and
  * BM25 — the search-side operators of a training-data pipeline
  * (contamination lookup, near-dup mining and corpus QA all start from
  * an inverted index or a ranked match list). The reference engine has
  * no analog; this belongs to the SURVEY.md §2.5 extension surface.
  *
  * Scale shape: term frequencies are computed ROW-LOCALLY (one pass
  * over the token array — there is never a raw (doc, token) occurrence
  * shuffle), so the only wide exchange any operator here pays keys on
  * the TERM: the natural index-build partitioning, which also serves
  * per-term reads. Corpus-level statistics (N, total doc length) are
  * one-row aggregates, and the per-term document frequencies are a
  * vocabulary-sized table — both broadcast back onto the stream, so
  * the corpus itself is touched by map-side work plus exactly one
  * term-keyed exchange.
  *
  * Determinism: scores involving `ln` are emitted as fixed-point
  * micro-units (floor(x·1e6 + 0.5), exact BIGINT addition thereafter)
  * where they must be summed — double summation order across partitions
  * is not associative, fixed-point addition is.
  */
object Search {

  /** Per-row (term, tf) struct array in ONE fused codegen pass
    * (TermFreqsExpr hash-map loop) — the HOF twin below is
    * O(distinct·len) per document and quadratic on long pages; this
    * is linear. Output identical incl. first-occurrence order. */
  def termFreqs(tokens: Column): Column = TextHashExprs.termFreqs(tokens)

  /** Interpreted-HOF spec twin of [[termFreqs]] (the differential
    * test baseline, [[graft.functions]] house pattern). `tokens` must
    * be a real column (`withColumn`), not an inline `split(...)`: the
    * HOF references it once per distinct term and Catalyst inlines
    * (re-evaluating) expression arguments into every reference site
    * (SURVEY §7.1 HOF-inlining trap). */
  def termFreqsHof(tokens: Column): Column =
    transform(array_distinct(tokens),
      t => struct(t.as("term"),
        size(filter(tokens, w => w === t)).cast("long").as("tf")))

  /** (doc_id, term) postings pairs — one row per DISTINCT term of each
    * document (occurrence counts live in [[termFreqs]], not here). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"), explode(array_distinct(col("_toks"))).as("term"))

  /** Inverted index: per term, its document frequency and the sorted
    * posting list. One term-keyed shuffle; posting lists are sorted so
    * a reader can merge-intersect them without re-sorting. At 100 TB a
    * stopword-grade term is a skewed group — cap or drop terms with
    * df above a threshold downstream (they carry no selectivity). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postings(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_sort(collect_list(col("doc_id"))).as("postings"))

  /** Conjunctive term search: documents containing ALL `terms`.
    * Implemented as a semi-join-shaped count over postings pairs —
    * a document qualifies when it matches `terms.size` distinct query
    * terms. The term filter prunes the exploded stream before the only
    * shuffle (on doc_id). */
  def searchAll(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term")
    val qt = terms.distinct
    postings(docs, idCol, textCol)
      .filter(col("term").isin(qt: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_hits"))
      .filter(col("_hits") === qt.size)
      .select(col("doc_id"))
  }

  /** Smoothed TF-IDF per (document, term):
    * `score = tf · (ln((N+1)/(df+1)) + 1)` (the sklearn-style smooth
    * idf — never negative, never divides by zero). Output columns:
    * doc_id, term, tf, df, score.
    *
    * Plan: row-local tf ([[termFreqs]]) → explode; df is ONE
    * vocabulary-sized aggregate broadcast back; N is a one-row
    * aggregate broadcast. No corpus-wide shuffle at all — the df
    * aggregation exchanges only (term, partial-count) pairs. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"), explode(termFreqs(col("_toks"))).as("_t"))
      .select(col("doc_id"), col("_t.term").as("term"), col("_t.tf").as("tf"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("_n") + 1).cast("double") / (col("df") + 1)) + 1.0))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** BM25 scores for a fixed query-term set (Robertson/Sparck Jones,
    * k1/b defaults per the classic Okapi parametrization):
    *
    * `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`
    * `s(t,d) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
    *
    * Per-term contributions are quantized to micro-units
    * (floor(s·1e6 + 0.5)) BEFORE the per-document sum so the sum is
    * exact integer addition — partition order can never perturb the
    * result (see object scaladoc). Output: (doc_id, score_e6).
    *
    * Plan: tf per query term is row-local (one `filter` HOF per term
    * over the materialized token array — query terms are few); df and
    * the (N, Σdl) stats broadcast; the only shuffle is the final
    * doc-keyed sum, which AQE coalesces to the match count. */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val qt = terms.distinct
    val toks = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_toks"))
      .select(col("doc_id"), col("_toks"), size(col("_toks")).cast("long").as("_dl"))
    val stats = toks.agg(count(lit(1)).as("_n"), sum(col("_dl")).as("_sdl"))
    val perTerm = toks
      .select(col("doc_id"), col("_dl"),
        explode(array(qt.map(term =>
          struct(lit(term).as("term"),
            size(filter(col("_toks"), w => w === lit(term))).cast("long").as("tf"))): _*)).as("_t"))
      .select(col("doc_id"), col("_dl"), col("_t.term").as("term"), col("_t.tf").as("tf"))
      .filter(col("tf") > 0)
    val dfs = perTerm.groupBy(col("term")).agg(count(lit(1)).as("df"))
    perTerm.join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_avgdl", col("_sdl").cast("double") / col("_n"))
      .withColumn("_s6",
        floor(
          log((col("_n").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * (k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("_dl") / col("_avgdl"))) *
            1000000.0 + 0.5).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_s6")).as("score_e6"))
  }

  /** Exact PHRASE search — the positional-postings capability the
    * bag-of-terms surface above can't express (IIR §2.4 positional
    * indexes): a document matches where the phrase's terms occur at
    * CONSECUTIVE token positions; emits (doc_id, n_occurrences) for
    * matching docs.
    *
    * Anchor trick: token at position p matching phrase offset j votes
    * for anchor p − j; an anchor with all |phrase| distinct votes is an
    * occurrence (duplicate phrase terms vote once per offset, so the
    * count is exact for phrases like "the cat the"). Scale shape: the
    * exploded token stream is pruned to phrase terms MAP-SIDE (the
    * phrase rides as literals — no query-side join), then one
    * (doc, anchor) integer agg and one doc-keyed count; both
    * partial-agg, no skew exposure beyond a term's true df. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val offMap = phrase.zipWithIndex.groupBy(_._1)
      .map { case (t, l) => t -> l.map(_._2) }
    val offCol = offMap.foldLeft(lit(null).cast("array<int>")) {
      case (acc, (t, js)) =>
        when(col("_term") === t, array(js.map(lit): _*)).otherwise(acc)
    }
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("_pos", "_term")))
      .filter(col("_term").isin(phrase.distinct: _*))
      .withColumn("_j", explode(offCol))
      .select(col("doc_id"), (col("_pos") - col("_j")).as("_anchor"))
      .filter(col("_anchor") >= 0)
      .groupBy(col("doc_id"), col("_anchor"))
      .agg(count(lit(1)).as("_k"))
      .filter(col("_k") === phrase.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Top-`k` characteristic terms per document by [[tfidf]] score —
    * the keyword-extraction / doc-summarization primitive (tf-idf
    * keyword selection is the classic baseline; IIR §6.2). Ranking is
    * (score desc, term asc) — ties (same tf and df) break
    * lexicographically, so the kept set is deterministic cross-engine.
    * Output: (doc_id, term, rank, score_e6) with score quantized to
    * micro-units AFTER ranking (ranking compares the exact doubles;
    * identical count inputs give identical doubles on any engine).
    *
    * Scale shape: [[tfidf]]'s one doc-keyed tf agg + broadcast df,
    * then ONE doc-keyed window whose `row_number() <= k` filter plans
    * as WindowGroupLimit — each map task pre-prunes to its local
    * top-k per doc before the exchange, so a 10⁶-term doc ships k
    * rows per upstream partition, not its whole vocabulary. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tfidf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"),
        floor(col("score") * 1000000.0 + 0.5).cast("long").as("score_e6"))
  }

  /** Reciprocal-rank fusion of several rankings (Cormack, Clarke &
    * Buettcher 2009 SIGIR, "Reciprocal rank fusion outperforms
    * Condorcet and individual rank learning methods"): each ranking
    * contributes `10⁶ div (k + rank)` micro-units per doc (rank from
    * 1 by that ranking's (score desc, id asc) order) and fused
    * candidates sum their contributions — INTEGER floor division, so
    * the fused score is bit-replicable in any engine, unlike the
    * 1/(k+r) float form. Docs absent from a ranking contribute
    * nothing (the full-outer union semantics RRF is defined with).
    * Input frames carry (idColumn, scoreColumn); `k` = 60 per the
    * paper. Output: (id, rrf_e6) — callers sort/limit.
    *
    * Scale shape: one window per input ranking (each pre-pruned by
    * its producer — rankings are top-N result sets, not corpora),
    * one union, one id-keyed integer sum. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, s"k must be >= 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val ranked = rankings.map { r =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      r.select(col(idCol).as("id"),
          row_number().over(w).cast("long").as("_rank"))
        .select(col("id"), expr(s"1000000L div (${k}L + _rank)").as("_rrf"))
    }
    ranked.reduce(_ union _)
      .groupBy(col("id"))
      .agg(sum(col("_rrf")).as("rrf_e6"))
  }
}
