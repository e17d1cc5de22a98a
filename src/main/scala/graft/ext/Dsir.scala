package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS): keep the raw-corpus documents whose hashed-n-gram
  * distribution resembles a small TARGET corpus. The pipeline:
  *
  *  1. features — each doc's word unigrams + bigrams, hashed into `m`
  *     buckets (the paper's 10k-bucket feature hash);
  *  2. two smoothed bucket distributions, target p and raw q;
  *  3. per-doc importance log-weight  Σ_b c_b·(ln p_b − ln q_b);
  *  4. Gumbel top-k resample without replacement ∝ the weights.
  *
  * Everything is deterministic by construction (repo rule): log-probs
  * are quantized to the lp6 fixed point (`floor(ln·1e6 + 0.5)`, the
  * cross-engine convention every LM operator here uses), per-doc
  * weights are then INTEGER sums, and the Gumbel noise derives from
  * [[Corpus.orderHash]] — no RNG state, so the selection is
  * reproducible across engines, partitionings and task retries.
  *
  * Scale shape: the weight table has exactly `m` rows (the feature
  * width, e.g. 10k — never corpus-sized), so it is a bounded driver
  * envelope; scoring is MAP-ONLY against the table as a codegen array
  * literal (the langid literal-state convention — no join, no
  * shuffle); training is two explode+groupBy passes whose shuffle keys
  * are the m buckets; the resample is a TakeOrdered top-n for bounded
  * budgets ([[resample]]) and radix-selection + threshold filter for
  * corpus-sized ones ([[resampleAt]] — the TakeOrdered driver merge of
  * n·partitions rows does not survive n ~ 10⁹).
  */
object Dsir {

  /** Hashed n-gram feature buckets of a word-hash array: unigrams plus
    * bigram shingles ([[TextHash.shingleHashes]] n=2), each reduced
    * mod `m`. One doc → (tokens + tokens−1) bucket ids, multiplicity
    * preserved (counts, not a set — the paper's bag-of-n-grams). */
  def buckets(whs: Column, m: Int): Column = {
    require(m >= 2, s"m=$m must be >= 2")
    transform(concat(whs, TextHash.shingleHashes(whs, 2)),
      h => pmod(h, lit(m.toLong)))
  }

  /** Smoothed per-bucket log-probability table of a corpus over all
    * `m` buckets (absent buckets get the add-one floor):
    * `lp6 = floor(ln((c_b+1)/(N+m))·1e6 + 0.5)` — integers in, one
    * double division and one ln on identical doubles cross-engine,
    * then fixed-point quantization (the q_tfidf/q_lm_score
    * convention). Output: (bucket, lp6), exactly m rows. */
  def bucketLp6(docs: DataFrame, textCol: String, m: Int): DataFrame = {
    val cnt = docs
      .select(explode(buckets(TextHash.wordHashes(col(textCol)), m)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("_c"))
    val spine = docs.sparkSession.range(m).select(col("id").as("bucket"))
    val tot = cnt.agg(sum(col("_c")).as("_n"))
    spine.join(cnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        floor(log((coalesce(col("_c"), lit(0L)) + 1L).cast("double")
          / (coalesce(col("_n"), lit(0L)) + m).cast("double")) * 1000000.0 + 0.5)
          .cast("long").as("lp6"))
  }

  /** Importance log-ratio table `lr6_b = lp6_target − lp6_raw` —
    * (bucket, lr6), m rows. Positive buckets are target-like. */
  def trainWeightTable(target: DataFrame, raw: DataFrame,
                       textCol: String, m: Int): DataFrame = {
    val t = bucketLp6(target, textCol, m).withColumnRenamed("lp6", "_t6")
    val r = bucketLp6(raw, textCol, m).withColumnRenamed("lp6", "_r6")
    t.join(r, "bucket").select(col("bucket"), (col("_t6") - col("_r6")).as("lr6"))
  }

  /** [[trainWeightTable]] materialized as an index→lr6 array (the
    * bounded driver envelope: m entries, the feature-hash width). */
  def trainWeights(target: DataFrame, raw: DataFrame,
                   textCol: String, m: Int): Array[Long] = {
    val out = new Array[Long](m)
    trainWeightTable(target, raw, textCol, m).collect()
      .foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Per-doc DSIR importance log-weight: INTEGER sum of `lr6` over the
    * doc's feature buckets, computed map-side against the weight table
    * riding the codegen kernel ([[BucketExprs.sumLong]]) — no join, no
    * shuffle, one tight loop per document. [[scoreDocsHof]] is the
    * readable spec this must equal (lambda HOFs evaluate interpreted —
    * not the shape for the map stage every document crosses). */
  def scoreDocs(docs: DataFrame, textCol: String, weights: Array[Long],
                outCol: String = "dsir_lw6"): DataFrame =
    docs.withColumn(outCol,
      BucketExprs.sumLong(
        buckets(TextHash.wordHashes(col(textCol)), weights.length), weights))

  /** HOF spec form of [[scoreDocs]] (differential reference only). */
  private[graft] def scoreDocsHof(docs: DataFrame, textCol: String,
                                weights: Array[Long],
                                outCol: String = "dsir_lw6"): DataFrame = {
    val wlit = typedlit(weights.toSeq)
    docs.withColumn(outCol,
      aggregate(buckets(TextHash.wordHashes(col(textCol)), weights.length),
        lit(0L), (acc, b) => acc + element_at(wlit, b.cast("int") + 1)))
  }

  /** Gumbel top-k importance resample (Xie et al. §2: sampling without
    * replacement ∝ exp(log-weight) ≡ top-k of logw + Gumbel noise):
    * noise derives from the LCG order hash — `u = (orderHash(id)+0.5)
    * / 2³¹` is an exact binary fraction in (0,1), so `g6 =
    * floor(−ln(−ln u)·1e6 + 0.5)` is identical cross-engine, and the
    * key `lw6 + g6` stays in the integer domain (both terms share the
    * 1e6 log scale, so the Gumbel-max property is preserved).
    * Deterministic: same corpus + same weights → byte-identical
    * sample, stable under task retries. Same id contract as
    * [[Corpus.orderHash]] (non-negative, < ~8.4e9). */
  def resample(docs: DataFrame, idCol: String, textCol: String,
               weights: Array[Long], n: Int): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    scoreDocs(docs, textCol, weights)
      .withColumn("_gumbel_key", gumbelKey(idCol))
      .orderBy(col("_gumbel_key").desc, col(idCol))
      .limit(n)
      .drop("_gumbel_key")
  }

  private def gumbelKey(idCol: String): org.apache.spark.sql.Column = {
    val u = (Corpus.orderHash(col(idCol)).cast("double") + 0.5) / 2147483648.0
    val g6 = floor(-log(-log(u)) * 1000000.0 + 0.5).cast("long")
    col("dsir_lw6") + g6
  }

  /** [[resample]] for corpus-sized budgets: the SAME selected set (ties
    * on the Gumbel key broken toward smaller ids, exactly the
    * `orderBy(key desc, id)` rule), but the top-n is found by
    * distributed radix selection ([[graft.operators.Selection]])
    * instead of a sorted limit — `orderBy.limit(n)` plans as
    * TakeOrderedAndProject, whose driver merge of n·partitions rows is
    * an OOM at n ~ 10⁹ (the keep budget this operator exists for).
    *
    * Cost shape: ONE text-scoring pass materialized as a slim
    * (id, key) checkpoint — 16 bytes/doc, the only thing the ~8
    * histogram scans touch — one more text pass for the final
    * emit, and zero joins (the survivor predicate is a key/id
    * threshold filter, map-only). Selection histograms are ≤ 65,536
    * rows each — bounded driver envelopes, never n rows. */
  def resampleAt(docs: DataFrame, idCol: String, textCol: String,
                 weights: Array[Long], n: Long): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    import graft.core.Checkpoints.CutOps
    val scored = scoreDocs(docs, textCol, weights)
      .withColumn("_gumbel_key", gumbelKey(idCol))
    val slim = scored.select(col(idCol), col("_gumbel_key")).cut
    if (slim.count() <= n) return scored.drop("_gumbel_key")
    val (t, r) = graft.operators.Selection.nthLargest(slim, "_gumbel_key", n)
    // r tie slots go to the SMALLEST ids among key == t (ids are unique,
    // so the r-th smallest id is a clean cut with no residual tie)
    val (idCut, _) = graft.operators.Selection.nthSmallest(
      slim.filter(col("_gumbel_key") === t), idCol, r)
    scored
      .filter(col("_gumbel_key") > t ||
        (col("_gumbel_key") === t && col(idCol) <= idCut))
      .drop("_gumbel_key")
  }
}
