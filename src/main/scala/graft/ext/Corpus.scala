package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: stratified
  * sampling (domain/language rebalancing), sequence packing (context-
  * window fill), and benchmark decontamination — the steps that run
  * AFTER cleaning/dedup (DocPipeline) and BEFORE the corpus is handed
  * to a trainer.
  *
  * Everything here is deterministic by construction (LCG order hashes,
  * polynomial shingle hashes — no engine RNG), so each operator is
  * DuckDB-oracle-checkable (q_stratified_sample / q_pack /
  * q_decontaminate) and reruns reproduce byte-identical corpora — a
  * practical requirement for training-data lineage.
  *
  * Scale shape: sampling is one window over the strata partitioning;
  * packing is one window per writer partition; decontamination shuffles
  * (id, shingle) pairs — never text — and aggregates candidate pairs
  * only. No driver-side loops, no all-pairs products anywhere.
  */
object Corpus {

  /** Deterministic per-row order hash: LCG over the id, the same
    * arithmetic the LSH plane constants use (public-domain LCG
    * parameters), replicated verbatim in the DuckDB oracles. Maps id →
    * [0, 2^31) with no RNG so the sample is stable across engines,
    * partitionings and reruns.
    *
    * The id is pre-reduced into [0, 2^31) BEFORE the multiply: for
    * every id already in that range (all the oracle tables) the result
    * is bit-identical to the plain `id·a + c mod 2^31` the DuckDB
    * twins compute, and for 64-bit ids (xxhash64-derived keys,
    * ShardStore pack keys) the multiply can no longer overflow ANSI
    * arithmetic — max (2^31−1)·1103515245 ≈ 2.4e18 < Long.Max. */
  def orderHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * 1103515245L + 12345L,
      lit(2147483648L))

  /** Stratified sample: keep `ceil(frac · |stratum|)` rows per stratum,
    * chosen by deterministic hash order (tie-broken by id). Guarantees
    * every non-empty stratum keeps ≥ 1 row — the property that matters
    * when rebalancing a corpus whose tail languages are thousands of
    * times rarer than the head.
    *
    * One shuffle on the strata key for the window; the count rides the
    * same window (no second aggregation pass). At 100 TB a hot stratum
    * (e.g. `en`) is a skewed window partition: use
    * [[stratifiedSampleSalted]] to sub-stratify it, or [[weightedSample]]
    * with a constant weight when exact per-stratum counts aren't
    * required (map-only, no window at all). */
  def stratifiedSample(df: DataFrame, strata: Seq[String], frac: Double,
                       idCol: String): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac=$frac outside (0,1]")
    val part = Window.partitionBy(strata.map(col): _*)
    val w = part.orderBy(orderHash(col(idCol)), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(part))
      .filter(col("_rn") <= ceil(col("_cnt") * lit(frac)))
      .drop("_rn", "_cnt")
  }

  /** [[stratifiedSample]] for corpora with HOT strata (an `en` stratum
    * thousands of times larger than the tail): sub-stratify every
    * stratum into `salts` deterministic shards (LCG hash of the id —
    * NOT round-robin, which depends on partition layout) and sample
    * each shard independently. The window partition count multiplies by
    * `salts`, so no single sort partition holds a whole hot stratum.
    *
    * Exactness trade: each shard keeps `ceil(frac·|shard|)`, so the
    * stratum total is at most `salts − 1` rows above `ceil(frac·count)`
    * — negligible at the sizes that need salting, and every non-empty
    * stratum still keeps ≥ 1 row. Fully deterministic: same corpus,
    * same salt count → byte-identical sample. */
  def stratifiedSampleSalted(df: DataFrame, strata: Seq[String], frac: Double,
                             idCol: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts=$salts must be >= 1")
    val salted = df.withColumn("_salt", pmod(orderHash(col(idCol)), lit(salts.toLong)))
    stratifiedSample(salted, strata :+ "_salt", frac, idCol).drop("_salt")
  }

  /** Mixture balancing to a TARGET distribution (the data-mixture
    * shaping step of pretraining recipes — fix the domain/language
    * proportions, cf. the published mixture tables of the major
    * open-data recipes and the DoReMi line of work): given integer
    * target `weights` w_g (proportions w_g/ΣW), keep the LARGEST
    * corpus subsample realizing them without upsampling —
    *
    *   T      = min_g ⌊count_g · W / w_g⌋     (binding group saturates)
    *   keep_g = ⌊w_g · T / W⌋                 (≤ count_g by T's bound)
    *
    * then per group the `keep_g` hash-first rows ([[orderHash]] order,
    * id tie-break — deterministic, engine-replicable). All integer
    * floor arithmetic; realized proportions sit within one row of
    * target. Groups absent from `weights` are dropped; a weights group
    * empty in the corpus forces T = 0 (callers wanting "best effort"
    * drop those keys first). Returns the kept rows.
    *
    * Scale shape: one tiny per-group count agg (≤ |groups| rows to the
    * driver — the [[graft.operators.Profile]] broadcast convention),
    * then ONE group-partitioned window with the keep caps broadcast
    * back; hot groups salt exactly like [[stratifiedSampleSalted]]
    * (sub-stratify, divide each cap by `salts`) if needed. */
  def matchMixture(df: DataFrame, groupCol: String, idCol: String,
                   weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val w = weights.values.sum
    val counts = df.filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (g, wg) =>
      counts.getOrElse(g, 0L) * w / wg
    }.min
    val keeps = weights.map { case (g, wg) => g -> wg * t / w }
    val keepCol = keeps.foldLeft(lit(0L)) { case (acc, (g, k)) =>
      when(col(groupCol) === g, lit(k)).otherwise(acc)
    }
    val win = Window.partitionBy(col(groupCol))
      .orderBy(orderHash(col(idCol)), col(idCol))
    df.filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .withColumn("_rn", row_number().over(win))
      .filter(col("_rn") <= keepCol)
      .drop("_rn")
  }

  /** Stratified sample with an exact per-stratum cap: keep the `n`
    * hash-first rows of every stratum (fewer when the stratum is
    * smaller) — the "at most N documents per domain" rebalancing rule. */
  def stratifiedSampleN(df: DataFrame, strata: Seq[String], n: Int,
                        idCol: String): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(orderHash(col(idCol)), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Sequence packing: assign documents to fixed-token-budget bins
    * ("context windows") by streaming fill — documents are taken in id
    * order within each writer partition, and a document belongs to the
    * bin its cumulative token offset starts in:
    * `bin = floor((cumsum_inclusive − n_tok) / budget)`.
    *
    * This is the concat-then-chunk packing used for pretraining shards
    * (documents are never split; a document straddling a boundary stays
    * in the bin where it started, so bins can overflow by at most one
    * document — the spillover variant). First-fit-decreasing would pack
    * tighter but is inherently sequential per bin set; streaming fill is
    * one window cumsum, embarrassingly parallel across writer
    * partitions, and deterministic — at 100 TB each writer partition
    * (e.g. language × date shard) packs independently.
    *
    * Returns the input plus `bin_id` (0-based within the partition). */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
                    budget: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(nTokCol)).over(w))
      .withColumn("bin_id",
        floor((col("_cum") - col(nTokCol)) / lit(budget)).cast("long"))
      .drop("_cum")
  }

  /** Exact greedy packing: like [[packSequences]] but bins NEVER exceed
    * `budget` (a doc that doesn't fit starts the next bin; a single
    * oversized doc gets a bin to itself). Greedy fill is inherently
    * sequential per writer partition, so this is the one corpus
    * operator where `mapPartitions` is the honest primitive, not a
    * window: rows are hash-partitioned by the writer key (a key never
    * splits across partitions), sorted by (key, id), and scanned once
    * with O(1) state — fully deterministic, parallel ACROSS writer
    * partitions, and the row scan does no per-row allocation beyond the
    * output row. Use [[packSequences]] when slight overflow is
    * acceptable and a pure-SQL plan is preferred. */
  def packSequencesGreedy(df: DataFrame, idCol: String, nTokCol: String,
                          budget: Long, partitionCols: Seq[String]): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(partitionCols.nonEmpty,
      "greedy packing needs writer partitions (pass e.g. a language/shard column)")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val parted = df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ idCol).map(col): _*)
    val outSchema = df.schema.add("bin_id", LongType, nullable = false)
    val keyIdx = partitionCols.map(df.schema.fieldIndex)
    val tokIdx = df.schema.fieldIndex(nTokCol)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var bin = 0L
      var fill = 0L
      it.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; bin = 0L; fill = 0L }
        val tokRaw = r.getAs[Number](tokIdx)
        // fail with the column named — a bare NPE deep in a task names
        // neither the row nor the offending field
        require(tokRaw != null,
          s"packSequencesGreedy: null $nTokCol at ${keyIdx.map(r.get).mkString(",")} " +
            "(token counts must be non-null — filter or fill upstream)")
        val tok = tokRaw.longValue()
        if (fill > 0 && fill + tok > budget) { bin += 1; fill = 0L }
        fill += tok
        Row.fromSeq(r.toSeq :+ bin)
      }
    }(Encoders.row(outSchema))
  }

  /** Materialize packed bins ([[packSequences]] / [[packSequencesGreedy]]
    * output) into training-ready rows: one row per (writer partition,
    * bin) carrying the in-id-order doc ids, per-doc token counts (the
    * attention/boundary mask is their prefix sum), and the concatenated
    * token stream — the last step before writing training shards.
    *
    * ONE shuffle on the (partition, bin) key; each group's payload is
    * bounded by the packing budget, so rows stay executor-sized at any
    * corpus scale. Intra-bin order is deterministic: docs ride a
    * `sort_array(collect_list(struct(id, …)))`, not the arrival order
    * of `collect_list`. */
  def materializePacked(df: DataFrame, idCol: String, tokensCol: String,
                        binCol: String = "bin_id",
                        partitionCols: Seq[String] = Nil): DataFrame = {
    val keys = (partitionCols :+ binCol).map(col)
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(col(idCol), col(tokensCol))))
        .as("_docs"))
      .select(keys ++ Seq(
        transform(col("_docs"), d => d(idCol)).as("doc_ids"),
        transform(col("_docs"), d => size(d(tokensCol)).cast("long"))
          .as("doc_lens"),
        flatten(transform(col("_docs"), d => d(tokensCol))).as("tokens")): _*)
      .withColumn("n_docs", size(col("doc_ids")).cast("long"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Inverse of [[materializePacked]] — the READ side of the training
    * shard round trip: restore one (doc id, tokens) row per document
    * from the packed bins by slicing each bin's concatenated stream at
    * the recorded `doc_lens` boundaries. Documents come back EXACTLY
    * (ids, order within bin, every token) — the round trip is the loss
    * check, pinned by q_unpack_roundtrip and CorpusSpec.
    *
    * Scale shape: map-only — one posexplode over the per-bin doc list
    * and an offset computed from the lens prefix (O(docs-per-bin²) per
    * bin on arrays of ints; bins hold dozens of docs by construction).
    * No shuffle, no join. */
  def unpackShards(packed: DataFrame, binCol: String = "bin_id",
                   idOut: String = "doc_id",
                   tokensOut: String = "tokens"): DataFrame =
    packed
      .select(col(binCol), col("doc_lens"), col("tokens"),
        posexplode(col("doc_ids")).as(Seq("_i", idOut)))
      .withColumn("_off",
        aggregate(slice(col("doc_lens"), lit(1), col("_i")),
          lit(0L), (a, x) => a + x))
      .select(col(idOut),
        slice(col("tokens"), (col("_off") + 1L).cast("int"),
          element_at(col("doc_lens"), col("_i") + 1).cast("int"))
          .as(tokensOut))

  /** Weighted (quality-proportional) sampling: keep a row with
    * probability `weightCol` (clamped to [0,1]) — but DETERMINISTICALLY,
    * by comparing the row's LCG order hash against the weight:
    * `orderHash(id) < weight · 2³¹`. The standard quality-score /
    * temperature downsampling step, with no RNG state: map-only (zero
    * shuffle), reproducible across engines, partitionings and reruns,
    * and stable under re-execution of failed tasks (a `rand()` filter
    * is NOT — recomputed partitions draw different rows, the
    * SPARK-23207 class of bug this library designs out everywhere). */
  def weightedSample(df: DataFrame, weightCol: String, idCol: String): DataFrame =
    df.filter(
      orderHash(col(idCol)).cast("double") <
        least(greatest(col(weightCol), lit(0.0)), lit(1.0)) * lit(2147483648.0))

  /** Temperature-flattened mixture sampling (α = 0.5): downsample each
    * group (language / source / domain) so kept counts are proportional
    * to `count^α` instead of `count` — the multilingual-pretraining
    * rebalancing rule that keeps tail languages visible without letting
    * the head dominate. Rates are anchored at the SMALLEST group (it
    * keeps everything): `rate_g = sqrt(min_count / count_g)`, and a row
    * survives iff `orderHash(id) < rate_g · 2³¹` — the same
    * deterministic no-RNG keep rule as [[weightedSample]].
    *
    * α is fixed at 0.5 because `sqrt` is IEEE-754 correctly rounded —
    * both engines (and any rerun) compute the bit-identical rate, so
    * the sample is byte-reproducible cross-engine; `pow(x, α)` for
    * general α carries no such guarantee. For other temperatures,
    * compose: α = 0.25 is `temperatureSample` applied twice.
    *
    * Precondition (all `orderHash` consumers, incl. [[weightedSample]]):
    * `idCol` must be NON-NEGATIVE and small enough that the hash's
    * multiply stays inside a 64-bit signed range (ids < ~8.4e9). The
    * SQL twin uses `%` (sign follows the dividend) against Spark's
    * `pmod`, and an unchecked BIGINT multiply — negative or larger ids
    * diverge or error cross-engine, so "byte-reproducible" holds only
    * under this id contract.
    *
    * Scale shape: the per-group count aggregation produces one row per
    * group (dozens, not billions) — it and the derived rate frame
    * broadcast back onto the corpus, so the corpus itself is touched by
    * exactly one map-side pass (partial agg + broadcast-hash probe +
    * filter); no corpus shuffle at any size. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_cnt"))
    val minCnt = counts.agg(min(col("_cnt")).as("_min"))
    val rates = counts.crossJoin(broadcast(minCnt))
      .select(col(groupCol),
        sqrt(col("_min").cast("double") / col("_cnt")).as("_rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(orderHash(col(idCol)).cast("double") < col("_rate") * lit(2147483648.0))
      .drop("_rate")
  }

  /** Token-budget selection: per group, keep the highest-`qualityCol`
    * documents until `budget` tokens are taken — the "best N tokens per
    * domain" corpus-shaping rule. A document is kept iff its cumulative
    * token offset (in quality order, id tie-break) STARTS under the
    * budget, so the last kept document may straddle the boundary — the
    * same spillover convention as [[packSequences]], and the choice
    * that keeps the filter a pure window function (exact take-until
    * would need the previous row's decision, i.e. a sequential scan).
    *
    * One window cumsum per group partition — embarrassingly parallel
    * across groups; a hot group is a skewed sort partition, the same
    * hazard (and salting remedy) as [[stratifiedSample]]. */
  def selectByBudget(df: DataFrame, groupCols: Seq[String], nTokCol: String,
                     qualityCol: String, budget: Long, idCol: String): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(nTokCol)).over(w))
      .filter(col("_cum") - col(nTokCol) < budget)
      .drop("_cum")
  }

  /** [[selectByBudget]] for ONE corpus-sized stratum (or an unstratified
    * corpus): the identical kept set — best-quality-first in
    * (quality DESC, id) order until the crossing document — but the cut
    * point is found by weighted radix descent
    * ([[graft.operators.Selection.budgetThresholdDesc]]) instead of a
    * window cumsum. The window form partitions by the group columns, so
    * a hot stratum ("en" at web scale) or an empty `groupCols` becomes
    * ONE sort partition — this path never sorts: ~8 histogram scans of
    * a slim (id, quality, weight) checkpoint, each collecting ≤ 65,536
    * rows, then a map-only threshold filter over the original frame.
    * Callers with several hot strata filter each and union the results;
    * small strata stay on the window form.
    *
    * `qualityCol` must be an integral column (the radix domain —
    * fractional quality scores should be fixed-pointed upstream, the
    * repo-wide e6 convention) and NON-NULL (enforced: the window form's
    * DESC ordering puts nulls LAST, where they can still land inside
    * the budget, while the radix descent ignores null keys entirely —
    * rather than silently diverge from the documented identical-kept-
    * set contract, a null quality raises; coalesce a sentinel upstream
    * if nulls are meaningful); `nTokCol` must be non-negative. */
  def selectByBudgetAt(df: DataFrame, nTokCol: String, qualityCol: String,
                       budget: Long, idCol: String): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val qt = df.schema(qualityCol).dataType
    require(Seq("long", "int", "short", "byte").contains(qt.typeName),
      s"qualityCol must be integral for radix selection, got $qt")
    import graft.core.Checkpoints.CutOps
    val q = col(qualityCol).cast("long")
    val slim = df.select(col(idCol), q.as("_q"), col(nTokCol).cast("long").as("_w")).cut
    // null-quality check rides the existing total-weight action
    val total = slim.agg(sum(col("_w")), sum(col("_q").isNull.cast("long"))).head()
    if (!total.isNullAt(1) && total.getLong(1) > 0L)
      throw new IllegalArgumentException(
        s"selectByBudgetAt: ${total.getLong(1)} null value(s) in $qualityCol — " +
        "null quality has no radix order; coalesce to a sentinel upstream")
    if (total.isNullAt(0) || total.getLong(0) < budget) return df
    val (t, r) = graft.operators.Selection.budgetThresholdDesc(slim, "_q", "_w", budget)
    val (idCut, _) = graft.operators.Selection.budgetThresholdAsc(
      slim.filter(col("_q") === t), idCol, "_w", r)
    df.filter(q > t || (q === t && col(idCol) <= idCut))
  }

  /** Deterministic corpus shuffle for training-order randomization:
    * globally sort by the LCG order hash (tie-break id), sharded by
    * FIXED hash ranges — shard = floor(h·numShards / 2³¹), an identity
    * RDD partitioner mapping shard i to partition i. This is the one
    * place the operator must NOT use repartitionByRange: its
    * RangePartitioner SAMPLES boundaries (seeded by rdd id and input
    * layout), so shard membership would shift across reruns and break
    * the training-order lineage contract — the whole point of the
    * operator. Fixed ranges of a uniform hash keep shards balanced;
    * concatenating shards in index order is the global hash order;
    * rerunning on the same ids reproduces shard N byte-for-byte. */
  def shuffleDeterministic(df: DataFrame, idCol: String,
                           numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards=$numShards must be >= 1")
    val spark = df.sparkSession
    val withH = df.withColumn("_h", orderHash(col(idCol)))
      .withColumn("_shard",
        floor(col("_h") * numShards.toLong / 2147483648L).cast("int"))
    val schema = withH.schema
    val parted = withH.rdd.map(r => (r.getAs[Int]("_shard"), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = numShards
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      }).map(_._2)
    spark.createDataFrame(parted, schema)
      .sortWithinPartitions(col("_h"), col(idCol))
      .drop("_h", "_shard")
  }

  /** Context-window chunking: split each document's token stream into
    * windows of `maxTokens` tokens with `overlap` tokens carried over
    * between consecutive chunks (stride = maxTokens − overlap) — the
    * long-document preprocessing step ahead of sequence packing
    * ([[packSequences]] bins the RESULTING chunks). The final chunk may
    * be shorter; documents shorter than one window yield exactly one
    * chunk; empty documents yield none. Output: (idCol, chunk_id,
    * chunk, n_tok) with chunk_id counting from 0.
    *
    * Map-only and shuffle-free at any corpus size: tokens are
    * materialized once per row (HOF-inlining trap, SURVEY §7.1) and
    * each chunk is a slice of that array — no explode-then-window
    * regrouping, which would shuffle every token. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens=$maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap=$overlap must be in [0, maxTokens)")
    // length > 0 first: split("", " ") is [""], a phantom 1-token
    // chunk the documented "empty documents yield none" forbids
    df.filter(length(col(textCol)) > 0)
      .withColumn("_toks", split(col(textCol), " "))
      .filter(size(col("_toks")) > 0)
      .select(col(idCol),
        posexplode(chunkSlices(col("_toks"), maxTokens, overlap))
          .as(Seq("chunk_id", "_ctoks")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(col("_ctoks"), " ").as("chunk"),
        size(col("_ctoks")).cast("long").as("n_tok"))
  }

  /** The chunk-window expression [[chunkDocs]] explodes: given a
    * non-empty token-array column, the array of `maxTokens`-token
    * slices at stride `maxTokens − overlap` (index = chunk_id). Shared
    * with [[Dedup.chunkDedup]]'s map-side reassembly so the rebuilt
    * chunking is BY CONSTRUCTION the chunking the winner election saw
    * — the slim-rebuild pattern only works when both sides split
    * identically. */
  private[graft] def chunkSlices(toks: Column, maxTokens: Int,
                                 overlap: Int): Column = {
    val stride = maxTokens - overlap
    val nch = greatest(lit(1L),
      (floor((size(toks) - lit(overlap + 1)) / lit(stride)) + 1).cast("long"))
    transform(sequence(lit(0L), nch - 1), k =>
      slice(toks, k.cast("int") * stride + 1, lit(maxTokens)))
  }

  /** [[chunkDocs]] with a PER-WORD COST function — the subword-budget
    * chunker (chunk while `Σ wordCost ≤ budget`, never splitting a
    * word): pass `w => Bpe.tokenCount(w, merges)` (a codegen BPE count
    * per word) and chunks respect a SUBWORD context budget, the real
    * training constraint, instead of a whitespace-word count.
    *
    * Greedy fill per document: a word that would overflow the running
    * budget starts the next chunk; a single word costing more than the
    * whole budget gets a chunk to itself (never silently dropped).
    * Output contract ≡ [[chunkDocs]]: (idCol, chunk_id, chunk, n_tok),
    * n_tok now in COST units. With `wordCost = 1` this reproduces
    * chunkDocs(maxTokens = budget, overlap = 0) exactly (CorpusSpec
    * pins it).
    *
    * Scale shape: map-only and shuffle-free like its parent — the
    * greedy scan is an `aggregate` HOF over the costs array emitting
    * only CHUNK BOUNDARIES (state is O(chunks), not O(words)), chunks
    * are slices of the one materialized token array, and the generator
    * input is the built chunk-struct array, so the token/cost arrays
    * never ride the exploded rows. */
  def chunkDocsBudget(df: DataFrame, idCol: String, textCol: String,
                      budget: Long,
                      wordCost: Column => Column = _ => lit(1L)): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    // length > 0: split("", " ") is [""] — see chunkDocs
    df.filter(length(col(textCol)) > 0)
      .withColumn("_toks", split(col(textCol), " "))
      .withColumn("_ntok", size(col("_toks")))
      .filter(col("_ntok") > 0)
      .withColumn("_costs", transform(col("_toks"), w => wordCost(w).cast("long")))
      .withColumn("_bounds",
        aggregate(
          col("_costs"),
          struct(array(lit(0)).as("bounds"), lit(0L).as("fill"), lit(0).as("idx")),
          (st, c) => {
            val overflow = st("fill") > 0 && st("fill") + c > budget
            struct(
              when(overflow, concat(st("bounds"), array(st("idx"))))
                .otherwise(st("bounds")).as("bounds"),
              when(overflow, c).otherwise(st("fill") + c).as("fill"),
              (st("idx") + 1).as("idx"))
          },
          st => st("bounds")))
      .withColumn("_nb", size(col("_bounds")))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_nb") - 1), k => {
          val start = element_at(col("_bounds"), k + 1)
          val end = when(k + 1 < col("_nb"), element_at(col("_bounds"), k + 2))
            .otherwise(col("_ntok"))
          struct(
            array_join(slice(col("_toks"), start + 1, end - start), " ").as("chunk"),
            aggregate(slice(col("_costs"), start + 1, end - start),
              lit(0L), _ + _).as("n_tok"))
        })).as(Seq("chunk_id", "_c")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("_c.chunk").as("chunk"), col("_c.n_tok").as("n_tok"))
  }

  /** Benchmark-contamination scores: for every training document, the
    * maximum number of distinct word n-gram shingles it shares with any
    * single benchmark document. `maxShared = 0` rows are omitted (they
    * are the uncontaminated bulk — at 100 TB you don't want a score row
    * per training doc).
    *
    * The join key is the shingle HASH (TextHash polynomial roll — the
    * cross-engine-deterministic kernel the dedup operators use), so the
    * shuffle carries (id, hash) pairs, never text, and the aggregation
    * touches candidate (train, bench) pairs only — the same blocking
    * discipline as MinHash banding. The benchmark side is tiny by
    * definition; Spark broadcasts it and the "join" is a map-side hash
    * probe. Stopword-run shingles shared by everything are the skew
    * hazard: raise `n` (13-grams in GPT-3-style decontamination) so a
    * shared shingle is evidence, not noise. */
  def contaminationScores(train: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 13): DataFrame = {
    def shingled(df: DataFrame, as: String) = df
      .withColumn("_whs", TextHash.wordHashes(col(textCol)))
      .select(col(idCol).as(as),
        explode(array_distinct(TextHash.shingleHashes(col("_whs"), n))).as("_sh"))
    shingled(train, "_tid")
      .join(broadcast(shingled(bench, "_bid")), Seq("_sh"))
      .groupBy(col("_tid"), col("_bid")).agg(count(lit(1)).as("_shared"))
      .groupBy(col("_tid")).agg(max(col("_shared")).as("max_shared"))
      .select(col("_tid").as(idCol), col("max_shared"))
  }

  /** Drop training documents sharing ≥ `minShared` distinct n-gram
    * shingles with any single benchmark document (left-anti against
    * [[contaminationScores]]) — GPT-3-style test-set decontamination. */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    n: Int = 13, minShared: Long = 1): DataFrame =
    train.join(
      contaminationScores(train, bench, idCol, textCol, n)
        .filter(col("max_shared") >= minShared)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Bloom-filter decontamination — the zero-shuffle twin of
    * [[decontaminate]] for when the benchmark suite is large enough
    * that even a broadcast hash join of its shingles is unwelcome: all
    * distinct benchmark n-gram shingle hashes go into ONE Bloom filter
    * (`fpp` sized, a few bits per shingle — tens of MB for hundreds of
    * millions of shingles), the filter broadcasts once, and every
    * training document is probed map-side against its own shingle
    * array. No explode, no join, no shuffle: the only cluster traffic
    * is the filter broadcast.
    *
    * Semantics: drops training docs with ≥ `minShared` distinct
    * shingles hitting the filter — overlap counted against the UNION
    * of benchmark shingles, a conservative superset of
    * [[decontaminate]]'s per-benchmark-doc rule (union count ≥ any
    * single-doc count). Errors are therefore ONE-SIDED in the safe
    * direction: a contaminated doc is NEVER kept (Bloom filters have
    * no false negatives); a clean doc may be dropped with probability
    * ≤ ~`fpp`·shingles-per-doc. The probe is a Scala UDF by necessity
    * (a sketch lookup has no Catalyst form) — but a row-local,
    * allocation-free one. */
  def bloomDecontaminate(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 13, minShared: Long = 1,
                         fpp: Double = 0.001): DataFrame = {
    // persisted: count() and bloomFilter() are two ACTIONS over the
    // same tokenize→shingle→distinct lineage — unpersisted, the large
    // benchmark suite would be scanned and distinct-shuffled twice
    val benchShingles = bench
      .withColumn("_whs", TextHash.wordHashes(col(textCol)))
      .select(explode(array_distinct(TextHash.shingleHashes(col("_whs"), n))).as("_sh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val expected = math.max(benchShingles.count(), 1L)
    val bf = benchShingles.stat.bloomFilter("_sh", expected, fpp)
    benchShingles.unpersist()
    val bcast = train.sparkSession.sparkContext.broadcast(bf)
    val hits = udf { shingles: Seq[Long] =>
      // null text → null shingle array → 0 hits (kept) — the exact
      // twin's behavior (explode of null emits no rows)
      if (shingles == null) 0L
      else {
        var c = 0L
        shingles.foreach(h => if (bcast.value.mightContainLong(h)) c += 1)
        c
      }
    }
    train
      .withColumn("_whs", TextHash.wordHashes(col(textCol)))
      .withColumn("_hits", hits(array_distinct(TextHash.shingleHashes(col("_whs"), n))))
      .filter(col("_hits") < minShared)
      .drop("_whs", "_hits")
  }

  /** Deterministic train/validation/test split: appends `outCol` with
    * the split label chosen by where [[orderHash]](id)/2³¹ falls in the
    * cumulative `fractions` ranges (last split takes any rounding
    * remainder). Map-only, no RNG: the assignment is a pure function of
    * the id, so it is stable across engines, partitionings, reruns AND
    * corpus growth — a document keeps its split when new data arrives,
    * the property that keeps eval sets uncontaminated over a corpus's
    * lifetime (a `randomSplit` re-deals every row on every run).
    * Same non-negative, < ~8.4e9 id precondition as every orderHash
    * consumer. */
  def assignSplits(df: DataFrame, idCol: String,
                   fractions: Seq[(String, Double)],
                   outCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be non-negative and sum to 1: $fractions")
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val u = orderHash(col(idCol)).cast("double") / lit(2147483648.0)
    val label = fractions.map(_._1).zip(bounds).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case ((name, hi), rest) =>
        when(u < hi, lit(name)).otherwise(rest)
      }
    df.withColumn(outCol, label)
  }
}
