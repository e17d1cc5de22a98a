package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Vector similarity search over embedding columns (ArrayType(FloatType)).
  *
  * Baseline: brute-force dot/cosine top-k — one broadcast of the probe,
  * map-side scoring, TakeOrderedAndProject for the top-k (no full sort,
  * no shuffle of the corpus).
  *
  * Scale path: random-hyperplane LSH. Hyperplanes are derived from a
  * deterministic LCG (seeded by (plane, dim) index), so buckets are
  * reproducible across engines and runs — no stored model, no RNG state.
  * Bucketing is map-side; the candidate search then touches only the
  * probe's bucket (a partition-pruned fraction ~2^-bits of the corpus).
  */
object Similarity {

  /** Codegen'd dot product (VectorLoops — identical doubles to
    * [[dotHof]], the HOF spec form the oracle replicates). */
  def dot(a: Column, b: Column): Column =
    bridge.column(graft.functions.DotExpr(bridge.expression(a), bridge.expression(b)))

  /** HOF spec form of [[dot]] — kept as the differential-test reference. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NaN when either norm is 0. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed projection of `vec` onto hyperplane `plane`. The plane
    * components are pure functions of constants (pv=2 mixed family —
    * [[graft.functions.VectorLoops.planeComponent]], the ONE owner of
    * the arithmetic), so they fold driver-side into a single array
    * LITERAL: per-row cost is a dot against a constant vector, and
    * the mixing chain costs nothing at execution. */
  def hyperplaneDot(vec: Column, plane: Int, dim: Int): Column = {
    val comps = Array.tabulate(dim)(i =>
      graft.functions.VectorLoops.planeComponent(plane.toLong * dim + (i + 1)))
    // slice to dim first (ADVICE r16): zip_with pads the SHORTER side
    // with nulls, so an over-length vector used to null-poison the
    // aggregate — whereas the codegen kernel (VectorLoops.lshBucket)
    // reads exactly the first dim components. Slicing keeps the two
    // declared-identical paths identical on malformed input too.
    aggregate(
      zip_with(slice(vec, 1, dim), lit(comps), (x, p) => x.cast("double") * p),
      lit(0.0), (acc, v) => acc + v)
  }

  /** LSH bucket id: `bits` sign bits packed into a long — codegen'd,
    * all planes in one pass per row (VectorLoops.lshBucket replicates
    * [[lshBucketHof]]'s LCG arithmetic exactly). `planeOffset` selects an
    * independent plane family (band b of a multi-band scheme passes
    * `b * bits`), so banded embedding LSH reuses the same kernel. */
  def lshBucket(vec: Column, dim: Int, bits: Int = 4, planeOffset: Int = 0): Column =
    bridge.column(graft.functions.LshBucketExpr(bridge.expression(vec), dim, bits, planeOffset))

  /** HOF spec form of [[lshBucket]] — the differential-test reference
    * and the arithmetic the DuckDB oracle replicates. */
  def lshBucketHof(vec: Column, dim: Int, bits: Int = 4, planeOffset: Int = 0): Column =
    (0 until bits).map { j =>
      when(hyperplaneDot(vec, planeOffset + j, dim) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Signed-random-projection dimensionality reduction (the
    * Johnson–Lindenstrauss workhorse): `out_j = ⟨vec, plane_j⟩` over
    * the SAME deterministic LCG hyperplane family as [[lshBucket]] —
    * so a reduced corpus and its LSH buckets come from one plane
    * budget, and the DuckDB oracle replicates the arithmetic it
    * already knows. Angles/cosines are preserved in expectation at any
    * uniform rescale, so the conventional 1/√dimOut factor is left to
    * the caller. Map-only, shuffle-free; `dimOut` is statically
    * unrolled (reduction targets are small by definition). */
  def randomProject(vec: Column, dimIn: Int, dimOut: Int, planeOffset: Int = 0): Column = {
    require(dimOut >= 1, s"dimOut=$dimOut must be >= 1")
    array((0 until dimOut).map(j => hyperplaneDot(vec, planeOffset + j, dimIn)): _*)
  }

  /** Tie-break order for the top-k APIs: equal scores would otherwise
    * make the k-th row partition-order-dependent (shuffled input could
    * return a different, equally-scored row). Default = every ORDERABLE
    * corpus column except the vector itself, ascending — a total order
    * whenever those columns distinguish the rows. Unorderable columns
    * (maps) are skipped rather than thrown at (Spark rejects maps as
    * sort keys), and arrays/structs of the payload still sort if the
    * atomic columns tie — pass an explicit `tieBreak` to bound the
    * comparator on wide payloads. */
  private def tieBreakCols(corpus: DataFrame, vecCol: String, tieBreak: Seq[String]): Seq[Column] =
    (if (tieBreak.nonEmpty) tieBreak
     else corpus.schema.fields.toSeq
       .filterNot(_.name == vecCol)
       .filterNot(f => hasMapType(f.dataType))
       .map(_.name)).map(col(_).asc)

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case a: org.apache.spark.sql.types.ArrayType => hasMapType(a.elementType)
    case st: org.apache.spark.sql.types.StructType => st.fields.exists(f => hasMapType(f.dataType))
    case _ => false
  }

  /** Brute-force top-k by dot product against one probe row.
    * `probe` must be a 1-row DataFrame with column `probeCol`.
    * Deterministic: ties on score break by `tieBreak` (default: all
    * corpus columns except the vector). */
  def bruteForceTopK(corpus: DataFrame, vecCol: String, probe: DataFrame, probeCol: String,
                     k: Int, scoreCol: String = "score",
                     tieBreak: Seq[String] = Nil): DataFrame = {
    val one = requireOneProbe(probe)
    corpus.crossJoin(broadcast(one))
      .withColumn(scoreCol, dot(col(vecCol), col(probeCol)))
      .drop(probeCol)
      .orderBy(col(scoreCol).desc +: tieBreakCols(corpus, vecCol, tieBreak): _*)
      .limit(k)
  }

  /** A multi-row probe frame silently pools a GLOBAL top-k across all
    * probes — indistinguishable from a valid answer once the vector
    * column is dropped. Surface the misuse; bruteForceTopKJoin is the
    * per-probe API.
    *
    * This is an EAGER action (the one in these otherwise-lazy builders),
    * but the probe plan is computed exactly ONCE: the collected row is
    * re-wrapped as a local relation and REUSED as the broadcast side,
    * so an expensive upstream probe plan is not re-executed when the
    * returned frame runs. limit(2) bounds the job to the first
    * partitions that yield two rows. */
  private def requireOneProbe(probe: DataFrame): DataFrame = {
    val rows = probe.limit(2).collect()
    require(rows.length == 1,
      s"probe frame has ${rows.length} rows — the single-probe top-k APIs take " +
        "exactly one row; use bruteForceTopKJoin/lshTopKJoin for per-probe results")
    probe.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows(0)), probe.schema)
  }

  /** LSH-bucketed top-k: score only the probe's bucket. Same contract as
    * bruteForceTopK; `dim` is the embedding dimensionality. Approximate:
    * recall < 1 by construction (near vectors in other buckets are not
    * scored) — raise recall by lowering `bits`, or probe the Hamming-1
    * neighborhood with [[lshTopKMultiProbe]]. */
  def lshTopK(corpus: DataFrame, vecCol: String, probe: DataFrame, probeCol: String,
              dim: Int, k: Int, bits: Int = 4, scoreCol: String = "score",
              tieBreak: Seq[String] = Nil): DataFrame = {
    val one = requireOneProbe(probe)
    val bucketed = corpus.withColumn("_bucket", lshBucket(col(vecCol), dim, bits))
    val p = one.withColumn("_pbucket", lshBucket(col(probeCol), dim, bits))
    bucketed.join(broadcast(p), col("_bucket") === col("_pbucket"))
      .withColumn(scoreCol, dot(col(vecCol), col(probeCol)))
      .drop(probeCol, "_bucket", "_pbucket")
      .orderBy(col(scoreCol).desc +: tieBreakCols(corpus, vecCol, tieBreak): _*)
      .limit(k)
  }

  /** Multi-probe LSH top-k: also scores the `bits` buckets at Hamming
    * distance 1 from the probe's bucket (a near vector that disagrees on
    * ONE hyperplane sign — the dominant miss mode — is recovered). Cost:
    * the broadcast side grows to bits+1 rows; the corpus side still
    * touches only matching buckets, ~(bits+1)/2^bits of the data. Each
    * corpus vector matches at most one probe bucket (the XOR'd ids are
    * distinct), so no dedup is needed before the top-k. */
  def lshTopKMultiProbe(corpus: DataFrame, vecCol: String, probe: DataFrame, probeCol: String,
                        dim: Int, k: Int, bits: Int = 4, scoreCol: String = "score",
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val one = requireOneProbe(probe)
    val bucketed = corpus.withColumn("_bucket", lshBucket(col(vecCol), dim, bits))
    val p = one
      .withColumn("_pbucket", lshBucket(col(probeCol), dim, bits))
      .withColumn("_pb", explode(array(
        col("_pbucket") +: (0 until bits).map(j => col("_pbucket").bitwiseXOR(lit(1L << j))): _*)))
    bucketed.join(broadcast(p), col("_bucket") === col("_pb"))
      .withColumn(scoreCol, dot(col(vecCol), col(probeCol)))
      .drop(probeCol, "_bucket", "_pbucket", "_pb")
      .orderBy(col(scoreCol).desc +: tieBreakCols(corpus, vecCol, tieBreak): _*)
      .limit(k)
  }

  /** Exact batch top-k JOIN: every row of `probes` gets its k best corpus
    * rows in ONE plan — query workloads arrive as a DataFrame of probes,
    * and running [[bruteForceTopK]] per probe would launch one job each.
    * Plan shape: broadcast the probes (they are the small side by
    * assumption), map-side score, then a per-probe window top-k — Spark 4
    * plans the `row_number <= k` filter as partial+final WindowGroupLimit,
    * so each task keeps only k rows per probe before the shuffle.
    * Deterministic: score ties break by `tieBreak` (default: all corpus
    * columns except the vector). */
  def bruteForceTopKJoin(corpus: DataFrame, vecCol: String,
                         probes: DataFrame, probeIdCol: String, probeVecCol: String,
                         k: Int, scoreCol: String = "score",
                         tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col(scoreCol).desc +: tieBreakCols(corpus, vecCol, tieBreak): _*)
    corpus.crossJoin(broadcast(probes))
      .withColumn(scoreCol, dot(col(vecCol), col(probeVecCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn", probeVecCol)
  }

  /** Hard-negative mining for retrieval/embedding training data (the
    * standard DPR/contrastive recipe — Karpukhin et al. 2020 §3.2:
    * negatives that the CURRENT embedder ranks highly are the ones
    * worth training against): for each query, the top-`k` corpus
    * candidates by dot product with every KNOWN POSITIVE removed, rank
    * re-assigned after removal. Retrieval is [[bruteForceTopKJoin]]
    * over-fetched by `overFetch` (positives knocked out of the top
    * list must not leave holes — set it ≥ the max positives per
    * query); swap in an IVF/LSH join upstream at index scale by
    * passing its output through the same anti-join + re-rank.
    *
    * Returns (probeIdCol, corpus columns minus the vector, score,
    * neg_rank 1..k). One broadcast of the query frame, one anti-join
    * on the (tiny) positives frame, one per-query window. */
  def mineHardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                        queries: DataFrame, qidCol: String, qvecCol: String,
                        positives: DataFrame, k: Int,
                        overFetch: Int = 10,
                        scoreCol: String = "score"): DataFrame = {
    require(k >= 1 && overFetch >= 0, s"k=$k, overFetch=$overFetch")
    val cands = bruteForceTopKJoin(corpus, vecCol, queries, qidCol, qvecCol,
      k + overFetch, scoreCol)
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    cands
      .join(positives.select(col(qidCol), col(idCol)), Seq(qidCol, idCol),
        "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      // the documented contract: corpus columns MINUS the vector —
      // without the drop every mined negative hauls a dim-wide float
      // array through the anti-join, window and training-data output
      .drop(vecCol)
  }

  /** LSH batch top-k JOIN — the scale form of [[bruteForceTopKJoin]]:
    * bucket BOTH sides map-side, equi-join on the bucket id, score only
    * co-bucketed pairs, then the same per-probe WindowGroupLimit top-k.
    * `multiProbe` additionally explodes each probe to its Hamming-1
    * bucket neighborhood (bits+1 rows/probe) for the recall recovery of
    * [[lshTopKMultiProbe]] — still at most one match per (corpus row,
    * probe). At scale pick `bits` ≥ log2(shuffle parallelism): the join
    * key cardinality is 2^bits, and a too-small `bits` under-partitions
    * the shuffle (Catalyst broadcasts the probe side automatically when
    * it is small enough, which sidesteps the issue entirely). */
  def lshTopKJoin(corpus: DataFrame, vecCol: String,
                  probes: DataFrame, probeIdCol: String, probeVecCol: String,
                  dim: Int, k: Int, bits: Int = 4, multiProbe: Boolean = false,
                  scoreCol: String = "score", tieBreak: Seq[String] = Nil): DataFrame = {
    val bucketed = corpus.withColumn("_bucket", lshBucket(col(vecCol), dim, bits))
    val p0 = probes.withColumn("_pbucket", lshBucket(col(probeVecCol), dim, bits))
    val p =
      if (multiProbe) p0.withColumn("_pb", explode(array(
        col("_pbucket") +: (0 until bits).map(j => col("_pbucket").bitwiseXOR(lit(1L << j))): _*)))
      else p0.withColumn("_pb", col("_pbucket"))
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col(scoreCol).desc +: tieBreakCols(corpus, vecCol, tieBreak): _*)
    bucketed.join(p, col("_bucket") === col("_pb"))
      .withColumn(scoreCol, dot(col(vecCol), col(probeVecCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn", "_bucket", "_pbucket", "_pb", probeVecCol)
  }
}
