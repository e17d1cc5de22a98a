package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextHash._

/** Deduplication operators for document corpora.
  *
  * Scale design (the 100 TB story): none of these ever compare documents
  * pairwise across the corpus. Exact dedup shuffles on a key; MinHash-LSH
  * shuffles each doc once per band on a short (band-id, band-hash) key so
  * candidate pairs only materialize inside buckets; SimHash groups on a
  * 16-bit value. All signature computation is map-side (TextHash kernels).
  * AQE handles bucket skew (a pathological all-identical corpus lands in
  * one bucket; salting the band key is the documented escape hatch).
  */
object Dedup {

  /** Exact dedup, deterministic representative: one row per key set,
    * keeping the minimum `orderCol` (NOT raw dropDuplicates, whose pick
    * is partition-order-dependent). */
  def exact(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(orderCol)).as(s"first_$orderCol"))

  /** Append a k-component MinHash signature column.
    *
    * PERFORMANCE INVARIANT (all builders here): token hashes are
    * materialized into a real column before any kernel references them.
    * Lambda HOFs are interpreted (CodegenFallback), and passing the
    * `wordHashes(text)` EXPRESSION into a k-reference kernel makes
    * Catalyst inline the whole token-hash computation at every reference
    * — measured as an O(words²)-ish 500× blowup at sf0.1. A separate
    * Project is kept by CollapseProject because the expression is
    * non-cheap and multiply-referenced. */
  def withMinhashSignature(df: DataFrame, textCol: String, k: Int = 8, outCol: String = "minhash_sig"): DataFrame =
    df.withColumn("_whs", wordHashes(col(textCol)))
      .withColumn(outCol, minhashSignature(col("_whs"), k))
      .drop("_whs")

  /** LSH banding: one output row per (doc, band); `band_key` combines the
    * band's signature components into a single group key. Downstream,
    * docs sharing a band_key are near-dup candidates — the shuffle key is
    * this short string, never the document. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, bands: Int = 4): DataFrame =
    minhashBandsFromWhs(
      df.withColumn("_whs", wordHashes(col(textCol))), idCol, "_whs", k, bands)

  /** [[minhashBands]] over an ALREADY-materialized word-hash column —
    * use when the caller also needs the hashes for another stage
    * (DocPipeline shares one pass between banding and shingles). */
  def minhashBandsFromWhs(df: DataFrame, idCol: String, whsCol: String,
                          k: Int = 8, bands: Int = 4): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible into $bands bands")
    val rowsPerBand = k / bands
    df.withColumn("_sig", minhashSignature(col(whsCol), k))
      .select(col(idCol), posexplode(array((0 until bands).map { b =>
        array_join(slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand), "_")
      }: _*)).as(Seq("band", "band_hash")))
      .withColumn("band_key", concat_ws(":", col("band"), col("band_hash")))
      .drop("band_hash")
  }

  /** Near-dup candidate groups: band buckets holding > 1 document.
    * Returns (band_key, n_docs, min doc id) per colliding bucket. */
  def minhashDupGroups(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, bands: Int = 4): DataFrame =
    minhashBands(df, idCol, textCol, k, bands)
      .groupBy("band_key")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as(s"min_$idCol"))
      .filter(col("n_docs") > 1)

  /** Append the 16-bit SimHash; exact-group near-dups = equal simhash. */
  def withSimhash(df: DataFrame, textCol: String, bits: Int = 16, outCol: String = "simhash"): DataFrame =
    df.withColumn("_whs", wordHashes(col(textCol)))
      .withColumn(outCol, simhash(col("_whs"), bits))
      .drop("_whs")

  /** n-gram Jaccard similarity between candidate pairs: `pairs` must
    * provide the two texts as columns — this operator deliberately takes
    * pre-banded candidates (from minhashBands or any blocking) instead of
    * crossing the corpus. */
  def ngramJaccard(textA: Column, textB: Column, n: Int = 3): Column =
    jaccard(shingleHashes(wordHashes(textA), n), shingleHashes(wordHashes(textB), n))

  /** Embedding near-dup: cosine over candidate pairs (see Similarity for
    * the LSH blocking that generates candidates at scale). */
  def cosineNearDup(vecA: Column, vecB: Column, threshold: Double): Column =
    Similarity.cosine(vecA, vecB) > threshold
}
