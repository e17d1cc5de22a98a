package graft.ext

import org.apache.spark.sql.{Column, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column + typed metadata — the
  * Spark-side machinery (schema, batch iteration, partition sizing,
  * frame slicing) is real and tested. Feature-dependent operators
  * (near-dup) take CALLER-SUPPLIED feature columns
  * ([[nearDupPairsFromFeatures]]) — bring your own codec + perceptual
  * model; nothing downstream of feature extraction depends on a codec.
  * Only the optional codec-free smoke path uses a STUB extractor
  * (`decodeStub`): this container has no image/audio libraries, and a
  * real deployment replaces exactly that one function with JNI/javacv/
  * a codec of choice. Shapes and determinism are preserved so pipelines
  * built on this run unchanged when the codec lands.
  *
  * Scale notes: decode is the classic CPU-heavy map stage — it runs in
  * `mapPartitions` (no shuffle), so parallelism = input splits;
  * `repartitionForDecode` rebalances by byte size first so one partition
  * of 4K videos doesn't straggle behind thumbnails.
  */
object Multimodal {

  final case class MediaItem(
      media_id: Long, kind: String, mime: String,
      content: Array[Byte], meta: Map[String, String])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** STUB — deterministic fake "decode → feature vector".
    * Real implementation: decode `bytes` with an image/audio codec and
    * run the feature extractor; everything around this call is the real
    * distributed plumbing. The fake is a byte-histogram projection so
    * tests get stable, content-sensitive vectors. */
  private[graft] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Decode + feature-extract each media item (batched per partition). */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 16): Dataset[MediaFeatures] =
    items.mapPartitions { it =>
      it.map { m =>
        val bytes = if (m.content == null) Array.emptyByteArray else m.content
        MediaFeatures(m.media_id, m.kind, bytes.length.toLong, decodeStub(bytes, dim))
      }
    }(Encoders.product[MediaFeatures])

  /** Rebalance so each partition carries ≈ `targetBytes` of media — large
    * items dominate decode cost, row counts don't. */
  def repartitionForDecode(items: Dataset[MediaItem], totalBytes: Long, targetBytes: Long): Dataset[MediaItem] = {
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytes)).toInt)
    items.repartition(parts, col("media_id"))
  }

  /** STUB — deterministic fake "resize": keep every `factor`-th byte of
    * the payload. A real deployment replaces this one function with the
    * codec's scaler (image resize / audio downsample); the surrounding
    * plumbing — schema preservation, metadata stamping, partition-local
    * execution — is the real contract. */
  private[graft] def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    if (bytes.length == 0) return Array.emptyByteArray
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Resize each media item by `factor` (partition-local map, no
    * shuffle), stamping `meta("resize_factor")` so downstream stages and
    * lineage audits see the transformation. Schema is unchanged — a
    * resized corpus feeds every operator the original does. */
  def resize(items: Dataset[MediaItem], factor: Int): Dataset[MediaItem] = {
    require(factor >= 1, s"factor=$factor must be >= 1")
    items.mapPartitions { it =>
      it.map { m =>
        val bytes = if (m.content == null) Array.emptyByteArray else m.content
        val meta = (if (m.meta == null) Map.empty[String, String] else m.meta) +
          ("resize_factor" -> factor.toString)
        m.copy(content = resizeStub(bytes, factor), meta = meta)
      }
    }(Encoders.product[MediaItem])
  }

  /** Pure-expression frame sampler: slice the binary payload into
    * `frameSize`-byte frames and keep every `everyK`-th. (For real video
    * this becomes keyframe extraction inside the codec; the column shape
    * — array<binary> — is the contract downstream stages rely on.) */
  def sampleFrames(content: Column, frameSize: Int, everyK: Int): Column = {
    val nFrames = ceil(length(content).cast("double") / frameSize).cast("int")
    transform(
      filter(sequence(lit(0), greatest(nFrames - 1, lit(0))), i => i % everyK === 0),
      i => substring(content, (i * frameSize + 1).cast("int"), lit(frameSize)))
  }

  // ── media dedup: the standard two-tier pipeline ──────────────────────

  /** Tier 1 — EXACT media dedup by content digest: one row per distinct
    * payload, keeping the smallest media_id (deterministic, not
    * partition-order first). The md5 shuffle key is 16 bytes — the
    * payload itself never shuffles (the q_binary_funcs digest shape,
    * computed map-side before the exchange). Output: (dup media_id,
    * canonical dup_of) pairs for every non-survivor. */
  def exactDupPairs(items: Dataset[MediaItem]): Dataset[(Long, Long)] = {
    import items.sparkSession.implicits._
    val keyed = items.toDF()
      .select(col("media_id"), md5(coalesce(col("content"), lit(Array.emptyByteArray))).as("_d"))
    val canon = keyed.groupBy(col("_d")).agg(min(col("media_id")).as("_keep"))
    keyed.join(canon, Seq("_d"))
      .filter(col("media_id") =!= col("_keep"))
      .select(col("media_id"), col("_keep").as("dup_of"))
      .as[(Long, Long)]
  }

  /** Tier 2 — NEAR-dup media pairs over CALLER-SUPPLIED perceptual
    * features (the BYO-features contract, and the path real deployments
    * use): `(idCol, featCol: array<float>)` from whatever
    * codec + embedding model the caller runs — CLIP image vectors,
    * audio fingerprints, video keyframe means. No decode happens here
    * and no payload byte is touched or shuffled: features go through
    * the same LSH-bucketed near-dup path the text corpus uses
    * (`Dedup.embeddingNearDups`) — bucket keys shuffle as three
    * scalars, cosine verifies only within-bucket candidates, nothing
    * is all-pairs.
    *
    * Null/empty/all-zero vectors are excluded: a zero vector has no
    * cosine (0/0) — byte-identical payloads belong to tier-1
    * [[exactDupPairs]], which needs no features. */
  def nearDupPairsFromFeatures(features: org.apache.spark.sql.DataFrame,
                               idCol: String, featCol: String, dim: Int,
                               bits: Int = 6, bands: Int = 2,
                               tau: Double = 0.95): org.apache.spark.sql.DataFrame =
    Dedup.embeddingNearDups(
      features.filter(col(featCol).isNotNull &&
        exists(col(featCol), x => x =!= 0.0f)),
      idCol, featCol, dim, bits, tau, bands)

  /** [[nearDupPairsFromFeatures]] with the built-in [[decodeStub]] as
    * the feature extractor — a codec-free smoke path for environments
    * without media libraries. Production callers extract real
    * perceptual features and call [[nearDupPairsFromFeatures]]; the
    * composition downstream of feature extraction is identical. */
  def nearDupPairs(items: Dataset[MediaItem], dim: Int = 16,
                   bits: Int = 6, bands: Int = 2, tau: Double = 0.95): org.apache.spark.sql.DataFrame =
    nearDupPairsFromFeatures(
      extractFeatures(items, dim).toDF().filter(col("n_bytes") > 0),
      "media_id", "features", dim, bits, bands, tau)
}
