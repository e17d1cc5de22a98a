package graft.ext

import org.apache.spark.sql.{Column, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column + typed metadata — the
  * Spark-side machinery (schema, batch iteration, partition sizing,
  * frame slicing) is real and tested. IMAGES and WAV AUDIO have REAL
  * codec paths built on the JDK's bundled decoders (ImageIO for
  * PNG/JPEG/BMP/GIF, javax.sound.sampled for PCM WAV — java.desktop,
  * no external libraries): [[imageFeatures]] extracts block-mean
  * perceptual vectors, [[audioFeatures]] RMS-energy envelopes, and
  * [[resize]] area-average downsamples + re-encodes. Payloads no JDK
  * codec decodes (video/compressed audio/unknown) fall back to
  * deterministic byte-level stand-ins (`decodeStub` / `resizeStub`) so
  * mixed corpora never throw; a real deployment adds codecs by
  * replacing exactly those functions. Feature-dependent
  * operators (near-dup) also take CALLER-SUPPLIED feature columns
  * ([[nearDupPairsFromFeatures]]) — bring your own embedding model;
  * nothing downstream of feature extraction depends on any codec.
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

  /** Byte-histogram fallback feature projection for payloads no codec
    * can decode (unknown formats, audio/video in this JDK-only build):
    * deterministic and content-sensitive, so mixed corpora never throw
    * and exact-duplicate payloads still collide. */
  private[graft] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Decode an image payload with the JDK's bundled ImageIO codecs
    * (PNG/JPEG/BMP/GIF/WBMP — java.desktop, no external libraries).
    * None for null/empty/undecodable bytes. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None } // fatal errors (OOM, interrupts) must propagate, not degrade to byte features

  /** REAL perceptual image features (aHash family — block-mean
    * luminance, cf. Zauner 2010 "Implementation and Benchmarking of
    * Perceptual Image Hash Functions"): decode, area-average the
    * luminance onto a g×g grid (g = ⌊√dim⌋), flatten row-major,
    * mean-center. Pixel-level arithmetic only — no AWT rendering
    * pipeline — so the vector is bit-deterministic across JVMs. The
    * SAME pixels re-encoded in another container (PNG vs BMP) map to
    * the SAME vector; small perturbations move it slightly (cosine ≈
    * 1) — exactly what the near-dup tier needs. Non-image payloads
    * fall back to [[decodeStub]]. */
  private[graft] def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    decodeImage(bytes) match {
      case None => decodeStub(if (bytes == null) Array.emptyByteArray else bytes, dim)
      case Some(img) => imageFeaturesOf(img, dim)
    }

  private def imageFeaturesOf(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Double](g * g)
    val cnt = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val gy = y * g / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val c = gy * g + x * g / w
        sum(c) += lum; cnt(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = Array.tabulate(g * g)(i => if (cnt(i) == 0) 0.0 else sum(i) / cnt(i))
    val mean = cells.sum / cells.length
    val out = new Array[Float](dim)
    var i = 0
    while (i < g * g) { out(i) = (cells(i) - mean).toFloat; i += 1 }
    out
  }

  /** Decode a WAV payload with the JDK's bundled javax.sound.sampled
    * codec (PCM WAV — java.desktop, no external libraries) to mono
    * float samples in [-1, 1]. Channels are averaged; 8/16/24/32-bit
    * signed PCM and 8-bit unsigned are handled. None for
    * null/empty/undecodable bytes. */
  private[graft] def decodeWav(bytes: Array[Byte]): Option[Array[Float]] =
    decodeWavWithRate(bytes).map(_._1)

  private[graft] def decodeWavWithRate(bytes: Array[Byte]): Option[(Array[Float], Float)] =
    if (bytes == null || bytes.length == 0) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          val enc = f.getEncoding
          val ok = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if (!ok || f.getSampleSizeInBits % 8 != 0) None
          else {
            val raw = ais.readAllBytes()
            val bytesPer = f.getSampleSizeInBits / 8
            val ch = f.getChannels
            val frameBytes = bytesPer * ch
            val n = raw.length / frameBytes
            val out = new Array[Float](n)
            val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val big = f.isBigEndian
            val full = (1L << (f.getSampleSizeInBits - 1)).toFloat
            var i = 0
            while (i < n) {
              var acc = 0.0f
              var c = 0
              while (c < ch) {
                val off = i * frameBytes + c * bytesPer
                var v = 0L
                var b = 0
                while (b < bytesPer) {
                  val byt = raw(off + (if (big) b else bytesPer - 1 - b)) & 0xffL
                  v = (v << 8) | byt
                  b += 1
                }
                val s =
                  if (signed) (v << (64 - f.getSampleSizeInBits)) >> (64 - f.getSampleSizeInBits)
                  else v - (1L << (f.getSampleSizeInBits - 1))
                acc += s / full
                c += 1
              }
              out(i) = acc / ch
              i += 1
            }
            Some((out, f.getSampleRate))
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None } // fatal errors (OOM, interrupts) must propagate, not degrade to byte features

  /** REAL audio downsample: decode to mono float samples, block-mean
    * every `factor` samples (the mean is the cheap anti-alias, the
    * audio twin of the image path's area average), re-encode as 16-bit
    * PCM mono WAV at `rate / factor`. None for non-WAV payloads. */
  private[graft] def resizeWav(bytes: Array[Byte], factor: Int): Option[Array[Byte]] =
    decodeWavWithRate(bytes).map { case (samples, rate) =>
      val n = math.max(1, (samples.length + factor - 1) / factor)
      val down = new Array[Float](n)
      var i = 0
      while (i < n) {
        var acc = 0.0f
        var c = 0
        var j = i * factor
        val end = math.min(samples.length, (i + 1) * factor)
        while (j < end) { acc += samples(j); c += 1; j += 1 }
        down(i) = if (c == 0) 0f else acc / c
        i += 1
      }
      val raw = new Array[Byte](n * 2)
      i = 0
      while (i < n) {
        val v = math.round(math.max(-1f, math.min(1f, down(i))) * 32767f)
        raw(i * 2) = (v & 0xff).toByte
        raw(i * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        math.max(1f, rate / factor), 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

  /** REAL audio features: WAV decode → `dim`-window RMS energy
    * envelope. Container details (bit depth, channel count, endianness)
    * wash out — the same recording re-encoded maps to nearly the same
    * vector, which is what the near-dup tier needs. */
  private[graft] def audioFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeWav(bytes).map { samples =>
      val out = new Array[Float](dim)
      if (samples.nonEmpty) {
        val sumSq = new Array[Double](dim)
        val cnt = new Array[Long](dim)
        var i = 0
        while (i < samples.length) {
          val w = math.min(dim - 1, (i.toLong * dim / samples.length).toInt)
          sumSq(w) += samples(i).toDouble * samples(i)
          cnt(w) += 1
          i += 1
        }
        var w = 0
        while (w < dim) {
          if (cnt(w) > 0) out(w) = math.sqrt(sumSq(w) / cnt(w)).toFloat
          w += 1
        }
      }
      out
    }

  /** Feature dispatch: image codec → audio codec → byte-histogram
    * fallback. One partition-local call per payload. */
  private[graft] def mediaFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    decodeImage(bytes) match {
      case Some(img) => imageFeaturesOf(img, dim)
      case None => audioFeatures(bytes, dim).getOrElse(
        decodeStub(if (bytes == null) Array.emptyByteArray else bytes, dim))
    }

  /** Decode + feature-extract each media item (batched per partition):
    * real ImageIO / WAV decode for image and audio payloads,
    * byte-histogram fallback for everything else — one map stage, no
    * shuffle. */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 16): Dataset[MediaFeatures] =
    items.mapPartitions { it =>
      it.map { m =>
        val bytes = if (m.content == null) Array.emptyByteArray else m.content
        MediaFeatures(m.media_id, m.kind, bytes.length.toLong, mediaFeatures(bytes, dim))
      }
    }(Encoders.product[MediaFeatures])

  /** Rebalance so each partition carries ≈ `targetBytes` of media — large
    * items dominate decode cost, row counts don't. */
  def repartitionForDecode(items: Dataset[MediaItem], totalBytes: Long, targetBytes: Long): Dataset[MediaItem] = {
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytes)).toInt)
    items.repartition(parts, col("media_id"))
  }

  /** Byte-decimation fallback "resize" for undecodable payloads: keep
    * every `factor`-th byte. Deterministic; preserves the pipeline
    * shape for formats the JDK codecs don't cover. */
  private[graft] def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    if (bytes.length == 0) return Array.emptyByteArray
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** REAL image resize: ImageIO decode → area-average downsample by
    * `factor` (each target pixel = mean of its source cell — pure pixel
    * arithmetic, no AWT rendering pipeline, deterministic) → PNG
    * re-encode. None when the payload isn't a decodable image. */
  private[graft] def resizeImage(bytes: Array[Byte], factor: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { img =>
      val (sw, sh) = (img.getWidth, img.getHeight)
      val w = math.max(1, sw / factor)
      val h = math.max(1, sh / factor)
      val sumR = new Array[Double](w * h)
      val sumG = new Array[Double](w * h)
      val sumB = new Array[Double](w * h)
      val cnt = new Array[Long](w * h)
      var y = 0
      while (y < sh) {
        val ty = math.min(h - 1, y * h / sh)
        var x = 0
        while (x < sw) {
          val c = ty * w + math.min(w - 1, x * w / sw)
          val rgb = img.getRGB(x, y)
          sumR(c) += (rgb >> 16) & 0xff
          sumG(c) += (rgb >> 8) & 0xff
          sumB(c) += rgb & 0xff
          cnt(c) += 1
          x += 1
        }
        y += 1
      }
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < w * h) {
        val n = math.max(1L, cnt(i)).toDouble
        out.setRGB(i % w, i / w,
          (math.round(sumR(i) / n).toInt << 16) |
            (math.round(sumG(i) / n).toInt << 8) |
            math.round(sumB(i) / n).toInt)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** Resize each media item by `factor` (partition-local map, no
    * shuffle): real ImageIO scale + PNG re-encode for image payloads,
    * real WAV block-mean downsample for audio payloads, byte
    * decimation otherwise; `meta("resize_factor")` and
    * `meta("resize_codec")` ("imageio" | "wav" | "bytes") record what
    * ran so downstream stages and lineage audits see the
    * transformation. Schema is unchanged — a resized corpus feeds
    * every operator the original does. */
  def resize(items: Dataset[MediaItem], factor: Int): Dataset[MediaItem] = {
    require(factor >= 1, s"factor=$factor must be >= 1")
    items.mapPartitions { it =>
      it.map { m =>
        val bytes = if (m.content == null) Array.emptyByteArray else m.content
        val (resized, codec) = resizeImage(bytes, factor) match {
          case Some(img) => (img, "imageio")
          case None => resizeWav(bytes, factor) match {
            case Some(wav) => (wav, "wav")
            case None => (resizeStub(bytes, factor), "bytes")
          }
        }
        val meta = (if (m.meta == null) Map.empty[String, String] else m.meta) +
          ("resize_factor" -> factor.toString, "resize_codec" -> codec)
        m.copy(content = resized, meta = meta)
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
