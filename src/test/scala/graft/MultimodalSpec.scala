package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.ext.Multimodal.MediaItem

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  private def item(id: Long, bytes: Array[Byte]) =
    MediaItem(id, "image", "image/fake", bytes, Map("w" -> "8", "h" -> "8"))

  test("feature extraction: deterministic, content-sensitive, batched") {
    val ds = Seq(
      item(1L, Array[Byte](1, 2, 3, 4)),
      item(2L, Array[Byte](1, 2, 3, 4)),
      item(3L, Array[Byte](9, 9, 9, 9, 9)),
      MediaItem(4L, "image", "image/fake", null, Map.empty)).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 4).collect().map(f => f.media_id -> f).toMap
    assert(out(1).features.toSeq === out(2).features.toSeq) // same bytes → same features
    assert(out(1).features.toSeq !== out(3).features.toSeq)
    assert(out(3).n_bytes === 5L)
    assert(out(4).n_bytes === 0L && out(4).features.length === 4) // null-safe
    // stub semantics: byte-histogram projection
    assertNear(out(1).features(0).toDouble, 1 / 255.0, 1e-6)
  }

  test("repartitionForDecode sizes partitions by bytes") {
    val ds = (1L to 100L).map(i => item(i, Array.fill(1000)(i.toByte))).toDS()
    val re = Multimodal.repartitionForDecode(ds, totalBytes = 100000L, targetBytes = 10000L)
    assert(re.rdd.getNumPartitions === 10)
    assert(re.count() === 100)
  }

  test("resize: decimated payload, schema preserved, factor stamped in meta") {
    val ds = Seq(
      item(1L, Array[Byte](10, 20, 30, 40, 50, 60, 70)),
      MediaItem(2L, "image", "image/fake", null, null)).toDS()
    val out = Multimodal.resize(ds, factor = 3).collect().map(m => m.media_id -> m).toMap
    assert(out(1L).content.toSeq === Seq[Byte](10, 40, 70)) // every 3rd byte
    assert(out(1L).meta("resize_factor") === "3")
    assert(out(1L).meta("w") === "8") // original metadata survives
    assert(out(2L).content.length === 0 && out(2L).meta("resize_factor") === "3")
    // resized corpus feeds the same downstream operators unchanged
    val feats = Multimodal.extractFeatures(Multimodal.resize(ds, 3), dim = 4).collect()
    assert(feats.length === 2)
  }

  test("frame sampling: every k-th fixed-size frame via pure expressions") {
    val df = Seq((1L, (0 until 100).map(_.toByte).toArray)).toDF("id", "content")
    val frames = df.select(Multimodal.sampleFrames(col("content"), frameSize = 10, everyK = 3).as("f"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.length === 4) // frames 0,3,6,9 of 10
    assert(frames(0).toSeq === (0 until 10).map(_.toByte))
    assert(frames(1).toSeq === (30 until 40).map(_.toByte))
    assert(frames(3).toSeq === (90 until 100).map(_.toByte))
  }

  // ── real JDK-ImageIO codec path ─────────────────────────────────────
  private def makeImage(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / math.max(1, w - 1) + seed * 37) % 256
      val g = (y * 255 / math.max(1, h - 1) + seed * 91) % 256
      val b = ((x + y) * 7 + seed * 13) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }
  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("imageFeatures: real decode — container-invariant, perturbation-tolerant") {
    import graft.ext.Multimodal
    val img = makeImage(32, 24, seed = 1)
    val png = encode(img, "png")
    val bmp = encode(img, "bmp")
    assert(!java.util.Arrays.equals(png, bmp), "containers must differ at byte level")
    // SAME pixels, different container → IDENTICAL perceptual vector
    // (byte histograms could never do this)
    val fPng = Multimodal.imageFeatures(png, 16)
    val fBmp = Multimodal.imageFeatures(bmp, 16)
    assert(fPng.toSeq === fBmp.toSeq)
    // one perturbed pixel → tiny move (cosine ≈ 1); different image → far
    val near = makeImage(32, 24, seed = 1)
    near.setRGB(0, 0, near.getRGB(0, 0) ^ 0x000008)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    assert(cos(fPng, Multimodal.imageFeatures(encode(near, "png"), 16)) > 0.9999)
    assert(cos(fPng, Multimodal.imageFeatures(encode(makeImage(32, 24, 9), "png"), 16)) < 0.99)
    // non-image payload falls back to the byte histogram, not a throw
    assert(Multimodal.imageFeatures(Array[Byte](1, 2, 3), 4).toSeq ===
      Multimodal.decodeStub(Array[Byte](1, 2, 3), 4).toSeq)
  }

  test("resize: real images downscale via ImageIO, non-images fall back to bytes") {
    import graft.ext.Multimodal
    val png = encode(makeImage(32, 24, seed = 2), "png")
    val ds = Seq(
      MediaItem(1L, "image", "image/png", png, Map.empty),
      MediaItem(2L, "blob", "application/octet-stream", Array[Byte](10, 20, 30, 40, 50, 60, 70), Map.empty)
    ).toDS()
    val out = Multimodal.resize(ds, factor = 2).collect().map(m => m.media_id -> m).toMap
    val resized = Multimodal.decodeImage(out(1L).content)
    assert(resized.isDefined, "resized payload must re-decode")
    assert(resized.get.getWidth === 16 && resized.get.getHeight === 12)
    assert(out(1L).meta("resize_codec") === "imageio")
    assert(out(2L).content.toSeq === Seq[Byte](10, 30, 50, 70))
    assert(out(2L).meta("resize_codec") === "bytes")
    // resized image's perceptual vector stays close to the original's
    // (the downsample IS the block-mean the features compute)
    val f0 = Multimodal.imageFeatures(png, 16)
    val f1 = Multimodal.imageFeatures(out(1L).content, 16)
    val cos = f0.zip(f1).map { case (x, y) => x.toDouble * y }.sum /
      math.sqrt(f0.map(x => x.toDouble * x).sum * f1.map(x => x.toDouble * x).sum)
    assert(cos > 0.999, s"cos=$cos")
  }

  // amplitude-modulated sine, so the RMS envelope is distinctive per seed
  private def makeWav(seed: Int, bits: Int = 16, channels: Int = 1,
                      n: Int = 4000): Array[Byte] = {
    val sr = 8000f
    val bytesPer = bits / 8
    val raw = new Array[Byte](n * bytesPer * channels)
    for (i <- 0 until n) {
      val env = 0.2 + 0.8 * math.abs(math.sin(math.Pi * i * (seed + 1) / n))
      val s = env * math.sin(2 * math.Pi * 440 * i / sr)
      val v = math.round(s * ((1L << (bits - 1)) - 1))
      for (c <- 0 until channels; b <- 0 until bytesPer)
        raw((i * channels + c) * bytesPer + b) = ((v >> (8 * b)) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr, bits, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def cosF(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    d / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
  }

  test("audioFeatures: real WAV decode — channel-layout-invariant envelopes") {
    import graft.ext.Multimodal
    val mono = makeWav(seed = 1)
    val stereo = makeWav(seed = 1, channels = 2) // same signal in both channels
    val fm = Multimodal.audioFeatures(mono, 16)
    val fs = Multimodal.audioFeatures(stereo, 16)
    assert(fm.isDefined && fs.isDefined)
    // same recording, different channel layout → same envelope
    assert(cosF(fm.get, fs.get) > 0.9999, s"cos=${cosF(fm.get, fs.get)}")
    // different modulation → clearly different envelope
    val other = Multimodal.audioFeatures(makeWav(seed = 5), 16).get
    assert(cosF(fm.get, other) < 0.99, s"cos=${cosF(fm.get, other)}")
    // non-audio bytes don't decode
    assert(Multimodal.audioFeatures(Array[Byte](1, 2, 3, 4), 16).isEmpty)
  }

  test("mediaFeatures dispatch: image → audio → byte-histogram fallback") {
    import graft.ext.Multimodal
    val png = encode(makeImage(16, 16, seed = 4), "png")
    val wav = makeWav(seed = 2)
    val blob = Array[Byte](9, 8, 7, 6, 5)
    assert(Multimodal.mediaFeatures(png, 16).toSeq ===
      Multimodal.imageFeatures(png, 16).toSeq)
    assert(Multimodal.mediaFeatures(wav, 16).toSeq ===
      Multimodal.audioFeatures(wav, 16).get.toSeq)
    assert(Multimodal.mediaFeatures(blob, 16).toSeq ===
      Multimodal.decodeStub(blob, 16).toSeq)
    // the Dataset op uses the same dispatch: a mixed corpus extracts
    // without a throw and every vector is dim-sized
    val ds = Seq(
      MediaItem(1L, "image", "image/png", png, Map.empty),
      MediaItem(2L, "audio", "audio/wav", wav, Map.empty),
      MediaItem(3L, "blob", "application/octet-stream", blob, Map.empty)).toDS()
    val feats = Multimodal.extractFeatures(ds, dim = 16).collect()
    assert(feats.length === 3 && feats.forall(_.features.length === 16))
  }

  test("resize on real audio: block-mean downsample, rate halves, envelope preserved") {
    import graft.ext.Multimodal
    val wav = makeWav(seed = 3, n = 4000)
    val ds = Seq(MediaItem(1L, "audio", "audio/wav", wav, Map.empty)).toDS()
    val out = Multimodal.resize(ds, factor = 2).collect().head
    assert(out.meta("resize_codec") === "wav")
    val (orig, origRate) = Multimodal.decodeWavWithRate(wav).get
    val (down, downRate) = Multimodal.decodeWavWithRate(out.content).get
    assert(downRate === origRate / 2)
    assert(math.abs(down.length - orig.length / 2) <= 1)
    // the RMS envelope survives the downsample: features of the
    // resized audio stay close to the original's.  Block-meaning a
    // 440 Hz carrier at 8 kHz attenuates amplitude uniformly (the mean
    // of adjacent samples is a cosine factor), so compare SHAPE via
    // cosine, not magnitude
    val f0 = Multimodal.audioFeatures(wav, 16).get
    val f1 = Multimodal.audioFeatures(out.content, 16).get
    assert(cosF(f0, f1) > 0.99, s"cos=${cosF(f0, f1)}")
  }

  test("near-dup end-to-end on real images: re-encode caught, distinct images kept apart") {
    import graft.ext.Multimodal
    val a = makeImage(40, 30, seed = 3)
    val ds = Seq(
      MediaItem(1L, "image", "image/png", encode(a, "png"), Map.empty),
      MediaItem(2L, "image", "image/bmp", encode(a, "bmp"), Map.empty), // re-encoded copy
      MediaItem(3L, "image", "image/png", encode(makeImage(40, 30, 8), "png"), Map.empty)
    ).toDS()
    val near = Multimodal.nearDupPairs(ds, dim = 16, bits = 4, bands = 4, tau = 0.9999)
      .select("media_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(near === Set((2L, 1L)), s"got $near")
  }

  test("BYO-features near-dup: planted perceptual near-copies recovered without payloads") {
    // Golden fixture simulating a caller's perceptual-embedding model:
    // 30 distinct base vectors; ids 101/103/107 are tiny perturbations
    // of ids 1/3/7 (cosine ≈ 1 — "the same image re-encoded"); id 200
    // is null-featured, id 201 all-zero (no cosine). The frame has NO
    // content column at all — the contract is that near-dup never needs
    // payload bytes.
    def base(i: Int) = Array.tabulate(8)(j => ((i * 131 + j * 47) % 23 - 11) / 3.0f)
    val planted = Seq(1, 3, 7)
    val rows = (1 to 30).map(i => (i.toLong, base(i))) ++
      planted.map(i => (100L + i, base(i).zipWithIndex.map { case (v, j) =>
        v + (if (j == 0) 0.001f else 0f) }))
    val feats = rows.toDF("media_id", "perc_vec")
      .unionByName(Seq((200L, null.asInstanceOf[Array[Float]]),
        (201L, Array.fill(8)(0f))).toDF("media_id", "perc_vec"))
    assert(!feats.columns.contains("content"))
    val near = Multimodal.nearDupPairsFromFeatures(
      feats, "media_id", "perc_vec", dim = 8, bits = 4, bands = 4, tau = 0.999)
      .select("media_id", "dup_of").as[(Long, Long)].collect().toSet
    planted.foreach { i =>
      assert(near.contains((100L + i, i.toLong)), s"planted $i missed in $near")
    }
    // precision 1 by construction (cosine-verified): every emitted pair
    // is ≥ tau under brute-force truth (the fixture also contains
    // incidental true near-pairs — shifted bases and the mod-23 cycle)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (d, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, na, nb), (x, y)) => (d + x * y, na + x * x, nb + y * y)
      }
      d / math.sqrt(na * nb)
    }
    val vecs = rows.toMap
    near.foreach { case (a, b) =>
      assert(cos(vecs(a), vecs(b)) >= 0.999, s"spurious pair ($a,$b)")
    }
    // degenerate vectors are excluded, not NaN-paired
    assert(!near.exists(p => p._1 >= 200L || p._2 >= 200L))
  }

  test("media dedup: exact pairs by digest, near-dups by feature LSH") {
    val base = (0 until 64).map(i => (i * 7 % 256).toByte).toArray
    val nearCopy = base.clone(); nearCopy(0) = (nearCopy(0) ^ 1).toByte
    val other = (0 until 64).map(i => (i * 131 % 256).toByte).toArray
    val ds = Seq(
      item(1L, base), item(2L, base.clone()), // exact dup pair
      item(3L, nearCopy),                      // 1-byte-off near dup of 1
      item(4L, other),                         // unrelated
      MediaItem(5L, "image", "image/fake", null, Map.empty),
      MediaItem(6L, "image", "image/fake", null, Map.empty)) // null ≡ empty pair
      .toDS()
    val exact = Multimodal.exactDupPairs(ds).collect().toSet
    assert(exact === Set((2L, 1L), (6L, 5L))) // min-id canonical, null-safe
    val near = Multimodal.nearDupPairs(ds, dim = 16, bits = 4, bands = 2, tau = 0.999)
      .select("media_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(near.contains((2L, 1L))) // identical content: cos = 1
    assert(near.contains((3L, 1L)), s"near-copy not found in $near") // 1-byte drift
    assert(!near.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated stays out
  }
}
