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
