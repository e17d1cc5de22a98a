package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Table-maintenance operators (round 6): latest-wins upsert and SCD-2
  * intervals. Cross-engine proof lives in q_merge_upsert / q_scd2;
  * these pin the semantics (tie rank, tombstones, interval chaining)
  * on hand-checkable inputs. */
class MergeSpec extends SparkTestBase {

  import spark.implicits._

  private def base = Seq(
    (1L, "a0", 0L, false), (2L, "b0", 0L, false), (3L, "c0", 0L, false)
  ).toDF("k", "val", "v", "del")

  private def changes = Seq(
    (1L, "a1", 5L, false), (1L, "a2", 9L, false), // two updates, v=9 wins
    (2L, "b1", 4L, true),                         // tombstone deletes key 2
    (4L, "d1", 2L, false)                         // insert of a new key
  ).toDF("k", "val", "v", "del")

  test("upsert: latest version wins, tombstone deletes, unseen keys survive") {
    val out = Merge.upsert(base, changes, Seq("k"), "v", Some("del"))
      .select("k", "val", "v").as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1L -> (("a2", 9L)), // highest version of the changelog
      3L -> (("c0", 0L)), // untouched base row
      4L -> (("d1", 2L))  // inserted
    ))
  }

  test("upsert: change outranks base at equal version") {
    val ch = Seq((3L, "c9", 0L, false)).toDF("k", "val", "v", "del")
    val out = Merge.upsert(base, ch, Seq("k"), "v", Some("del"))
      .filter(col("k") === 3L).select("val").as[String].collect()
    assert(out === Array("c9"))
  }

  test("upsert is deterministic under input reshuffling") {
    val a = Merge.upsert(base, changes, Seq("k"), "v", Some("del"))
      .select("k", "val").as[(Long, String)].collect().sorted
    val b = Merge.upsert(base.repartition(5, col("val")),
      changes.repartition(3, col("v")), Seq("k"), "v", Some("del"))
      .select("k", "val").as[(Long, String)].collect().sorted
    assert(a.sameElements(b))
  }

  test("streamUpsert: cross-batch latest-wins, tombstones stored and filtered on read") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString + "/store"
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Merge.streamUpsert(
      input.toDF().toDF("k", "val", "v", "del"), dir, Seq("k"), "v", nBuckets = 4)
    try {
      input.addData((1L, "a1", 1L, false), (2L, "b1", 1L, false), (3L, "c1", 1L, false))
      q.processAllAvailable()
      // batch 2: update k=1, tombstone k=2, leave k=3 untouched
      input.addData((1L, "a2", 2L, false), (2L, "b2", 2L, true))
      q.processAllAvailable()
      val live = Merge.readUpsertStore(spark, dir, Some("del"))
        .select("k", "val", "v").as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(live === Map(1L -> (("a2", 2L)), 3L -> (("c1", 1L))))
      // the tombstone survives as a stored row (an emptied bucket must
      // still be rewritten under dynamic partition overwrite)
      val raw = Merge.readUpsertStore(spark, dir, None)
        .select("k", "del").as[(Long, Boolean)].collect().toMap
      assert(raw(2L) === true)
      // stale version replay after the fact cannot regress the store
      input.addData((1L, "a0", 1L, false))
      q.processAllAvailable()
      val after = Merge.readUpsertStore(spark, dir, Some("del"))
        .filter(col("k") === 1L).select("val").as[String].collect()
      assert(after === Array("a2"))
    } finally q.stop()
  }

  test("streamUpsertAtomic: cross-batch latest-wins; crash debris invisible to readers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.AtomicCommit
    val root = java.nio.file.Files.createTempDirectory("graft-acdc").toString + "/store"
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Merge.streamUpsertAtomic(
      input.toDF().toDF("k", "val", "v", "del"), root, Seq("k"), "v", nBuckets = 4)
    try {
      input.addData((1L, "a1", 1L, false), (2L, "b1", 1L, false), (3L, "c1", 1L, false))
      q.processAllAvailable()
      // batch 2: update k=1, tombstone k=2, leave k=3 untouched
      input.addData((1L, "a2", 2L, false), (2L, "b2", 2L, true))
      q.processAllAvailable()
      val live = Merge.readUpsertStoreAtomic(spark, root, Some("del"))
        .select("k", "val", "v").as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(live === Map(1L -> (("a2", 2L)), 3L -> (("c1", 1L))))
      // untouched buckets were NOT rewritten: k=3's bucket still owned
      // by version 1 in the latest manifest
      val (vLatest, body) = AtomicCommit.latest(spark, root).get
      val owners = AtomicCommit.decodeOwners(body)
      assert(vLatest === 2L)
      assert(owners.values.toSet === Set(1L, 2L), s"owners $owners")

      // crash simulation: a half-written uncommitted version must not
      // change what readers resolve
      Seq((9L, "zz", 9L, false)).toDF("k", "val", "v", "del")
        .withColumn("_bucket", lit(0))
        .write.partitionBy("_bucket")
        .parquet(AtomicCommit.versionDir(root, 99L))
      val after = Merge.readUpsertStoreAtomic(spark, root, Some("del"))
        .select("k").as[Long].collect().toSet
      assert(after === Set(1L, 3L), "uncommitted version leaked into reads")

      // stale replay cannot regress the store
      input.addData((1L, "a0", 1L, false))
      q.processAllAvailable()
      val replay = Merge.readUpsertStoreAtomic(spark, root, Some("del"))
        .filter(col("k") === 1L).select("val").as[String].collect()
      assert(replay === Array("a2"))
    } finally q.stop()
  }

  test("streamUpsertAtomic fencing: a superseded attempt fails fast, the retry owns the store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.AtomicCommit
    val root = java.nio.file.Files.createTempDirectory("graft-fence").toString + "/store"
    implicit val sq = spark.sqlContext
    // attempt 1 starts with its fencing token and lands one batch
    val e1 = AtomicCommit.acquireEpoch(spark, root, holder = "attempt-1")
    val in1 = MemoryStream[(Long, String, Long, Boolean)]
    val q1 = Merge.streamUpsertAtomic(
      in1.toDF().toDF("k", "val", "v", "del"), root, Seq("k"), "v",
      nBuckets = 4, fenceEpoch = Some(e1))
    try {
      in1.addData((1L, "a1", 1L, false), (2L, "b1", 1L, false))
      q1.processAllAvailable()
      assert(Merge.readUpsertStoreAtomic(spark, root, Some("del")).count() === 2L)
      // the orchestrator retries: attempt 2 claims a newer epoch
      val e2 = AtomicCommit.acquireEpoch(spark, root, holder = "attempt-2")
      assert(e2 > e1)
      // the stalled attempt 1 wakes with another batch → its commit is
      // fenced and the query dies instead of publishing
      in1.addData((1L, "stale", 9L, false))
      val err = intercept[Exception](q1.processAllAvailable())
      assert(err.getMessage.contains("fenced") ||
        Option(err.getCause).exists(_.getMessage.contains("fenced")),
        s"expected fencing failure, got: ${err.getMessage}")
      // store is untouched by the zombie batch
      val live = Merge.readUpsertStoreAtomic(spark, root, Some("del"))
        .select("k", "val").as[(Long, String)].collect().toMap
      assert(live === Map(1L -> "a1", 2L -> "b1"))
      // attempt 2 proceeds under its own token
      val in2 = MemoryStream[(Long, String, Long, Boolean)]
      val q2 = Merge.streamUpsertAtomic(
        in2.toDF().toDF("k", "val", "v", "del"), root, Seq("k"), "v",
        nBuckets = 4, fenceEpoch = Some(e2))
      try {
        in2.addData((1L, "a2", 2L, false))
        q2.processAllAvailable()
        val after = Merge.readUpsertStoreAtomic(spark, root, Some("del"))
          .select("k", "val").as[(Long, String)].collect().toMap
        assert(after === Map(1L -> "a2", 2L -> "b1"))
      } finally q2.stop()
    } finally q1.stop()
  }

  test("upsert store time travel: readUpsertStoreAt resolves each commit's manifest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.AtomicCommit
    val root = java.nio.file.Files.createTempDirectory("graft-acdc-tt").toString + "/store"
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Merge.streamUpsertAtomic(
      input.toDF().toDF("k", "val", "v", "del"), root, Seq("k"), "v", nBuckets = 4)
    try {
      input.addData((1L, "a1", 1L, false), (2L, "b1", 1L, false), (3L, "c1", 1L, false))
      q.processAllAvailable()
      input.addData((1L, "a2", 2L, false), (2L, "b2", 2L, true))
      q.processAllAvailable()
      def stateAt(v: Long): Map[Long, String] =
        Merge.readUpsertStoreAt(spark, root, v, Some("del"))
          .select("k", "val").as[(Long, String)].collect().toMap
      // v=1: the pre-update world, including the later-tombstoned k=2;
      // v=2 ≡ latest. Both resolve THROUGH their own manifests (v=2's
      // untouched bucket still reads from version 1's directory).
      assert(stateAt(1L) === Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))
      assert(stateAt(2L) === Map(1L -> "a2", 3L -> "c1"))
      assert(stateAt(2L) ===
        Merge.readUpsertStoreAtomic(spark, root, Some("del"))
          .select("k", "val").as[(Long, String)].collect().toMap)
      // retention floor keeps v=2 readable and fails v=1 cleanly; v=1's
      // DATA directory survives the vacuum because v=2's manifest still
      // owns buckets in it (only the v=1 commit file goes)
      val removed = AtomicCommit.vacuum(spark, root, keepVersions = 1)
      assert(removed.exists(_.endsWith("_commits/1")), s"removed=$removed")
      assert(!removed.exists(_.endsWith("v=1")), s"removed=$removed")
      assert(stateAt(2L) === Map(1L -> "a2", 3L -> "c1"))
      val e = intercept[RuntimeException] { stateAt(1L) }
      assert(e.getMessage.contains("vacuumed"))
    } finally q.stop()
  }

  test("scd2: intervals chain (valid_to = next valid_from), one current row per key") {
    val log0 = Seq(
      (1L, 10L, "x1", 100L), (1L, 20L, "x2", 101L), (1L, 20L, "x3", 102L),
      (2L, 5L, "y1", 103L)
    ).toDF("k", "ts", "attr", "seq")
    val out = Merge.scd2(log0, Seq("k"), "ts", Seq("seq"))
      .select("k", "seq", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(out === Seq(
      (1L, 100L, 10L, Some(20L), false),
      (1L, 101L, 20L, Some(20L), false), // same-ts change: empty interval, seq-ordered
      (1L, 102L, 20L, None, true),
      (2L, 103L, 5L, None, true)
    ))
    val currents = out.filter(_._5).groupBy(_._1).view.mapValues(_.size).toMap
    assert(currents.values.forall(_ === 1))
  }
}
