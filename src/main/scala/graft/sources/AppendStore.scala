package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only ATOMIC set store: each append lands a fresh `v=<N>/`
  * directory and publishes it with one [[AtomicCommit]] commit file;
  * the live content is the UNION of all committed versions. The
  * atomic-commit twin of the plain `mode("append")` parquet stores the
  * streaming dedup operators grow — with plain append, a crash during
  * the store write leaves a HALF-written file set that readers cannot
  * tell from committed data (the documented exactly-once caveat);
  * here a crash anywhere before the commit rename leaves an orphan
  * directory no reader resolves, and the next attempt claims the same
  * version number and clobbers the debris.
  *
  * Replay semantics for dedup stores: a batch replayed after a
  * crash-before-commit finds the store exactly as it first saw it, so
  * it reproduces the same output and the same append — the STORE is
  * exactly-once. (Sink delivery retains foreachBatch's usual replay
  * caveat; a batch replayed after a successful commit sees its own
  * hashes as history.)
  *
  * Scale shape: reads list one small `_commits/` directory then scan
  * the committed version dirs as one parquet load; appends are one
  * distributed write + one rename. Version-dir proliferation under
  * high batch counts is bounded by [[compact]], which folds every
  * committed version into one new version and vacuums the rest. */
object AppendStore {

  /** The store's live content, or `empty` when nothing is committed
    * (the caller owns the schema — an absent store has none). Fails
    * fast when `root` holds a PLAIN parquet store (data files but no
    * commit log) — flipping a stream from `atomicStore = false` to
    * `true` over the same path would otherwise silently read an empty
    * history, forget every accepted hash, and re-admit old duplicates
    * while writing `v=` dirs into the mixed layout. */
  def readOr(spark: SparkSession, root: String, empty: => DataFrame): DataFrame = {
    val versions = AtomicCommit.committedVersions(spark, root)
    if (versions.isEmpty) {
      val f = AtomicCommit.fs(spark, root)
      val p = new org.apache.hadoop.fs.Path(root)
      val plainData = f.exists(p) && f.listStatus(p).exists { s =>
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith("v=") && !n.startsWith(".")
      }
      require(!plainData,
        s"$root holds a non-atomic parquet store (data files, no _commits/) — " +
          "it cannot be read as an atomic AppendStore; migrate it first " +
          "(read the plain store, append it as v=1, commit) or keep " +
          "atomicStore = false for this path")
      empty
    } else spark.read.parquet(
      versions.map(v => AtomicCommit.versionDir(root, v)): _*)
  }

  /** Append `df` as the next committed version; None when `df` is
    * empty (nothing to commit — version numbers are not burned on
    * empty batches). `fenceEpoch` (from `AtomicCommit.acquireEpoch`)
    * opts into writer fencing: a stalled attempt cannot append after
    * its retry claims a newer epoch. */
  def append(df: DataFrame, root: String,
             fenceEpoch: Option[Long] = None): Option[Long] = {
    if (df.isEmpty) return None
    val spark = df.sparkSession
    fenceEpoch.foreach(AtomicCommit.checkFence(spark, root, _)) // before the data write
    val v = AtomicCommit.nextVersion(spark, root)
    df.write.mode("overwrite") // clobbers only uncommitted crash debris
      .parquet(AtomicCommit.versionDir(root, v))
    AtomicCommit.commitOrFail(spark, root, v, "", fenceEpoch)
    Some(v)
  }

  /** Fold every committed version into ONE new version and vacuum the
    * old ones — run periodically so long-lived streams don't accumulate
    * thousands of tiny version dirs. */
  def compact(spark: SparkSession, root: String,
              fenceEpoch: Option[Long] = None): Option[Long] = {
    val versions = AtomicCommit.committedVersions(spark, root)
    if (versions.size < 2) return None
    val all = spark.read.parquet(
      versions.map(v => AtomicCommit.versionDir(root, v)): _*)
    val v = append(all, root, fenceEpoch)
    AtomicCommit.vacuum(spark, root, keepVersions = 1)
    v
  }
}
