package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Write-new-files-then-commit versioning for the mutable stores
  * (VERDICT r6 #4): data lands under a fresh `v=<N>/` directory first,
  * and becomes visible only when a small commit file RENAMES into
  * `_commits/<N>` — the atomic primitive on HDFS-like filesystems, the
  * same design as Structured Streaming's metadata log. Readers resolve
  * "latest" as the max version present in `_commits/`, so:
  *
  *   - a crash ANYWHERE mid-write leaves an orphan `v=<N>` directory
  *     that no reader ever sees (the commit file was never renamed);
  *   - readers concurrent with a writer see the previous version in
  *     full — never a mix of old and new buckets (snapshot isolation
  *     at version granularity);
  *   - recovery is automatic: the next write picks the version after
  *     the last COMMITTED one and overwrites any orphan debris.
  *
  * The commit file body is the version's manifest (free-form text —
  * bucket ownership for the upsert store, empty for whole-version
  * stores). One writer per store at a time (foreachBatch and batch
  * jobs are single-writer by construction); the rename-no-overwrite
  * claim is a best-effort guard, not a lock service. */
object AtomicCommit {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versionDir(root: String, v: Long): String = s"$root/v=$v"

  private def commitsDir(root: String) = new Path(root, "_commits")

  /** Latest committed (version, manifest body), None for an empty or
    * absent store. */
  def latest(spark: SparkSession, root: String): Option[(Long, String)] = {
    val f = fs(spark, root)
    val dir = commitsDir(root)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
    if (versions.isEmpty) None
    else {
      val v = versions.max
      val in = f.open(new Path(dir, v.toString))
      try Some((v, new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), UTF_8)))
      finally in.close()
    }
  }

  /** The version a writer should produce next. */
  def nextVersion(spark: SparkSession, root: String): Long =
    latest(spark, root).map(_._1 + 1).getOrElse(1L)

  /** Publish version `v` with `manifest` as the commit body. Returns
    * false if `v` was already committed (lost a race — the store is
    * single-writer, so treat as an error upstream). */
  def commit(spark: SparkSession, root: String, v: Long, manifest: String): Boolean = {
    val f = fs(spark, root)
    f.mkdirs(commitsDir(root))
    val dst = new Path(commitsDir(root), v.toString)
    if (f.exists(dst)) return false
    val tmp = new Path(root, s"_tmp-commit-$v-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(manifest.getBytes(UTF_8)) finally out.close()
    val ok = f.rename(tmp, dst)
    if (!ok) f.delete(tmp, false)
    ok
  }

  /** Bucket-ownership manifest codec for the upsert store: one
    * `bucket,version` line per bucket. */
  def encodeOwners(owners: Map[Int, Long]): String =
    owners.toSeq.sorted.map { case (b, v) => s"$b,$v" }.mkString("\n")

  def decodeOwners(s: String): Map[Int, Long] =
    s.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, v) = line.split(",", 2)
      b.toInt -> v.toLong
    }.toMap

  /** Delete uncommitted orphan `v=<N>` directories (crash debris) and
    * data versions no manifest references. Safe to run any time from
    * the single writer; never touches the committed-latest version's
    * referenced directories. */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return Nil
    val live: Set[Long] = latest(spark, root) match {
      case None => Set.empty
      case Some((v, body)) =>
        decodeOwners(body).values.toSet + v // whole-version stores: just v
    }
    f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .flatMap { s =>
        scala.util.Try(s.getPath.getName.stripPrefix("v=").toLong).toOption
          .filterNot(live).map { _ => f.delete(s.getPath, true); s.getPath.toString }
      }
  }
}
