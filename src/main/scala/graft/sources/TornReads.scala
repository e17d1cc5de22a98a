package graft.sources

/** THE torn-read classifier — one definition for every racing reader
  * of an atomic store or meta sidecar (VERDICT r18: the classifier
  * existed in five drifting copies, and the drift was already real — a
  * torn read surfacing as `FILE_NOT_EXIST` text retried in the demos
  * but classified fatal inside `embeddingDupProbe` and non-retryable
  * in the sharded-meta reader; a new signature now lands HERE and
  * reaches every call site at once, with TornReadsSpec pinning the
  * set).
  *
  * Every benign class is the same event — "the files this read
  * resolved were vacuumed or overwritten before it finished" — caught
  * at a different stage of the read:
  *   - commit/dir listing: `PATH_NOT_FOUND`, `does not exist`,
  *     `FILE_NOT_EXIST`, or a raw [[java.io.FileNotFoundException]];
  *   - task-side file read: `FAILED_READ_FILE` (Spark wraps the
  *     executor's FileNotFound in a SparkException whose cause chain
  *     carries it — the chain walk below finds either form);
  *   - plan-time schema inference: a dir whose files vanished between
  *     the listing and `spark.read`'s footer probe fails with
  *     `UNABLE_TO_INFER_SCHEMA` / "Unable to infer schema" (a meta
  *     sidecar mid-overwrite lists as an empty dir — the rarest
  *     window, seen once as a full-suite flake, r15).
  *
  * Anything NOT matched here is a real failure and must propagate:
  * classifying too much as torn would convert data corruption into an
  * infinite retry. The cause-chain walk is depth-bounded (Spark wraps
  * 2-4 deep; 14 covers every observed chain with margin) and
  * cycle-safe by the bound alone. */
object TornReads {

  /** The message substrings that mark a torn (cleanly retryable)
    * read — the pinned classification set. */
  val signatures: Seq[String] = Seq(
    "PATH_NOT_FOUND", "does not exist", "FILE_NOT_EXIST",
    "FAILED_READ_FILE", "FileNotFound",
    "UNABLE_TO_INFER_SCHEMA", "Unable to infer schema")

  private val maxCauseDepth = 14

  /** True iff `e` (or any cause in its chain, bounded) is a torn
    * read: retry against the next committed snapshot. */
  def matches(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(maxCauseDepth)
      .exists { t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
          (t.getMessage != null && signatures.exists(t.getMessage.contains))
      }
}
