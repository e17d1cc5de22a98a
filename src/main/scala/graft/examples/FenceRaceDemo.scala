package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{AppendStore, AtomicCommit}

/** TWO-PROCESS store contention — the evidence thread-based
  * ContentionSpec cannot give (SURVEY §7.7 #7's residual): a real
  * orchestration retry is a separate JVM, so this demo forks one. The
  * parent plays the STALLED attempt (epoch 1); the child JVM is the
  * RETRY (epoch 2) that takes over the store, appends and compacts
  * while the parent concurrently READS across the process boundary;
  * after the child exits, the parent wakes up as a zombie and its
  * fenced append must die at the fence — proving the epoch claim
  * crosses processes (it lives in the filesystem, not in JVM state).
  *
  * Asserted:
  *   - the child acquires a HIGHER epoch than the parent's (FS-backed
  *     monotonicity across processes);
  *   - parent reads racing the child's appends+compactions see only
  *     complete-batch prefix sets (or fail missing-file-clean), same
  *     contract as the in-process spec — now across JVMs;
  *   - the parent's post-takeover fenced append throws "fenced" and
  *     writes NO data;
  *   - final content = parent's pre-takeover batch + the child's
  *     batches, single copy each.
  *
  * Run: sbt "runMain graft.examples.FenceRaceDemo"
  */
object FenceRaceDemo {

  private def batchDf(spark: SparkSession, b: Int, rows: Int = 5000) =
    spark.range(b.toLong * 1000000L, b.toLong * 1000000L + rows)
      .select(col("id"), lit(b).as("batch"))

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("worker")) worker(args(1)) else parent()

  private def session(name: String, threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .appName(name)
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory(s"$name-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def parent(): Unit = {
    val spark = session("fence-race-parent", 8)
    val root = java.nio.file.Files.createTempDirectory("fencerace")
      .resolve("store").toString

    // attempt 1 (this process) claims the store and lands one batch
    val e1 = AtomicCommit.acquireEpoch(spark, root, "attempt-1-parent")
    AppendStore.append(batchDf(spark, 0), root, fenceEpoch = Some(e1))
    println(s"FENCE-RACE parent: epoch $e1 claimed, batch 0 committed")

    // fork the RETRY as a real second JVM, inheriting this (forked)
    // JVM's classpath and module flags
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val cmd = Seq(
      s"${System.getProperty("java.home")}/bin/java") ++ jvmArgs ++ Seq(
      "-Xmx4g", "-cp", System.getProperty("java.class.path"),
      "graft.examples.FenceRaceDemo", "worker", root)
    val child = new ProcessBuilder(cmd: _*).inheritIO().start()

    // while the retry appends + compacts over there, read from HERE:
    // cross-process snapshot isolation at version granularity
    val anomalies = scala.collection.mutable.ArrayBuffer.empty[String]
    var successes = 0
    while (child.isAlive) {
      try {
        val got = AppendStore.readOr(spark, root, sys.error("empty"))
          .groupBy("batch").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        got.foreach { case (b, n) =>
          if (n != 5000L) anomalies += s"torn batch $b: $n rows"
        }
        val bs = got.keySet
        if (bs.nonEmpty && bs != (0 to bs.max).toSet)
          anomalies += s"non-prefix batch set $bs"
        successes += 1
      } catch {
        case e: Throwable =>
          val s = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .take(8).map(_.toString).mkString(" | ")
          if (!(s.contains("FileNotFound") || s.contains("PATH_NOT_FOUND") ||
              s.contains("does not exist") || s.contains("FAILED_READ_FILE")))
            anomalies += s"unexpected reader failure: $s"
      }
    }
    require(child.waitFor() == 0, "worker JVM failed")
    require(anomalies.isEmpty, s"cross-process reader anomalies: $anomalies")
    require(successes > 0, "degenerate race: no concurrent read completed")

    // the zombie wakes: its next fenced append must die at the fence —
    // the epoch the CHILD claimed fences THIS process
    val zombieDeath =
      try { AppendStore.append(batchDf(spark, 9), root, fenceEpoch = Some(e1)); None }
      catch { case t: Throwable => Some(t) }
    require(zombieDeath.isDefined && zombieDeath.get.getMessage.contains("fenced"),
      s"zombie append must die at the fence, got $zombieDeath")

    // final content: parent batch 0 + child batches 1..5, single copy
    val fin = AppendStore.readOr(spark, root, sys.error("empty"))
      .groupBy("batch").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(fin == (0 to 5).map(_ -> 5000L).toMap,
      s"final content wrong: $fin")
    println(s"FENCE-RACE passed: child epoch fenced the parent across JVMs, " +
      s"$successes concurrent cross-process reads all consistent, " +
      s"zombie append dead, final content exact (6 batches x 5000)")
    spark.stop()
  }

  private def worker(root: String): Unit = {
    val spark = session("fence-race-worker", 4)
    val e2 = AtomicCommit.acquireEpoch(spark, root, "attempt-2-worker")
    require(e2 >= 2, s"worker epoch $e2 must supersede the parent's")
    (1 to 5).foreach { b =>
      AppendStore.append(batchDf(spark, b), root, fenceEpoch = Some(e2))
      if (b % 2 == 0) AppendStore.compact(spark, root, fenceEpoch = Some(e2))
    }
    println(s"FENCE-RACE worker: epoch $e2, 5 batches + compactions committed")
    spark.stop()
  }
}
