package graft.examples

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.CutOps
import graft.ext.{Eval, Ivf}
import graft.sources.AtomicCommit

/** IVF SERVE GRACE AT LOAD (VERDICT r17 #2): the signature stores got
  * fold supersession + a `keepVersions` grace knob because ServeRace
  * MEASURED a retry storm (26 torn retries vs 14 reads under keep=1
  * folds); the IVF segment store kept its own vacuum cadence on the
  * strength of 1–2 torn retries per run at ServeRace's QPS. This probe
  * produces the missing number: serve readers at saturation QPS
  * against an aggressive append → compact → vacuum cadence, measured
  * at `keepVersions = 1` and then `= 2`, same cycle count, same box.
  *
  * The decision the measurement backs: the IVF store needs NO ported
  * mechanism. [[AtomicCommit.vacuum]] already retains every data dir a
  * retained MANIFEST references, so `keepVersions = 2` is exactly
  * one-generation reader grace for the composition (IvfSpec pins the
  * semantics deterministically); serving deployments vacuum their IVF
  * roots with `keepVersions = 2` and inherit the same bounded ~2×
  * footprint as the signature stores' fold grace. A fold-supersession
  * line would be REDUNDANT here: unlike AppendStore (live = union of
  * ALL committed versions, so retention without supersession would
  * double-count), the IVF read path resolves ONE latest manifest —
  * old versions are never re-unioned, so retention alone is safe.
  *
  * Reader contract per read, as everywhere on the serve frontier: a
  * complete committed snapshot (every probe gets its full k) clearing
  * a fixed recall floor, or a LOUD torn-listing failure counted as a
  * clean retry; anything else is fatal.
  *
  * Run: sbt "runMain graft.examples.IvfServeGraceProbe [cycles] [readers]". */
object IvfServeGraceProbe {

  // the shared engine-side classifier (r19 — was a local copy)
  private def tornRead(e: Throwable): Boolean =
    graft.sources.TornReads.matches(e)

  private final class Reader(name: String, done: AtomicBoolean)(read: () => Unit)
      extends Thread(name) {
    val reads = new AtomicInteger(0)
    val retries = new AtomicInteger(0)
    val fatal = new AtomicReference[Throwable](null)
    override def run(): Unit =
      while (!done.get() && fatal.get() == null) {
        try { read(); reads.incrementAndGet() }
        catch {
          case e: Throwable if tornRead(e) => retries.incrementAndGet()
          case e: Throwable => fatal.set(e)
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(10)
    val nReaders = args.lift(1).map(_.toInt).getOrElse(3)
    require(cycles >= 4 && nReaders >= 1)
    val spark = SparkSession.builder()
      .appName("ivf-serve-grace-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("ivfgraceprobe")

    val dim = 16; val kCells = 16; val topK = 8; val nRes = 20000
    // the ServeRace geometry: residents strictly positive, mutating
    // traffic their negation — ground truth is a run-long constant and
    // every read must clear the same floor regardless of which
    // committed version it lands on
    def vecOf(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)), j =>
        (((pmod(xxhash64(id, j), lit(900L)) + 100L).cast("double") / 1000.0)
          .cast("float")))
    val residents = spark.range(nRes)
      .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding")).cut
    def farBatch(tag: Int, r: Int, n: Int) = {
      val b = 1000000L + tag.toLong * 10000000L + r * 100000L
      spark.range(b, b + n).select(col("id").as("vec_id"),
        transform(vecOf(col("id")), x => (-x).cast("float")).as("embedding"))
    }
    val panel = spark.range(32)
      .select((col("id") * 379L).as("probe_id"),
        transform(vecOf(col("id") * 379L), x => (x + 0.01f).cast("float"))
          .as("p_emb")).cut
    val truth = graft.ext.Similarity.bruteForceTopKJoin(residents, "embedding",
      panel, "probe_id", "p_emb", k = topK, tieBreak = Seq("vec_id")).cut
    val budget = 30000L

    final case class Phase(keep: Int, reads: Int, retries: Int, wall: Double)
    def runPhase(tag: Int, keep: Int): Phase = {
      val root = tmp.resolve(s"ivf$tag").toString
      Ivf.saveIndexAtomic(residents, "vec_id", "embedding", root,
        k = kCells, iters = 2)
      def serveOnce(): Unit = {
        val snap = Ivf.indexSnapshot(spark, root)
        val got = Ivf.topKJoinBudget(snap.index, "embedding", snap.centroids,
          snap.census, panel, "probe_id", "p_emb", k = topK,
          maxScanRows = budget, tieBreak = Seq("vec_id")).cut
        val shape = got.groupBy("probe_id").agg(count(lit(1)).as("n"))
          .agg(min(col("n")).as("mn"), count(lit(1)).as("p")).head()
        require(shape.getLong(0) == topK && shape.getLong(1) == 32L,
          s"incomplete serve result at keep=$keep (version ${snap.version})")
        val r = Eval.meanRecallAtK(got, truth, "probe_id", "vec_id", topK)
        require(r >= 0.8, f"recall $r%.3f below floor at keep=$keep")
      }
      serveOnce() // prime: the baseline read must pass before racing
      val done = new AtomicBoolean(false)
      val readers = (0 until nReaders).map(i =>
        new Reader(s"serve-$tag-$i", done)(() => serveOnce()))
      readers.foreach(_.start())
      val t0 = System.nanoTime()
      (0 until cycles).foreach { r =>
        Ivf.appendToIndexAtomic(farBatch(tag, r, 1000).cut, "embedding", root)
        Ivf.compactIndexAtomic(spark, root)
        AtomicCommit.vacuum(spark, root, keepVersions = keep)
      }
      done.set(true)
      readers.foreach(_.join(300000))
      readers.foreach(r => if (r.fatal.get() != null) throw r.fatal.get())
      Phase(keep, readers.map(_.reads.get()).sum,
        readers.map(_.retries.get()).sum, (System.nanoTime() - t0) / 1e9)
    }

    val a = runPhase(1, keep = 1)
    val b = runPhase(2, keep = 2)
    def rate(p: Phase): Double =
      if (p.reads + p.retries == 0) 0.0
      else p.retries.toDouble / (p.reads + p.retries)
    require(a.reads >= cycles && b.reads >= cycles,
      s"not a sustained read stream: ${a.reads}/${b.reads} reads")
    require(rate(b) <= rate(a),
      f"grace made it WORSE: keep=2 torn rate ${rate(b)}%.3f > keep=1 ${rate(a)}%.3f")
    println(f"IVF-GRACE keep=1: ${a.reads} committed reads, ${a.retries} torn " +
      f"retries (${rate(a) * 100}%.1f%% of attempts) across $cycles " +
      f"append+compact+vacuum cycles in ${a.wall}%.1f s ($nReaders readers)")
    println(f"IVF-GRACE keep=2: ${b.reads} committed reads, ${b.retries} torn " +
      f"retries (${rate(b) * 100}%.1f%% of attempts) across $cycles " +
      f"identical cycles in ${b.wall}%.1f s — one-generation manifest " +
      "retention is the serving cadence; no new mechanism needed")
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
