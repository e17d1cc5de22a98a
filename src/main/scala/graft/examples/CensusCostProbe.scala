package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Ivf

/** Measurement gate for SURVEY §7.7 #6 / VERDICT r14 #7: would folding
  * the IVF census into the commit manifest BODY pay for itself? The
  * candidate cost it would remove is one tiny `_census` parquet read
  * per SEGMENT at serve setup (steady-state streaming reads are
  * already free — the census is cached by committed version). This
  * probe builds a deliberately fragmented index (many small appends,
  * never compacted), then times cold `indexCellCounts` against the
  * full-scan fallback. Implement the manifest fold ONLY if the
  * sidecar reads show up at operational segment counts (compaction
  * keeps real indexes at single-digit segments — OpsMonthDemo holds
  * ≤ 6).
  *
  * Run: sbt "runMain graft.examples.CensusCostProbe [segments] [rowsPerSeg]"
  */
object CensusCostProbe {
  def main(args: Array[String]): Unit = {
    val nSegs = args.headOption.map(_.toInt).getOrElse(48)
    val perSeg = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .appName("census-cost-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 16
    def vecOf(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(dim)), i =>
        ((pmod(xxhash64(id, i), lit(2000L)) - 1000L).cast("double") / 1000.0)
          .cast("float"))
    def batch(s: Int) = spark.range(s.toLong * perSeg, (s + 1L) * perSeg)
      .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))

    val root = java.nio.file.Files.createTempDirectory("censuscost")
      .resolve("ivf").toString
    Ivf.saveIndexAtomic(batch(0), "vec_id", "embedding", root, k = 16, iters = 2)
    (1 until nSegs).foreach(s => Ivf.appendToIndexAtomic(batch(s), "embedding", root))
    val segs = Ivf.indexSegments(spark, root)
    require(segs.size == nSegs, s"expected $nSegs segments, got ${segs.size}")

    def timed(f: => Map[Int, Long]): (Map[Int, Long], Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // cold sidecar sum (first touch), then warm repeats
    val (cSide, wCold) = timed(Ivf.indexCellCounts(spark, root))
    val warm = (1 to 5).map(_ => timed(Ivf.indexCellCounts(spark, root))._2)
    // the fallback everyone would pay without sidecars: scan + groupBy
    val (cScan, wScan) = timed(Ivf.cellCounts(Ivf.readIndex(spark, root)))
    require(cSide == cScan, "census sidecar diverged from scan")
    println(f"CENSUS-COST: $nSegs segments x $perSeg rows — sidecar sum " +
      f"cold $wCold%.2f s, warm median ${warm.sorted.apply(warm.size / 2)}%.2f s " +
      f"(${wCold / nSegs * 1000}%.0f ms/segment cold); full scan $wScan%.2f s")
    println(if (wCold < 0.1 * wScan && wCold < 2.0)
      "VERDICT: sidecar reads are noise even at pathological segment counts — " +
        "manifest-body fold NOT warranted (compaction keeps real indexes at " +
        "single-digit segments)"
    else
      "VERDICT: sidecar reads material — consider folding counts into the " +
        "commit manifest body")
    spark.stop()
  }
}
