package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DocPipeline}

/** Candidate-edge volume delta of the r15 path-edge default (VERDICT
  * r14 #2 "measured and recorded"): on an ops-mix corpus (60% unique /
  * 25% exact dups / 15% near-dups — the OpsMonthDemo traffic shape at
  * one cycle's scale), count the star candidate set vs star ∪ path and
  * time `prepare` with `pathEdges` off vs on. The bound says path adds
  * ≤ 1 edge per (doc, band) — in practice far less, because singleton
  * buckets (unique content) contribute no path edge at all.
  *
  * Run: sbt "runMain graft.examples.PathEdgeDelta [docs]"
  */
object PathEdgeDelta {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .appName("path-edge-delta")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ops-mix: ids [0, .6n) unique content; [.6n, .85n) exact dups of a
    // uniform earlier unique id; [.85n, n) near-dups (suffix token)
    val nNew = n * 60 / 100
    def text(cid: org.apache.spark.sql.Column) =
      array_join(transform(
        sequence(lit(0), pmod(cid, lit(20L)).cast("int") + 14),
        w => concat(lit("w"), pmod(xxhash64(cid, w), lit(1000000L)))), " ")
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < nNew, text(col("id")))
        .when(col("id") < n * 85 / 100, text(pmod(xxhash64(col("id")), lit(nNew))))
        .otherwise(concat(text(pmod(xxhash64(col("id"), lit(7)), lit(nNew))),
          lit(" zz"), (col("id") % 3).cast("string"))).as("text"))
      .localCheckpoint()

    // candidate volumes from the same banding the pipeline uses
    val banded = Dedup.minhashBands(docs, "doc_id", "text", k = 8, bands = 4)
      .localCheckpoint()
    val bmin = banded.groupBy(col("band_key")).agg(min(col("doc_id")).as("m"))
    val star = banded.join(bmin, "band_key")
      .filter(col("doc_id") > col("m"))
      .select(col("doc_id"), col("m")).distinct().count()
    val byB = Window.partitionBy(col("band_key")).orderBy(col("doc_id"))
    val path = banded.withColumn("p", lag(col("doc_id"), 1).over(byB))
      .filter(col("p").isNotNull)
      .select(col("doc_id"), col("p"))
    val both = banded.join(bmin, "band_key")
      .filter(col("doc_id") > col("m"))
      .select(col("doc_id"), col("m"))
      .union(path).distinct().count()
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (survOff, wOff) = timed(
      DocPipeline.prepare(docs, minWords = 5, tau = 0.8, pathEdges = false).count())
    val (survOn, wOn) = timed(
      DocPipeline.prepare(docs, minWords = 5, tau = 0.8).count())
    require(survOn <= survOff, s"path edges must only add drops: $survOff -> $survOn")
    println(f"PATH-EDGE-DELTA: $n docs (60/25/15 mix) — star candidates $star%,d, " +
      f"star∪path $both%,d (+${100.0 * (both - star) / star}%.1f%%); " +
      f"survivors star-only $survOff%,d in $wOff%.1f s vs default $survOn%,d in $wOn%.1f s " +
      f"(leak closed: ${survOff - survOn}%,d more true dups caught)")
    spark.stop()
  }
}
