package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.DocPipeline

/** MinHash banding recall sweep on the ops rehearsal's planted mix —
  * the (minhashK, bands) tuning table operators actually set store
  * geometry by. The ops-month rehearsal quantified a LEAK at its
  * fixed (8, 4): a few planted near-dups per cycle miss every band
  * against their stored target (decaying 35 → 3 per 24k batch as
  * store coverage grows). This probe isolates the per-config rate:
  * one store of accepted content, one batch of pure planted near-dups
  * (target text + a 1–2-token suffix, the rehearsal's shape), leak =
  * accepted fraction of that batch, measured per geometry.
  *
  * Expected shape (banding theory, r = k/bands rows per band): the
  * probability a true pair at word-set similarity s collides in ≥ 1
  * band is 1 − (1 − s^r)^bands — more bands at fixed r buys recall
  * linearly in store cost (store rows scale with bands); deeper bands
  * (bigger r) SHARPEN the τ threshold but leak more just above it.
  * The probe prints measured vs predicted so drift from theory (e.g.
  * suffix tokens hijacking minhash components) is visible.
  *
  * Run: sbt "runMain graft.examples.BandingLeakSweep [nStore] [nNear]"
  */
object BandingLeakSweep {
  def main(args: Array[String]): Unit = {
    val nStore = args.headOption.map(_.toLong).getOrElse(200000L)
    val nNear = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .appName("banding-leak-sweep")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // accepted contents: distinct 15–34-word docs (the OpsMonthDemo
    // generator shape — xxhash words over a 1M space)
    def docText(contentId: org.apache.spark.sql.Column) =
      array_join(transform(
        sequence(lit(0), pmod(contentId, lit(20L)).cast("int") + 14),
        w => concat(lit("w"), pmod(xxhash64(contentId, w), lit(1000000L)))), " ")
    val contents = spark.range(nStore)
      .select(col("id").as("doc_id"), docText(col("id")).as("text"))
      .localCheckpoint()
    // planted near-dups: uniform targets + the rehearsal's suffix
    val nears = spark.range(nStore, nStore + nNear)
      .select(col("id").as("doc_id"),
        concat(docText(pmod(xxhash64(col("id"), lit(7)), lit(nStore))),
          lit(" zz"), (col("id") % 3).cast("string")).as("text"))
      .localCheckpoint()
    contents.count(); nears.count()

    println(f"${"k"}%4s ${"bands"}%5s ${"r"}%3s ${"leaked"}%7s ${"rate"}%8s ${"puncture(theory)"}%17s sec")
    val results = Seq((8, 4), (8, 2), (16, 4), (16, 8), (32, 8)).map { case (k, b) =>
      val store = DocPipeline.signatures(contents, minhashK = k, bands = b)
        .localCheckpoint()
      store.count()
      val t0 = System.nanoTime()
      val leaked = DocPipeline.prepareIncremental(
        nears, store, minWords = 10, minhashK = k, bands = b).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // word-set similarity of a planted near-dup: n/(n+2) for an
      // n-word target (one suffix token pair); average over the
      // 15..34 length mix for the theory line
      val r = k / b
      val pred = (15 to 34).map { n =>
        val s = n.toDouble / (n + 2)
        1.0 - math.pow(1.0 - math.pow(s, r), b)
      }.sum / 20.0
      println(f"$k%4d $b%5d $r%3d $leaked%7d ${leaked.toDouble / nNear}%8.4f ${1.0 - pred}%17.4f $sec%5.1f")
      (k, b, leaked)
    }
    // recall must not DECREASE when bands are added at fixed r
    val l84 = results.collect { case (8, 4, l) => l }.head
    val l168 = results.collect { case (16, 8, l) => l }.head
    require(l168 <= l84,
      s"more bands at r=2 leaked MORE ($l168 > $l84) — banding broken")
    println("BANDING-LEAK sweep complete")
    spark.stop()
  }
}
