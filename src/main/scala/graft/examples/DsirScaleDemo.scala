package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dsir, TextHash}

/** Scale rehearsal for [[graft.ext.Dsir]] (importance resampling) and
  * the OPH signature kernel, on a ~10⁶-doc synthetic corpus:
  *
  *  1. DSIR end-to-end — train a m=10k weight table on a 1%-slice
  *     target with a distinctive topic vocabulary, score the full
  *     corpus MAP-ONLY against the literal table, Gumbel-resample 5%,
  *     and report how strongly the selection enriches the planted
  *     topic (the paper's selling point, measured);
  *  2. signature-kernel throughput — classic k-min MinHash (O(n·k))
  *     vs one-permutation + densification (O(n+k)) at k=64, same
  *     corpus, forced end-to-end through an aggregation sink.
  *
  * Run: sbt "runMain graft.examples.DsirScaleDemo [nDocs]". Timings
  * comparable within one run only (shared box, README "Timing noise").
  */
object DsirScaleDemo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .appName("dsir-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 30-token docs over a 50k-token space (xxhash64 generator — the
    // CurateScaleDemo linearity lesson); every 20th doc is "on-topic":
    // its last 10 tokens come from a 40-word topic vocabulary
    val i = col("id")
    val onTopic = pmod(i, lit(20L)) === 0
    val body = transform(sequence(lit(0), lit(29)), w =>
      when(onTopic && w >= 20,
        concat(lit("topic"), pmod(abs(xxhash64(i, w)), lit(40L))))
        .otherwise(concat(lit("t"), pmod(abs(xxhash64(i, w)), lit(50021L)))))
    val docs = spark.range(nDocs)
      .select(i.as("doc_id"), array_join(body, " ").as("text"))
      .localCheckpoint() // isolate generation cost
    println(s"DSIR-SCALE input docs = ${docs.count()}")

    // target: an independent small corpus of PURE topic prose
    val target = spark.range(2000).select(
        array_join(transform(sequence(lit(0), lit(29)), w =>
          concat(lit("topic"), pmod(abs(xxhash64(col("id") + 7700000L, w)), lit(40L)))), " ")
          .as("text"))
      .localCheckpoint()

    var t0 = System.nanoTime()
    val w = Dsir.trainWeights(target, docs, "text", 10000)
    println(f"DSIR-SCALE trainWeights(m=10k) = ${(System.nanoTime() - t0) / 1e9}%.1f s")

    t0 = System.nanoTime()
    val n = (nDocs / 20L).toInt // resample exactly the planted count
    val picked = Dsir.resample(docs, "doc_id", "text", w, n)
      .select(col("doc_id")).localCheckpoint()
    val nPicked = picked.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val onTopicPicked = picked.filter(pmod(col("doc_id"), lit(20L)) === 0).count()
    println(f"DSIR-SCALE score+resample($n) = $sec%.1f s; " +
      f"on-topic in selection: $onTopicPicked/$nPicked " +
      f"(base rate would be ${nPicked / 20L})")

    // the corpus-budget path: radix selection + threshold filter must
    // pick the IDENTICAL set with no TakeOrdered driver merge
    t0 = System.nanoTime()
    val viaSel = Dsir.resampleAt(docs, "doc_id", "text", w, n.toLong)
      .select(col("doc_id")).localCheckpoint()
    val selSec = (System.nanoTime() - t0) / 1e9
    val diff = viaSel.union(picked).groupBy("doc_id").count()
      .filter(col("count") =!= 2).count()
    println(f"DSIR-SCALE resampleAt($n) = $selSec%.1f s; " +
      f"set difference vs sorted-limit path: $diff (must be 0)")

    // signature kernel shootout at k=64: word hashes MATERIALIZED first
    // so the timing isolates the signature loop (tokenization dominates
    // otherwise and hides the O(n·k) vs O(n+k) difference)
    val whs = docs.select(TextHash.wordHashes(col("text")).as("_whs"))
      .localCheckpoint()
    whs.count()
    def time(label: String, sig: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { rep =>
        val t = System.nanoTime()
        val s = whs.select(element_at(sig, 1).as("c0"))
          .agg(sum(col("c0"))).head().getLong(0)
        if (rep == 3)
          println(f"DSIR-SCALE $label k=64: ${(System.nanoTime() - t) / 1e9}%.2f s (checksum $s)")
      }
    }
    time("classic minhashSignature", TextHash.minhashSignature(col("_whs"), 64))
    time("oph signature          ", TextHash.ophSignature(col("_whs"), 64))
    spark.stop()
  }
}
