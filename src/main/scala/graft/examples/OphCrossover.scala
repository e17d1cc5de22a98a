package graft.examples

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ext.TextHash

/** Signature-kernel crossover micro-bench: classic k-min MinHash vs
  * one-permutation densified, by k, over 2M pre-hashed 30-token docs
  * (hashes checkpointed so tokenization cannot hide the loop). The
  * r13 run on this box measured classic/OPH 0.34/0.26 s at k=4,
  * 0.35/0.28 at k=8, 0.52/0.31 at k=16, 0.95/0.34 at k=32,
  * 1.76/0.51 at k=64 — the source of
  * [[graft.ext.DocPipeline.OphDefaultMinK]] = 16 (below it both
  * kernels are scan-dominated and classic keeps historical
  * signatures bit-stable; above it the O(tokens·k) loop dominates). */
object OphCrossover {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8").appName("oph-crossover").getOrCreate()
    import spark.implicits._
    val n = 2000000
    val docs = spark.range(n.toLong)
      .select(col("id"),
        transform(sequence(lit(0), lit(29)),
          i => xxhash64(concat(col("id"), lit("_"), i))
            .bitwiseAND(lit((1L << 30) - 1))).as("_whs"))
      .localCheckpoint(true)
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      // warm
      docs.select(sum(element_at(c, 1))).head()
      val t0 = System.nanoTime()
      docs.select(sum(element_at(c, 1))).head()
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (k <- Seq(4, 8, 16, 32, 64)) {
      time(s"classic k=$k", TextHash.minhashSignature(col("_whs"), k))
      time(s"oph     k=$k", TextHash.ophSignature(col("_whs"), k))
    }
    spark.stop()
  }
}
