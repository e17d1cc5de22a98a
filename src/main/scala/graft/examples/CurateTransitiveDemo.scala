package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Curate

/** Transitive vs star near-dup blocking inside the Curate funnel at
  * 10M docs — the cost/benefit record for `transitive = true` now that
  * [[graft.ext.Dedup.transitiveClusters]] is the diameter-free
  * alternating star algorithm (§7.4: the old hash-min loop was ~d/3
  * rounds on permuted chains, so this mode previously carried a latent
  * non-termination on exactly the chain-shaped dup families it
  * exists for). Same fixture as [[Curate10MDemo]]'s floor prefix
  * (exact/near dup families every 50 ids, corpus-wide footer, OPH
  * banding by the k ≥ 16 default, banding df-guard on by default).
  *
  * Star mode drops every verified non-min PARTNER of a banded pair;
  * transitive mode collapses CHAINS (A~B~C drops B and C even when A
  * and C never shared a band) — on this fixture both see the same
  * within-family pairs, so docs-out match and the measured delta is
  * the CC rounds' cost alone; on real drift chains transitive kills
  * strictly more.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.examples.CurateTransitiveDemo [nDocs]"
  */
object CurateTransitiveDemo {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .appName("curate-transitive-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the Curate10MDemo fixture, generation isolated from timing
    val i = col("id")
    val grp = floor(i / 50L)
    val role = pmod(i, lit(50L))
    val seed = when(role === 1 || role === 2, grp * 50L).otherwise(i)
    val onTopic = pmod(i, lit(10L)) === 3
    val body = array_join(transform(sequence(lit(0), lit(29)),
      w => concat(
        when(onTopic && pmod(w, lit(3)) === 0,
          concat(lit("topic"), pmod(abs(xxhash64(seed, w)), lit(200L))))
          .otherwise(concat(lit("t"),
            pmod(abs(xxhash64(seed, w)), lit(50021L)))),
        when(pmod(w, lit(8)) === 7, lit(".")).otherwise(lit("")))), " ")
    val docs = spark.range(nDocs).select(
        i.as("doc_id"),
        concat(
          body,
          when(role === 1, lit(" extraneous")).otherwise(lit("")),
          lit(" All rights reserved footer line.")).as("text"))
      .localCheckpoint()
    println(s"CURATE-TRANSITIVE input docs = ${docs.count()}")

    val floorCfg = Curate.Config(minWords = 10, maxTopTokenFrac = 0.5,
      minhashK = 16, bands = 8, tau = 0.7)

    def run(label: String, cfg: Curate.Config): Long = {
      val t0 = System.nanoTime()
      val n = Curate.run(docs, cfg).count()
      println(f"$label%-24s docs out = $n%9d  wall = ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      n
    }
    val star = run("star blocking", floorCfg)
    val trans = run("transitive clustering", floorCfg.copy(transitive = true))
    // every star-dropped doc (the greater member of ≥1 verified pair)
    // is a non-min member of its component, so transitive drops a
    // SUPERSET — the measured gap is exactly the chain-middle members
    // only transitive semantics can reach (here: rare collision-induced
    // cross-family links; on real revision chains, the whole tail)
    require(trans <= star,
      s"transitive must drop a superset of star blocking: $trans > $star")
    println(s"CURATE-TRANSITIVE invariants hold: chain-only extra drops = ${star - trans}")
    spark.stop()
  }
}
