package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Pointer-doubling connected-components rehearsal — the scale proof
  * for [[Dedup.transitiveClusters]]' O(log diameter) claim, which the
  * corpus demo only exercises at diameter 32. Two regimes in ONE call
  * (a mixed edge set, the way a real post-verification near-dup graph
  * mixes shapes):
  *
  *   - one PATH of 1,000,000 vertices over multiplicatively permuted
  *     ids (the component minimum sits at a random interior position,
  *     so hash-min must actually travel) — the adversarial diameter
  *     case: naive label propagation needs ~10⁶ rounds; the
  *     relax+double loop must converge inside `maxIter = 20`
  *     (per-round covered distance ≥ 3d+1 ⇒ ~13 rounds), and the
  *     operator THROWS on non-convergence, so finishing at all IS the
  *     log-diameter proof;
  *   - 500,000 STARS of 40 leaves each (20M edges) with the center id
  *     ABOVE its leaves, so the component label must flow leaf → center
  *     — the realistic throughput shape (dup clusters are shallow and
  *     wide).
  *
  * Asserted, not eyeballed: total distinct components = 500,001; the
  * path collapses to ONE component labeled by its true minimum id
  * (computed independently by an aggregation over the generator); every
  * star vertex's component equals its block base (0 mismatches across
  * 20.5M vertices).
  *
  * Run: SPARK_DRIVER_MEM=32g sbt "runMain graft.examples.CcScaleDemo"
  */
object CcScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("cc-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // path over permuted ids: v(i) = (i·2654435761) mod 1000000007 — a
    // bijection on [0, p), so the 1M vertex ids are distinct and the
    // component min lands at an arbitrary interior i
    val P = 1000000007L
    def v(c: org.apache.spark.sql.Column) = (c * 2654435761L) % P
    val nPath = 1000000L
    val pathEdges = spark.range(nPath - 1)
      .select(v(col("id")).as("a"), v(col("id") + 1).as("b"))
    val pathMin = spark.range(nPath).select(v(col("id")).as("x"))
      .agg(min("x")).head().getLong(0)

    // 500k stars: block j owns ids S + 64j .. S + 64j + 40; leaves at
    // +0..+39, center at +40 (center ABOVE leaves: the min is a leaf)
    val S = 2000000000L
    val nStars = 500000L
    val starEdges = spark.range(nStars * 40)
      .select((lit(S) + floor(col("id") / 40) * 64 + lit(40L)).as("a"),
        (lit(S) + floor(col("id") / 40) * 64 + pmod(col("id"), lit(40L))).as("b"))

    // one 2M-degree HUB (a boilerplate near-dup cluster): the known
    // skew shape for star algorithms — large-star processes the hub's
    // whole neighborhood in one group/join partition, so this pins
    // that a single hot key degrades gracefully instead of OOMing.
    // Hub center H sits BELOW its leaves, so it is also the label.
    val H = 4000000000L
    val hubEdges = spark.range(2000000L)
      .select(lit(H).as("a"), (lit(H) + 1L + col("id")).as("b"))

    val edges = pathEdges.unionByName(starEdges).unionByName(hubEdges)
      .localCheckpoint()
    ScaleDemo.time(s"materialize ${edges.count() / 1000000}M edges")(())

    var rounds = 0
    val comps = ScaleDemo.time("transitiveClusters (1M-diameter path + 500k stars)") {
      val c = Dedup.transitiveClusters(edges, "a", "b", maxIter = 30,
        onConverge = rounds = _).localCheckpoint()
      c.count(); c
    }
    require(rounds <= 25, s"pointer doubling degraded: $rounds rounds for 1M diameter")

    val nComp = comps.agg(countDistinct("comp")).head().getLong(0)
    require(nComp == nStars + 2, s"components $nComp != ${nStars + 2}")

    val hubRows = comps.filter(col("id") >= H)
    val hubStats = hubRows.agg(count(lit(1)), countDistinct("comp"), min("comp")).head()
    require(hubStats.getLong(0) == 2000001L && hubStats.getLong(1) == 1L &&
      hubStats.getLong(2) == H, s"hub component broken: $hubStats")

    val pathRows = comps.filter(col("id") < S)
    val pathComps = pathRows.agg(countDistinct("comp"), min("comp"), count(lit(1))).head()
    require(pathComps.getLong(0) == 1L,
      s"path split into ${pathComps.getLong(0)} components")
    require(pathComps.getLong(1) == pathMin,
      s"path label ${pathComps.getLong(1)} != true min $pathMin")
    require(pathComps.getLong(2) == nPath, s"path vertex count ${pathComps.getLong(2)}")

    val starBad = comps.filter(col("id") >= S && col("id") < H)
      .filter(col("comp") =!= (lit(S) + floor((col("id") - S) / 64) * 64)).count()
    require(starBad == 0L, s"$starBad star vertices mislabeled")

    println(s"CC-SCALE invariants hold: ${nStars + 2} components in $rounds rounds, " +
      s"path min $pathMin reached across 1M hops, 2M-degree hub intact, " +
      s"${comps.count()} labeled vertices")
    spark.stop()
  }
}
