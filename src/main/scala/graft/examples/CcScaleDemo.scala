package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Connected-components rehearsal — the scale proof for
  * [[Dedup.transitiveClusters]]' diameter-free round bound (the
  * alternating star algorithm; this demo's predecessor falsified the
  * old hash-min loop's O(log d) claim, see §7.4). Three regimes in ONE
  * call (a mixed edge set, the way a real post-verification near-dup
  * graph mixes shapes):
  *
  *   - one PATH of 1,000,000 vertices over multiplicatively permuted
  *     ids (the component minimum sits at an arbitrary position, so
  *     min labels must actually travel 10⁶ hops) — the adversarial
  *     diameter case: naive label propagation needs ~10⁶ rounds, the
  *     old relax+chase loop needed ~d/3, the alternating algorithm
  *     must finish inside 25 (measured: 17), and the operator THROWS
  *     on non-convergence, so finishing at all IS the proof;
  *   - 500k·scale STARS of 40 leaves with the center id ABOVE its
  *     leaves (the label must flow leaf → center) — the realistic
  *     throughput shape (dup clusters are shallow and wide);
  *   - one 2M·scale-degree HUB — the boilerplate-cluster skew shape:
  *     large-star funnels the hub's whole neighborhood through one
  *     group/join partition, so this pins graceful degradation.
  *
  * Asserted, not eyeballed: total distinct components; the path
  * collapses to ONE component labeled by its true minimum (computed
  * independently by an aggregation over the generator); every star
  * vertex's component equals its block base; the hub component is
  * whole and labeled by the hub.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.examples.CcScaleDemo [scale]"
  */
object CcScaleDemo {
  def main(args: Array[String]): Unit = {
    // scale multiplies the star count and the hub degree (the path
    // stays at 1M — diameter is the adversarial axis, not volume):
    // 1 → 22M edges / 2M-degree hub; 5 → 111M edges / 10M-degree hub
    val scale = args.headOption.map(_.toInt).getOrElse(1)
    // optional arg 2: storage level for the per-round cuts (the
    // spark.graft.cutStorageLevel knob — MEMORY_AND_DISK_SER /
    // DISK_ONLY shrink the round-state heap envelope; §7.4 measures
    // the trade at 111M edges)
    val cutLevel = args.lift(1)
    val spark = SparkSession.builder()
      .appName("cc-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cutLevel.foreach { l =>
      spark.conf.set(graft.core.Checkpoints.LocalLevelConf, l)
      println(s"cut storage level: $l")
    }

    // per-stage task-time capture — the hub-salting decision gate
    // (§7.5): salting the large-star group key is justified only if a
    // single hot task dominates, so record max vs median task time per
    // stage and report the worst ratios after the run
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null && t.taskInfo.successful)
            stageTasks.computeIfAbsent(t.stageId,
              _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
              .add(t.taskInfo.duration)
      })

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
    val nStars = 500000L * scale
    val starEdges = spark.range(nStars * 40)
      .select((lit(S) + floor(col("id") / 40) * 64 + lit(40L)).as("a"),
        (lit(S) + floor(col("id") / 40) * 64 + pmod(col("id"), lit(40L))).as("b"))

    // one 2M-degree HUB (a boilerplate near-dup cluster): the known
    // skew shape for star algorithms — large-star processes the hub's
    // whole neighborhood in one group/join partition, so this pins
    // that a single hot key degrades gracefully instead of OOMing.
    // Hub center H sits BELOW its leaves, so it is also the label.
    val H = 4000000000L
    val hubEdges = spark.range(2000000L * scale)
      .select(lit(H).as("a"), (lit(H) + 1L + col("id")).as("b"))

    // input materialization goes through the library cut so the
    // storage-level knob governs the WHOLE demo's block envelope, not
    // just the per-round state
    val edges = graft.core.Checkpoints.cut(
      pathEdges.unionByName(starEdges).unionByName(hubEdges))
    ScaleDemo.time(s"materialize ${edges.count() / 1000000}M edges")(())

    var rounds = 0
    val comps = ScaleDemo.time("transitiveClusters (1M-diameter path + 500k stars)") {
      val c = Dedup.transitiveClusters(edges, "a", "b", maxIter = 30,
        onConverge = rounds = _).localCheckpoint()
      c.count(); c
    }
    require(rounds <= 25, s"round bound degraded: $rounds rounds for 1M diameter")

    val nComp = comps.agg(countDistinct("comp")).head().getLong(0)
    require(nComp == nStars + 2, s"components $nComp != ${nStars + 2}")

    val hubRows = comps.filter(col("id") >= H)
    val hubStats = hubRows.agg(count(lit(1)), countDistinct("comp"), min("comp")).head()
    require(hubStats.getLong(0) == 2000000L * scale + 1 && hubStats.getLong(1) == 1L &&
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

    // task-skew report: the top stages by max/median task time among
    // stages with enough tasks for a median to mean anything — the
    // row that decides whether the hub needs large-star salting
    import scala.jdk.CollectionConverters._
    val skews = stageTasks.asScala.toSeq.flatMap { case (sid, q) =>
      val ds = q.asScala.toArray.sorted
      if (ds.length < 8) None
      else {
        val med = ds(ds.length / 2).max(1L)
        Some((sid, ds.length, med, ds.last, ds.last.toDouble / med))
      }
    }.sortBy(-_._5).take(10)
    println("stage task-skew (top-10 by max/median):")
    skews.foreach { case (sid, n, med, mx, r) =>
      println(f"  stage=$sid%5d tasks=$n%4d medianMs=$med%7d maxMs=$mx%8d ratio=$r%6.1f")
    }
    val worst = skews.headOption.map(_._5).getOrElse(0.0)
    println(f"CC-SKEW worst max/median task ratio: $worst%.1f " +
      s"(salting gate: act only if a single hot task dominates rounds)")
    spark.stop()
  }
}
