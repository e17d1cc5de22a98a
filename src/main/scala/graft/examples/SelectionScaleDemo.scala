package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Corpus
import graft.operators.Selection

/** Radix-selection rehearsal at corpus scale — the order-statistics
  * analog of [[Curate10MDemo]]: 200M rows (two orders past the 1M
  * set-parity measurement of r12), full-range signed keys so every one
  * of the four 16-bit descent rounds carries information and negative
  * keys exercise the round-0 arithmetic-shift ordering.
  *
  * What is asserted, not eyeballed:
  *   - [[Selection.nthLargest]] threshold invariants at n = N/10 from
  *     ONE follow-up aggregation: count(key > t) < n ≤ count(key ≥ t),
  *     and the returned tie-slot count equals n − count(key > t);
  *   - [[Corpus.selectByBudgetAt]] kept set is a minimal best-first
  *     prefix: kept weight ≥ budget, removing the crossing doc drops
  *     below budget, no dropped row outranks a kept row in
  *     (quality DESC, id ASC) order;
  *   - byte-identical kept-id set vs the window-cumsum form
  *     ([[Corpus.selectByBudget]]) at 10M rows (both directions of
  *     `except` empty) — the documented identical-kept-set contract,
  *     re-proven one order past the SelectionSpec fixtures.
  *
  * What is measured: radix wall at 20M and at 200M (the descent's
  * per-scan cost is map+65,536-bucket agg, so ~10× rows ⇒ ~10× wall,
  * no super-linear term), vs the window form at 20M — which plans an
  * EMPTY-groupCols cumsum as ONE sort partition; its wall is the
  * single-core external-sort cost the radix path exists to delete, and
  * it cannot be run at 10¹⁰ rows at all.
  *
  * Run: sbt "runMain graft.examples.SelectionScaleDemo [nRows]"
  */
object SelectionScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000000L)
    val spark = SparkSession.builder()
      .appName("selection-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // full-range signed quality (xxhash64 spans the whole Long domain),
    // token weights 50..4049 — the DSIR keep-budget shape
    def frame(rows: Long) = spark.range(rows).select(
      col("id"),
      xxhash64(col("id")).as("q"),
      (pmod(xxhash64(col("id"), lit(7)), lit(4000L)) + 50L).as("ntok"))

    val big = frame(n).localCheckpoint()
    ScaleDemo.time(s"materialize ${n / 1000000}M rows")(big.count())

    // ---- nthLargest at n/10: four scans, ≤65,536-row envelopes ----
    val topN = n / 10
    val (t, slots) = ScaleDemo.time(s"nthLargest(n=${topN / 1000000}M)") {
      Selection.nthLargest(big, "q", topN)
    }
    val inv = big.agg(
      sum((col("q") > t).cast("long")).as("above"),
      sum((col("q") === t).cast("long")).as("eq")).head()
    val (above, eq) = (inv.getLong(0), inv.getLong(1))
    require(above < topN && above + eq >= topN,
      s"threshold $t violates count(>t)=$above < $topN <= count(>=t)=${above + eq}")
    require(slots == topN - above, s"tie slots $slots != ${topN - above}")
    println(s"SELECTION-SCALE nthLargest invariants hold: t=$t above=$above eq=$eq slots=$slots")

    // ---- selectByBudgetAt at 40% of total weight ----
    val totalW = big.agg(sum("ntok")).head().getLong(0)
    val budget = (totalW * 2) / 5
    val kept = ScaleDemo.time(s"selectByBudgetAt(${n / 1000000}M)") {
      val k = Corpus.selectByBudgetAt(big, "ntok", "q", budget, "id").localCheckpoint()
      k.count(); k
    }
    val keptW = kept.agg(sum("ntok")).head().getLong(0)
    require(keptW >= budget, s"kept weight $keptW < budget $budget")
    // crossing doc = last kept in (q DESC, id ASC) order; removing it
    // must fall below budget (minimality)
    val crossing = kept.orderBy(col("q").asc, col("id").desc)
      .select("ntok").limit(1).head().getLong(0)
    require(keptW - crossing < budget,
      s"kept set not minimal: $keptW - $crossing >= $budget")
    // best-first prefix: no dropped row outranks a kept row
    val minKept = kept.agg(min("q")).head().getLong(0)
    val dropped = big.join(kept.select("id"), Seq("id"), "left_anti")
    val dStats = dropped.agg(max("q").as("mq"),
      min(when(col("q") === minKept, col("id"))).as("mid")).head()
    require(dStats.getLong(0) <= minKept,
      s"dropped row with quality ${dStats.getLong(0)} outranks kept minimum $minKept")
    if (!dStats.isNullAt(1)) {
      val maxKeptTieId = kept.filter(col("q") === minKept).agg(max("id")).head().getLong(0)
      require(maxKeptTieId < dStats.getLong(1),
        s"tie order broken: kept id $maxKeptTieId >= dropped id ${dStats.getLong(1)}")
    }
    println(s"SELECTION-SCALE budget invariants hold: kept=${kept.count()} " +
      s"keptW=$keptW budget=$budget crossing=$crossing")

    // ---- window-form parity at 10M (exact kept-id set) ----
    val mid = frame(10000000L).localCheckpoint(); mid.count()
    val midBudget = mid.agg(sum("ntok")).head().getLong(0) * 2 / 5
    val viaWin = ScaleDemo.time("selectByBudget window(10M)") {
      val k = Corpus.selectByBudget(mid, Seq.empty, "ntok", "q", midBudget, "id")
        .select("id").localCheckpoint()
      k.count(); k
    }
    val viaRadix = ScaleDemo.time("selectByBudgetAt(10M)") {
      val k = Corpus.selectByBudgetAt(mid, "ntok", "q", midBudget, "id")
        .select("id").localCheckpoint()
      k.count(); k
    }
    require(viaWin.except(viaRadix).count() == 0 &&
      viaRadix.except(viaWin).count() == 0,
      "window and radix kept sets differ at 10M")
    println(s"SELECTION-SCALE parity holds at 10M: kept=${viaRadix.count()}")

    // ---- scaling point: radix at 20M for the rows→wall slope ----
    val small = frame(20000000L).localCheckpoint(); small.count()
    val sBudget = small.agg(sum("ntok")).head().getLong(0) * 2 / 5
    ScaleDemo.time("selectByBudgetAt(20M)") {
      Corpus.selectByBudgetAt(small, "ntok", "q", sBudget, "id").count()
    }
    ScaleDemo.time("selectByBudget window(20M)") {
      Corpus.selectByBudget(small, Seq.empty, "ntok", "q", sBudget, "id").count()
    }
    spark.stop()
  }
}
