package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Exact-span dedup at 1M docs — VERDICT r15 next-round #5: the one
  * dedup family whose Σdf² candidate shape had only fixture-scale
  * evidence (q_span_exact runs at sf0.1 ≈ 60k docs). Corpus, all
  * columnar-generated:
  *
  *   - per-doc-unique filler (xxhash64 token names): no accidental
  *     cross-doc shingles, so every candidate is a planted one;
  *   - 1,000 planted cross-doc passage pairs (30 tokens, pair-private
  *     vocabulary, different offsets in each member — the
  *     chunking-invisible case duplicatedSpans exists for);
  *   - a boilerplate HUB (25 shared tokens across `hubDocs` docs):
  *     each hub-interior shingle has df = hubDocs, and the candidate
  *     stage pays df² pair rows PER SHINGLE — at df 20,000 that is
  *     21 × 4×10⁸ ≈ 8×10⁹ rows, the quadratic the maxDf cap exists
  *     to stop.
  *
  * Three measured runs:
  *   1. hub 20k, default cap 5,000 — the cap FIRES: wall, planted
  *      recall (must be 2000/2000 — the hub must not mask true
  *      pairs), the `span_exact_df_cap*` observed metrics (21 dropped
  *      shingles at max df 20,000), and zero hub spans reported
  *      (capped — the documented recall trade);
  *   - 2. hub 2k, same cap — the hub sits UNDER the cap: the
  *      candidate stage really pays 21 × 2000² ≈ 84M pair rows, hub
  *      docs all report their true 25-token span, wall records what
  *      df² costs when admitted;
  *   3. spanDedupExact (losersOnly) on the capped corpus — the
  *      removal path at the same scale.
  *
  * Run: sbt "runMain graft.examples.SpanExactScaleDemo [nDocs]".
  */
object SpanExactScaleDemo {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .appName("span-exact-scale-demo")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val nPairs = 1000L
    val half = nDocs / 2
    def uniq(id: Column, from: Int, n: Int) =
      transform(sequence(lit(from), lit(from + n - 1)),
        w => concat(lit("u"), xxhash64(id, w).cast("string")))
    def passage(pid: Column) =
      transform(sequence(lit(0), lit(29)),
        w => concat(lit("p"), pid.cast("string"), lit("_"), w.cast("string")))
    val hubTokens =
      transform(sequence(lit(0), lit(24)), w => concat(lit("hb"), w.cast("string")))

    def corpus(hubDocs: Long) = spark.range(nDocs)
      .select(col("id").as("doc_id"), array_join(
        when(col("id") < nPairs,
          concat(uniq(col("id"), 0, 15), passage(col("id")),
            uniq(col("id"), 100, 15)))
          .when(col("id") >= half && col("id") < half + nPairs,
            concat(uniq(col("id"), 0, 10), passage(col("id") - half),
              uniq(col("id"), 100, 20)))
          .when(col("id") >= nPairs && col("id") < nPairs + hubDocs,
            concat(uniq(col("id"), 0, 17), hubTokens, uniq(col("id"), 100, 18)))
          .otherwise(uniq(col("id"), 0, 60)), " ").as("text"))
      .localCheckpoint()

    // observed cap metrics ride the caller's own action
    val capSeen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach {
          case (k, row) if k.startsWith("span_exact_df_cap_") =>
            capSeen.add((row.getAs[Long]("n_shingles_dropped"),
              Option(row.getAs[java.lang.Long]("max_df_dropped"))
                .map(_.toLong).getOrElse(0L)))
          case _ => ()
        }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    def recallOf(spans: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val planted = spans.filter(
        (col("doc_id") < nPairs) ||
          (col("doc_id") >= half && col("doc_id") < half + nPairs))
        .filter(col("n_tokens") >= 30)
        .select(col("doc_id")).distinct().count()
      val hub = spans.filter(col("doc_id") >= nPairs && col("doc_id") < nPairs + 20000L)
        .select(col("doc_id")).distinct().count()
      (planted, hub)
    }

    // ── 1. hub ABOVE the cap: quadratic suppressed, recall intact ──
    val docsCapped = corpus(hubDocs = 20000L)
    val (r1, w1) = timed(recallOf(
      Dedup.duplicatedSpansExact(docsCapped, "doc_id", "text")))
    val deadline = System.currentTimeMillis() + 30000
    while (capSeen.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    val caps = capSeen.toArray(Array.empty[(Long, Long)])
    require(r1._1 == 2 * nPairs,
      s"planted recall under the cap: ${r1._1} of ${2 * nPairs}")
    require(r1._2 == 0, s"capped hub still reported ${r1._2} docs")
    require(caps.exists { case (nd, mx) => nd == 21L && mx == 20000L },
      s"cap metrics not observed: ${caps.mkString(", ")}")
    println(f"SPAN-EXACT 1M: hub 20k > cap 5k — wall $w1%.1f s, planted " +
      s"recall ${r1._1}/${2 * nPairs}, hub spans 0 (capped, observed " +
      s"drops=${caps.head._1} maxDf=${caps.head._2})")

    // ── 2. hub UNDER the cap: df² admitted and paid ──
    val docsUnder = corpus(hubDocs = 2000L)
    val (r2, w2) = timed(recallOf(
      Dedup.duplicatedSpansExact(docsUnder, "doc_id", "text")))
    require(r2._1 == 2 * nPairs,
      s"planted recall under-cap run: ${r2._1} of ${2 * nPairs}")
    require(r2._2 == 2000L, s"under-cap hub docs reported: ${r2._2} of 2000")
    println(f"SPAN-EXACT 1M: hub 2k < cap — wall $w2%.1f s (candidate stage " +
      "admits 21 x 2000² ≈ 84M pair rows), planted recall " +
      s"${r2._1}/${2 * nPairs}, hub spans 2000/2000 (true 25-token dups)")

    // ── 3. removal path at the same scale ──
    val (cut, w3) = timed {
      Dedup.spanDedupExact(docsCapped, "doc_id", "text")
        .agg(sum(when(col("n_removed") > 0L, 1L).otherwise(0L)).as("docs_cut"),
          sum(col("n_removed")).as("toks"))
        .head()
    }
    println(f"SPAN-EXACT 1M: spanDedupExact wall $w3%.1f s — " +
      s"${cut.getLong(0)} docs cut, ${cut.getLong(1)} tokens removed " +
      "(losers only: the 1000 high-id pair members)")
    spark.stop()
  }
}
