package graft

import org.apache.spark.sql.functions._
import graft.operators.Fill

/** Goldens for gap filling (cross-engine behavior of the window forms
  * is proven by the q_ffill oracle). */
class FillSpec extends SparkTestBase {

  import spark.implicits._

  // key A: leading null, gap, trailing null; key B: all null
  private def df = Seq(
    ("A", 1L, None: Option[Double]), ("A", 2L, Some(10.0)), ("A", 3L, None),
    ("A", 4L, Some(20.0)), ("A", 5L, None),
    ("B", 1L, None), ("B", 2L, None))
    .toDF("k", "t", "v")

  private def vals(out: org.apache.spark.sql.DataFrame): Seq[(String, Long, Option[Double])] =
    out.orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq

  test("forwardFill carries the last observation; leading nulls stay null") {
    assert(vals(Fill.forwardFill(df, Seq("k"), Seq("t"), Seq("v"))) === Seq(
      ("A", 1L, None), ("A", 2L, Some(10.0)), ("A", 3L, Some(10.0)),
      ("A", 4L, Some(20.0)), ("A", 5L, Some(20.0)),
      ("B", 1L, None), ("B", 2L, None)))
  }

  test("backwardFill mirrors forward; trailing nulls stay null") {
    assert(vals(Fill.backwardFill(df, Seq("k"), Seq("t"), Seq("v"))) === Seq(
      ("A", 1L, Some(10.0)), ("A", 2L, Some(10.0)), ("A", 3L, Some(20.0)),
      ("A", 4L, Some(20.0)), ("A", 5L, None),
      ("B", 1L, None), ("B", 2L, None)))
  }

  test("fill = ffill, then bfill the prefix, then default for empty keys") {
    assert(vals(Fill.fill(df, Seq("k"), Seq("t"), Seq("v"), lit(-1.0))) === Seq(
      ("A", 1L, Some(10.0)), ("A", 2L, Some(10.0)), ("A", 3L, Some(10.0)),
      ("A", 4L, Some(20.0)), ("A", 5L, Some(20.0)),
      ("B", 1L, Some(-1.0)), ("B", 2L, Some(-1.0))))
  }

  test("interpolateLinear blends by order distance; edges hold nearest") {
    // A: t=3 sits 1/2 of the way from (2,10) to (4,20) → 15; t=1 edge
    // holds 10 (nearest following); t=5 edge holds 20 (nearest
    // preceding); B (no observations) stays null
    assert(vals(Fill.interpolateLinear(df, Seq("k"), "t", Seq("v"))) === Seq(
      ("A", 1L, Some(10.0)), ("A", 2L, Some(10.0)), ("A", 3L, Some(15.0)),
      ("A", 4L, Some(20.0)), ("A", 5L, Some(20.0)),
      ("B", 1L, None), ("B", 2L, None)))
  }

  test("interpolateLinear weights by ORDER distance, not row count") {
    // observations at t=0 (v=0) and t=10 (v=100); single null at t=7
    // → 70, not the row-midpoint 50
    val gaps = Seq(("A", 0L, Some(0.0)), ("A", 7L, None: Option[Double]),
      ("A", 10L, Some(100.0))).toDF("k", "t", "v")
    assert(vals(Fill.interpolateLinear(gaps, Seq("k"), "t", Seq("v")))
      .find(_._2 == 7L).flatMap(_._3).contains(70.0))
  }

  test("interpolateLinear: duplicate order keys fall to edge hold, never NaN") {
    // the null row shares t=5 with both observations → zero order
    // distance; the guard falls back to coalesce(prev, next), not 0/0
    val dup = Seq(("A", 5L, Some(10.0)), ("A", 5L, None: Option[Double]),
      ("A", 5L, Some(20.0))).toDF("k", "t", "v")
    val out = Fill.interpolateLinear(dup, Seq("k"), "t", Seq("v"))
      .collect().map(_.getAs[Double]("v"))
    assert(out.forall(v => !v.isNaN && !v.isInfinity))
    assert(out.sorted === Seq(10.0, 10.0, 20.0)) // held from prev obs
  }

  test("ewma follows the adjust=False recurrence; nulls carry state") {
    val d = Seq(
      ("A", 1L, Some(10.0)), ("A", 2L, None: Option[Double]),
      ("A", 3L, Some(20.0)), ("A", 4L, Some(0.0)),
      ("B", 1L, None: Option[Double]), ("B", 2L, Some(5.0))).toDF("k", "t", "v")
    val out = vals(Fill.ewma(d, Seq("k"), Seq("t"), "v", alpha = 0.5)
      .select(col("k"), col("t"), col("ewma").as("v")))
    // A: y1=10; t2 null → carry 10; y3 = .5·10+.5·20 = 15; y4 = 7.5
    // B: leading null → null; then first obs seeds state
    assert(out === Seq(
      ("A", 1L, Some(10.0)), ("A", 2L, Some(10.0)), ("A", 3L, Some(15.0)),
      ("A", 4L, Some(7.5)), ("B", 1L, None), ("B", 2L, Some(5.0))))
  }

  test("ewma is deterministic under input reshuffling") {
    val d = (1 to 500).map(i => (s"k${i % 7}", i.toLong, Some(i * 1.0)))
      .toDF("k", "t", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Fill.ewma(df, Seq("k"), Seq("t"), "v", 0.3)
        .select("k", "t", "ewma").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(run(d) === run(d.repartition(13).sortWithinPartitions("v")))
  }

  test("multi-column fill shares one window (single sort in the plan)") {
    val two = df.withColumn("v2", col("v") * 2)
    val out = Fill.forwardFill(two, Seq("k"), Seq("t"), Seq("v", "v2"))
    assert(out.filter(col("t") === 3 && col("k") === "A")
      .select("v", "v2").head() === org.apache.spark.sql.Row(10.0, 20.0))
    // both filled columns ride the same Window operator — exactly one
    // exchange on k in the plan
    val exchanges = out.queryExecution.executedPlan.toString
      .split("Exchange hashpartitioning").length - 1
    assert(exchanges === 1, s"expected one exchange, plan:\n${out.queryExecution.executedPlan}")
  }

  test("holtLinear: hand-computed recurrence; null carry; per-key reset; reshuffle-stable") {
    val d = Seq(
      ("A", 1L, Some(10.0)), ("A", 2L, Some(12.0)), ("A", 3L, None: Option[Double]),
      ("A", 4L, Some(14.0)),
      ("B", 1L, Some(5.0))).toDF("k", "t", "y")
    val out = Fill.holtLinear(d, Seq("k"), Seq("t"), "y", alphaPct = 50, betaPct = 25)
      .orderBy("k", "t")
      .select("k", "t", "holt_level", "holt_trend", "holt_next")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    // A: l1=10 b1=0; l2=.5*12+.5*10=11, b2=.25; t=3 null carries state;
    // l4=.5*14+.5*11.25=12.625, b4=.25*1.625+.75*.25=0.59375
    assert(out(0) === (("A", 1L, Some(10.0), Some(0.0), Some(10.0))))
    assert(out(1) === (("A", 2L, Some(11.0), Some(0.25), Some(11.25))))
    assert(out(2) === (("A", 3L, Some(11.0), Some(0.25), Some(11.25))))
    assert(out(3) === (("A", 4L, Some(12.625), Some(0.59375), Some(13.21875))))
    // B resets: fresh level, zero trend
    assert(out(4) === (("B", 1L, Some(5.0), Some(0.0), Some(5.0))))
    // deterministic under input reshuffling
    val re = Fill.holtLinear(d.repartition(7), Seq("k"), Seq("t"), "y", 50, 25)
      .orderBy("k", "t")
      .select("k", "t", "holt_level", "holt_trend", "holt_next")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(re === out)
  }

  test("holtWinters: hand-computed m=2 recurrence; warm-up = Holt; null carry; reshuffle-stable") {
    val d = Seq(
      ("A", 1L, Some(10.0)), ("A", 2L, Some(12.0)), ("A", 3L, Some(14.0)),
      ("A", 4L, Some(20.0)),
      ("B", 1L, None: Option[Double]), ("B", 2L, Some(5.0))).toDF("k", "t", "y")
    def run(df: org.apache.spark.sql.DataFrame) =
      Fill.holtWinters(df, Seq("k"), Seq("t"), "y", period = 2,
          alphaPct = 50, betaPct = 25, gammaPct = 50)
        .orderBy("k", "t")
        .select("k", "t", "hw_level", "hw_trend", "hw_season", "hw_next")
        .as[(String, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
        .collect().toSeq
    val out = run(d)
    // t=1: l=10 b=0 s=0, forecast 10 (s_{2-2} ≡ 0 in warm-up)
    assert(out(0) === (("A", 1L, Some(10.0), Some(0.0), Some(0.0), Some(10.0))))
    // t=2 (s_{0} ≡ 0): l=.5·12+.5·10=11, b=.25, s=.5·(12−10−0)=1;
    // forecast uses s_1 = 0 → 11.25
    assert(out(1) === (("A", 2L, Some(11.0), Some(0.25), Some(1.0), Some(11.25))))
    // t=3 (s_1 ≡ 0): l=.5·14+.5·11.25=12.625, b=.25·1.625+.75·.25=.59375,
    // s=.5·(14−11−.25)=1.375; forecast uses s_2 = 1 → 14.21875
    assert(out(2) === (("A", 3L, Some(12.625), Some(0.59375), Some(1.375), Some(14.21875))))
    // t=4, first seasonal hit (s_2 = 1):
    // l=.5·(20−1)+.5·13.21875=16.109375,
    // b=.25·3.484375+.75·.59375=1.31640625,
    // s=.5·(20−12.625−.59375)+.5·1=3.890625; forecast uses s_3=1.375
    assert(out(3) === (("A", 4L, Some(16.109375), Some(1.31640625),
      Some(3.890625), Some(18.80078125))))
    // B: leading null → null state; first obs seeds fresh level
    assert(out(4) === (("B", 1L, None, None, None, None)))
    assert(out(5) === (("B", 2L, Some(5.0), Some(0.0), Some(0.0), Some(5.0))))
    assert(run(d.repartition(7)) === out)
  }

  test("detectPeriod: planted period-3 series argmaxes at lag 3; scores match a driver reference; reshuffle-stable") {
    // A: strict period-3 impulse train; B: strictly increasing (no
    // seasonality — reference decides the argmax, we just agree)
    val a = (1 to 18).map(t => ("A", t.toLong, if (t % 3 == 0) 10.0 else 0.0))
    val b = (1 to 18).map(t => ("B", t.toLong, t * 1.0))
    val d = (a ++ b).toDF("k", "t", "y")
    val (minLag, maxLag) = (2, 5)
    def ref(ys: Seq[Double]): Map[Int, BigDecimal] = {
      // the operator's exact formula, in BigDecimal, from scratch
      val y4 = ys.map(v => BigDecimal(v).setScale(4))
      val rows = (maxLag until y4.length).map(i =>
        (y4(i), (minLag to maxLag).map(k => y4(i - k))))
      val n = BigDecimal(rows.length)
      val sy = rows.map(_._1).sum
      (minLag to maxLag).map { k =>
        val syy = rows.map { case (v, ls) => v * ls(k - minLag) }.sum
        val sl = rows.map(_._2(k - minLag)).sum
        k -> (n * syy - sy * sl)
      }.toMap
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      Fill.detectPeriod(df, Seq("k"), Seq("t"), "y", minLag, maxLag)
        .orderBy("k", "lag").collect()
        .map(r => (r.getString(0), r.getInt(1), BigDecimal(r.getDecimal(2)), r.getLong(3)))
        .toSeq
    val out = run(d)
    val refA = ref(a.map(_._3))
    val refB = ref(b.map(_._3))
    out.foreach { case (k, lagK, c, _) =>
      val want = if (k == "A") refA(lagK) else refB(lagK)
      assert(c === want, s"score mismatch at ($k, $lagK)")
    }
    // the impulse train's best lag is its true period
    assert(out.filter(r => r._1 == "A" && r._4 == 1L).map(_._2) === Seq(3))
    // exactly one best per key; deterministic under reshuffling
    assert(out.count(_._4 == 1L) === 2)
    assert(run(d.repartition(7)) === out)
  }

  test("detectPeriod: null observations drop (series compacts); out-of-bounds values raise, never null-score") {
    val a = (1 to 18).map(t => ("A", t.toLong, Some(if (t % 3 == 0) 10.0 else 0.0)))
    val withNulls = ((a.take(6) :+ (("A", 6L + 1, None: Option[Double]))) ++
      a.drop(6).map { case (k, t, v) => (k, t + 2, v) })
      .toDF("k", "t", "y")
    val clean = a.toDF("k", "t", "y")
    def run(df: org.apache.spark.sql.DataFrame) =
      Fill.detectPeriod(df, Seq("k"), Seq("t"), "y", 2, 5)
        .orderBy("k", "lag").collect()
        .map(r => (r.getInt(1), BigDecimal(r.getDecimal(2)), r.getLong(3))).toSeq
    // a null row contributes nothing — scores equal the compacted series
    assert(run(withNulls) === run(clean))
    // a value DECIMAL(14,4) cannot hold fails loudly (no silent null
    // score electing an arbitrary best)
    val big = (1 to 18).map(t => ("A", t.toLong, 2.0e10)).toDF("k", "t", "y")
    val e = intercept[Exception] {
      Fill.detectPeriod(big, Seq("k"), Seq("t"), "y", 2, 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ANSI sessions (the Spark 4 default) throw at the cast itself;
    // non-ANSI sessions reach the operator's raise_error guard — both
    // are loud, which is the contract under test
    assert(msgs(e).exists(m => m.contains("exceeds DECIMAL(14,4)") ||
      m.contains("cannot be represented") ||
      m.contains("NUMERIC_VALUE_OUT_OF_RANGE")), msgs(e).mkString(" | "))
  }

  test("detectPeriod: random series ≡ BigDecimal reference (differential)") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 15 + rng.nextInt(10)
      val (minLag, maxLag) = (2, 2 + rng.nextInt(4) + 1)
      // 4-decimal-exact random values inside the bounds contract (one
      // int division — a further subtraction would reintroduce binary
      // error past 4 decimals)
      val ys = (1 to n).map(_ => (rng.nextInt(2000000) - 1000000) / 100.0)
      val d = ys.zipWithIndex.map { case (v, i) => ("K", i.toLong, v) }
        .toDF("k", "t", "y")
      val y4 = ys.map(v => BigDecimal(v).setScale(4))
      val rows = (maxLag until n).map(i => (y4(i), (minLag to maxLag).map(k => y4(i - k))))
      val want = (minLag to maxLag).map { k =>
        val syy = rows.map { case (v, ls) => v * ls(k - minLag) }.sum
        val sl = rows.map(_._2(k - minLag)).sum
        k -> (BigDecimal(rows.length) * syy - rows.map(_._1).sum * sl)
      }.toMap
      val got = Fill.detectPeriod(d, Seq("k"), Seq("t"), "y", minLag, maxLag)
        .collect().map(r => r.getInt(1) -> BigDecimal(r.getDecimal(2))).toMap
      (minLag to maxLag).foreach { k =>
        assert(got(k) === want(k), s"trial $trial lag $k (n=$n maxLag=$maxLag)")
      }
    }
  }
}
