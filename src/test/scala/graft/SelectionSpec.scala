package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  test("nthLargest/nthSmallest: hand cases incl. negatives, ties, radix boundaries") {
    // ties straddling a low-16-bit radix boundary: 0x1FFFF vs 0x20000
    // share no 16-bit suffix bucket but order by the high rounds first
    val xs = Seq(5L, 5L, 5L, -3L, 0L, 0x1FFFFL, 0x20000L, -0x20000L,
      Long.MinValue, Long.MaxValue, 7L)
    val df = xs.toDF("k")
    assert(Selection.nthLargest(df, "k", 1) === ((Long.MaxValue, 1L)))
    assert(Selection.nthLargest(df, "k", 2) === ((0x20000L, 1L)))
    assert(Selection.nthLargest(df, "k", 3) === ((0x1FFFFL, 1L)))
    assert(Selection.nthLargest(df, "k", 4) === ((7L, 1L)))
    assert(Selection.nthLargest(df, "k", 5) === ((5L, 1L)))
    assert(Selection.nthLargest(df, "k", 6) === ((5L, 2L)))
    assert(Selection.nthLargest(df, "k", 7) === ((5L, 3L)))
    assert(Selection.nthLargest(df, "k", 8) === ((0L, 1L)))
    assert(Selection.nthLargest(df, "k", xs.length) === ((Long.MinValue, 1L)))
    assert(Selection.nthSmallest(df, "k", 1) === ((Long.MinValue, 1L)))
    assert(Selection.nthSmallest(df, "k", 2) === ((-0x20000L, 1L)))
    assert(Selection.nthSmallest(df, "k", 3) === ((-3L, 1L)))
    assert(Selection.nthSmallest(df, "k", 6) === ((5L, 2L)))
    // n past the row count is an error, not "everything"
    assertThrows[IllegalArgumentException] {
      Selection.nthLargest(df, "k", xs.length + 1)
    }
    // nulls are ignored, not counted
    val withNulls = df.union(Seq[Option[Long]](None, None).toDF("k"))
    assert(Selection.nthLargest(withNulls, "k", xs.length) ===
      ((Long.MinValue, 1L)))
  }

  test("selectByBudgetAt ≡ selectByBudget (global): ties, zero-weight rows, exact crossing doc") {
    import graft.ext.Corpus
    // quality ties (q=5 thrice), a zero-token row inside the tie group,
    // and weights chosen so the budget crosses mid-tie
    val df = Seq(
      (1L, 9L, 4L), (2L, 7L, 3L), (3L, 5L, 2L), (4L, 5L, 0L), (5L, 5L, 6L),
      (6L, 3L, 10L), (7L, 1L, 1L)
    ).toDF("doc_id", "q", "n_tok")
    for (budget <- Seq(1L, 4L, 7L, 9L, 10L, 15L, 25L, 26L, 100L)) {
      val window = Corpus.selectByBudget(df, Nil, "n_tok", "q", budget, "doc_id")
        .select("doc_id").as[Long].collect().toSet
      val radix = Corpus.selectByBudgetAt(df, "n_tok", "q", budget, "doc_id")
      assert(radix.select("doc_id").as[Long].collect().toSet === window,
        s"budget=$budget")
      // the scale path must not plan a Window (that is the hot-stratum
      // single-partition sort it exists to avoid)
      assert(!radix.queryExecution.executedPlan.toString.contains("Window"),
        s"budget=$budget planned a window")
    }
    // fractional quality is rejected, not silently truncated
    assertThrows[IllegalArgumentException] {
      Corpus.selectByBudgetAt(df.withColumn("q", col("q") / 2.0),
        "n_tok", "q", 5L, "doc_id")
    }
    // a negative weight would silently corrupt the cumulative walk —
    // the descent's ride-along min(weight) guard must raise instead
    assertThrows[IllegalArgumentException] {
      graft.operators.Selection.budgetThresholdDesc(
        Seq((1L, 4L), (2L, -1L)).toDF("k", "w"), "k", "w", 3L)
    }
  }

  test("weight hygiene: int-typed weights work, null weights raise, " +
      "per-bucket Long overflow raises instead of walking a wrapped histogram") {
    // IntegerType weight column: descend must cast, not ClassCastException
    val intW = Seq((10L, 3), (9L, 2), (8L, 1)).toDF("k", "w")
    assert(Selection.budgetThresholdDesc(intW, "k", "w", 4L) === (9L, 1L))
    // null weight is a caller bug (only null KEYS are ignored)
    assertThrows[IllegalArgumentException] {
      Selection.budgetThresholdDesc(
        Seq((1L, Some(4L)), (2L, None)).toDF("k", "w"), "k", "w", 3L)
    }
    // two Long.MaxValue weights on keys sharing every radix bucket:
    // their sum wraps negative outside ANSI mode — must fail loudly
    assertThrows[ArithmeticException] {
      Selection.budgetThresholdDesc(
        Seq((5L, Long.MaxValue), (5L, Long.MaxValue)).toDF("k", "w"),
        "k", "w", 3L)
    }
    // THREE huge weights wrap a raw Long sum past 2^64 back into
    // POSITIVE range (3 × 6.3e18 ≈ 1.89e19 ≡ +4.4e17 mod 2^64) — a
    // sign check is blind here; the decimal total must still raise
    assertThrows[ArithmeticException] {
      Selection.budgetThresholdDesc(
        Seq((5L, 6300000000000000000L), (5L, 6300000000000000000L),
          (5L, 6300000000000000000L)).toDF("k", "w"),
        "k", "w", 3L)
    }
  }

  test("differential vs driver sort on pseudo-random longs, all n") {
    // deterministic LCG mix, spanning positives/negatives and shared
    // values (mod squeezes collisions into every radix round)
    val xs = (1 to 300).map(i =>
      ((i * 2654435761L + 40503L) % 1000003L) * 77L - 38500000L)
    val df = xs.map(Tuple1(_)).toDF("k")
    val desc = xs.sorted(Ordering[Long].reverse)
    val asc = xs.sorted
    for (n <- Seq(1, 2, 17, 150, 299, 300)) {
      val tL = desc(n - 1)
      val expL = (tL, n.toLong - desc.count(_ > tL))
      assert(Selection.nthLargest(df, "k", n) === expL, s"largest n=$n")
      val tS = asc(n - 1)
      val expS = (tS, n.toLong - asc.count(_ < tS))
      assert(Selection.nthSmallest(df, "k", n) === expS, s"smallest n=$n")
    }
  }
}
