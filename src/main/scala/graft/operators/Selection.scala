package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics for LONG keys — the scale-safe
  * replacement for `orderBy(key).limit(n)` when `n` is corpus-sized.
  *
  * Spark plans a sorted limit as TakeOrderedAndProject: every partition
  * keeps its local top-n, and the DRIVER merge-sorts `n · partitions`
  * rows. At a training-data keep budget (n ~ 10⁹ of 10¹⁰ docs) that is
  * a driver OOM by construction — the same failure class as the
  * global-window AUC this repo already bounded. Selection replaces it
  * with 16-bit-radix histogram descent: four filtered scans, each
  * aggregating into at most 65,536 buckets (a bounded driver envelope,
  * the repo's envelope rule), no sort, no shuffle wider than the
  * 65,536-row histogram.
  *
  * Round r buckets keys by bits [63−16r, 48−16r): round 0 uses the
  * ARITHMETIC shift `key >> 48`, so bucket order equals signed key
  * order; later rounds mask 16 unsigned bits within the already-pinned
  * prefix. Deterministic and retry-stable (buckets derive from key
  * content only). */
object Selection {

  /** The n-th largest value of `keyCol` (1-based, duplicates counted),
    * plus how many of the n top slots fall on keys EQUAL to that
    * value. A caller keeping exactly n rows takes everything strictly
    * above the threshold and breaks the tie among equal-key rows with
    * a second criterion (ids — see [[graft.ext.Dsir.resampleAt]]).
    *
    * Null keys are ignored (SQL ordering semantics for a DESC NULLS
    * LAST top-n). Throws when n exceeds the non-null row count —
    * silently returning "everything" would hide a budget bug. */
  def nthLargest(df: DataFrame, keyCol: String, n: Long): (Long, Long) =
    descend(df, keyCol, lit(1L), n, largest = true)

  /** [[nthLargest]] mirrored: the n-th SMALLEST value and the tie-slot
    * count — the same histogram descent walked in ascending bucket
    * order (no sign-flip trick, so Long.MinValue keys are ordinary
    * values, not a corrupting edge case). */
  def nthSmallest(df: DataFrame, keyCol: String, n: Long): (Long, Long) =
    descend(df, keyCol, lit(1L), n, largest = false)

  /** Weighted generalization — the budget-selection primitive: walking
    * rows in `keyCol`-descending order, the key at which the running
    * `weightCol` total first REACHES `budget`, plus the budget still
    * unfilled when entering that key's tie group. A caller keeping the
    * minimal best-first prefix of ≥ `budget` total weight takes every
    * row above the threshold and resolves the tie group with a second
    * ascending descent over ids (see `Corpus.selectByBudgetAt`).
    * [[nthLargest]] is exactly this with weight 1. Weights must be
    * non-negative and non-null (both enforced); rows with null KEYS
    * are ignored. */
  def budgetThresholdDesc(df: DataFrame, keyCol: String, weightCol: String,
                          budget: Long): (Long, Long) =
    descend(df, keyCol, col(weightCol), budget, largest = true)

  /** [[budgetThresholdDesc]] walked in ascending key order. */
  def budgetThresholdAsc(df: DataFrame, keyCol: String, weightCol: String,
                         budget: Long): (Long, Long) =
    descend(df, keyCol, col(weightCol), budget, largest = false)

  private def descend(df: DataFrame, keyCol: String, weightIn: Column,
                      budget: Long, largest: Boolean): (Long, Long) = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    // integral weights of any width are welcome (the getLong reads
    // below need LongType, not IntegerType); the cast also normalizes
    // an integer-typed key-companion column a caller passes verbatim
    val weight = weightIn.cast("long")
    val key = col(keyCol)
    var remaining = budget
    var kept: Column = key.isNotNull
    var acc = 0L
    for (r <- 0 until 4) {
      val shift = 48 - 16 * r
      val bucket =
        if (r == 0) shiftright(key, 48)
        else shiftright(key, shift).bitwiseAND(lit(0xFFFFL))
      // min(weight) and the null-weight count ride the same
      // aggregation — a negative weight would silently corrupt the
      // cumulative walk and a null one would silently vanish from it
      // (only null KEYS are defined as ignored), so both must raise,
      // and checking here costs no extra scan
      // the per-bucket total sums as decimal(38,0): Long sum() wraps
      // silently outside ANSI mode, and with ≥3 huge weights it can
      // wrap past 2⁶⁴ back into POSITIVE range, so a sign check is
      // parity-dependent — the decimal total makes overflow detection
      // exact (the 10¹⁰-row × large-weight regime must fail loudly,
      // not walk a corrupted histogram)
      val rows = df.filter(kept)
        .groupBy(bucket.as("_b")).agg(
          sum(weight.cast("decimal(38,0)")).as("_c"), min(weight).as("_m"),
          sum(weight.isNull.cast("long")).as("_nn"))
        .collect()
      val maxLong = new java.math.BigDecimal(Long.MaxValue)
      rows.foreach { row =>
        if (!row.isNullAt(2) && row.getLong(2) < 0L)
          throw new IllegalArgumentException(
            s"Selection: negative weight ${row.getLong(2)} — weights must be non-negative")
        if (row.getLong(3) > 0L)
          throw new IllegalArgumentException(
            s"Selection: ${row.getLong(3)} null weight(s) — weights must be non-null " +
            "(null keys are the only rows this operator ignores)")
        if (!row.isNullAt(1) && row.getDecimal(1).compareTo(maxLong) > 0)
          throw new ArithmeticException(
            s"Selection: per-bucket weighted sum ${row.getDecimal(1)} exceeds Long range " +
            s"(bucket ${row.getLong(0)}) — rescale weights below 2^63 / rows")
      }
      val counts = rows.map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) 0L else row.getDecimal(1).longValueExact()))
        .sortBy(b => if (largest) -b._1 else b._1)
      var i = 0
      var found = false
      var chosen = 0L
      while (i < counts.length && !found) {
        val (b, c) = counts(i)
        if (c >= remaining) { chosen = b; found = true } else remaining -= c
        i += 1
      }
      if (!found)
        throw new IllegalArgumentException(
          s"Selection: budget=$budget exceeds the total weight over $keyCol")
      acc |= (if (r == 0) chosen << 48 else chosen << shift)
      kept = kept &&
        (if (r == 0) shiftright(key, 48) === chosen
         else shiftright(key, shift).bitwiseAND(lit(0xFFFFL)) === chosen)
    }
    (acc, remaining)
  }
}
