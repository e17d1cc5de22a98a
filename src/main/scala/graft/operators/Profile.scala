package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling and distribution-based quality gates — the table-
  * maintenance / data-quality layer a long-lived 100 TB store needs
  * (reference has no analog; extension surface, SURVEY.md §2.5). A
  * profile drives partition-layout and filter decisions (null-heavy
  * columns, low-cardinality candidates for dictionary/partition keys);
  * the IQR gates are the numeric analog of TextAnalysis's text-quality
  * filters (drop/clamp metric outliers before they skew training
  * mixes).
  */
object Profile {

  /** Per-column profile — (column, n_rows, n_null, n_distinct) — of the
    * named columns, computed in ONE aggregation job.
    *
    * Scale shape: one scan; the multi-column exact distinct runs on
    * Catalyst's Expand (one duplicated stream per column, the same plan
    * q_agg_distinct measured and kept deliberately) with partial
    * aggregation, so the shuffle carries distinct values only — there
    * is no per-column job loop, unlike naive `df.select(c).distinct()
    * .count()` profiling. Exact integer outputs: bit-stable on any
    * engine and partitioning. For thousands-of-columns profiling swap
    * `countDistinct` for `approx_count_distinct` (HLL, sketch policy —
    * no oracle row) — the Expand blowup, not the agg, is the cliff. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(lit(1)).as(s"_n_$i"),
        count(when(col(c).isNull, lit(1))).as(s"_null_$i"),
        countDistinct(col(c)).as(s"_dist_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Column API with index-keyed intermediate aliases, not interpolated
    // selectExpr: column names with quotes/dots/backticks arrive only as
    // literals, never as parsed SQL text or attribute names
    val rows = cols.indices.map(i =>
      struct(lit(cols(i)).as("column"), col(s"_n_$i").as("n_rows"),
        col(s"_null_$i").as("n_null"), col(s"_dist_$i").as("n_distinct")))
    wide.select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.column"), col("_r.n_rows"), col("_r.n_null"), col("_r.n_distinct"))
  }

  /** Tukey fences of `valueCol`: one row (q1, q3, lo, hi) with
    * lo = q1 − k·IQR, hi = q3 + k·IQR (k = 1.5 is Tukey's "inner
    * fence"). Exact interpolated percentiles (≡ DuckDB quantile_cont,
    * parity proven by q_percentile); one aggregation row, broadcastable.
    * Exact percentile sorts per group — fine to ~10⁹ rows/group; beyond
    * that use approx_percentile and accept the sketch contract. */
  def iqrBounds(df: DataFrame, valueCol: String, k: Double = 1.5): DataFrame =
    df.agg(
        percentile(col(valueCol), lit(0.25)).as("q1"),
        percentile(col(valueCol), lit(0.75)).as("q3"))
      .select(col("q1"), col("q3"),
        (col("q1") - (col("q3") - col("q1")) * k).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * k).as("hi"))

  /** Keep rows with `valueCol` inside the closed Tukey fence
    * [lo, hi] — nulls are dropped (no evidence either way ⇒ not
    * provably inlier; keep-nulls callers should coalesce first).
    *
    * Scale shape: the fence is a 1-row aggregate broadcast back onto
    * the corpus — one stats pass + one map-side filter pass, no corpus
    * shuffle (same two-scan shape as temperatureSample; at 100 TB
    * persist the fence row and reuse it across batches instead of
    * recomputing). */
  def filterOutliers(df: DataFrame, valueCol: String, k: Double = 1.5): DataFrame = {
    val (lo, hi) = fenceNames(df)
    df.crossJoin(broadcast(
        iqrBounds(df, valueCol, k).select(col("lo").as(lo), col("hi").as(hi))))
      .filter(col(valueCol) >= col(lo) && col(valueCol) <= col(hi))
      .drop(lo, hi)
  }

  /** Collision-free fence column names — an unprefixed lo/hi would be
    * ambiguous (or dropped) on a frame that already carries them. */
  private def fenceNames(df: DataFrame): (String, String) = {
    val taken = df.columns.toSet
    def fresh(base: String) = Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i").filterNot(taken).next()
    (fresh("_iqr_lo"), fresh("_iqr_hi"))
  }

  /** Per-group ordinary-least-squares line y = intercept + slope·x,
    * with r² — the "does this metric trend with that one, per segment"
    * profiling question, computed from the five classical sums in ONE
    * aggregation pass (no second centered pass, no per-group collect):
    *
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    *
    * NULL where undefined (x constant in the group ⇒ zero x-variance;
    * r² additionally needs y-variance). Sums are EXACT decimal sums of
    * `scale`-decimal products (the decSum convention every money oracle
    * row uses), cast to double only for the final arithmetic — so
    * results are bit-stable under any partitioning and engine, given
    * inputs that are true `scale`-decimal values.
    *
    * Scale shape: partial+final hash agg on the group key — one scan,
    * one short-key shuffle, same plan class as any groupBy-sum. */
  def linearFit(df: DataFrame, groupCol: String, xCol: String, yCol: String,
                scale: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // operands pin to `scale` decimals FIRST, products keep the full
    // 2*scale-digit precision (exact in decimal(37, 2s)) — casting the
    // double PRODUCT to scale decimals would quantize x*y itself and
    // wreck slope/r2 for small-magnitude data (rates ~1e-3 round to 0).
    // Under non-ANSI mode a |value| >= 10^(18-scale) cast overflows to
    // NULL and would be SILENTLY dropped from every sum while count()
    // still counts the row — raise instead (the detectPeriod guard).
    def d(c: Column) = when(c.isNotNull && c.cast(DecimalType(18, scale)).isNull,
        raise_error(lit(s"linearFit: value exceeds DECIMAL(18,$scale) — " +
          s"|x|,|y| must be < 1e${18 - scale} (see scaladoc)")))
      .otherwise(c.cast(DecimalType(18, scale)))
    def dsum(c: Column) = sum(d(c)).cast("double")
    def dsumProd(a: Column, b: Column) = sum(d(a) * d(b)).cast("double")
    val x = col(xCol); val y = col(yCol)
    val agged = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("_n"),
      dsum(x).as("_sx"), dsum(y).as("_sy"),
      dsumProd(x, y).as("_sxy"), dsumProd(x, x).as("_sxx"), dsumProd(y, y).as("_syy"))
    val vx = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val vy = col("_n") * col("_syy") - col("_sy") * col("_sy")
    val cxy = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    agged
      .withColumn("slope", when(vx > 0, cxy / vx))
      .withColumn("intercept",
        when(vx > 0, (col("_sy") - col("slope") * col("_sx")) / col("_n")))
      .withColumn("r2", when(vx > 0 && vy > 0, cxy * cxy / (vx * vy)))
      .select(col(groupCol), col("_n").cast("long").as("n"),
        col("slope"), col("intercept"), col("r2"))
  }

  /** Winsorize: CLAMP `valueCol` to the fence instead of dropping —
    * the variance-preserving alternative when row loss is unacceptable
    * (per-group token budgets, paired observations). Same broadcast
    * shape as [[filterOutliers]]; nulls pass through as null. */
  def winsorize(df: DataFrame, valueCol: String, k: Double = 1.5,
                outCol: String = "winsorized"): DataFrame = {
    val (lo, hi) = fenceNames(df)
    df.crossJoin(broadcast(
        iqrBounds(df, valueCol, k).select(col("lo").as(lo), col("hi").as(hi))))
      // nulls pass through as documented — greatest/least SKIP nulls,
      // so an unguarded clamp would fabricate the lower fence for
      // every null observation
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol), col(lo)), col(hi))))
      .drop(lo, hi)
  }
}
