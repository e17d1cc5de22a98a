package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap filling for sparse observations: replace nulls with the nearest
  * non-null value along an ordering, per key — the time-series
  * forward/backward fill every sensor/metrics pipeline runs before
  * aggregation, and the array-free analog of the reference's
  * missing-value masking (a masked cell is a null to be imputed).
  *
  * One window per direction over the SAME (key, order) sort — filling k
  * columns adds k window expressions, not k shuffles; Spark computes
  * them in a single Window operator. `last(ignoreNulls)` over an
  * unbounded-preceding frame is O(1) running state per partition, not
  * a per-row scan — this holds at any partition size. */
object Fill {

  private def ffillWindow(partitionCols: Seq[String], orderCols: Seq[String]) =
    Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def bfillWindow(partitionCols: Seq[String], orderCols: Seq[String]) =
    Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

  /** Nulls take the most recent non-null value per key (rows before the
    * first observation stay null). */
  def forwardFill(df: DataFrame, partitionCols: Seq[String],
                  orderCols: Seq[String], cols: Seq[String]): DataFrame = {
    val w = ffillWindow(partitionCols, orderCols)
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Nulls take the next non-null value per key (rows after the last
    * observation stay null). */
  def backwardFill(df: DataFrame, partitionCols: Seq[String],
                   orderCols: Seq[String], cols: Seq[String]): DataFrame = {
    val w = bfillWindow(partitionCols, orderCols)
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** Forward fill, then backward fill the leading-null prefix, then a
    * constant for keys with no observation at all — the standard
    * "complete" imputation. */
  def fill(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
           cols: Seq[String], default: Column): DataFrame = {
    val filled = backwardFill(
      forwardFill(df, partitionCols, orderCols, cols),
      partitionCols, orderCols, cols)
    cols.foldLeft(filled)((acc, c) => acc.withColumn(c, coalesce(col(c), default)))
  }

  /** Linear interpolation between the surrounding observations per key
    * (pandas `interpolate(method='values')`): a null at position x
    * between observations (x0,v0) and (x1,v1) becomes
    * v0 + (v1−v0)·(x−x0)/(x1−x0); rows outside the observed span take
    * the nearest observation (edge hold). `orderCol` must be numeric —
    * the interpolation weight is a ratio of order distances, not of row
    * counts.
    *
    * Four window expressions over ONE (key, order) sort — Spark fuses
    * them into a single Window operator, so the cost is one shuffle on
    * `partitionCols` regardless of how many value columns are filled.
    * Each expression is last/first(IGNORE NULLS) over a one-sided
    * frame: O(1) running state per row at any partition size. All
    * arithmetic is IEEE correctly-rounded ops (sub/div/mul/add) on
    * binary64 in a fixed expression shape, so engines agree bitwise —
    * no rounding needed for cross-engine hashing. */
  def interpolateLinear(df: DataFrame, partitionCols: Seq[String],
                        orderCol: String, cols: Seq[String]): DataFrame = {
    val wPrev = ffillWindow(partitionCols, Seq(orderCol))
    val wNext = bfillWindow(partitionCols, Seq(orderCol))
    val x = col(orderCol).cast("double")
    cols.foldLeft(df) { (acc, c) =>
      val v = col(c)
      val pv = last(v, ignoreNulls = true).over(wPrev)
      val px = last(when(v.isNotNull, x), ignoreNulls = true).over(wPrev)
      val nv = first(v, ignoreNulls = true).over(wNext)
      val nx = first(when(v.isNotNull, x), ignoreNulls = true).over(wNext)
      acc.withColumn(c,
        when(v.isNotNull, v)
          // nx > px guard: duplicate orderCol values on both sides of a
          // gap would divide by zero (NaN/Inf); fall to the edge-hold
          // branch instead
          .when(pv.isNotNull && nv.isNotNull && nx > px,
            pv + (nv - pv) * ((x - px) / (nx - px)))
          .otherwise(coalesce(pv, nv)))
    }
  }

  /** Exponentially weighted moving average per key (pandas
    * `ewm(alpha, adjust=False, ignore_na=True).mean()`):
    * y_t = (1−α)·y_{t−1} + α·x_t over the key's order-sorted stream;
    * null observations leave the state unchanged (and take the carried
    * value; leading nulls stay null). Appends `outCol`.
    *
    * The recurrence is inherently sequential per key, which no window
    * frame expresses (Spark has no recursive window state) — so this is
    * the documented `mapPartitions` escalation (SURVEY §4.2(d), same as
    * `Corpus.packSequencesGreedy`): ONE shuffle to co-locate each key,
    * a sort within partitions, then an O(1)-state scan. Keys must
    * individually fit a partition (billions of short streams parallelize
    * across partitions; one trillion-row key would serialize — the same
    * contract every per-key sequential op carries). */
  def ewma(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
           valueCol: String, alpha: Double, outCol: String = "ewma"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha must be in (0, 1]")
    require(partitionCols.nonEmpty, "ewma needs key columns (per-key streams)")
    require(!df.columns.contains(outCol),
      s"outCol '$outCol' already exists (schema.add would duplicate it — rename)")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.DoubleType
    val parted = df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ orderCols).map(col): _*)
    val outSchema = df.schema.add(outCol, DoubleType, nullable = true)
    val keyIdx = partitionCols.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state: java.lang.Double = null
      it.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; state = null }
        val v = r.get(valIdx)
        if (v != null) {
          val x = v.asInstanceOf[Number].doubleValue()
          state = if (state == null) x else (1.0 - alpha) * state + alpha * x
        }
        Row.fromSeq(r.toSeq :+ state)
      }
    }(Encoders.row(outSchema))
  }

  /** Holt's linear (double exponential) smoothing — the trend-aware
    * [[ewma]] (Holt 1957; Hyndman & Athanasopoulos, FPP §8.2 "Holt's
    * linear trend method"): per key, in order,
    *
    *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * initialized l₁ = y₁, b₁ = 0 at each key's first non-null
    * observation; null values carry state (the ewma convention).
    * Appends `level`, `trend` and the one-step-ahead forecast
    * `level + trend`. α, β are integer PERCENTS so both engines
    * derive identical double constants, and the recurrence is a fixed
    * op sequence — bit-replicable wherever the inputs are (the
    * exact-decimal daily-sum discipline upstream).
    *
    * Scale shape = [[ewma]]'s: one key repartition + in-partition
    * sort, then a single ordered pass (mapPartitions — the documented
    * sequential-recurrence escape hatch). */
  def holtLinear(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
                 valueCol: String, alphaPct: Int, betaPct: Int,
                 levelCol: String = "holt_level", trendCol: String = "holt_trend",
                 forecastCol: String = "holt_next"): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 100, s"alphaPct=$alphaPct must be in [1,100]")
    require(betaPct >= 0 && betaPct <= 100, s"betaPct=$betaPct must be in [0,100]")
    require(partitionCols.nonEmpty, "holtLinear needs key columns (per-key series)")
    Seq(levelCol, trendCol, forecastCol).foreach(c =>
      require(!df.columns.contains(c), s"output column '$c' already exists"))
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.DoubleType
    val alpha = alphaPct / 100.0
    val beta = betaPct / 100.0
    val parted = df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ orderCols).map(col): _*)
    val outSchema = df.schema
      .add(levelCol, DoubleType, nullable = true)
      .add(trendCol, DoubleType, nullable = true)
      .add(forecastCol, DoubleType, nullable = true)
    val keyIdx = partitionCols.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var l: java.lang.Double = null
      var b: java.lang.Double = null
      it.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; l = null; b = null }
        val v = r.get(valIdx)
        if (v != null) {
          val y = v.asInstanceOf[Number].doubleValue()
          if (l == null) { l = y; b = 0.0 }
          else {
            val lNew = alpha * y + (1.0 - alpha) * (l + b)
            b = beta * (lNew - l) + (1.0 - beta) * b
            l = lNew
          }
        }
        val f: java.lang.Double = if (l == null) null else l + b
        Row.fromSeq(r.toSeq :+ l :+ b :+ f)
      }
    }(Encoders.row(outSchema))
  }

  /** Additive Holt-Winters (triple exponential) smoothing — [[holtLinear]]
    * plus a period-`m` seasonal index (Winters 1960; Hyndman &
    * Athanasopoulos, FPP §8.3 "Holt-Winters' seasonal method", additive
    * form). Per key, at the t-th non-null observation,
    *
    *   l_t = α·(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ·(y_t − l_{t−1} − b_{t−1}) + (1−γ)·s_{t−m}
    *
    * with the simple sequential initialization l₁ = y₁, b₁ = 0, s₁ = 0
    * and s_{t−m} ≡ 0 while t ≤ m — the warm-up season behaves exactly
    * like [[holtLinear]] and seasonality is learned from the second
    * cycle on. (The classic first-season-mean initialization needs a
    * look-ahead over the first m points; this form keeps the recurrence
    * strictly one-pass and makes the DuckDB recursive-CTE twin a
    * line-for-line replay.) Null values carry state without advancing
    * the seasonal clock (t counts OBSERVATIONS, not rows — the ewma
    * convention). Appends level, trend, the seasonal index s_t, and the
    * one-step-ahead forecast l_t + b_t + s_{t+1−m}. α, β, γ are integer
    * PERCENTS and the op order is fixed, so results are bit-replicable
    * across engines.
    *
    * Scale shape = [[ewma]]'s: one key repartition + in-partition sort,
    * then a single ordered pass with O(period) state per key (a ring
    * buffer of seasonal values — never the series). */
  def holtWinters(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
                  valueCol: String, period: Int,
                  alphaPct: Int, betaPct: Int, gammaPct: Int,
                  levelCol: String = "hw_level", trendCol: String = "hw_trend",
                  seasonCol: String = "hw_season", forecastCol: String = "hw_next"): DataFrame = {
    require(period >= 2, s"period=$period must be >= 2 (use holtLinear for no seasonality)")
    require(alphaPct >= 1 && alphaPct <= 100, s"alphaPct=$alphaPct must be in [1,100]")
    require(betaPct >= 0 && betaPct <= 100, s"betaPct=$betaPct must be in [0,100]")
    require(gammaPct >= 0 && gammaPct <= 100, s"gammaPct=$gammaPct must be in [0,100]")
    require(partitionCols.nonEmpty, "holtWinters needs key columns (per-key series)")
    Seq(levelCol, trendCol, seasonCol, forecastCol).foreach(c =>
      require(!df.columns.contains(c), s"output column '$c' already exists"))
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.DoubleType
    val alpha = alphaPct / 100.0
    val beta = betaPct / 100.0
    val gamma = gammaPct / 100.0
    val m = period
    val parted = df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ orderCols).map(col): _*)
    val outSchema = df.schema
      .add(levelCol, DoubleType, nullable = true)
      .add(trendCol, DoubleType, nullable = true)
      .add(seasonCol, DoubleType, nullable = true)
      .add(forecastCol, DoubleType, nullable = true)
    val keyIdx = partitionCols.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var l: java.lang.Double = null
      var b: java.lang.Double = null
      var sLast: java.lang.Double = null
      var t: Long = 0L
      // ring(i) holds s_{t'} for the latest t' with (t'-1) % m == i;
      // 0.0 = "no seasonal estimate yet" (the s_{t-m} ≡ 0 warm-up)
      var ring: Array[Double] = null
      it.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) {
          curKey = key; l = null; b = null; sLast = null; t = 0L
          ring = Array.fill(m)(0.0)
        }
        val v = r.get(valIdx)
        if (v != null) {
          val y = v.asInstanceOf[Number].doubleValue()
          t += 1
          val slot = ((t - 1) % m).toInt
          if (l == null) { l = y; b = 0.0; sLast = 0.0; ring(slot) = 0.0 }
          else {
            val sPrev = ring(slot) // s_{t-m}, or 0.0 during warm-up
            val lNew = alpha * (y - sPrev) + (1.0 - alpha) * (l + b)
            val bNew = beta * (lNew - l) + (1.0 - beta) * b
            val sNew = gamma * (y - l - b) + (1.0 - gamma) * sPrev
            l = lNew; b = bNew; sLast = sNew; ring(slot) = sNew
          }
        }
        val f: java.lang.Double =
          if (l == null) null else l + b + ring((t % m).toInt)
        Row.fromSeq(r.toSeq :+ l :+ b :+ sLast :+ f)
      }
    }(Encoders.row(outSchema))
  }

  /** Seasonality-period detection — the companion of [[holtWinters]]'s
    * `period` parameter: per key, the mean-corrected autocovariance at
    * every lag in [minLag, maxLag], with the argmax flagged. Two
    * choices make it EXACT (bit-identical across engines, independent
    * of partitioning):
    *
    *   - all lags share ONE support window (rows with row_number >
    *     maxLag), so every lag sums the same n' terms and scores
    *     compare directly — no per-lag normalization, no division;
    *   - the mean correction is the division-free form
    *     C_k = n'·Σ(y_t·y_{t−k}) − (Σy_t)·(Σy_{t−k}), computed in
    *     DECIMAL end to end (values pinned to DECIMAL(14,4); every
    *     intermediate stays within 38 digits, so no precision loss).
    *
    * Bounds contract (enforced, not just documented): the fixed
    * decimal widths hold exactly when |Σy| < 10^12 and
    * n'·max(y)² < 10^18 per key — e.g. n' ≤ 10^6 with |value| ≤ 10^5,
    * or n' ≤ 10^4 with |value| ≤ 10^7. A value unrepresentable in
    * DECIMAL(14,4) or a sum overflowing its cast RAISES (the DuckDB
    * twin errors loudly on the same overflow) — never a silent null
    * score electing an arbitrary best lag. Null observations are
    * DROPPED before ranking (fill them first — ffill/interpolate are
    * this module; a null would otherwise shrink each lag's sum over a
    * different term set and make scores incomparable). Returns one row
    * per (key, lag): partitionCols + (lagCol int, scoreCol decimal,
    * bestCol 1/0 — ties resolve to the smallest lag).
    *
    * Scale shape: maxLag lag-columns over ONE keyed sort window, one
    * keyed aggregation, a stack (no shuffle), one tiny ranking window
    * over maxLag−minLag+1 rows per key. The series is never collected
    * and never joined against itself. */
  def detectPeriod(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
                   valueCol: String, minLag: Int = 2, maxLag: Int = 14,
                   lagCol: String = "lag", scoreCol: String = "acov",
                   bestCol: String = "is_best"): DataFrame = {
    require(minLag >= 1, s"minLag=$minLag must be >= 1")
    require(maxLag > minLag, s"maxLag=$maxLag must be > minLag=$minLag")
    require(partitionCols.nonEmpty, "detectPeriod needs key columns (per-key series)")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val lags = (minLag to maxLag).toSeq
    val y = col("_y4")
    val wide = df.filter(col(valueCol).isNotNull)
      .withColumn("_y4",
        when(col(valueCol).cast("decimal(14,4)").isNull,
          raise_error(lit(s"detectPeriod: '$valueCol' value exceeds DECIMAL(14,4) " +
            "— outside the exactness bounds (see scaladoc)")))
          .otherwise(col(valueCol).cast("decimal(14,4)")))
      .withColumn("_rn", row_number().over(w))
      .select((partitionCols.map(col) :+ y :+ col("_rn")) ++
        lags.map(k => lag(y, k).over(w).as(s"_l$k")): _*)
      .filter(col("_rn") > maxLag)
    val aggs = Seq(
      count(lit(1)).cast("decimal(6,0)").as("_n"),
      sum(y).cast("decimal(16,4)").as("_sy")) ++
      lags.flatMap(k => Seq(
        sum(y * col(s"_l$k")).cast("decimal(26,8)").as(s"_syy$k"),
        sum(col(s"_l$k")).cast("decimal(16,4)").as(s"_sl$k")))
    val a = wide.groupBy(partitionCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // a null score here means a sum overflowed its cast (the bounds
    // contract was violated) — raise instead of letting row_number
    // elect an arbitrary best lag over nulls
    val withC = lags.foldLeft(a) { (d, k) =>
      val c = col("_n") * col(s"_syy$k") - col("_sy") * col(s"_sl$k")
      d.withColumn(s"_c$k",
        when(c.isNull, raise_error(lit(
          s"detectPeriod: decimal overflow at lag $k — per-key sums exceed " +
            "the exactness bounds (see scaladoc)"))).otherwise(c))
    }
    val stackExpr = s"stack(${lags.length}, " +
      lags.map(k => s"$k, _c$k").mkString(", ") + s") as ($lagCol, $scoreCol)"
    val long = withC.select(partitionCols.map(col) :+ expr(stackExpr): _*)
    val wr = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(lagCol).asc)
    long.withColumn(bestCol, when(row_number().over(wr) === 1, 1L).otherwise(0L))
  }
}
