package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream cohort analytics beyond the funnel (operators/Funnel):
  * weekly retention triangles and event-transition matrices — the other
  * two product-analytics staples (extension surface, SURVEY.md §2.5).
  * Both are exact integer/date arithmetic end to end: no floats, so
  * results are bit-stable on any engine and partitioning.
  */
object Events {

  /** Weekly retention triangle: users cohorted by the week of their
    * first `cohortType` event; one output row per (cohort week, week
    * offset ≥ 0) with the count of cohort users active (ANY event) in
    * that week. `week0` is the cohort week itself; offsets are exact
    * (week-truncated date difference / 7). Activity before the cohort
    * event is ignored — a pre-signup visit is not retention.
    *
    * Scale shape: one user-keyed aggregation for cohort weeks, one
    * user-keyed equi-join onto per-event activity weeks (co-partitioned
    * with the agg output — AQE reuses the exchange), then a distinct +
    * count on (cohort, offset) short keys. Nothing is collected; the
    * (user, week) distinct is the only corpus-sized shuffle. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, cohortType: String): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(date_trunc("week", col(tsCol))).as("_cw"))
    val activity = events.select(col(userCol), date_trunc("week", col(tsCol)).as("_aw"))
    cohorts.join(activity, Seq(userCol))
      .filter(col("_aw") >= col("_cw"))
      .select(col(userCol), col("_cw"),
        floor(datediff(to_date(col("_aw")), to_date(col("_cw"))) / 7).as("week_offset"))
      .distinct()
      .groupBy(col("_cw").as("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-transition counts: for each user's time-ordered event
    * sequence, count (event → next event) adjacencies corpus-wide —
    * the empirical Markov transition matrix of the product. Rows with
    * no successor (each user's last event) emit nothing. Pass `idCol`
    * to break timestamp ties deterministically (the attribution
    * operators' discipline); with `idCol = None` per-user-unique
    * timestamps are required for a partition-order-independent result
    * (the driver testdata guarantees them).
    *
    * Scale shape: ONE user-keyed window (sorted within partitions) and
    * an agg on the tiny (from, to) key space; partial aggregation
    * collapses the shuffle to O(|event types|²) rows. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, idCol: Option[String] = None): DataFrame = {
    val order = col(tsCol) +: idCol.map(col).toSeq
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** MULTI-touch (linear) attribution: every touch strictly before a
    * conversion shares its credit equally — the complement of
    * [[attribution]]'s winner-take-all models. Output: one row per
    * (conversion, preceding touch) with the touch `channel`, the
    * conversion's `n_touches`, and `weight` = 1/n_touches; conversions
    * with no preceding touch emit nothing (callers count them as
    * 'direct' via [[attribution]]).
    *
    * Scale shape: one user-keyed window whose per-row state is the
    * LIST of preceding touches (collect_list skips the null
    * non-touches) — memory per row is the user's touch count, the same
    * per-key bound as sorted collect_list aggregation; the explode
    * multiplies only conversion rows. Ordering ties break on `idCol`,
    * so credit is partition-order-independent. */
  def attributionLinear(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String, touchTypes: Seq[String],
                        convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(lit): _*), col(typeCol))
    events
      .withColumn("_touches", collect_list(touch).over(w))
      .filter(col(typeCol) === convType && size(col("_touches")) > 0)
      .withColumn("n_touches", size(col("_touches")).cast("long"))
      .select(col(userCol), col(idCol), col(tsCol),
        explode(col("_touches")).as("channel"),
        col("n_touches"),
        (lit(1.0) / col("n_touches")).as("weight"))
  }

  /** Touch attribution: each `convType` event is credited to the
    * nearest `touchTypes` event STRICTLY before it in the same user's
    * stream (`model = "last"`, the default last-touch rule) or to the
    * user's earliest preceding touch (`model = "first"`). Conversions
    * with no preceding touch get a null channel (direct conversions —
    * callers decide whether to keep or drop them). Output: the
    * conversion rows with a `channel` column.
    *
    * Both models are ONE user-keyed window over the time-sorted
    * stream — last/first(IGNORE NULLS) over a (unbounded, 1 PRECEDING)
    * frame is O(1) running state per row, so the whole attribution is
    * a single shuffle on the user key no matter how long the streams
    * are. Ordering ties on `tsCol` are broken by `idCol` so credit is
    * partition-order-independent. */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, touchTypes: Seq[String],
                  convType: String, model: String = "last"): DataFrame = {
    require(model == "last" || model == "first", s"unknown model: $model")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(lit): _*), col(typeCol))
    val credited =
      if (model == "last") last(touch, ignoreNulls = true).over(w)
      else first(touch, ignoreNulls = true).over(w)
    events
      .withColumn("channel", credited)
      .filter(col(typeCol) === convType)
  }
}
