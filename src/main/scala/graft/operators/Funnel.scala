package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Strictly-ordered funnel analysis over an event stream — "of the
  * users who did A, how many then did B, then C?" (product-analytics
  * staple; reference has no analog — extension surface, SURVEY.md
  * §2.5). Stage k+1 must happen STRICTLY AFTER the chosen stage-k
  * event: a click logged before the first view does not convert, and
  * the chosen stage-k event is always the EARLIEST one that satisfies
  * its own predecessor constraint (the standard greedy funnel — greedy
  * is optimal here, since taking the earliest valid event can only
  * enlarge the set of valid successors).
  */
object Funnel {

  /** Per-user funnel times: for each user, `t1` = earliest stage-1
    * event, `t{k+1}` = earliest stage-(k+1) event strictly after `tk`
    * (NULL propagates — never reached stage k ⇒ never reached k+1),
    * plus `reached` = number of stages completed. `maxGapSeconds`, if
    * set, is the conversion deadline: stage k+1 must also land within
    * that many seconds of `tk` (an event past the deadline does NOT
    * fall through to later candidates — the greedy-optimality argument
    * only holds for the no-deadline funnel, so the deadline applies to
    * the earliest-after-tk candidate set directly).
    *
    * Scale shape: ONE user-keyed shuffle carrying (stage, ts) pairs;
    * the per-stage sorted arrays and the greedy scan are entirely
    * group-local (arrays of per-user event counts — dozens, not
    * corpus-sized). At petabyte event volume, feed this from a store
    * bucketed on `userCol` (sources/BucketedStore) and the exchange
    * disappears; the greedy scan itself is already map-side then.
    * `get(...)`/`filter(...)` are null-safe by construction: a NULL
    * predecessor makes the lambda predicate NULL ⇒ element dropped ⇒
    * `get` of the empty array is NULL, no ANSI out-of-bounds error. */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, stages: Seq[String],
                  maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val listCols = stages.zipWithIndex.map { case (st, i) =>
      array_sort(collect_list(when(col(typeCol) === st, col(tsCol)))).as(s"_l$i")
    }
    val grouped = events.groupBy(col(userCol)).agg(listCols.head, listCols.tail: _*)
    val withTimes = stages.indices.foldLeft(grouped) { (df, i) =>
      def inWindow(x: Column): Column = maxGapSeconds match {
        case Some(g) =>
          x > col(s"t$i") && x <= col(s"t$i") + expr(s"INTERVAL $g SECONDS")
        case None => x > col(s"t$i")
      }
      val ti =
        if (i == 0) get(col("_l0"), lit(0))
        else get(filter(col(s"_l$i"), inWindow _), lit(0))
      df.withColumn(s"t${i + 1}", ti)
    }
    val reached = stages.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withTimes
      .withColumn("reached", reached.cast("long"))
      .drop(stages.indices.map(i => s"_l$i"): _*)
  }

  /** Funnel conversion summary: one row per stage with the number of
    * users who completed it — the report built on [[funnelTimes]].
    * `stage` is 1-based; counts are necessarily non-increasing. */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String],
                 maxGapSeconds: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, userCol, tsCol, typeCol, stages, maxGapSeconds)
    // coalesce: over an EMPTY events frame sum() returns null and
    // every stage's n_users would read null instead of 0
    val counts = stages.indices.map(i =>
      coalesce(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as(s"_c$i"))
    val wide = times.agg(counts.head, counts.tail: _*)
    // Column API, not interpolated selectExpr: a stage name containing
    // a quote must arrive as a literal, never as SQL text
    val rows = stages.indices.map(i =>
      struct(lit((i + 1).toLong).as("stage"), lit(stages(i)).as("stage_name"),
        col(s"_c$i").as("n_users")))
    wide.select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.stage"), col("_r.stage_name"), col("_r.n_users"))
  }
}
